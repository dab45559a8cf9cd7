"""Python user-defined TABLE functions (SURVEY §2.10 U4, literal UDTF API).

The grouped-map tier (``applyInPandas``, functions.udafs) covers
order-dependent per-group computation; this module covers the 1→N ROW
EXPANSION tier with Spark 4's first-class ``@udtf`` API — a lateral-join
shape (each input row yields any number of output rows with a declared
schema).

UDTFs evaluate row-at-a-time in Python: they are the SLOW path. Use one
when per-row expansion needs real Python logic (stateful parsing,
third-party libraries); for anything expressible as ``explode``/
``posexplode`` over a codegen array expression, use that instead (the
conformance twin ``explode_split`` is the fast-path version of exactly
this operator — the docstring steers, the bench shows why).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SplitAuthors:
    """Expand a comma-separated author string into (pos, name) rows —
    the reference's naive ``', '`` split (``process_publications_dag.py:73``:
    'A and B' stays one author) with the ordinal preserved. A blank or
    NULL field yields zero rows (the reference skips empties)."""

    def eval(self, pub_id: int, authors: str):  # noqa: A003 - UDTF contract
        if authors is None:
            return
        for pos, raw in enumerate(authors.split(", ")):
            name = raw.strip()
            if name:
                yield pub_id, pos, name


def split_authors_udtf(spark: SparkSession, df: DataFrame,
                       id_col: str = "pub_id",
                       authors_col: str = "authors") -> DataFrame:
    """Apply the UDTF laterally — one call per input row, N output rows.
    Per-row application goes through the SQL table-valued-function
    surface (``FROM src, LATERAL fn(...)``): the functional form
    ``fn(col, col)`` builds a standalone one-row relation, not a lateral
    join. Registration is per-session and idempotent."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_authors",
        udtf(SplitAuthors, returnType="pub_id bigint, pos int, name string"))
    view = f"__split_authors_src_{abs(hash((id_col, authors_col))) % 10**8}"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT t.pub_id, t.pos, t.name FROM {view}, "
        f"LATERAL split_authors({id_col}, {authors_col}) t")
