"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke: rows>0, stable schema).
``queries()`` — one callable per implemented SURVEY §2 operator.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for ops the
oracle can't express; driver records rows-only).

Implementation lives in ``data_engineering__spark.conformance``; this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's headline analytics query
    (entities ranked by join-count, ``database and queries
    aupostgres.sql:102-106``) widened to a 4-table star join —
    region → nation → customer → orders with per-nation order stats."""
    from data_engineering__spark.session import tune
    from data_engineering__spark.sources.io import read_table

    tune(spark)
    r = read_table(spark, SF_SMOKE, "region")
    n = read_table(spark, SF_SMOKE, "nation")
    c = read_table(spark, SF_SMOKE, "customer")
    o = read_table(spark, SF_SMOKE, "orders")
    joined = (o.join(c, o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.groupBy("r_name", "n_name")
            .agg(F.count("o_orderkey").alias("order_count"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
                 F.countDistinct("c_custkey").alias("n_customers"))
            .orderBy(F.desc("order_count"), F.asc("n_name")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # driver_ordered: the driver records correctness rows for the first ~50
    # dict entries per round — unverified/changed queries lead (see
    # conformance.DRIVER_PRIORITY)
    from data_engineering__spark.conformance import QUERIES, driver_ordered
    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_engineering__spark.conformance import ORACLE, driver_ordered
    return driver_ordered(ORACLE)
