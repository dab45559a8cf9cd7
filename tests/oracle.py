"""Local replica of the driver's DuckDB-oracle compare.

Runs a Spark conformance query and its oracle SQL over the same parquet
tables, normalizes both result sets (columns sorted by name, rows as a
multiset, floats canonicalized), and diffs them. Keeping this in-repo means
every oracle mismatch is caught at test time, not at driver verify time.
"""

from __future__ import annotations

import math
import os
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

from data_engineering__spark.sources.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # In-memory connections have NO temp directory, so DuckDB cannot
    # spill and a memory-hungry oracle (60M-row window at the sf10 probe
    # scale) grows until the kernel kills the whole sweep. Cap the budget
    # and give it somewhere to spill — out-of-core instead of OOM. At the
    # driver-gate scales neither setting ever engages.
    budget_gb = int(os.environ.get("ORACLE_DUCK_MEM_GB", "40"))
    con.execute(f"SET memory_limit='{budget_gb}GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize float noise: driver hashes exact values, so we compare
        # at full precision here — queries themselves must guarantee equality
        return repr(v)
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, name: str, sf_dir: str) -> tuple[bool, str]:
    from data_engineering__spark.conformance import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    # The driver materializes oracle results via pandas, where DuckDB's
    # HUGEINT (int128 — what count_if/SUM(BIGINT) return) degrades to
    # float64 and hash-mismatches Spark's bigint even when every value is
    # identical. fetchall() below yields exact Python ints, masking that,
    # so check the declared types explicitly: any HUGEINT column must be
    # CAST(... AS BIGINT) in the oracle SQL.
    dtypes = con.execute(f"DESCRIBE (\n{ORACLE[name]}\n)").fetchall()
    huge = [r[0] for r in dtypes if "HUGEINT" in r[1].upper()]
    if huge:
        con.close()
        return False, (f"oracle emits HUGEINT column(s) {huge} — the driver "
                       "hashes these as float64; CAST(... AS BIGINT)")
    res = con.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if sn != dn:
        only_s = list((sn - dn).items())[:5]
        only_d = list((dn - sn).items())[:5]
        return False, f"value mismatch: spark-only={only_s} duck-only={only_d}"
    return True, f"ok ({len(s_rows)} rows)"


_DIGEST_MOD = (1 << 127) - 1


def _digest_stream(cols: list[str], rows) -> tuple[int, int]:
    """Order-insensitive multiset digest of an iterable of row tuples:
    (count, sum over rows of sha1(repr(normalized_tuple)) mod 2^127-1).
    Same per-cell normalization as ``_norm_rows`` — floats canonicalized
    to repr, Decimal→float, dates→str — so a digest match means exactly
    what a Counter match means, without holding the rows."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    n, acc = 0, 0
    for r in rows:
        t = tuple(_norm_cell(r[i]) for i in order)
        h = int.from_bytes(hashlib.sha1(repr(t).encode()).digest(), "big")
        acc = (acc + h) % _DIGEST_MOD
        n += 1
    return n, acc


def compare_digest(spark, name: str, sf_dir: str,
                   batch: int = 100_000) -> tuple[bool, str]:
    """Scale-probe variant of ``compare`` for DATA-SIZED result sets.

    ``compare`` materializes both result sets as Python Counters — at the
    sf10 synthetic upsample a per-event result (e.g. ``nearest_error_join``,
    ~8M rows × 4 cols) costs tens of GB of Python objects and killed the
    round-10/11 probes (the documented "oracle RSS" was the COMPARE
    vehicle, not the oracle's join). This variant streams both sides
    (``toLocalIterator`` / ``fetchmany``) into an order-insensitive
    sha1-sum multiset digest: identical normalization, O(batch) memory,
    at the price of no per-row mismatch listing — use it for scale
    batteries, keep ``compare`` (the driver's faithful replica) for the
    driver-gate scales where mismatches must be diagnosable."""
    from data_engineering__spark.conformance import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_n, s_dig = _digest_stream(
        s_cols, (tuple(r) for r in sdf.toLocalIterator()))

    con = duck_connection(sf_dir)
    dtypes = con.execute(f"DESCRIBE (\n{ORACLE[name]}\n)").fetchall()
    huge = [r[0] for r in dtypes if "HUGEINT" in r[1].upper()]
    if huge:
        con.close()
        return False, (f"oracle emits HUGEINT column(s) {huge} — the driver "
                       "hashes these as float64; CAST(... AS BIGINT)")
    res = con.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    if sorted(s_cols) != sorted(d_cols):
        con.close()
        return False, (f"column mismatch: spark={sorted(s_cols)} "
                       f"duck={sorted(d_cols)}")

    def duck_rows():
        # fetchmany() materializes the ENTIRE result on its first call
        # (DuckDB's python API buffers the full result set) — on a 60M-row
        # sf10 result that is tens of GB of process RSS, which is what
        # killed the round-11 wave-4 digest batch, not the oracle's join.
        # fetch_record_batch() is the genuinely streaming path: Arrow
        # batches materialize one at a time; to_pylist() yields the same
        # Python object types fetchmany does (Decimal/datetime/str/int),
        # so _norm_cell sees identical cells either way.
        reader = res.fetch_record_batch(batch)
        for rb in reader:
            yield from zip(*(c.to_pylist() for c in rb.columns))

    d_n, d_dig = _digest_stream(d_cols, duck_rows())
    con.close()
    if s_n != d_n:
        return False, f"row count: spark={s_n} duck={d_n}"
    if s_dig != d_dig:
        return False, (f"multiset digest mismatch over {s_n} rows "
                       f"(spark={s_dig:x} duck={d_dig:x})")
    return True, f"ok ({s_n} rows, digest)"
