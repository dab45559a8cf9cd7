"""Local replica of the driver's DuckDB-oracle compare.

Runs a Spark conformance query and its oracle SQL over the same parquet
tables, normalizes both result sets (columns sorted by name, rows as a
multiset, floats canonicalized), and diffs them. Keeping this in-repo means
every oracle mismatch is caught at test time, not at driver verify time.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

from data_engineering__spark.sources.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
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
