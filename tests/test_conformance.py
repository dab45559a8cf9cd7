"""Differential oracle tests (SURVEY §5 strategy #1): every SQL-expressible
conformance query must hash-match its DuckDB oracle at sf0.001 — a local
replica of the driver's t2 gate. Rows-only queries must return rows."""

from __future__ import annotations

import pytest

from data_engineering__spark.conformance import ORACLE, QUERIES

from .oracle import compare

SQL_BACKED = sorted(ORACLE)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("name", SQL_BACKED)
def test_oracle_match(spark, sf_dir, name):
    ok, msg = compare(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_nonempty(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.limit(1000).collect()
    assert len(rows) > 0, f"{name} returned no rows"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "n_name", "order_count",
                               "total_revenue", "n_customers"}


def test_every_query_key_unique_and_callable():
    assert len(QUERIES) >= 30
    for name, fn in QUERIES.items():
        assert callable(fn), name
    # every oracle key has a query
    assert set(ORACLE) <= set(QUERIES)
