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


def test_oracle_sweep_survives_driver_resource_envelope():
    """Replica of the round-3 driver failure mode (CORRECTNESS_r03: 24/50
    slots err). The driver runs EVERY oracle through one long-lived DuckDB
    process; DuckDB 1.0.0's CTE inlining + jemalloc fragmentation pushed
    that process over ``vm.max_map_count`` (65530 mappings), after which
    every allocation — of any size — failed. This guard runs the full
    oracle registry on ONE shared connection under a 500 MB memory_limit
    and default (32-way) threading at the driver's verify scale (sf0.01),
    and pins the process's virtual-mapping growth to a small fraction of
    the kernel limit. A future memory- or churn-heavy oracle fails HERE,
    not in a driver round.

    The sweep runs in a FRESH subprocess, like the driver's own oracle
    process: measuring /proc/self/maps inside the pytest process is
    context-noisy (the Py4J/Spark client and glibc arenas spawned by
    earlier tests shift baseline placement by >10k mappings), which made
    the in-process version of this guard flake when the whole suite ran
    before it."""
    import json
    import os
    import subprocess
    import sys

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver-scale testdata not present")

    prog = r"""
import json, os
import duckdb
from data_engineering__spark.conformance import ORACLE
from data_engineering__spark.sources.io import TABLES

sf_dir = %r

def n_maps():
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)

con = duckdb.connect()
con.execute("SET memory_limit='500MB'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
start = n_maps()
failures, peak = [], start
for name, sql in ORACLE.items():
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        failures.append(f"{name}: {e}")
    peak = max(peak, n_maps())
con.close()
print(json.dumps({"failures": failures, "growth": peak - start,
                  "peak": peak}))
""" % sf_dir
    proc = subprocess.run([sys.executable, "-c", prog],
                          capture_output=True, text=True, timeout=900,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, f"sweep subprocess died: {proc.stderr[-2000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not out["failures"], (
        f"oracles broke the 500MB envelope: {out['failures']}")
    # budget 20k: the full ~150-oracle sweep measures 3.7k-11k mappings
    # run to run; the driver's exposure is ~50 oracles/process, a third of
    # this sweep. 20k still catches both known churn classes — CTE
    # inlining (pre-_mat ivf_kmeans: +7.5k alone) and wide join-order
    # planning (pre-slim ivfpq_adc: +22.9k alone) — with 3x headroom
    # under vm.max_map_count.
    assert out["growth"] < 20_000, (
        f"oracle sweep grew a fresh process by {out['growth']} virtual "
        f"mappings (peak {out['peak']}); vm.max_map_count is 65530 and the "
        "driver batches ~50 oracles per process — keep per-sweep growth "
        "well under 20k (see conformance._mat and _ivfpq_oracle_sql for "
        "the known churn sources)")


def test_driver_window_spends_no_slot_without_an_oracle():
    """The driver hash-verifies only the first ~50 ``queries()`` entries
    per round; a rows-only key in that window would burn a verification
    slot on a weaker check. Guard: every windowed key carries an oracle
    and every prioritized key exists."""
    from data_engineering__spark.conformance import DRIVER_PRIORITY

    assert [k for k in DRIVER_PRIORITY[:50] if k not in ORACLE] == []
    assert [k for k in DRIVER_PRIORITY if k not in QUERIES] == []
