"""Mergeable cardinality sketches (EXT: warehouse profiling family).

The reference audits distinct keys with exact ``COUNT(DISTINCT ...)``
(``process_publications_dag.py:486-495`` duplicate-doi audit). Exact
distinct is a full shuffle of every key; at 100 TB the idiomatic pattern
is a Datasketches HLL sketch per fine-grained group (computed once, map-
side partial agg), then ANY coarser rollup — other group level, wider
date range — is a cheap union of the stored sketches instead of a rescan
of the raw table. Spark 4 ships the kernels JVM-side:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``.

Scale notes: a sketch is ~2^lg_k bytes regardless of input size, so the
per-group state that flows through the shuffle is bounded; merging is
associative + commutative (safe under AQE re-partitioning) and lossless
between same-``lg_k`` sketches — a rollup of stored sketches returns the
IDENTICAL estimate the direct sketch over the raw rows would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # ~1.6% relative standard error, 4 KiB per sketch


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """One sketch per group over ``value_col`` → (group_cols..., sketch).

    This is the "compute once, store forever" stage: partial aggregation
    happens map-side (each task folds its rows into a local sketch;
    only fixed-size sketches cross the exchange)."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")))


def hll_union_rollup(sketches: DataFrame, group_cols: list[str],
                     sketch_col: str = "sketch") -> DataFrame:
    """Merge stored sketches up to a coarser grouping →
    (group_cols..., sketch, distinct_est). Never touches raw data."""
    return (sketches.groupBy(*group_cols)
            .agg(F.hll_union_agg(sketch_col).alias("sketch"))
            .withColumn("distinct_est",
                        F.hll_sketch_estimate("sketch")))


def distinct_estimate(df: DataFrame, group_cols: list[str], value_col: str,
                      lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """Direct per-group estimate (group_cols..., distinct_est) — the
    one-shot form of hll_rollup + estimate."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, F.lit(lg_k)))
                .alias("distinct_est")))
