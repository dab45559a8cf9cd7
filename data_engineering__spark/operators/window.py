"""Window-function operators (SURVEY §2.5: W1-W3).

W1 is the flagship rewrite: the reference loops one SQL query PER CATEGORY
(``SELECT ... WHERE categories LIKE %s ORDER BY id LIMIT 2`` inside a Python
for-loop, ``process_publications_dag.py:161-178``) — O(categories) scans.
A single ``row_number() OVER (PARTITION BY category ORDER BY id)`` pass does
the same work in ONE shuffle regardless of category count; at 100 TB the loop
is impossible and the window is routine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, partition_by: list[str],
                   order_by: list[Column], k: int) -> DataFrame:
    """W1: top-k rows per group in one pass.

    ``order_by`` must be a total order within each partition (include a
    unique tie-break key) or the selected rows are nondeterministic across
    reruns — same contract as deterministic surrogate keys (SURVEY §1.2).
    Skew note: a single hot group serializes into one task; for pathological
    group sizes pre-aggregate with a salted partial top-k, then re-rank.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k)
              .drop("__rn"))


def with_rank(df: DataFrame, partition_by: list[str], order_by: list[Column],
              kind: str = "rank", out_col: str = "rnk") -> DataFrame:
    """W2 EXT: ranking family over one window definition."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number,
          "percent_rank": F.percent_rank}[kind]
    return df.withColumn(out_col, fn().over(w))


def running_agg(df: DataFrame, partition_by: list[str], order_by: list[Column],
                agg_col: Column, out_col: str = "running") -> DataFrame:
    """W3 EXT: running aggregate with an explicit ROWS frame.

    ``order_by`` must be a total order: with ties, ROWS-frame prefix sums are
    nondeterministic. Unbounded-preceding frames keep per-group state on one
    task — fine for bounded groups (per-customer histories), not for a global
    running total (repartition by a bucketed key first).
    """
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, agg_col.over(w))


def lag_lead(df: DataFrame, partition_by: list[str], order_by: list[Column],
             col: str, offset: int = 1) -> DataFrame:
    """W3 EXT: adjacent-row analytics (lag/lead)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(f"{col}_lag", F.lag(col, offset).over(w))
              .withColumn(f"{col}_lead", F.lead(col, offset).over(w)))


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_us: int = 30 * 60 * 1_000_000,
               session_col: str = "session_seq") -> DataFrame:
    """W3 EXT: batch sessionization — number each entity's events into
    gap-delimited sessions (a new session starts when the inter-event gap
    exceeds ``gap_us`` microseconds). The batch counterpart of the
    streaming ``session_window`` aggregate: that one yields per-session
    AGGREGATES; this labels every EVENT with its session ordinal, the
    shape joins and per-event features need.

    One shuffle (the window partition on ``user_col``), two passes within
    the partition (lag, then running sum) — no Python. Microsecond
    integer arithmetic end to end, so external oracles replicate the
    boundaries exactly. Tied timestamps can't split a session (their gap
    is 0), so ordering among ties never changes the output labels.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    run = (Window.partitionBy(user_col).orderBy(us)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(session_col, F.sum(new_s).over(run))
