"""User-defined aggregates (SURVEY §2.10 U3 EXT).

When no built-in aggregate expresses the semantics, a GROUPED_AGG pandas
UDF is the scale-correct escape hatch: Arrow-batched columns in, scalar
out, executed per group after the normal hash-shuffle — never a Python
call per row. (The reference has no UDAFs; its per-row Python transforms
all map to native expressions — see functions.derive.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Σ(v·w)/Σ(w) as a GROUPED_AGG pandas UDF (vectorized numpy inside)."""
    total_w = weight.sum()
    if total_w == 0:
        return float("nan")
    return float((value * weight).sum() / total_w)


def user_gap_stats(events) -> "DataFrame":
    """U4 (GROUPED_MAP): per-user inter-event gap profile via
    ``groupBy().applyInPandas`` — the whole group arrives as ONE pandas
    DataFrame (unlike the Arrow-iterator mapInPandas), the natural shape for
    order-dependent per-entity computations (sessionization, trajectories).

    All outputs are INTEGER (microsecond sums, counts): exact across
    engines, so the conformance oracle hash-compares safely — float means
    would diverge in the last ulp between numpy pairwise and SQL sequential
    summation.

    Scale: one shuffle on user_id; each group must fit in one worker's
    memory (gap profile state is O(events-per-user) — bounded for real
    users; for adversarial whales pre-aggregate by (user, day) first).

    Prefer the pure-JVM window formulation when the stat IS expressible
    with ``lag``/``sum`` (see the ``window_lag_lead`` conformance query):
    these exact gap stats = ``lag(ts) over (partition by user order by
    ts)`` + a grouped sum, at ~10× less cost (no Python worker transfer).
    This operator exists for the semantics built-ins CANNOT express —
    order-dependent per-entity loops with cross-row state.
    """
    import pandas as pd

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values()
        gaps = ts.diff().dropna()
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "n_gaps": [len(gaps)],
            # .value is exact integer nanoseconds; // 1000 keeps the whole
            # path integral (total_seconds() would round-trip through
            # float64 and lose precision once sums exceed 2^53 ns).
            "total_gap_us": [gaps.sum().value // 1000 if len(gaps) else 0],
        })

    return (events.select("user_id", "ts").groupBy("user_id")
            .applyInPandas(profile,
                           "user_id bigint, n_events bigint, "
                           "n_gaps bigint, total_gap_us bigint"))


def user_gap_stats_native(events) -> "DataFrame":
    """The pure-JVM twin of :func:`user_gap_stats` — identical output
    (same schema, same integer microsecond sums), zero Python boundary.

    ``lag(ts) over (partition by user_id order by ts)`` + one grouped sum:
    the window and the aggregation share the ``user_id`` hash partitioning,
    so the whole profile is ONE exchange with no Arrow transfer and no
    per-group pandas materialization. All arithmetic is integer microseconds
    (``unix_micros`` differences), exact at any magnitude.

    This is the production formulation; ``user_gap_stats`` remains as the
    GROUPED_MAP API surface for semantics window functions cannot express
    (equivalence pinned in tests/test_operators.py).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (F.unix_micros(F.col("ts"))
           - F.unix_micros(F.lag("ts").over(w))).alias("gap_us")
    return (events.select("user_id", "ts")
            .withColumn("gap_us", gap)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("gap_us").alias("n_gaps"),
                 F.coalesce(F.sum("gap_us"), F.lit(0)).cast("long")
                  .alias("total_gap_us")))
