"""Structured Streaming operators (SURVEY §2.9: ST1-ST4).

The reference's only 'streaming' is an externally-scheduled daily batch
(``process_publications_dag.py:547-552``). The idiomatic Spark
generalization: the SAME declarative aggregations run incrementally over
``readStream`` with watermarked event-time state; the daily batch is the
degenerate one-trigger case (``trigger(availableNow=True)``).

Scale notes: watermarks bound state size (late rows beyond the watermark are
dropped, state for closed windows is evicted); state lives in the
embedded state store partitioned by group key — the same shuffle keys as the
batch plan, so skew reasoning carries over unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6/S6: file streaming source over the events table (schema pinned
    from the batch read — never inferred). Same nanos→micros conversion as
    the batch reader (sources.io.read_table)."""
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # file stream sources take a DIRECTORY; glob-filter to the one table
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    from ..sources.io import _normalize_event_ts
    return stream.withColumn("ts", _normalize_event_ts(stream))


def stream_rate_events(spark: SparkSession, rows_per_batch: int = 2000,
                       n_users: int = 7, start_epoch: int = 1_700_000_000,
                       step_s: int = 30) -> DataFrame:
    """S6 generator variant: the built-in ``rate-micro-batch`` source
    mapped onto the events shape — a file-less stream for soak tests and
    for exercising the streaming stack where no landing directory exists
    (the file-source path is ``stream_events``).

    Deterministic by construction: batch k carries values
    ``[k·rowsPerBatch, (k+1)·rowsPerBatch)`` and every derived column is
    pure integer arithmetic on ``value``, so an ``availableNow`` run
    (exactly one batch) is replayable and ORACLE-checkable — the same
    stream≡batch verification device as the file-source queries. Values
    are quarters (``(v mod 1000)/4``): exactly representable doubles, so
    cross-engine sums are bit-identical."""
    s = (spark.readStream.format("rate-micro-batch")
         .option("rowsPerBatch", rows_per_batch)
         .option("numPartitions", 8)
         .option("startTimestamp", 0)
         .load())
    v = F.col("value")
    return s.select(
        v.alias("event_id"),
        (v % n_users).alias("user_id"),
        F.element_at(F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                     (v % 3 + 1).cast("int")).alias("event_type"),
        F.timestamp_seconds(F.lit(start_epoch) + v * step_s).alias("ts"),
        ((v % 1000).cast("double") / 4).alias("value"))


def tumbling_agg(events: DataFrame, width: str = "10 minutes",
                 watermark: str = "1 hour") -> DataFrame:
    """ST1+ST3: watermarked tumbling-window aggregate."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", width).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def sliding_agg(events: DataFrame, width: str = "10 minutes",
                slide: str = "5 minutes", watermark: str = "1 hour") -> DataFrame:
    """ST1: sliding (overlapping) windows — each row lands in width/slide
    windows; state cost scales accordingly."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt")))


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "1 hour") -> DataFrame:
    """ST2: session windows — gap-merged per-user activity bursts."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("cnt")))


def session_agg_dynamic(events: DataFrame, gap_col,
                        watermark: str | None = None) -> DataFrame:
    """EXT (R174, round 6): session windows with a PER-EVENT gap
    expression — ``session_window(ts, <Column>)``, the Spark surface the
    fixed-gap ``session_agg`` cannot express. The canonical use: event
    types with different engagement half-lives (a purchase keeps a
    session alive for 45 min, a heartbeat for 10), so the timeout is a
    property of the event, not the stream. Merging semantics are
    Spark's: each event spans [ts, ts+gap); overlapping spans merge;
    the session end is max(ts + gap) over its events.

    Same expression runs batch or streaming (pass ``watermark``); state
    per key is bounded by the watermark horizon exactly as fixed-gap
    sessions are."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.session_window("ts", gap_col).alias("w"),
                        "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .cast("long").alias("sum_cents")))


def stream_static_join(events: DataFrame, dim: DataFrame,
                       on: str) -> DataFrame:
    """ST EXT: stream-static enrichment join — each micro-batch hash-joins
    against the (broadcast) static dimension; stateless, so append mode
    needs no watermark and no state store. The streaming analog of the
    reference's per-row dimension lookups (``process_publications_dag.py:
    27-43``): the dim rides with the executors, the stream never blocks.
    """
    return events.join(F.broadcast(dim), on)


def stateful_dedup(events: DataFrame, keys: list[str],
                   watermark: str = "1 hour") -> DataFrame:
    """ST4: streaming dedup with bounded state — the streaming analog of the
    reference's ``ON CONFLICT DO NOTHING`` (``process_publications_dag.py:67``):
    first arrival wins, duplicates within the watermark horizon drop, state
    for expired keys is evicted."""
    return events.withWatermark("ts", watermark) \
                 .dropDuplicatesWithinWatermark(keys)


def run_to_memory(agg: DataFrame, timeout_s: int = 120,
                  output_mode: str = "complete") -> tuple[str, object]:
    """Execute a streaming query to completion on the available data (one
    availableNow trigger) into a memory sink; returns (table_name, query).
    ``output_mode``: "complete" for aggregations, "append" for row streams
    (dedup, maps)."""
    name = f"stream_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return name, q


def tumbling_window_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive ST1 end-to-end through the streaming engine and return the
    result as a batch DataFrame (proves plan compilation + batch/stream
    semantic equivalence; compared against the batch version in tests)."""
    name, _ = run_to_memory(tumbling_agg(stream_events(spark, sf_dir)))
    return (spark.table(name)
            .select(F.unix_timestamp(F.col("w.start")).alias("w_start_epoch"),
                    "event_type", "cnt", "sum_value"))


def stream_stream_left_join(left: DataFrame, right: DataFrame,
                            user_col: str = "user_id",
                            horizon: str = "10 minutes",
                            watermark: str = "1 hour") -> DataFrame:
    """ST EXT (round 6): stream-STREAM LEFT OUTER interval join — for
    each left event, right events of the same user within
    [left.ts, left.ts + horizon]; lefts that never match emit a
    NULL-right row ONLY once the watermark passes their match horizon
    (the engine must know no future right can arrive before declaring
    "unconverted"). This is the attribution/conversion shape: clicks ⋈
    purchases with a conversion window, unconverted clicks included.

    The OUTER side is exactly what the watermark gates: matched rows
    emit eagerly (inner semantics), null-extended rows emit at
    ``watermark(ts) > l.ts + horizon``, and state for both sides evicts
    on the same boundary — bounded state where an unbounded outer join
    would hold every left forever. A one-trigger ``availableNow`` run
    therefore equals the BATCH left join restricted to lefts whose
    horizon the final watermark (max event time − delay) passed —
    SQL-expressible, so the oracle pins the null-emission rule itself."""
    l = (left.withWatermark("ts", watermark).alias("l"))
    r = (right.withWatermark("ts", watermark).alias("r"))
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter")


def stream_stream_full_join(left: DataFrame, right: DataFrame,
                            user_col: str = "user_id",
                            horizon: str = "10 minutes",
                            watermark: str = "1 hour") -> DataFrame:
    """ST EXT (R186, round 6): stream-STREAM FULL OUTER interval join —
    completes the streaming join family (inner R48, left outer R161):
    matched pairs emit eagerly; unmatched LEFTS null-extend once the
    watermark passes their match horizon (``wm > l.ts + horizon`` — no
    future right can land inside it); unmatched RIGHTS null-extend once
    the watermark passes their own timestamp (``wm > r.ts`` — any
    future left has ts beyond the watermark, hence > r.ts, and the
    condition needs l.ts ≤ r.ts). The two outer sides are gated by
    DIFFERENT boundaries because the interval is one-sided — exactly
    what the oracle pins. State for both sides evicts on the same
    boundaries that gate emission."""
    l = (left.withWatermark("ts", watermark).alias("l"))
    r = (right.withWatermark("ts", watermark).alias("r"))
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon}")),
        "fullOuter")


def stream_stream_right_join(left: DataFrame, right: DataFrame,
                             user_col: str = "user_id",
                             horizon: str = "10 minutes",
                             watermark: str = "1 hour") -> DataFrame:
    """ST EXT (R318, round 7): stream-STREAM RIGHT OUTER interval join —
    the last missing member of the streaming join matrix (inner R48,
    left outer R161, full outer R186, left semi R213). Each right event
    keeps any left event of the same user whose horizon covers it
    (``l.ts <= r.ts <= l.ts + horizon``); rights that never match emit a
    NULL-left row once the watermark passes their OWN timestamp
    (``wm > r.ts`` — any future left arrives with ts beyond the
    watermark, hence > r.ts, and a match needs l.ts <= r.ts). This is
    the full-outer join's right-side emission rule standing alone: the
    purchases-without-an-attributing-click audit, streamed. State on
    both sides evicts on the same boundaries that gate emission."""
    l = (left.withWatermark("ts", watermark).alias("l"))
    r = (right.withWatermark("ts", watermark).alias("r"))
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon}")),
        "rightOuter")


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                user_col: str = "user_id",
                                lookback: str = "10 minutes",
                                watermark: str = "1 hour") -> DataFrame:
    """ST EXT: stream-STREAM interval join — for each left event, all
    right events of the same user within [left.ts - lookback, left.ts].
    Both sides watermarked; the range condition is what lets the engine
    EVICT right-side state once the watermark passes the interval
    (an unbounded-time equi-join would hold both streams' state forever —
    the canonical stream-join OOM).

    INNER joins emit each match the moment both rows are present — no
    result is held back for the watermark (that only applies to OUTER
    sides) — so a one-trigger availableNow run yields exactly the batch
    join's rows and can be hash-verified against a plain SQL oracle
    end to end, the same device as the stream-static enrich join.
    """
    l = (left.withWatermark("ts", watermark).alias("l"))
    r = (right.withWatermark("ts", watermark).alias("r"))
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r.ts") <= F.col("l.ts")))


def stream_stream_semi_join(left: DataFrame, right: DataFrame,
                            user_col: str = "user_id",
                            horizon: str = "10 minutes",
                            watermark: str = "1 hour") -> DataFrame:
    """ST EXT (R213, round 6): stream-STREAM LEFT SEMI interval join —
    the existence filter that completes the streaming join family
    (inner R48, left outer R161, full outer R186): each left event
    emits AT MOST ONCE, iff some right event of the same user lands in
    [l.ts, l.ts + horizon]; no right columns, no duplicate lefts when
    several rights match. The conversion-audience shape: "clicks that
    converted", streamed.

    Semantics under one availableNow trigger: semi rows emit eagerly on
    first match (inner-join timing — no watermark gate, which only
    unmatched-row emission would need), so the run equals the BATCH
    left-semi interval join — the oracle is the plain distinct-left
    SQL. The watermark still bounds join state on both sides (left
    rows evict once wm passes their horizon, rights once wm passes
    their ts)."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        (F.col(f"l.{user_col}") == F.col(f"r.{user_col}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon}")),
        "leftSemi")


def chained_tumbling(events: DataFrame, width: str = "10 minutes",
                     outer: str = "1 hour",
                     watermark: str = "0 seconds") -> DataFrame:
    """ST EXT (round 6): CHAINED stateful aggregations — a tumbling
    per-(window, type) count re-aggregated into coarser per-hour cells
    (cell count, event total, hottest cell), exercising Spark 4's
    multiple-stateful-operators-in-append support. The rollup a
    metrics pipeline wants ("store minute grain, serve hour grain")
    without a second job.

    Semantics to know before using: append mode is REQUIRED (complete
    is unsupported for chained state), and a first-level window only
    flows downstream once the watermark passes its end — so a
    single-batch availableNow run emits NOTHING (the watermark
    advances after the only batch; measured, not guessed). Feed it a
    multi-batch source; the emitted hour set is exactly the hours
    whose end ≤ the last watermark that had a batch behind it — the
    pytest pins that contract against the batch equivalent."""
    first = (events.withWatermark("ts", watermark)
             .groupBy(F.window("ts", width).alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("cnt")))
    # NO second withWatermark: re-windowing the window STRUCT is the
    # supported chained-stateful form — the event-time column and its
    # watermark propagate through the first aggregate automatically
    # (a fresh withWatermark on a derived column stalls at -inf and
    # the second level never emits; measured)
    return (first.groupBy(F.window(F.col("w"), outer).alias("h"))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("cnt").cast("long").alias("n_events"),
                 F.max("cnt").cast("long").alias("max_cell")))


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           watermark: str = "0 seconds") -> DataFrame:
    """ST EXT (round 6): ``dropDuplicatesWithinWatermark`` — dedup
    whose state EVICTS once the watermark passes a key's event time,
    vs plain streaming ``dropDuplicates`` whose key set grows forever.
    The trade is explicit and this helper exists to document it: a
    duplicate arriving after eviction is emitted AGAIN (at-least-once
    dedup within the lateness horizon, bounded state), which is the
    correct contract when upstream retries cluster in time — and the
    wrong one for global uniqueness, where the unbounded variant (ST4)
    plus a batch compaction is the answer. The pytest pins the
    re-emission behavior, not just the happy path."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))
