"""Round-6 streaming additions: chained stateful aggregations."""
from datetime import datetime, timedelta

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)


def test_chained_tumbling_multi_batch_flush(spark, tmp_path):
    """Three-file source (maxFilesPerTrigger=1): the watermark that has
    a batch BEHIND it is batch 2's max ts (3:19), so exactly hour
    windows 0/1/2 emit — with values equal to the batch rollup — and
    the partial hour 3 stays in state. Hour 2 is single-typed, pinning
    that n_cells counts (window, type) cells, not windows."""
    from data_engineering__spark.streaming.windows import (
        chained_tumbling,
        run_to_memory,
    )

    base = datetime(2024, 1, 1)

    def mk(name, lo, hi, single_type=False):
        rows = [(i, "a" if single_type or i % 2 == 0 else "b",
                 base + timedelta(minutes=i)) for i in range(lo, hi)]
        spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp"
        ).coalesce(1).write.parquet(str(tmp_path / "in" / name))

    mk("f1", 0, 120)                      # hours 0-1, alternating a/b
    mk("f2", 120, 200, single_type=True)  # hour 2 + part of 3, all 'a'
    mk("f3", 200, 210, single_type=True)  # advances the watermark only

    src = (spark.readStream.schema("event_id long, event_type string,"
                                   " ts timestamp")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(tmp_path / "in" / "*")))
    name, _ = run_to_memory(chained_tumbling(src), output_mode="append")
    got = {r["h"]["start"].hour: r for r in spark.table(name).collect()}

    assert set(got) == {0, 1, 2}
    for h in (0, 1):  # six 10-min windows x 2 types, 5 per cell
        assert (got[h].n_cells, got[h].n_events, got[h].max_cell) == \
            (12, 60, 5), h
    # hour 2: single-typed -> 6 cells of 10 events each
    assert (got[2].n_cells, got[2].n_events, got[2].max_cell) == \
        (6, 60, 10)


def test_dedup_within_watermark_evicts_and_reemits(spark, tmp_path):
    """The measured eviction contract: a duplicate arriving ONE batch
    after the watermark passed its key (batch 2's 2h-later id-1) is
    STILL suppressed — eviction lags a batch — but by batch 3 the
    state is gone and the same key emits again. In-batch duplicates
    always collapse."""
    from datetime import datetime, timedelta

    from data_engineering__spark.streaming.windows import (
        dedup_within_watermark,
        run_to_memory,
    )

    b = datetime(2024, 2, 1)
    files = {
        "f1": [(1, b), (1, b + timedelta(seconds=5)), (2, b)],
        "f2": [(1, b + timedelta(hours=2)),
               (3, b + timedelta(hours=2))],
        "f3": [(1, b + timedelta(hours=4)),
               (4, b + timedelta(hours=4))],
    }
    for name, rows in files.items():
        spark.createDataFrame(rows, "k long, ts timestamp") \
            .coalesce(1).write.parquet(str(tmp_path / "in" / name))
    src = (spark.readStream.schema("k long, ts timestamp")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(tmp_path / "in" / "*")))
    name, _ = run_to_memory(dedup_within_watermark(src, ["k"]),
                            output_mode="append")
    got = sorted((r.k, str(r.ts))
                 for r in spark.table(name).collect())

    ks = [k for k, _ in got]
    assert ks.count(2) == 1 and ks.count(3) == 1 and ks.count(4) == 1
    # key 1: batch-1 emit (in-batch dup dropped), batch-2 duplicate
    # SUPPRESSED (eviction lags), batch-3 re-emit after eviction
    assert ks.count(1) == 2
    assert (1, str(b + timedelta(hours=4))) in got
    assert (1, str(b + timedelta(hours=2))) not in got


def test_statestore_reader_exposes_agg_state(spark, tmp_path):
    """Round 7: Spark 4 State Data Source (reader) — the streaming-ops
    surface for inspecting checkpointed state without replaying the
    query (debugging skew/leaks on a live deployment). Pins: the
    statestore format reads the aggregation's keyed state from the
    checkpoint, and the state VALUES equal the batch groupBy exactly
    (count + sum per key)."""
    src = spark.createDataFrame(
        [(i, f"u{i % 5}") for i in range(100)], "v long, user string")
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream = (spark.readStream.schema("v long, user string")
              .parquet(str(tmp_path / "in"))
              .groupBy("user").agg(F.count("*").alias("n"),
                                   F.sum("v").alias("s")))
    q = (stream.writeStream.format("memory").queryName("agg_state_rt")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    state = (spark.read.format("statestore")
             .load(str(tmp_path / "ckpt"))
             .select(F.col("key.user").alias("user"),
                     F.col("value.count").alias("n"),
                     F.col("value.sum").alias("s")))
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, src.groupBy("user")
                      .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
                      .collect()))
    assert got == want and len(got) == 5


def test_python_streaming_datasource_offsets_and_restart(spark, tmp_path):
    """Round 7: the Spark 4 PYTHON streaming data source protocol
    (initialOffset/latestOffset/partitions(start,end)/read/commit) on
    the synthetic-events generator. Pins: (1) an availableNow run
    produces exactly the batch reader's rows over the same id range —
    the deterministic id→row arithmetic IS the oracle; (2) a restart on
    the same checkpoint resumes from the COMMITTED offset: ids never
    repeat, the union is a contiguous prefix (exactly-once semantics of
    the offset/commit contract)."""
    from data_engineering__spark.sources.pysource import (
        read_synthetic_events,
        register,
    )

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    tip = str(tmp_path / "tip")

    def run_once():
        q = (spark.readStream.format("synthetic_events")
             .option("rowsperbatch", "40").option("tipfile", tip).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r.reading_id for r in spark.read.parquet(out).collect()}

    first = run_once()
    assert first == set(range(40))
    batch_rows = {tuple(r) for r in
                  read_synthetic_events(spark, n=40).collect()}
    stream_rows = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert stream_rows == batch_rows

    both = run_once()
    second = both - first
    assert second and min(second) == 40, \
        "restart resumes from the committed offset"
    assert both == set(range(max(both) + 1)), \
        "ids never repeat and form a contiguous prefix"


def test_python_datasource_end_to_end_stream_source_to_sink(spark, tmp_path):
    """Round 7: full Python-data-source streaming path — the synthetic
    STREAM source feeding the custom jsonl STREAM sink in one query.
    Pins: per-batch commit publishes batch-<id> part files plus a
    _BATCHES ledger whose per-batch row counts sum to the rows read;
    the sink's rows equal the batch reader over the same id range."""
    import json
    import os

    from data_engineering__spark.sources.pysource import (
        read_synthetic_events,
        register,
    )

    register(spark)
    out = str(tmp_path / "out")
    q = (spark.readStream.format("synthetic_events")
         .option("rowsperbatch", "30")
         .option("tipfile", str(tmp_path / "tip")).load()
         .writeStream.format("jsonl_sink").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    with open(os.path.join(out, "_BATCHES")) as fh:
        ledger = [json.loads(l) for l in fh]
    assert sum(b["rows"] for b in ledger) == 30
    assert not [f for f in os.listdir(out) if f.startswith("_tmp-")]
    src = read_synthetic_events(spark, n=30)
    back = spark.read.json(os.path.join(out, "batch-*.jsonl"),
                           schema=src.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, src.collect()))


def test_statestore_reader_exposes_join_state(spark, tmp_path):
    """Round 8: extends the round-7 aggregation-state pin to stream-
    stream JOIN state. `spark.read.format("statestore")` with a
    `joinSide` option reads the rows each side has BUFFERED in the
    join's state stores — the ops surface for debugging watermark-lag
    skew (which user's clicks are piling up?) without replaying the
    query. After ONE availableNow trigger nothing is evicted yet (the
    watermark only advances for the NEXT batch), so each side's
    buffered state must equal its full input — a deterministic pin of
    what the reader exposes."""
    from datetime import datetime, timedelta

    from data_engineering__spark.streaming.windows import (
        stream_stream_interval_join,
    )

    base = datetime(2024, 1, 1)
    clicks = [(u, base + timedelta(minutes=m))
              for u in range(4) for m in range(0, 30, 10)]
    buys = [(u, base + timedelta(minutes=m + 5))
            for u in range(4) for m in range(0, 30, 15)]
    spark.createDataFrame(clicks, "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(str(tmp_path / "l"))
    spark.createDataFrame(buys, "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(str(tmp_path / "r"))

    l = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(str(tmp_path / "l"))
    r = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(str(tmp_path / "r"))
    q = (stream_stream_interval_join(l, r)
         .writeStream.format("memory").queryName("join_state_rt")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    def side(name):
        return sorted(
            (rw["key"]["field0"], str(rw["value"]["ts"]))
            for rw in (spark.read.format("statestore")
                       .option("joinSide", name)
                       .load(str(tmp_path / "ckpt"))
                       .select("key", "value").collect()))

    assert side("left") == sorted((u, str(t)) for u, t in clicks)
    assert side("right") == sorted((u, str(t)) for u, t in buys)
