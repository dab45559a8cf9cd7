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
