"""Streaming sinks (SURVEY §2.9 ST5): micro-batch merge via foreachBatch.

The reference's whole DAG loop (insert → clean → enrich → validate, daily)
is idiomatically a ``foreachBatch`` sink: each micro-batch flows through the
SAME batch operators (upsert_merge, audit_diff, checks) — one code path for
batch and streaming, which is the architectural point of Structured
Streaming.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_merge(stream: DataFrame,
                        merge_fn: Callable[[DataFrame, int], None],
                        checkpoint_dir: str,
                        trigger_available_now: bool = True):
    """ST5: apply a batch merge function to every micro-batch.

    ``merge_fn(batch_df, batch_id)`` typically calls
    ``operators.merge.upsert_merge`` against the serving table and writes
    idempotently (batch_id-keyed) — exactly-once under retries comes from
    idempotent writes + the checkpointed offset log.
    """
    writer = (stream.writeStream
              .foreachBatch(merge_fn)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def idempotent_batch_write(df: DataFrame, path: str, batch_id: int) -> bool:
    """EXT (R143): the exactly-once half of the foreachBatch contract —
    an idempotent, batch-id-keyed append. Structured Streaming replays a
    micro-batch after failure with the SAME batch_id; a sink is
    exactly-once iff the replay is a no-op. Layout: each batch lands in
    its own ``batch_id=N`` partition directory, and a zero-byte
    ``_batch_N.committed`` marker (written AFTER the data) gates
    re-execution — data without a marker is an aborted attempt that the
    retry overwrites in place.

    Returns True if the batch was written, False if it was already
    committed (replayed). The marker check-then-write is safe under the
    streaming engine's guarantee that one batch_id never runs
    concurrently with itself. Readers take only committed batches:
    ``read_committed_batches``."""
    import os

    marker = os.path.join(path, f"_batch_{batch_id}.committed")
    if os.path.exists(marker):
        return False
    (df.write.mode("overwrite")
       .parquet(os.path.join(path, f"batch_id={batch_id}")))
    with open(marker, "w"):
        pass
    return True


def read_committed_batches(spark, path: str) -> DataFrame:
    """Read ONLY committed batches of an ``idempotent_batch_write``
    layout — aborted attempts (data, no marker) are invisible, which is
    what makes the sink's crash window safe for readers."""
    import os

    ids = sorted(int(f[len("_batch_"):-len(".committed")])
                 for f in os.listdir(path)
                 if f.startswith("_batch_") and f.endswith(".committed"))
    paths = [os.path.join(path, f"batch_id={i}") for i in ids]
    if not paths:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.parquet(*paths)
