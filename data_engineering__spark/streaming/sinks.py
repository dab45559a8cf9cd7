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
