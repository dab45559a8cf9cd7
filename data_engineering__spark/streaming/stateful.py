"""Custom stateful streaming operators (SURVEY §2.9 EXT mandate:
``applyInPandasWithState`` for operators the built-in window/dedup state
machines can't express).

The reference has no streaming at all (daily Airflow batch,
``process_publications_dag.py:547-552``); this module supplies the
arbitrary-state tier of the streaming generalization: user-defined state
schema, explicit update/eviction, Arrow-batched per-group processing.

Scale notes: state is partitioned by the group key (same shuffle as a
streaming agg); per-key state must stay small and bounded — use timeouts
for eviction. The pandas function sees ALL batch rows for its key as an
iterator of Arrow batches, so memory stays bounded per batch, not per key
history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def user_activity_profile(events: DataFrame) -> DataFrame:
    """Running per-user activity profile with EXPLICIT state: cumulative
    event count + value sum, emitted each micro-batch the user appears in.

    This is the custom-stateful shape the built-ins can't express (a
    windowed agg forgets across windows; ``dropDuplicates`` keeps no
    accumulator): arbitrary user state (n, total) carried across
    micro-batches in the state store.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    return (events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def batch_equivalent(events: DataFrame) -> DataFrame:
    """The batch query the stateful operator converges to after all data is
    seen — used by tests to pin semantics (stream result ⊇ final totals)."""
    from pyspark.sql import functions as F
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


def run_profile(spark: Any, sf_dir: str) -> DataFrame:
    """Drive the stateful operator end-to-end on the events table through
    one availableNow micro-batch; returns the emitted profile rows."""
    from .windows import run_to_memory, stream_events
    profile = user_activity_profile(stream_events(spark, sf_dir))
    name, _ = run_to_memory(profile, output_mode="update")
    return spark.table(name)


# ------------------- transformWithStateInPandas tier (Spark 4, round 3)

PEAK_OUT_SCHEMA = "user_id bigint, n_events bigint, peak_value double"


def user_peak_tracker(events: DataFrame) -> DataFrame:
    """Running per-user (event count, peak value) via
    ``transformWithStateInPandas`` — the Spark-4 arbitrary-state API that
    supersedes ``applyInPandasWithState``: TYPED state variables
    (ValueState/ListState/MapState) instead of one opaque tuple, timers,
    and per-variable TTL. Same state-store partitioning (shuffle on the
    group key), so the scale reasoning of ``user_activity_profile``
    carries over unchanged; this operator exists to cover the newer API
    surface with a second custom-state semantics (running max is not
    expressible as a built-in windowed agg across micro-batches).

    Requires the RocksDB state-store provider (set by ``run_peak``; on a
    real cluster configure it once in spark-defaults) AND the
    ``protobuf`` package (the transformWithState state-server protocol
    is protobuf-framed; absent in this container, so the pytest is
    import-gated — the plan compiles regardless, execution needs the
    dependency).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PeakProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._peak = handle.getValueState("peak", "mx double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            if self._peak.exists():
                mx, n = self._peak.get()
            else:
                mx, n = None, 0
            for pdf in rows:
                n += len(pdf)
                m = float(pdf["value"].max())
                if mx is None or m > mx:
                    mx = m
            self._peak.update((mx, n))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "peak_value": [mx]})

        def close(self) -> None:
            pass

    return (events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(statefulProcessor=PeakProcessor(),
                                        outputStructType=PEAK_OUT_SCHEMA,
                                        outputMode="Update",
                                        timeMode="None"))


def peak_batch_equivalent(events: DataFrame) -> DataFrame:
    """Batch query the tracker converges to once all data is seen."""
    from pyspark.sql import functions as F
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max(F.col("value").cast("double")).alias("peak_value")))


def run_peak(spark: Any, sf_dir: str) -> DataFrame:
    """Drive the transformWithState tracker through one availableNow pass.
    transformWithStateInPandas supports only the RocksDB state store
    (bundled with Spark 4) — set per-session here, harmless for other
    queries."""
    from .windows import run_to_memory, stream_events
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    tracked = user_peak_tracker(stream_events(spark, sf_dir))
    name, _ = run_to_memory(tracked, output_mode="update")
    return spark.table(name)
