"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the S-family generator source.

The reference's only non-DB source is an HTTP API sampler
(`fetch and test api.py:1-48`, `process_publications_dag.py:45-88`); this
is the Spark-4-native generalization: ANY Python-reachable system (REST
cursor, message log, proprietary SDK) becomes a first-class parallel
DataFrame source by implementing `partitions()` + `read(partition)` —
Spark plans one task per partition, so ingest parallelism is declared,
not hand-threaded.

`SyntheticEventsDataSource` here is the deterministic reference
implementation (and test fixture): `n` synthetic sensor readings split
over `parts` partitions, every value a pure function of the row id —
identical on every executor, every rerun, any partitioning. The id→row
arithmetic is integer-only (Knuth multiplicative hashing mod small
primes), so a DuckDB `generate_series` oracle reproduces it verbatim.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

#: Knuth multiplicative constant — the same one dedup_keep_best's
#: conformance quality hash uses.
_KNUTH = 2654435761
_MOD = 1 << 31


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        per = -(-self.n // self.parts)
        return [_Range(i * per, min((i + 1) * per, self.n))
                for i in range(self.parts) if i * per < self.n]

    def read(self, part):
        for i in range(part.start, part.end):
            h = (i * _KNUTH) % _MOD
            yield (i,
                   f"sensor{h % 50}",
                   h % 10_000,           # centi-units reading
                   (h // 7) % 86_400)    # second-of-day


class _SyntheticEventsStreamReader(DataSourceStreamReader):
    """Round 7: the STREAMING tail of the same deterministic generator —
    the Spark 4 Python streaming source protocol (initialOffset /
    latestOffset / partitions(start, end) / read / commit). Each
    micro-batch advances the offset by ``rowsperbatch`` ids; rows are
    the identical id→row arithmetic as the batch reader, so the batch
    read over the same id range is the exact oracle, and a RESTART from
    a checkpoint resumes from the committed offset (exactly-once ids,
    pinned in pytest)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 50))
        # the generator's "external system tip": persisted to a driver-
        # side file when ``tipfile`` is set so a RESTARTED query sees
        # the source having advanced past its committed offset (a real
        # source queries the broker/cursor here); in-memory otherwise
        self.tipfile = options.get("tipfile")
        self._latest = 0

    def _advance_tip(self) -> int:
        if self.tipfile:
            import os
            tip = 0
            if os.path.exists(self.tipfile):
                with open(self.tipfile) as fh:
                    tip = int(fh.read().strip() or 0)
            tip += self.rows_per_batch
            with open(self.tipfile, "w") as fh:
                fh.write(str(tip))
            return tip
        self._latest += self.rows_per_batch
        return self._latest

    def initialOffset(self):
        return {"n": 0}

    def latestOffset(self):
        return {"n": self._advance_tip()}

    def partitions(self, start, end):
        return [_Range(start["n"], end["n"])]

    def read(self, part):
        for i in range(part.start, part.end):
            h = (i * _KNUTH) % _MOD
            yield (i,
                   f"sensor{h % 50}",
                   h % 10_000,
                   (h // 7) % 86_400)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("n", ...)` source;
    `spark.readStream.format("synthetic_events")` streams the same rows
    in ``rowsperbatch``-id micro-batches."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return ("reading_id bigint, sensor string, centi_value bigint, "
                "second_of_day bigint")

    def reader(self, schema):
        return _SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return _SyntheticEventsStreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, n_rows: int):
        self.tmp_file, self.n_rows = tmp_file, n_rows


class _JsonlPartWriter(DataSourceWriter):
    """Round 7: the WRITE side of the Python data source protocol, with
    real two-phase commit — executors write ``_tmp-*`` part files and
    return commit messages; ``commit`` (driver) atomically publishes by
    rename and writes a ``_SUCCESS`` manifest with the total row count;
    ``abort`` deletes the temps so a failed job leaves no partial
    output visible. The pattern any proprietary-SDK sink follows."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r.asDict()) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        import json
        import os

        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_file, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total}))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming tier of the sink: same executor-side temp parts, but
    commit/abort run PER MICRO-BATCH with the batch id — committed
    batches publish under ``batch-<id>`` names and append to the
    ``_BATCHES`` ledger, so replayed batch ids after a restart are
    detectable (the idempotent-sink contract foreachBatch sinks keep)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows):
        return _JsonlPartWriter({"path": self.path}).write(rows)

    def commit(self, messages, batchId):
        import json
        import os

        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path,
                                 f"batch-{batchId:05d}-part-{i:05d}.jsonl")
            os.replace(m.tmp_file, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_BATCHES"), "a") as fh:
            fh.write(json.dumps({"batch": batchId, "rows": total}) + "\n")

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonl_sink").option("path", ...)` custom sink;
    `df.writeStream.format("jsonl_sink")` streams into per-batch files
    with a batch ledger."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite):
        return _JsonlPartWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source + sink on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


def read_synthetic_events(spark, n: int = 1000, parts: int = 8):
    register(spark)
    return (spark.read.format("synthetic_events")
            .option("n", str(n)).option("parts", str(parts)).load())
