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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("n", ...)` source."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return ("reading_id bigint, sensor string, centi_value bigint, "
                "second_of_day bigint")

    def reader(self, schema):
        return _SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


def read_synthetic_events(spark, n: int = 1000, parts: int = 8):
    register(spark)
    return (spark.read.format("synthetic_events")
            .option("n", str(n)).option("parts", str(parts)).load())
