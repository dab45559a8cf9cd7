"""Scans and sinks (SURVEY §2.1: S1-S3, S5).

Reference behavior re-expressed:
- S1 JSON array scan: the reference slurps a whole JSON array into driver
  memory (``process_publications_dag.py:51-52``) — here it is a distributed
  ``spark.read.json`` with an EXPLICIT schema (schema inference is a full
  extra pass over 100 TB; never in production).
- S2 table scan: every psycopg2 ``SELECT`` (e.g.
  ``process_publications_dag.py:162-164,311``) becomes a parquet scan with
  Catalyst predicate pushdown + column pruning reaching the file footers.
- S3 row sink: row-at-a-time ``INSERT``s (``process_publications_dag.py:61-77``)
  become set-oriented ``df.write.parquet`` — idempotent overwrite per
  partition, never per-row round trips.
- S5 sampler: ``createdataset.py:15-46`` streams the first ~40 KB of a file;
  the set-oriented analog is ``limit``/``sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Driver testdata tables (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one testdata table.

    Plain ``spark.read.parquet``: filters/projections applied downstream are
    pushed into the scan by Catalyst (verify with ``.explain`` →
    ``PushedFilters`` / ``ReadSchema``).

    ``events.ts`` arrives in either of two parquet layouts depending on the
    writer (the driver has shipped both): TIMESTAMP(NANOS), which Spark has
    no native type for (PARQUET_TYPE_ILLEGAL) — read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert with integer
    ``div`` (never float division — 1.7e18 ns exceeds double's 53-bit
    mantissa) — or TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
    reads as TIMESTAMP_NTZ — cast to the session-zone TIMESTAMP (the
    session zone is pinned UTC, so the epoch value is unchanged and
    DuckDB's naive read of the same file agrees). Both normalize to the
    same TIMESTAMP column, so everything downstream is layout-agnostic.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", _normalize_event_ts(df))
    return spark.read.parquet(path)


def _normalize_event_ts(df: DataFrame) -> F.Column:
    """TIMESTAMP column from whichever physical layout ``ts`` arrived in."""
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":          # TIMESTAMP(NANOS) via nanosAsLong
        return F.timestamp_micros(F.expr("ts div 1000"))
    if ts_type == "timestamp_ntz":   # TIMESTAMP(MICROS), not UTC-adjusted
        return F.col("ts").cast("timestamp")
    return F.col("ts")


def read_json_array(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1: multiLine JSON-array scan with explicit schema.

    Mirrors ``json.load(file)`` at ``process_publications_dag.py:51-52`` but
    distributed. ``multiLine`` is required for a single top-level JSON array;
    at scale prefer JSON-lines (one doc per line → splittable). Explicit
    schema: no inference pass, stable types across reruns.
    """
    return spark.read.option("multiLine", "true").schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """S3: set-oriented sink replacing row-at-a-time INSERT loops.

    ``partition_by`` gives partition pruning to downstream readers; writes are
    idempotent under ``overwrite`` (Spark task retries re-write whole files,
    the analog of the reference's per-item rollback+continue at
    ``process_publications_dag.py:79-82``).
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_parquet_variant(df: DataFrame, path: str, shredded: bool = True,
                          mode: str = "overwrite") -> None:
    """S3 EXT (round 8): parquet write with explicit VARIANT-SHREDDING
    control — the write side of the R320 VARIANT read surface.

    With shredding (``spark.sql.variant.writeShredding.enabled`` +
    ``inferShreddingSchema`` — Spark 4.1's DEFAULT), each VARIANT column
    lands as the Parquet Variant group (``metadata``/``value``) PLUS an
    inferred per-path ``typed_value`` column group — so downstream scans
    of a stable path (``v:meta.type``) read a plain typed column
    (pruned, min/max-pruneable) instead of re-probing binary blobs row
    by row. At 100 TB of semi-structured logs that is the difference
    between a columnar scan and a full binary decode; rows whose shape
    misses the inferred schema ride the residual ``value`` binary with
    full fidelity. ``shredded=False`` forces the legacy pure-binary
    layout — for sinks consumed by readers that predate the shredded
    Variant spec.

    Session confs are set for the duration of the write and restored
    after — the layout is a property of THIS sink, not the session.
    """
    spark = df.sparkSession
    names = ("spark.sql.variant.writeShredding.enabled",
             "spark.sql.variant.inferShreddingSchema")
    old = {}
    for n in names:
        try:
            old[n] = spark.conf.get(n)
        except Exception:
            old[n] = None
        spark.conf.set(n, "true" if shredded else "false")
    try:
        df.write.mode(mode).parquet(path)
    finally:
        for n, v in old.items():
            if v is None:
                spark.conf.unset(n)
            else:
                spark.conf.set(n, v)


def write_bucketed(df: DataFrame, table: str, buckets: int,
                   bucket_cols: list[str],
                   sort_cols: list[str] | None = None) -> None:
    """S3 scale path: hash-bucketed (and optionally sorted) managed table.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle (SortMergeJoin reads co-located buckets directly) —
    the pre-shuffle is paid once at write time and amortized over every
    downstream join/agg on that key. This is the parquet-table analog of
    the reference warehouse's PK layout. Bucket count rule of thumb at
    scale: total_size / bucket_count ≈ 100-200 MB per bucket file.
    """
    w = df.write.mode("overwrite").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 8, **options: str) -> DataFrame:
    """S2: JDBC connector (the reference's psycopg2 SELECTs,
    ``process_publications_dag.py:28,162-164``), kept as an optional source.

    Always pass the partition-column bounds for big tables: without them the
    whole table streams through ONE task. Predicates still push down to the
    database (Catalyst emits WHERE into the generated query). Smoke-tested
    against embedded Derby (the JDBC engine on Spark's default classpath)
    in tests/test_operators.py — plain and bound-partitioned reads.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def sample_head(df: DataFrame, n: int, order_by: list[str] | None = None) -> DataFrame:
    """S5/O3: deterministic head sample (``createdataset.py:25-35`` analog).

    The reference's byte-budget head is order-dependent on file layout; for a
    distributed engine a bare ``limit(n)`` is nondeterministic across reruns,
    so callers that need rerun-stability pass ``order_by`` (global sort is a
    shuffle — Catalyst collapses sort+limit to TakeOrderedAndProject, a true
    top-k that never materializes the full sort).
    """
    if order_by:
        df = df.orderBy(*order_by)
    return df.limit(n)


def write_clustered(df: DataFrame, path: str, cluster_cols: list[str],
                    n_ranges: int = 8,
                    max_records_per_file: int | None = None) -> None:
    """S3 scale variant #2: range-clustered, sorted, size-capped write.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives every output
    file a TIGHT, near-disjoint min/max footer range on the cluster
    columns, so any engine's row-group/file skipping turns a point or
    range predicate into a handful-of-files scan (the 1-D analog of
    Z-ordering; asserted against real parquet footers in
    tests/test_operators.py). ``max_records_per_file`` additionally caps
    file size — the compaction knob that keeps 100 TB of output out of
    small-files hell without a post-hoc rewrite job."""
    out = (df.repartitionByRange(n_ranges, *cluster_cols)
             .sortWithinPartitions(*cluster_cols))
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_ranges: int = 16, bits: int = 16) -> None:
    """S3 scale variant #3: Z-ORDER clustered write — multi-dimensional
    file skipping where ``write_clustered`` only serves its leading
    column.

    Both columns min/max-scale to ``bits``-bit integers (one scalar agg,
    broadcast), their bits INTERLEAVE into a z-value (pure codegen
    shift/mask arithmetic — no UDF), and the write range-partitions +
    sorts on z. Because the z-curve preserves locality in BOTH
    dimensions, every output file's parquet footer carries a tight
    min/max range on EACH column — predicates on either (or both) skip
    to a handful of files, the property the layout test measures against
    real footers. This is the standard lakehouse Z-ORDER device
    (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as plain DataFrame
    ops; extend to k columns by interleaving k streams.

    Scaling uses ranks-free min/max normalization: one pass, no global
    sort per dimension. For heavily skewed columns substitute quantile
    boundaries (``approx_quantiles``) for the linear scale — the
    interleave stays identical."""
    stats = df.agg(F.min(col_a).alias("__a_lo"), F.max(col_a).alias("__a_hi"),
                   F.min(col_b).alias("__b_lo"), F.max(col_b).alias("__b_hi"))
    top = (1 << bits) - 1

    def scaled(c: str, lo: str, hi: str):
        span = F.col(hi).cast("double") - F.col(lo).cast("double")
        frac = F.when(span > 0,
                      (F.col(c).cast("double") - F.col(lo).cast("double"))
                      / span).otherwise(F.lit(0.0))
        return F.least(F.floor(frac * top).cast("long"), F.lit(top))

    za, zb = scaled(col_a, "__a_lo", "__a_hi"), scaled(col_b, "__b_lo", "__b_hi")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(za, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(zb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = (df.crossJoin(F.broadcast(stats))
           .withColumn("__z", z)
           .repartitionByRange(n_ranges, "__z")
           .sortWithinPartitions("__z")
           .drop("__a_lo", "__a_hi", "__b_lo", "__b_hi", "__z"))
    out.write.mode("overwrite").parquet(path)


def read_csv_typed(spark: SparkSession, path: str, schema: T.StructType,
                   header: bool = True, sep: str = ",",
                   mode: str = "PERMISSIVE",
                   corrupt_col: str | None = None) -> DataFrame:
    """S1 format variant: CSV ingest with an EXPLICIT schema — never
    ``inferSchema`` (which buys its guess with a full extra pass over the
    data; at 100 TB that is a second scan for nothing, and the guess can
    drift between daily files). ``mode='PERMISSIVE'`` + ``corrupt_col``
    lands malformed lines in a quarantine column instead of failing the
    job — the standard poison-row pattern for third-party feeds;
    ``mode='FAILFAST'`` for trusted internal data."""
    r = (spark.read.schema(schema)
         .option("header", str(header).lower()).option("sep", sep)
         .option("mode", mode))
    if corrupt_col:
        r = r.option("columnNameOfCorruptRecord", corrupt_col)
    return r.csv(path)


def read_xml(spark: SparkSession, path: str, row_tag: str,
             schema: T.StructType | None = None) -> DataFrame:
    """S1 format variant: XML ingest (built into Spark 4 — no external
    module). ``rowTag`` picks the repeating element; pass an explicit
    schema for production reads (same no-inference policy as CSV: schema
    inference is an extra full pass over the data at scale)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str,
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    """S3 format variant: XML sink (Spark 4 built-in) — one file per
    partition, same distributed-write semantics as the columnar sinks.
    XML is an interchange format, not a lakehouse format: use it at the
    edges (feeds in/out), parquet/ORC inside."""
    (df.write.format("xml").option("rowTag", row_tag)
       .option("rootTag", root_tag).mode(mode).save(path))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S1 format variant: ORC scan — columnar like parquet (predicate
    pushdown, column pruning, footer statistics all apply); Spark ships
    the reader built-in. Avro, by contrast, needs the external
    ``spark-avro`` module — see :func:`read_avro`."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """S1 format variant, MODULE-GATED: Avro scan via the external
    ``spark-avro`` connector (``org.apache.spark:spark-avro_2.13``, not
    bundled with pyspark — this environment ships avro-core jars only).
    Works as-is on a cluster deployed with the connector; raises a
    actionable error otherwise instead of Spark's generic
    'failed to find data source' (the same guarded-surface pattern as
    the PIL codec kernels and the protobuf-gated state API)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: FAILED_FIND_DATA_SOURCE
        if "avro" in str(e).lower():
            raise RuntimeError(
                "Avro needs the external spark-avro module: submit with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
                "(route feeds through JSON/parquet/ORC in environments "
                "without it)") from e
        raise


def compact_files(spark: SparkSession, path: str,
                  target_rows_per_file: int,
                  out_path: str | None = None) -> int:
    """S3 maintenance: SMALL-FILES COMPACTION — rewrite a parquet
    directory into ⌈n/target⌉ right-sized files and return the new file
    count. Streaming sinks and fine-grained partition writes accrete
    kilobyte files; at 100 TB the resulting open/seek overhead and
    NameNode/listing pressure dominate scan time, so periodic compaction
    is a standing maintenance job in every lakehouse.

    One distributed pass: count (metadata-only for parquet) → coalesce to
    the target file count — ``coalesce`` narrows partitions WITHOUT a
    shuffle (each output task concatenates whole input partitions).
    Writes to ``out_path`` (default: swap directory `<path>__compact`) —
    rewriting a directory while reading it is undefined, and the caller
    owns the atomic swap (rename/catalog repoint) just like
    ``merge_into_managed``'s staging contract."""
    import math

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    dest = out_path or f"{path}__compact"
    df.coalesce(n_files).write.mode("overwrite").parquet(dest)
    return n_files
