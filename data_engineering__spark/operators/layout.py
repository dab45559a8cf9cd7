"""Storage-layout optimization for data skipping (round 8, EXT R323).

At 100 TB the fastest scan is the one that never happens: parquet
readers skip whole files/row-groups using min/max statistics, but a
layout sorted on ONE column gives tight min/max ranges on that column
only — a filter on a second dimension still touches every file.
Z-ORDERING (Morton-interleaving the bits of two dimensions and range-
partitioning on the interleaved key) makes every output file a small
RECTANGLE in (x, y) space, so min/max pruning works on BOTH filter
columns at once. The same technique warehouses expose as `OPTIMIZE ...
ZORDER BY`; here it is plain Spark: a codegen bit-arithmetic expression
+ `repartitionByRange` — no custom writer.

Everything is integer bit arithmetic (`&`, `|`, `<<`), identical in any
engine — the DuckDB oracle for `zorder_skipping_events` recomputes the
keys, buckets, and per-bucket rectangles verbatim.

Reference basis: the reference warehouse relies on Postgres PK/btree
locality (`database and queries aupostgres.sql` DDL); this is the
columnar-at-scale counterpart of that layout decision.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-number bit spreads for a 16-bit Morton interleave
_SPREAD_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                 (2, 0x33333333), (1, 0x55555555))

ZORDER_BITS = 16
ZORDER_DOMAIN = 1 << (2 * ZORDER_BITS)  # zkey in [0, 2^32)


def _spread16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions (classic
    interleave-by-magic-numbers: O(log bits) codegen ops, no UDF).
    The input is masked to 16 bits up front — without it, bit 16 of an
    over-range value survives the 0x00FF00FF round and collides with an
    interleaved position, silently corrupting the key (ADVICE r8)."""
    out = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton_key(x: Column, y: Column) -> Column:
    """Z-order (Morton) key of two 16-bit-clamped ints: interleaves the
    bits so nearby (x, y) points get nearby keys. Pure codegen."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_skipping_stats(df: DataFrame, x: Column, y: Column,
                          bucket_bits: int = 4) -> DataFrame:
    """The data-skipping report a z-ordered layout delivers: rows are
    assigned to ``2**bucket_bits`` equal z-ranges (the file boundaries a
    `repartitionByRange(zkey)` write would draw) and each bucket reports
    its row count and min/max RECTANGLE in both source dimensions —
    tight in x AND y simultaneously, which is the property a 1-D sort
    cannot give. The bucket id is the zkey's top ``bucket_bits`` bits
    (a pure shift — exact in any engine, no float division). One
    map-side key expression + one hash aggregate over a bounded bucket
    domain; no corpus-sized shuffle."""
    z = morton_key(x, y)
    bucket = F.shiftrightunsigned(z, 2 * ZORDER_BITS - bucket_bits)
    return (df.select(x.alias("__x"), y.alias("__y"), bucket.alias("zbucket"))
            .groupBy("zbucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("__x").cast("long").alias("x_min"),
                 F.max("__x").cast("long").alias("x_max"),
                 F.min("__y").cast("long").alias("y_min"),
                 F.max("__y").cast("long").alias("y_max")))


def write_zordered(df: DataFrame, path: str, x: Column, y: Column,
                   n_files: int = 16, mode: str = "overwrite") -> None:
    """Z-ordered parquet write: range-partition on the Morton key so
    each output file covers one contiguous z-range — a small (x, y)
    rectangle whose parquet min/max stats prune scans filtered on
    EITHER dimension. The write costs one range exchange (sampled
    boundaries), the standard price of any clustered layout."""
    (df.withColumn("__zkey", morton_key(x, y))
       .repartitionByRange(n_files, "__zkey")
       .drop("__zkey")
       .write.mode(mode).parquet(path))


def compact_parquet(spark, src: str, dst: str,
                    target_mb: int = 128) -> int:
    """Small-files compaction (the `OPTIMIZE` bin-pack half of layout
    maintenance): rewrite a directory of many small parquet files into
    ceil(bytes / target_mb) files. Streaming sinks and incremental
    loads produce file counts proportional to trigger counts; at scale
    the resulting open/footer overhead dominates scans long before data
    size does. Returns the file count written. Row-identity is the
    caller-visible contract (pinned in tests)."""
    import math

    df = spark.read.parquet(src)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    # coalesce() can only MERGE partitions; when the source has fewer
    # partitions than n (one oversized file), a full shuffle repartition
    # is required to actually split it (ADVICE r8)
    if n > df.rdd.getNumPartitions():
        df.repartition(n).write.mode("overwrite").parquet(dst)
    else:
        df.coalesce(n).write.mode("overwrite").parquet(dst)
    # report the count actually written, not the request: the writer may
    # emit fewer files (empty partitions are skipped)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    it = fs.listFiles(jdst, True)
    written = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            written += 1
    return written
