"""Round-8 IO additions: VARIANT shredded parquet WRITE control.

Completes the R320 VARIANT surface: round 7 pinned the READ capability
(`allowReadingShredded` on, binary round-trip); this pins the WRITE side —
shredding (Spark 4.1's default) emits real per-path typed parquet columns,
`shredded=False` forces the legacy pure-binary layout, and values survive
both layouts bit-identically.
"""
from pyspark.sql import functions as F


def _parquet_message_type(spark, parquet_file: str) -> str:
    """Footer schema via the JVM parquet reader — pyarrow's thrift parser
    predates the VARIANT logical type and refuses the footer outright."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(parquet_file)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        return reader.getFooter().getFileMetaData().getSchema().toString()
    finally:
        reader.close()


def test_variant_shredded_write_roundtrip(spark, tmp_path):
    """Pins: (1) the shredded write emits the Parquet Variant group WITH
    an inferred `typed_value` column group carrying plain typed columns
    per stable path (int64 for `a`, STRING for `b.c`) — the columnar
    scan path for semi-structured data at scale; (2) `shredded=False`
    yields the legacy binary-only layout; (3) values read back identical
    across layouts, including the row whose `a` is a string (it rides
    the residual `value` fallback, not the typed column); (4) the
    session confs are restored after each write."""
    import glob

    from data_engineering__spark.sources.io import write_parquet_variant

    before = {}
    for n in ("spark.sql.variant.writeShredding.enabled",
              "spark.sql.variant.inferShreddingSchema"):
        try:
            before[n] = spark.conf.get(n)
        except Exception:
            before[n] = None

    df = spark.range(20).select(
        "id",
        F.parse_json(F.when(
            F.col("id") == 7,
            F.lit('{"a": "not-an-int", "b": {"c": "x7"}}'),
        ).otherwise(F.concat(
            F.lit('{"a": '), F.col("id").cast("string"),
            F.lit(', "b": {"c": "x'), F.col("id").cast("string"),
            F.lit('"}}')))).alias("v"))

    shred_dir = str(tmp_path / "shredded")
    plain_dir = str(tmp_path / "plain")
    write_parquet_variant(df, shred_dir, shredded=True)
    write_parquet_variant(df, plain_dir, shredded=False)

    for n, v in before.items():  # confs restored after both writes
        try:
            now = spark.conf.get(n)
        except Exception:
            now = None
        assert now == v, n

    # Spark 4.1 infers the shredding schema PER TASK, so footers within
    # one shredded sink legitimately DIFFER: an empty task's part has a
    # plain metadata/value footer with NO typed_value group, and a task
    # whose only `a` values are strings types $.a's typed_value as
    # STRING, not int64. Mixed footers are the normal contract and
    # readers must handle them — so pin the layout with any-across-parts
    # assertions, never against glob.glob()[0] (directory-entry order
    # varies with task completion timing; this pin used to flake on it).
    shred_schemas = [_parquet_message_type(spark, p)
                     for p in sorted(glob.glob(f"{shred_dir}/*.parquet"))]
    assert any("typed_value" in s for s in shred_schemas)
    # a task that saw int `a` rows shreds $.a as a plain int64 column
    assert any("optional int64 typed_value" in s for s in shred_schemas)
    # $.b.c is a string on every row, so some footer shreds it as STRING
    assert any("optional binary typed_value (STRING)" in s
               for s in shred_schemas)
    # companion pin of the mixed-footer contract: every part — empty-task
    # or data-bearing, shredded or not — is a valid Variant group
    for s in shred_schemas:
        assert "metadata" in s and "value" in s
    plain_schema = _parquet_message_type(
        spark, glob.glob(f"{plain_dir}/*.parquet")[0])
    assert "typed_value" not in plain_schema
    assert "value" in plain_schema and "metadata" in plain_schema

    back = {r["id"]: r["j"] for r in
            spark.read.parquet(shred_dir)
            .select("id", F.to_json("v").alias("j")).collect()}
    want = {r["id"]: r["j"] for r in
            spark.read.parquet(plain_dir)
            .select("id", F.to_json("v").alias("j")).collect()}
    assert back == want and len(back) == 20
    assert back[7] == '{"a":"not-an-int","b":{"c":"x7"}}'

    # typed-path extraction over the shredded files keeps full fidelity:
    # 19 int rows + the string row as a try-cast NULL
    got = (spark.read.parquet(shred_dir)
           .select(F.try_variant_get("v", "$.a", "bigint").alias("a"))
           .collect())
    vals = sorted((r["a"] for r in got if r["a"] is not None))
    assert vals == [i for i in range(20) if i != 7]
    assert sum(1 for r in got if r["a"] is None) == 1


def test_write_zordered_files_are_disjoint_zranges(spark, tmp_path):
    """Round 8 (layout family): `write_zordered` range-partitions on the
    Morton key, so each output file must cover a z-range DISJOINT from
    every other file's — the precondition for min/max file pruning on
    both dimensions — and the rewrite is row-identical. Also pins that
    z-bucket rectangles are tighter in x than a y-sorted layout's
    (the 2-D locality a 1-D sort cannot give): with rows laid out by
    y alone, every file spans ~the full x domain."""
    import glob

    from pyspark.sql import functions as F
    from data_engineering__spark.operators.layout import (
        morton_key,
        write_zordered,
    )

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64 * 1024).alias("x"),
        (F.floor(F.col("id") / 64) * 1024).alias("y"))
    out = str(tmp_path / "zordered")
    write_zordered(df, out, F.col("x"), F.col("y"), n_files=8)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1
    ranges = []
    back_total = 0
    for f in files:
        part = spark.read.parquet(f).select(
            morton_key(F.col("x"), F.col("y")).alias("z"), "x", "y")
        row = part.agg(F.min("z"), F.max("z"), F.count(F.lit(1))).collect()[0]
        if row[2]:
            ranges.append((row[0], row[1]))
            back_total += row[2]
    assert back_total == n
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # strictly disjoint z-ranges

    # row identity
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == \
        sorted(map(tuple, df.collect()))

    # 2-D locality: mean per-file x-span under z-order << under y-sort
    def mean_x_span(path):
        spans = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            r = spark.read.parquet(f).agg(F.min("x"), F.max("x"),
                                          F.count(F.lit(1))).collect()[0]
            if r[2]:
                spans.append(r[1] - r[0])
        return sum(spans) / len(spans)

    ysorted = str(tmp_path / "ysorted")
    df.repartitionByRange(8, "y").write.parquet(ysorted)
    assert mean_x_span(out) < 0.8 * mean_x_span(ysorted)


def test_compact_parquet_binpacks_and_keeps_rows(spark, tmp_path):
    """Round 8 (layout family): many small files in, few files out,
    rows identical — the OPTIMIZE bin-pack half of layout maintenance
    (streaming sinks and incremental loads fragment; footer/open
    overhead dominates scans at scale)."""
    import glob

    from data_engineering__spark.operators.layout import compact_parquet

    src = str(tmp_path / "fragmented")
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1  # tiny data bin-packs to a single file
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 1
    assert sorted(r[0] for r in spark.read.parquet(dst).collect()) == \
        list(range(10_000))


def test_compact_parquet_splits_oversized_file(spark, tmp_path):
    """ADVICE r8: coalesce() cannot RAISE the partition count, so an
    oversized single file must go through repartition to actually split
    — and the return value is the count of files WRITTEN, not the
    request (the two diverge exactly in this case without the fix)."""
    import glob

    from pyspark.sql import functions as F

    from data_engineering__spark.operators.layout import compact_parquet

    src = str(tmp_path / "one_big")
    # ~3 MB of incompressible-ish payload in ONE file
    (spark.range(40_000)
     .withColumn("pad", F.sha2(F.col("id").cast("string"), 512))
     .coalesce(1).write.parquet(src))
    assert len(glob.glob(f"{src}/part-*.parquet")) == 1

    dst = str(tmp_path / "split")
    n = compact_parquet(spark, src, dst, target_mb=1)
    written = len(glob.glob(f"{dst}/part-*.parquet"))
    assert n == written and written > 1
    assert spark.read.parquet(dst).count() == 40_000
