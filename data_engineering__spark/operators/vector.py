"""Vector / similarity-search operators (SURVEY §2.12 L3 + EXT mandate).

Embedding columns are ``array<float>``; all arithmetic casts to double and
stays in codegen (``zip_with`` + ``aggregate`` fold) — no Python in the
scoring loop. Two tiers:
- brute-force cosine top-k: exact baseline; one pass over candidates with a
  broadcast query vector; TakeOrderedAndProject for the top-k (no full sort).
- IVF-style LSH-bucketed ANN: random-hyperplane signatures partition the
  corpus; queries probe only matching buckets — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ as a codegen fold (sequential, deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_topk(candidates: DataFrame, query: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                out_score: str = "cosine") -> DataFrame:
    """L3 baseline: exact top-k by cosine against ONE query vector.

    ``query`` is a 1-row (or few-row) DataFrame broadcast to every executor —
    a map-side cross join, zero shuffle for scoring; the only exchange is the
    k-row TakeOrderedAndProject merge. Ties broken by id for determinism.
    """
    q = F.broadcast(query.select(as_double_array(vec_col).alias("__q")))
    scored = (candidates
              .withColumn("__v", as_double_array(vec_col))
              .crossJoin(q)
              .withColumn(out_score, _dot(F.col("__v"), F.col("__q"))
                          / (_norm(F.col("__v")) * _norm(F.col("__q"))))
              .drop("__v", "__q"))
    return (scored.orderBy(F.round(F.col(out_score), 6).desc(), F.col(id_col).asc())
                  .limit(k))


def rp_signature(vec_col: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature (int bucket id).

    Plane p's normal is a deterministic pseudo-random ±1 vector generated
    DRIVER-SIDE at plan time and embedded as an array literal — executors
    need no side data, signatures are rerun-stable, and (unlike deriving the
    vector from per-element hash expressions) nothing is recomputed per row.
    sign(v·r) per plane → n_planes-bit bucket id. Cosine-similar vectors
    collide with high probability.
    """
    import random
    rng = random.Random(seed)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        rand = F.array(*[F.lit(1.0 if rng.random() < 0.5 else -1.0)
                         for _ in range(dim)])
        proj = F.aggregate(F.zip_with(vec_col, rand, lambda x, r: x * r),
                           F.lit(0.0), lambda acc, v: acc + v)
        sig = sig.bitwiseOR(F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p))
                             .otherwise(F.lit(0).cast("long")))
    return sig


def ann_topk_lsh(candidates: DataFrame, query: DataFrame, k: int, dim: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 8, seed: int = 42) -> DataFrame:
    """L3 scale path: LSH-bucketed approximate top-k.

    Corpus is signed once (signature persisted/bucketed in a real
    deployment); a query probes only its own bucket — at 1000 executors the
    scan narrows by ~2^n_planes. Exact cosine re-ranks within the bucket.
    Recall/latency trades via n_planes (fewer planes → bigger buckets).
    """
    cand_sig = candidates.withColumn("__sig", rp_signature(as_double_array(vec_col), dim, n_planes, seed))
    q_sig = F.broadcast(query.select(as_double_array(vec_col).alias("__q"))
                        .withColumn("__sig", rp_signature(F.col("__q"), dim, n_planes, seed)))
    probe = cand_sig.join(q_sig, "__sig")
    scored = (probe.withColumn("__v", as_double_array(vec_col))
              .withColumn("cosine", _dot(F.col("__v"), F.col("__q"))
                          / (_norm(F.col("__v")) * _norm(F.col("__q"))))
              .drop("__v", "__q", "__sig"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             dim: int = 64, n_planes: int = 6, seed: int = 42) -> DataFrame:
    """EXT embedding-cosine near-dup: candidate pairs from shared LSH bucket,
    verified by exact cosine ≥ threshold. Self-join keyed on the signature —
    sub-quadratic; never ships vectors except within matching buckets."""
    sig = df.select(F.col(id_col), as_double_array(vec_col).alias("__v")) \
            .withColumn("__sig", rp_signature(F.col("__v"), dim, n_planes, seed))
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (a.join(b, "__sig")
              .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
              .withColumn("cosine", _dot(F.col("a.__v"), F.col("b.__v"))
                          / (_norm(F.col("a.__v")) * _norm(F.col("b.__v"))))
              .filter(F.col("cosine") >= threshold)
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"),
                      F.round("cosine", 6).alias("cosine")))
    return pairs.distinct()
