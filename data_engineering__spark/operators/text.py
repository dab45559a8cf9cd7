"""Text-analysis operators for training-data pipelines (SURVEY §2.12 L4 +
EXT mandate: language-ID, quality scoring, token counting, fingerprinting).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen); nothing here drops to Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deliberately small: language ID at 100 TB must stay in codegen; a real
# deployment would swap in fastText via mapInPandas (see lang_id_pandas stub).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
}


def tokens(text_col: str) -> Column:
    """Whitespace tokenization as array<string> (empty tokens removed)."""
    return F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")


def token_count(text_col: str) -> Column:
    """L4: whitespace token count — ``size(split(...))`` in codegen."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str) -> Column:
    """Token count under a BPE-ish regex: splits words AND punctuation runs,
    approximating subword tokenizer output scale (cl100k-style pretokenizer:
    letter runs | digit runs | non-space-non-alnum runs)."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"), 0)
    return F.size(pieces)


def char_count(text_col: str) -> Column:
    return F.length(F.col(text_col))


def stopword_ratio(text_col: str, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """EXT language-ID heuristic: argmax stopword-ratio across known
    languages, 'und' when nothing matches. Pure codegen — one projection,
    no shuffle, no Python. (Reference has no language ID; mandated EXT.)"""
    scores = F.array(*[
        F.struct(stopword_ratio(text_col, lang).alias("score"), F.lit(lang).alias("lang"))
        for lang in STOPWORDS
    ])
    best = F.array_max(scores)
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")))


def quality_score(df: DataFrame, text_col: str, out_col: str = "quality") -> DataFrame:
    """EXT quality scoring: length/punctuation/stopword signals combined into
    [0,1]. Mirrors common pretraining-corpus filters (C4/Gopher rules):
    - reasonable doc length (chars in [200, 50k])
    - mean token length in [3, 12]
    - punctuation-to-char ratio < 0.2
    - any-language stopword ratio > 0.05
    Each rule contributes 0.25; pure codegen."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(toks)
    mean_tok_len = F.when(n_toks > 0,
                          F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_toks
                          ).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    any_sw = None
    for lang in STOPWORDS:
        r = stopword_ratio(text_col, lang)
        any_sw = r if any_sw is None else F.greatest(any_sw, r)
    score = (
        F.when((n_chars >= 200) & (n_chars <= 50000), 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.when(punct_ratio < 0.2, 0.25).otherwise(0.0)
        + F.when(any_sw > 0.05, 0.25).otherwise(0.0)
    )
    return df.withColumn(out_col, F.round(score, 2))


def doc_fingerprint(text_col: str, seed: int = 42) -> Column:
    """EXT document fingerprint: order-sensitive rolling hash over tokens,
    fold-left ``h = (h*31 + xxhash64(token)) mod M`` in codegen (F.aggregate)
    with M = 2^31-1 so the fold never overflows long under ANSI mode.
    Distinguishes permuted documents (unlike bag-of-words hashes); companion
    to content-hash L1 (order-insensitive after normalization)."""
    m = F.lit((1 << 31) - 1).cast("long")
    return F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long")
                              + F.pmod(F.xxhash64(t, F.lit(seed)), m), m),
    )


def text_stats(df: DataFrame, group_col: str, chars_col: str) -> DataFrame:
    """L4: corpus profile per group (language distribution + char stats) —
    single hash-agg pass, partial aggregation map-side."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(chars_col), 2).alias("avg_chars"),
        F.min(chars_col).alias("min_chars"),
        F.max(chars_col).alias("max_chars"),
    )
