"""HTTP enrichment source (SURVEY §2.1 S4, §2.10 U2).

The reference enriches rows by calling SerpApi per publication with a 5-try
exponential backoff on 429 (``process_publications_dag.py:141-157,202-263``)
— a driver-side sequential loop. The distributed shape: the HTTP client
lives INSIDE a ``mapInPandas`` partition function — one session per
partition, batched requests, backoff in-place; results come back as columns.
The dead ``doi_cache = {}`` at ``process_publications_dag.py:139`` becomes a
real per-partition memo dict.

No network in tests/CI: the fetch function is injected; the default raises
unless ``SPARK_GRAFT_HTTP_LIVE=1`` opts into the real ``requests`` transport
(``live_fetch_factory`` — same base-URL/param/backoff shape as the
reference, credentials via ``SPARK_GRAFT_HTTP_API_KEY``).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ENRICHED_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("rank", T.IntegerType(), True),       # 0-based result index
    T.StructField("title", T.StringType(), True),
    T.StructField("link", T.StringType(), True),
    T.StructField("result_id", T.StringType(), True),
    T.StructField("first_author", T.StringType(), True),
    T.StructField("authors", T.ArrayType(T.StringType()), True),
    T.StructField("summary", T.StringType(), True),
])


class RateLimitError(ConnectionError):
    """HTTP 429 — retryable by ``retry_backoff``'s default filter, matching
    the reference's 429-only ``2**attempt`` sleep loop
    (``process_publications_dag.py:141-157``)."""


def live_fetch_factory(base_url: str | None = None,
                       api_key: str | None = None,
                       engine: str = "google_scholar",
                       num: int = 2,
                       timeout: float = 30.0,
                       session=None) -> Callable[[str], dict]:
    """Real HTTP transport with the reference's request shape
    (``process_publications_dag.py:181-199``): GET ``base_url`` with
    ``engine/q/start/num/api_key/hl`` params, JSON body back.

    ``requests`` is imported lazily so environments without it still import
    this module; credentials come from ``SPARK_GRAFT_HTTP_API_KEY`` (never
    hard-coded), the endpoint from ``SPARK_GRAFT_HTTP_BASE_URL``. A 429
    raises :class:`RateLimitError` so ``retry_backoff`` applies the
    reference's exponential backoff; other HTTP errors raise through.

    One factory call per partition (inside ``enrich``'s partition function
    or injected by the caller) keeps a pooled ``requests.Session`` per
    partition — connection reuse across the partition's batched keys.
    """
    import requests  # lazy: optional dependency, guarded import

    sess = session or requests.Session()
    base = base_url or os.environ.get(
        "SPARK_GRAFT_HTTP_BASE_URL", "https://serpapi.com/search")
    key = api_key if api_key is not None else os.environ.get(
        "SPARK_GRAFT_HTTP_API_KEY", "")

    def fetch(query: str) -> dict:
        params = {"engine": engine, "q": query, "start": 0, "num": num,
                  "hl": "en"}
        if key:
            params["api_key"] = key
        resp = sess.get(base, params=params, timeout=timeout)
        if resp.status_code == 429:
            raise RateLimitError(f"429 rate limit from {base}")
        resp.raise_for_status()
        return resp.json()

    return fetch


#: per-process live client, built on first use inside each executor worker
_live_fetch: Callable[[str], dict] | None = None


def default_fetch(query: str) -> dict:
    """Default transport: live ``requests`` GET when the deployment opts in
    with ``SPARK_GRAFT_HTTP_LIVE=1``; otherwise raise so tests/CI must
    inject a stub (no accidental network egress from a test run)."""
    if os.environ.get("SPARK_GRAFT_HTTP_LIVE") == "1":
        global _live_fetch
        if _live_fetch is None:
            _live_fetch = live_fetch_factory()
        return _live_fetch(query)
    raise NotImplementedError("inject a fetch(query) -> payload dict callable")


def retry_backoff(fn: Callable[[], dict], attempts: int = 5,
                  base_sleep: float = 1.0,
                  retryable: type[Exception] = ConnectionError) -> dict:
    """The reference's retry loop (5 attempts, 2^n backoff on 429,
    ``process_publications_dag.py:143-157``), reusable inside partitions."""
    for attempt in range(attempts):
        try:
            return fn()
        except retryable:
            if attempt == attempts - 1:
                raise
            time.sleep(base_sleep * (2 ** attempt))
    raise RuntimeError("unreachable")


def enrich(df: DataFrame, key_col: str,
           fetch: Callable[[str], dict] = default_fetch,
           attempts: int = 5, base_sleep: float = 0.0) -> DataFrame:
    """U2: per-partition batched HTTP enrichment via mapInPandas — 1→N.

    One output row PER organic result, matching the reference's cardinality:
    both the enrichment upsert loop (one upsert per result,
    ``process_publications_dag.py:216-233``) and the citation harvest (one
    citation row per result, ``:445-460``) iterate ALL ``organic_results``.
    A key with no results emits ZERO rows (the reference ``continue``s).

    Field extraction mirrors the reference exactly: title/link are
    ``.strip()``-ed (kept even when empty), ``result_id`` is
    ``strip() or None`` (``new_doi or None``, ``:220,232``), and
    ``first_author`` is ``publication_info.authors[0].name`` defaulting to
    ``'Unknown'`` (``:221``).

    Parallelism = partitions (repartition upstream to set the request fan-
    out); per-partition memo dict dedups repeated keys (the reference's
    intended-but-dead ``doi_cache``); Arrow batches keep transfer columnar.
    """
    cols = [f.name for f in ENRICHED_SCHEMA.fields]

    def extract(key: str) -> list[dict]:
        payload = retry_backoff(lambda: fetch(key),
                                attempts=attempts, base_sleep=base_sleep)
        results = (payload or {}).get("organic_results") or []
        out = []
        for rank, article in enumerate(results):
            info = article.get("publication_info") or {}
            authors = info.get("authors") or [{}]
            out.append({
                "key": key, "rank": rank,
                "title": (article.get("title") or "").strip(),
                "link": (article.get("link") or "").strip(),
                "result_id": (article.get("result_id") or "").strip() or None,
                "first_author": authors[0].get("name") or "Unknown",
                # full author-name list (stripped, blanks dropped) — feeds
                # the reference's per-result authorship inserts (:237-247)
                "authors": [n for n in
                            ((a.get("name") or "").strip() for a in authors)
                            if n],
                "summary": info.get("summary"),
            })
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[dict]] = {}
        for pdf in batches:
            rows = []
            for key in pdf[key_col].astype(str):
                if key not in memo:
                    memo[key] = extract(key)
                rows.extend(memo[key])
            yield pd.DataFrame(rows, columns=cols)

    return df.select(df[key_col].cast("string").alias(key_col)) \
             .mapInPandas(run, schema=ENRICHED_SCHEMA)
