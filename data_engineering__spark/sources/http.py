"""HTTP enrichment source (SURVEY §2.1 S4, §2.10 U2).

The reference enriches rows by calling SerpApi per publication with a 5-try
exponential backoff on 429 (``process_publications_dag.py:141-157,202-263``)
— a driver-side sequential loop. The distributed shape: the HTTP client
lives INSIDE a ``mapInPandas`` partition function — one session per
partition, batched requests, backoff in-place; results come back as columns.
The dead ``doi_cache = {}`` at ``process_publications_dag.py:139`` becomes a
real per-partition memo dict.

No network in tests/CI: the fetch function is injected; the default raises.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ENRICHED_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("link", T.StringType(), True),
    T.StructField("result_id", T.StringType(), True),
    T.StructField("summary", T.StringType(), True),
])


def default_fetch(query: str) -> dict:
    """Placeholder for the real HTTP GET (``requests.get`` over
    ``https://serpapi.com/search`` in the reference). Tests inject a stub;
    production injects a real client."""
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
    """U2: per-partition batched HTTP enrichment via mapInPandas.

    Parallelism = partitions (repartition upstream to set the request fan-
    out); per-partition memo dict dedups repeated keys (the reference's
    intended-but-dead ``doi_cache``); Arrow batches keep transfer columnar.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, dict] = {}
        for pdf in batches:
            rows = []
            for key in pdf[key_col].astype(str):
                if key not in memo:
                    payload = retry_backoff(lambda k=key: fetch(k),
                                            attempts=attempts, base_sleep=base_sleep)
                    results = (payload or {}).get("organic_results") or [{}]
                    first = results[0]
                    info = first.get("publication_info") or {}
                    memo[key] = {
                        "title": first.get("title"),
                        "link": first.get("link"),
                        "result_id": first.get("result_id"),
                        "summary": info.get("summary"),
                    }
                rows.append({"key": key, **memo[key]})
            yield pd.DataFrame(rows, columns=[f.name for f in ENRICHED_SCHEMA.fields])

    return df.select(df[key_col].cast("string").alias(key_col)) \
             .mapInPandas(run, schema=ENRICHED_SCHEMA)
