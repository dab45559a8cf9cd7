#!/usr/bin/env python
"""Per-key isolated bench + plan capture (r11 optimization round).

Times the named conformance keys through the noop sink (guide §1.4) on a
tuned local[$SPARK_GRAFT_CPUS] session, min-of-N, after the same JVM/Arrow
warmup bench.py performs, and optionally writes .explain("formatted") to
``--plans-dir``. Repo root (first sys.path entry) comes from
``$BENCH_KEYS_REPO`` so the same script can measure a baseline worktree
and the working tree.

Usage:
  BENCH_KEYS_REPO=/root/repo python tools/bench_keys.py key1 key2 \
      [--sf /root/testdata/sf0.1] [--repeat 3] [--plans-dir plans/r11 \
       --plans-suffix after]
Prints one JSON line {key: best_sec, ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="after")
    args = ap.parse_args()

    repo = os.environ.get("BENCH_KEYS_REPO", "/root/repo")
    sys.path.insert(0, repo)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from data_engineering__spark.conformance import QUERIES
    from data_engineering__spark.session import get_spark
    spark = get_spark("bench-keys", master=f"local[{cpus}]")
    spark.range(1000).count()
    (spark.range(int(cpus) * 4).repartition(int(cpus))
     .mapInPandas(lambda it: it, "id long").count())

    out: dict[str, float] = {}
    for name in args.keys:
        fn = QUERIES[name]
        best = None
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            txt = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    args.plans_dir,
                    f"{name}_{args.plans_suffix}.txt"), "w") as fh:
                fh.write(txt)
    try:
        load = round(os.getloadavg()[0], 1)
    except OSError:
        load = None
    print(json.dumps({"timings": out, "load_1m": load,
                      "repo": repo, "sf": args.sf}))


if __name__ == "__main__":
    main()
