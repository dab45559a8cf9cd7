#!/usr/bin/env python
"""Synthetic scale-up of the canonical testdata for 100x probes.

Builds an N-fold key-shifted upsample of a testdata directory (default:
sf0.1 x 10 = "sf1") under /tmp, leaving the canonical driver testdata
untouched and authoritative:

    python tools/make_scaled_testdata.py                   # /tmp/sf1
    python tools/make_scaled_testdata.py --src /root/testdata/sf0.1 \
        --dst /tmp/sf1 --copies 10

Each copy shifts every key column (PKs and the FKs that reference them)
by ``copy_index * KEY_OFFSET`` so per-copy joins are preserved, keys
stay unique, and cross-copy joins never occur. Non-key payloads (text,
embeddings, values) are duplicated verbatim — sums and magnitudes grow
N-fold, which is exactly what the probe is for. KEY_OFFSET (1e7) stays
far below the repo's 1e12 twin-plant sentinel.

What the probe catches (round-9 findings, all invisible at the sf0.01
driver gate): twin-sentinel id collisions, int64 overflow in id
arithmetic under ANSI, ROUND precision deficits on magnitude-growing
floats, corpus-growing frames that Catalyst auto-broadcasts until the
driver OOMs. Run it with tools/sweep_oracles.py:

    python tools/sweep_oracles.py --sf /tmp/sf1 <linear keys...>

Caveats: duplicated TEXTS mean every doc has N-1 exact twins, so the
deliberately-planted near-dup densities of the dedup/ER fixture keys
inflate quadratically — run those with a provisioned heap and expect
their brute-force oracles to be impractical; this is an artifact of
the upsample, not of the operators. events.ts is copied in whatever
physical layout the source carries (read raw, no normalization).
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KEY_OFFSET = 10_000_000

#: key columns shifted per copy — PKs and the FKs referencing them
KEY_COLUMNS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: shared dimensions copied verbatim (no keys worth shifting)
COPY_AS_IS = ["region", "nation"]


def shifted_union(df, keys: list[str], copies: int):
    from pyspark.sql import functions as F

    parts = []
    for i in range(copies):
        c = df
        for k in keys:
            c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def consolidate(d: str) -> None:
    """Spark writes a directory; the oracle compare expects ONE file per
    table (DuckDB read_parquet on the exact path). Merge with pyarrow so
    the physical schema (events.ts logical type!) is preserved bit-for-
    bit — a DuckDB COPY would rewrite timestamps UTC-adjusted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    merged = pa.concat_tables(pq.read_table(f) for f in files)
    tmp = d + ".one"
    # Bound the row-group size so every table carries >= ~16 splittable
    # row groups: Spark's minimum split granularity is the row group, and
    # pyarrow's default (1M rows) left the small tables (embeddings,
    # documents) as ONE group — serializing every corpus scan into a
    # single task, which is how the round-9 sf10 probe mistook a fixture
    # artifact for a 21-minute straggler. A deployment's corpus arrives
    # as thousands of splits; the probe data should too.
    rg = min(1_048_576, max(8_192, merged.num_rows // 16))
    pq.write_table(merged, tmp, compression="snappy", row_group_size=rg)
    shutil.rmtree(d)
    os.rename(tmp, d)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    if os.path.realpath(args.dst).startswith(os.path.realpath(args.src)):
        raise SystemExit("dst must not live inside src")

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16").getOrCreate())

    os.makedirs(args.dst, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copy(f"{args.src}/{t}.parquet", f"{args.dst}/{t}.parquet")
    for t, keys in KEY_COLUMNS.items():
        df = spark.read.parquet(f"{args.src}/{t}.parquet")  # raw layout
        out = f"{args.dst}/{t}.parquet"
        shifted_union(df, keys, args.copies) \
            .coalesce(4).write.mode("overwrite").parquet(out)
        consolidate(out)
        print(f"built {t}: "
              f"{spark.read.parquet(out).count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
