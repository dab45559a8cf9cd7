#!/usr/bin/env python
"""Driver-sim oracle sweep — the verification loop as one command.

Simulates the external driver on a VANILLA SparkSession (no tuned
configs — the code under test must ``tune()`` itself) and hash-compares
every oracle-backed ``queries()`` entry against DuckDB via
``tests/oracle.compare`` (the faithful replica of the driver's
normalization — never hand-roll a str() compare):

    python tools/sweep_oracles.py                      # sf0.01, all keys
    python tools/sweep_oracles.py --sf /root/testdata/sf0.1
    python tools/sweep_oracles.py --slots 1-50         # one driver window
    python tools/sweep_oracles.py key1 key2            # just these keys

Run BOTH scales each round: sf0.01 is the driver's gate; the sf0.1
sweep (round-9 practice) catches scale-boundary oracle fragility —
IEEE -0.0 through ROUND, >16-significant-digit rounding, sketch
tolerance flags at low sigma — that the small gate cannot.

The 100x battery (round-9 practice) is the same sweep against the
synthetic-sf1 upsample, minus the keys whose ORACLES the upsample
makes impractical by construction:

    python tools/make_scaled_testdata.py               # /tmp/sf1
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \\
        python tools/sweep_oracles.py --sf /tmp/sf1 --scale-battery

Exit code = number of failures (0 = all green).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Excluded from ``--scale-battery`` ONLY. The synthetic upsample
#: duplicates every text/name N-fold (tools/make_scaled_testdata.py), so
#: the deliberately-planted duplicate density of these two fixtures
#: inflates QUADRATICALLY — their brute-force cross-engine oracles
#: (all-pairs verify joins) are impractical at that density by
#: construction of the probe data, not by any property of the operators
#: (both complete on the Spark side at sf1 with a provisioned heap —
#: BASELINE.md round-9 probe notes). Everything else sweeps.
IMPRACTICAL_AT_SYNTHETIC_SF1 = frozenset({
    "containment_pairs_docs",
    "supplier_er_clusters",
})


def battery_keys(oracles) -> list[str]:
    """The ``--scale-battery`` key set: every oracle-backed key minus the
    documented synthetic-upsample exclusions, sorted for stable output."""
    return sorted(k for k in oracles if k not in IMPRACTICAL_AT_SYNTHETIC_SF1)


def parse_slots(spec: str, keys: list[str]) -> list[str]:
    """'A-B' (1-indexed, inclusive) slice of the driver-ordered keys."""
    lo, hi = (int(p) for p in spec.split("-", 1))
    return keys[lo - 1:hi]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", help="explicit keys (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--slots", help="driver-window slice, e.g. 1-50")
    ap.add_argument("--scale-battery", action="store_true",
                    help="all oracle keys minus the documented "
                         "synthetic-sf1 oracle exclusions")
    ap.add_argument("--timings", metavar="PATH",
                    help="write per-key wall seconds (Spark query + DuckDB "
                         "oracle + hash compare) as JSON — turns a battery "
                         "into a scale profile of where the wall time lives")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--digest", action="store_true",
                    help="streaming multiset-digest compare (O(1) memory) "
                         "for scale probes whose RESULT SETS are data-"
                         "sized; same normalization as the default "
                         "Counter compare, no per-row mismatch listing")
    args = ap.parse_args()
    n_selectors = sum((bool(args.slots), args.scale_battery, bool(args.keys)))
    if n_selectors > 1:
        ap.error("pass at most ONE of --slots / --scale-battery / explicit "
                 "keys — mixing them would silently ignore the lower-"
                 "precedence selector")

    sys.path.insert(0, REPO)
    # run from outside the repo so Spark's spark-warehouse/ litter and
    # cwd-relative reads never touch the tree (verify-skill gotcha)
    os.chdir("/tmp")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(args.master)
             .appName("driver-sim").getOrCreate())

    import __spark_entry__ as E
    from tests.oracle import compare, compare_digest
    if args.digest:
        compare = compare_digest

    Q, O = E.queries(), E.oracle_sql()
    ordered = list(Q)
    if args.slots:
        names = parse_slots(args.slots, ordered)
    elif args.scale_battery:
        names = battery_keys(O)
    elif args.keys:
        names = args.keys
    else:
        names = sorted(O)

    t0 = time.time()
    bad: list[str] = []
    timings: dict[str, float] = {}
    for i, name in enumerate(names, 1):
        if name not in O:
            print(f"SKIP {name}: rows-only (no oracle)")
            continue
        k0 = time.time()
        try:
            ok, msg = compare(spark, name, args.sf)
        except Exception as exc:  # surface, keep sweeping
            ok, msg = False, repr(exc)
        timings[name] = round(time.time() - k0, 2)
        if not ok:
            bad.append(name)
            print(f"FAIL {name}: {(msg or '')[:300]}", flush=True)
        if i % 25 == 0:  # heartbeat so a long sweep is monitorable
            print(f".. {i}/{len(names)} in {round(time.time() - t0)}s "
                  f"(last: {name})", flush=True)
    if args.timings:
        import json
        with open(args.timings, "w") as fh:
            json.dump(timings, fh, indent=0, sort_keys=True)
        print(f"per-key timings -> {args.timings}")
    print(f"swept {len(names)} keys vs {os.path.basename(args.sf)} in "
          f"{round(time.time() - t0)}s — failures: {bad or 'none'}")
    return len(bad)


if __name__ == "__main__":
    raise SystemExit(main())
