#!/usr/bin/env python
"""Propose the next round's DRIVER_PRIORITY rotation.

The driver records CORRECTNESS rows for the first ~50 ``queries()``
entries each round; after its file lands, the priority list must rotate:
newly-green keys drop out of the head, the remaining never-verified
backlog moves up, stale-rotation and new keys ride behind. Doing that by
hand over a ~200-entry list is error-prone — this tool PRINTS the
proposed list (it does not edit conformance.py; paste and review):

    python tools/rotate_driver_priority.py            # uses newest CORRECTNESS_r*.json
    python tools/rotate_driver_priority.py CORRECTNESS_r07.json

Policy encoded (VERDICT r6 tasks 1 and 4):
1. never-driver-verified keys first, in current queue order;
2. then keys whose newest green row is > 4 rounds old (oldest first);
3. freshly-green keys are dropped from the list entirely (they follow
   in registration order, i.e. last).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO)
    from tools.verification_ledger import load_rows

    from data_engineering__spark.conformance import DRIVER_PRIORITY, QUERIES

    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if len(sys.argv) > 1:
        target = sys.argv[1]
    elif files:
        target = files[-1]
    else:
        print("no CORRECTNESS_r*.json on disk — nothing to rotate from; "
              "pass a file explicitly or wait for a driver round")
        return 1
    rnd = int(re.search(r"_r(\d+)\.json", target).group(1))
    with open(target) as fh:
        latest = json.load(fh)
    bad = {k: v for k, v in latest.items()
           if v.get("err") or v.get("rows_match") is False
           or v.get("schema_match") is False or v.get("hash_match") is False}
    if bad:
        print(f"!! {len(bad)} NON-GREEN rows in {os.path.basename(target)} — "
              f"fix these FIRST, they keep their head slots: {sorted(bad)}")

    newest = load_rows()  # includes `target` if it is on disk
    never = [k for k in DRIVER_PRIORITY
             if k not in newest and k in QUERIES and k not in bad]
    never += [k for k in QUERIES if k not in newest and k not in never
              and k not in bad]
    # a key red in the target round keeps its head slot via `bad`; do not
    # list it a second time in the stale block even if an old row is stale
    stale = sorted(((r, k) for k, r in newest.items()
                    if k in QUERIES and rnd - r > 4 and k not in bad))
    head = sorted(bad) + never + [k for _, k in stale]

    print(f"# proposed DRIVER_PRIORITY after round {rnd} "
          f"({len(head)} entries: {len(bad)} red + {len(never)} "
          f"never-verified + {len(stale)} stale; window = first 50)")
    for i in range(0, len(head), 4):
        print("    " + ", ".join(f'"{k}"' for k in head[i:i + 4]) + ",")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
