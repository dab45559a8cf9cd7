#!/usr/bin/env python
"""Verification ledger — the driver-record state, auditable per round.

Reads every ``CORRECTNESS_r*.json`` the driver has written plus the
registry, and regenerates ``VERIFICATION.md``: per-key newest green
driver round, the never-driver-verified backlog (in its queue order),
and the staleness report VERDICT r6 task 4 asks for ("no key's newest
green row stays >4 rounds old" once the backlog drains). Run after each
driver round:

    python tools/verification_ledger.py

The ledger is a REPORT of the durable contract (the driver's rows), not
a substitute for it: judge sweeps and local driver-sims are noted where
VERDICTs recorded them, but only CORRECTNESS rows count as green here.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rows() -> dict[str, int]:
    """Per key: newest driver round with a fully-green row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for key, row in rows.items():
            matches = (row.get("rows_match"), row.get("schema_match"),
                       row.get("hash_match"))
            # Green = no error, no explicit mismatch, AND at least one
            # explicit True. Weaker rows-only records (hash_match
            # None/absent) stay green, but a placeholder/partial row like
            # {"err": null} with every field absent does NOT count as a
            # driver verification.
            ok = (row.get("err") is None
                  and not any(m is False for m in matches)
                  and any(m is True for m in matches))
            if ok:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def main() -> int:
    sys.path.insert(0, REPO)
    from data_engineering__spark.conformance import (
        DRIVER_PRIORITY,
        ORACLE,
        QUERIES,
    )

    newest = load_rows()
    latest_round = max(newest.values()) if newest else 0
    keys = list(QUERIES)
    never = [k for k in DRIVER_PRIORITY if k not in newest]
    never += [k for k in keys if k not in newest and k not in never]
    stale = sorted((k, r) for k, r in newest.items()
                   if k in QUERIES and latest_round - r > 4)

    lines = [
        "# VERIFICATION ledger (generated — do not edit; "
        "`python tools/verification_ledger.py`)",
        "",
        f"Registry: **{len(keys)} queries / "
        f"{sum(1 for k in keys if k in ORACLE)} oracles**. "
        f"Latest driver round on record: **r{latest_round:02d}**.",
        "",
        f"- driver-green keys (≥1 green CORRECTNESS row): "
        f"**{sum(1 for k in keys if k in newest)} / {len(keys)}**",
        f"- never-driver-verified backlog: **{len(never)}** "
        f"(drains ~50/round in `DRIVER_PRIORITY` order)",
        f"- stale keys (newest green row > 4 rounds old): **{len(stale)}**",
        "",
        "## Rotation policy (steady state, rounds 10+)",
        "",
        "Once the backlog drains, each driver round re-verifies ~50 keys "
        "in staleness-first order (oldest newest-green row first; keys "
        "RED in the latest round pre-empt the head; rows-only keys ride "
        "last). Projected staleness ceiling at the current registry size "
        f"({len(keys)} keys / 50 slots per round): every key's newest "
        f"green row is re-earned at least once every "
        f"ceil({len(keys)}/50) = {-(-len(keys) // 50)} rounds — the "
        "oldest row in steady state is bounded by that cycle length, "
        "and the freeze rule (new keys ≤3/round, queued behind the "
        "backlog) keeps the cycle from growing faster than it drains.",
        "",
        "## Never-driver-verified (queue order — next driver window first)",
        "",
    ]
    for i in range(0, len(never), 6):
        lines.append("    " + ", ".join(never[i:i + 6]))
    lines += ["", "## Newest green driver round per key", ""]
    by_round: dict[int, list[str]] = {}
    for k in keys:
        if k in newest:
            by_round.setdefault(newest[k], []).append(k)
    for rnd in sorted(by_round, reverse=True):
        ks = sorted(by_round[rnd])
        lines.append(f"### r{rnd:02d} ({len(ks)} keys)")
        lines.append("")
        for i in range(0, len(ks), 6):
            lines.append("    " + ", ".join(ks[i:i + 6]))
        lines.append("")
    if stale:
        lines += ["## STALE (> 4 rounds old — rotate these next)", ""]
        for k, r in stale:
            lines.append(f"- {k} (r{r:02d})")
        lines.append("")

    out = os.path.join(REPO, "VERIFICATION.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {sum(1 for k in keys if k in newest)}/{len(keys)} "
          f"green, backlog {len(never)}, stale {len(stale)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
