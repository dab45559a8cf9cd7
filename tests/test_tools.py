"""Unit pins for the round-workflow tools (round 8).

The rotation and ledger scripts now carry real policy (what counts as a
green driver row; how the queue rotates) — policy that decides which keys
the driver verifies next round, so it gets the same test treatment as an
operator. These run without Spark.
"""
from __future__ import annotations

import sys


def _load_rows_for(rows_by_round, monkeypatch, tmp_path):
    import json

    for rnd, rows in rows_by_round.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows))
    import tools.verification_ledger as vl
    monkeypatch.setattr(vl, "REPO", str(tmp_path))
    return vl.load_rows()


def test_load_rows_green_red_rowsonly_and_placeholder(monkeypatch, tmp_path):
    """ADVICE r7: a green row needs err=None, no explicit False, AND at
    least one explicit True — so a placeholder like {"err": null} or the
    legacy no-oracle rows (err='no_oracle', all-None matches) never count
    as driver verifications, while a weaker rows-only record with an
    explicit rows_match=True stays green."""
    full = {"rows_match": True, "schema_match": True, "hash_match": True,
            "err": None}
    rows_only = {"rows_match": True, "schema_match": True,
                 "hash_match": None, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "err": None}
    errored = dict(full, err="boom")
    legacy_no_oracle = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "no_oracle"}
    placeholder = {"err": None}

    newest = _load_rows_for(
        {3: {"a": full, "b": rows_only, "c": red, "d": errored,
             "e": legacy_no_oracle, "f": placeholder},
         5: {"a": full, "c": full}},
        monkeypatch, tmp_path)
    assert newest == {"a": 5, "b": 3, "c": 5}


def test_rotation_render_apply_roundtrip(monkeypatch, tmp_path):
    """--apply's block rewrite: the rendered DRIVER_PRIORITY block must
    substitute cleanly into a conformance-shaped file and parse back to
    exactly bad+never+stale in that order."""
    import ast
    import re

    import tools.rotate_driver_priority as rp

    block = rp.render_block(["red1"], ["n1", "n2", "n3"], ["s1"], [], rnd=8)
    src = ("X = 1\n\nDRIVER_PRIORITY = [\n    # old\n    \"zzz\",\n]\n\n"
           "def driver_ordered(d):\n    return d\n")
    target = tmp_path / "conformance.py"
    target.write_text(src)
    monkeypatch.setattr(rp, "CONFORMANCE", str(target))
    rp.apply_block(block)
    out = target.read_text()
    assert out.startswith("X = 1") and out.rstrip().endswith("return d")
    m = re.search(r"DRIVER_PRIORITY = (\[.*?\n\])\n", out, re.S)
    assert ast.literal_eval(m.group(1)) == ["red1", "n1", "n2", "n3", "s1"]
    assert "zzz" not in out


def test_rotation_compute_tiers(monkeypatch, tmp_path):
    """compute(): red keys keep head slots and are excluded from both
    the never and stale tiers (ADVICE r7 — no double listing); staleness
    is >4 rounds vs the target round, oldest first."""
    import json

    import tools.rotate_driver_priority as rp
    import tools.verification_ledger as vl

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False,
           "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"old1": g, "old2": g, "redkey": g}))
    (tmp_path / "CORRECTNESS_r06.json").write_text(
        json.dumps({"fresh": g, "redkey": bad}))
    monkeypatch.setattr(vl, "REPO", str(tmp_path))

    fake_keys = ["neverA", "neverB", "neverRowsOnly", "fresh", "old1",
                 "old2", "redkey"]
    import data_engineering__spark.conformance as conf
    monkeypatch.setattr(conf, "DRIVER_PRIORITY",
                        ["neverRowsOnly", "neverB", "neverA"])
    monkeypatch.setattr(conf, "QUERIES", {k: None for k in fake_keys})
    # neverRowsOnly has no oracle: it must sort BEHIND every oracle-backed
    # key — never AND stale tiers — even though it leads the current queue
    # (ADVICE r8: the two-window guard requires slots 1-100 hash-verifiable)
    monkeypatch.setattr(conf, "ORACLE",
                        {k: "SELECT 1" for k in fake_keys
                         if k != "neverRowsOnly"})

    badk, never, stale, rows_only, rnd = rp.compute(
        str(tmp_path / "CORRECTNESS_r06.json"))
    assert rnd == 6 and badk == ["redkey"]
    assert never == ["neverB", "neverA"]      # queue order preserved
    assert stale == ["old1", "old2"]          # r01 is 5 rounds old
    assert rows_only == ["neverRowsOnly"]     # rendered LAST, after stale
    # redkey has a stale r01 green row but rides the red tier only
    assert "redkey" not in stale and "redkey" not in never


def test_sweep_tool_slot_slice_is_driver_window_semantics():
    """tools/sweep_oracles.py --slots A-B must slice exactly the way the
    driver windows are quoted everywhere (1-indexed, inclusive): slots
    1-50 of a list IS its first 50 entries."""
    import tools.sweep_oracles as sw

    keys = [f"k{i}" for i in range(1, 121)]
    assert sw.parse_slots("1-50", keys) == keys[:50]
    assert sw.parse_slots("51-100", keys) == keys[50:100]
    assert sw.parse_slots("120-130", keys) == ["k120"]  # clamped tail


def test_scale_battery_excludes_only_the_documented_pair():
    """tools/sweep_oracles.py --scale-battery: the exclusion set must
    stay exactly the two fixtures whose brute-force oracles the
    synthetic upsample makes quadratic by construction — every one of
    the exclusions must be a REAL registry oracle (a stale name here
    would silently re-include the key), and every other oracle-backed
    key must be in the battery."""
    import tools.sweep_oracles as sw
    from data_engineering__spark import conformance as C

    assert sw.IMPRACTICAL_AT_SYNTHETIC_SF1 == {
        "containment_pairs_docs", "supplier_er_clusters"}
    assert sw.IMPRACTICAL_AT_SYNTHETIC_SF1 <= set(C.ORACLE)
    got = sw.battery_keys(C.ORACLE)
    assert got == sorted(set(C.ORACLE) - sw.IMPRACTICAL_AT_SYNTHETIC_SF1)
    assert len(got) == len(C.ORACLE) - 2


def test_scaled_testdata_offsets_stay_below_twin_sentinel():
    """tools/make_scaled_testdata.py: the per-copy key shift must keep
    every synthetic id far below the 1e12 twin-plant sentinel the
    fixture keys add, and cover exactly the repo's table registry."""
    import tools.make_scaled_testdata as mk

    from data_engineering__spark.sources.io import TABLES

    assert set(mk.KEY_COLUMNS) | set(mk.COPY_AS_IS) == set(TABLES)
    # 10 copies of sf10-sized ids still two orders below the sentinel
    assert 10 * mk.KEY_OFFSET + 10_000_000_000 < 1_000_000_000_000


def test_digest_stream_is_order_insensitive_multiset():
    """tests/oracle._digest_stream: the scale-probe digest must equal the
    Counter compare's semantics — order-independent, duplicate-sensitive,
    cell-normalization identical (floats → repr, Decimal → float) — and
    any single-cell change must move the digest."""
    from decimal import Decimal

    from tests.oracle import _digest_stream

    cols = ["b", "a"]
    rows = [(1, 0.5), (2, None), (1, 0.5)]
    n1, d1 = _digest_stream(cols, iter(rows))
    n2, d2 = _digest_stream(cols, iter(reversed(rows)))
    assert (n1, d1) == (n2, d2) == (3, d1)
    # Decimal('0.50') normalizes to the same cell as float 0.5
    _, d3 = _digest_stream(cols, iter([(1, Decimal("0.50")), (2, None),
                                       (1, 0.5)]))
    assert d3 == d1
    # duplicate-sensitive: dropping one copy of the dup row changes it
    _, d4 = _digest_stream(cols, iter(rows[:2]))
    assert d4 != d1
    # single-cell change changes it
    _, d5 = _digest_stream(cols, iter([(1, 0.5), (2, 7), (1, 0.5)]))
    assert d5 != d1
