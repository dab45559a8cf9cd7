"""Static perf-discipline audits over the package source (round 8).

VERDICT r7 verified by hand that the package has no row-at-a-time
``F.udf``, no ``toPandas()``, and that all 20 ``.collect()`` sites are
bounded driver-side probes (1-row scalars, k×d centroid tables,
per-partition count maps, CC convergence checks). Hand audits rot; this
test makes the claims structural: an AST walk over every module, with an
explicit allowlist for collect sites. Adding a new ``.collect()`` fails
the suite until the site is listed here with its boundedness argument —
the same empty-allowlist philosophy as the plan audits, applied to the
driver-memory axis.
"""
from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data_engineering__spark")

# (module-relative path, enclosing function) ->
#     (expected site COUNT, why each collect is bounded).
# The count pins the audit exactly: without it, a NEW .collect() added to
# an already-allowlisted function would pass silently (ADVICE r8).
COLLECT_ALLOWLIST = {
    ("conformance.py", "did_report_events"):
        (1, "1-row scalar probe (pre-period group means)"),
    ("conformance.py", "cuped_report_events"):
        (1, "1-row scalar probe (theta covariance terms)"),
    ("plans/pipeline.py", "ingest_incremental"):
        (1, "1-row scalar probe (max load date watermark)"),
    ("plans/pipeline.py", "enrich"):
        (1, "bounded unseen-title list for the HTTP side-channel "
            "(quota-capped)"),
    ("operators/analytics.py", "markov_attribution"):
        (1, "|states|^2 transition matrix (event-type vocabulary, not rows)"),
    ("operators/analytics.py", "markov_stationary"):
        (1, "|states|^2 transition matrix (event-type vocabulary, not "
            "rows) — driver power iteration, markov_attribution precedent"),
    ("operators/analytics.py", "funnel_within"):
        (1, "k-row funnel-step counts (k = number of steps)"),
    ("operators/dedup.py", "connected_components"):
        (2, "1-row convergence check per iteration (changed-count)"),
    ("operators/dedup.py", "connected_components_star"):
        (1, "1-row convergence check per iteration"),
    ("operators/merge.py", "assign_ids"):
        (1, "per-partition count map (numPartitions rows)"),
    ("operators/merge.py", "dim_upsert"):
        (1, "1-row scalar probe (current max surrogate id)"),
    ("operators/vector.py", "ivf_assign"):
        (1, "INDEX_CELL_CAP x d centroid table into the Arrow kernel"),
    ("operators/vector.py", "cos_grid_pandas"):
        (1, "anchor-capped query grid (<= EVAL_ANCHOR_CAP rows by the "
            "sample_bounded contract) into the Arrow scoring kernel"),
    ("operators/vector.py", "kmeans_assign"):
        (1, "k x d centroid table broadcast via literal array"),
    ("operators/vector.py", "kmeans_fit"):
        (1, "k x d centroid table per Lloyd pass"),
    ("operators/vector.py", "_kmeans_update_sums"):
        (1, "k x d centroid table into the partial-sum Arrow kernel"),
    ("operators/vector.py", "ivf_topk_trained"):
        (1, "nprobe-row probed-cell list"),
    ("operators/vector.py", "semantic_dedup"):
        (1, "k x d centroid table (two Lloyd passes)"),
    ("operators/vector.py", "pq_encode"):
        (1, "m x 256 x (d/m) codebook table"),
    ("operators/vector.py", "ivfpq_topk"):
        (3, "codebooks + probed-cell list + ADC LUT (all k/m-sized)"),
    ("operators/vector.py", "ivf_nprobe_curve"):
        (1, "per-nprobe recall grid (len(nprobes) rows)"),
}


def _scan():
    hits = []
    for root, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            tree = ast.parse(open(path).read())

            class V(ast.NodeVisitor):
                def __init__(self):
                    self.stack = ["<module>"]

                def visit_FunctionDef(self, n):
                    self.stack.append(n.name)
                    self.generic_visit(n)
                    self.stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_Call(self, n):
                    fn = n.func
                    if isinstance(fn, ast.Attribute) and fn.attr in (
                            "collect", "toPandas"):
                        hits.append((fn.attr, rel, self.stack[-1], n.lineno))
                    if (isinstance(fn, ast.Attribute) and fn.attr == "udf") \
                            or (isinstance(fn, ast.Name) and fn.id == "udf"):
                        hits.append(("udf", rel, self.stack[-1], n.lineno))
                    self.generic_visit(n)

            V().visit(tree)
    return hits


def test_no_topandas_no_row_udf_and_all_collects_allowlisted():
    hits = _scan()
    assert [h for h in hits if h[0] == "toPandas"] == []
    assert [h for h in hits if h[0] == "udf"] == []
    unlisted = [h for h in hits if h[0] == "collect"
                and (h[1], h[2]) not in COLLECT_ALLOWLIST]
    assert unlisted == [], (
        "new .collect() site(s) — add to COLLECT_ALLOWLIST with a "
        f"boundedness argument: {unlisted}")
    # exact per-function site counts: a new collect inside an already
    # allowlisted function must fail too, not ride the existing entry
    from collections import Counter
    live = Counter((h[1], h[2]) for h in hits if h[0] == "collect")
    wrong = {k: (live.get(k, 0), n) for k, (n, _why) in
             COLLECT_ALLOWLIST.items() if live.get(k, 0) != n}
    assert wrong == {}, (
        "collect-site count drifted (live, allowlisted) — re-audit the "
        f"function's boundedness and update the count: {wrong}")


def test_collect_allowlist_carries_no_dead_entries():
    """An allowlist entry whose site no longer exists is audit rot in the
    other direction — prune it so the list stays exactly the live sites."""
    live = {(h[1], h[2]) for h in _scan() if h[0] == "collect"}
    dead = [k for k in COLLECT_ALLOWLIST if k not in live]
    assert dead == [], f"prune dead allowlist entries: {dead}"
