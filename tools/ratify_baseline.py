#!/usr/bin/env python3
"""Build the RATIFIED per-key baseline (round-17 consolidation) and emit
the over-2x scorecard against it.

Why: BASELINE.json accumulated 7 overlapping blocks under an
oldest-block-wins convention. The oldest (round-10) block was measured
on a demonstrably faster host regime — round 16's same-host worktree
A/Bs showed old code is NOT faster, i.e. the uniform ~1.44x per-key
median against r10 prices the HOST, not the plans. Grading against it
permanently hazes the scorecard. The regime break, documented once:

  - r10 block ('internal_baseline_sf0.1') and r11: dead fast-host
    regime (r11 additionally self-documents 1.5x steal inflation).
  - r12/r13/r15 blocks: a middle regime — internally consistent, but
    r15_final measured a UNIFORM per-key 1.25x vs r15 with no code
    delta (its own note), so they are not host-comparable to today.
  - r15_final + r16: the CURRENT regime — mutually consistent (r16
    vs r15_final per-key median 0.98x, A/B-adjudicated same-host).

Ratified value per key = the OLDEST value among the current-regime
blocks (r15_final first, r16 for keys it lacks), so the bar is the
strictest HOST-COMPARABLE measurement. Keys first measured later join
from their first clean record.

Usage:
  python3 tools/ratify_baseline.py            # (re)build 'ratified' into BASELINE.json
  python3 tools/ratify_baseline.py BENCH.json # scorecard: per-key ratio vs ratified
"""
import json, sys

BASELINE = "/root/repo/BASELINE.json"
# oldest-first: an earlier block's value wins for keys it carries, so
# the bar stays the strictest HOST-COMPARABLE measurement; keys first
# measured in a later round join from their first clean record.
CURRENT_REGIME_BLOCKS = ["internal_baseline_r15_final", "internal_baseline_r16",
                         "internal_baseline_r17", "internal_baseline_r18",
                         "internal_baseline_r19", "internal_baseline_r20"]


def build(d):
    queries = {}
    source = {}
    for block in CURRENT_REGIME_BLOCKS:  # oldest first wins
        for k, v in d[block]["queries"].items():
            if k not in queries and v is not None and v >= 0:
                queries[k] = v
                source[k] = block
    d["ratified"] = {
        "note": ("Ratified per-key baseline (round-17 convention): oldest value per key among the "
                 "HOST-COMPARABLE (current-regime) blocks "
                 f"{CURRENT_REGIME_BLOCKS}. The r10/r11 and r12-r15 blocks are "
                 "excluded as dead host regimes (uniform per-key deltas with no "
                 "code change; r16 same-host A/Bs adjudicated old code not faster "
                 "- see adjudication_r16/adjudication_r17). The 2x bar reads "
                 "against THIS block; older blocks stay for history only."),
        # Bench SF-gates its ratified comparisons on this stamp: every
        # current-regime block measured sf0.1, and a cross-SF ratio is
        # meaningless (an sf0.001 smoke once read 100x).
        "sf": "sf0.1",
        "blocks": CURRENT_REGIME_BLOCKS,
        "n_queries": len(queries),
        "queries": queries,
        "source_block": source,
    }
    return d


def scorecard(d, bench_path):
    bench = json.load(open(bench_path))
    ratified = d["ratified"]["queries"]
    rows = []
    for k, t in sorted(bench["queries"].items()):
        if t is None or t < 0:
            continue
        base = ratified.get(k)
        if base:
            rows.append((t / base, k, t, base))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > 2.0]
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else float("nan")
    print(f"{len(rows)} keys compared | median ratio {med:.2f} | {len(over)} over 2x")
    for ratio, k, t, base in over:
        print(f"  {ratio:5.2f}x  {k:32s} {t:7.3f}s  vs {base:7.3f}s")
    new = sorted(set(bench["queries"]) - set(ratified))
    if new:
        print(f"no baseline yet (first measured this round): {', '.join(new)}")


if __name__ == "__main__":
    d = json.load(open(BASELINE))
    d = build(d)
    with open(BASELINE, "w") as f:
        json.dump(d, f, indent=1)
    print(f"ratified block written: {d['ratified']['n_queries']} keys")
    if len(sys.argv) > 1:
        scorecard(d, sys.argv[1])
