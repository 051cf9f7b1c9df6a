#!/usr/bin/env python3
"""Fold N full-sweep Bench records into internal_baseline_r<N> (per-key
MIN across sweeps — the round-17/18 convention: min-of-sweeps absorbs
transient host steal; a degraded sweep's mins still feed the fold).

Usage:
  python3 tools/fold_round.py <round> <commit> <note> sweep1.json [sweep2.json ...]

Writes the block into BASELINE.json and prints the scorecard summary
vs the ratified block.
"""
import json, sys

def main():
    rnd = int(sys.argv[1]); commit = sys.argv[2]; note = sys.argv[3]
    sweeps = [json.load(open(f)) for f in sys.argv[4:]]
    assert sweeps, "need at least one sweep record"
    folded = {}
    for s in sweeps:
        for k, v in s["queries"].items():
            if v is not None and v > 0:
                folded[k] = min(folded.get(k, float("inf")), v)
    base = json.load(open("BASELINE.json"))
    base[f"internal_baseline_r{rnd}"] = {
        "note": note, "commit": commit, "round": rnd,
        "passes": sweeps[0].get("passes"),
        "timing": f"min-of-{len(sweeps)}-sweeps-of-min-of-{sweeps[0].get('passes')}",
        "substrate": sweeps[0].get("substrate_mode", "cold"),
        "sf": "0.1", "total_sec": round(sum(folded.values()), 1),
        "n_queries": len(folded),
        "queries": {k: round(v, 4) for k, v in sorted(folded.items())},
    }
    json.dump(base, open("BASELINE.json", "w"), indent=1)
    rat = base.get("ratified", {}).get("queries", {})
    ratios = sorted(folded[k] / rat[k] for k in folded if rat.get(k, 0) > 0)
    if ratios:
        def q(p): return ratios[min(len(ratios) - 1, int(p * (len(ratios) - 1)))]
        over = [(k, folded[k] / rat[k]) for k in folded
                if rat.get(k, 0) > 0 and folded[k] / rat[k] > 2.0]
        print(f"fold: {len(folded)} keys, total {sum(folded.values()):.1f}s; "
              f"vs ratified: n={len(ratios)} median={q(.5):.2f} p90={q(.9):.2f} "
              f"over2x={len(over)} {sorted(over, key=lambda x: -x[1])}")

if __name__ == "__main__":
    main()
