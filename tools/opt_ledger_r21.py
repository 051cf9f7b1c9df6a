#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r21.md per-operator ledger table from the
round's bench records: per key, the best clean r21 measurement, the
ratio vs the ratified bar and vs the r20 driver record, plus the
r21 disposition (changed / adjudicated / examined-clean)."""
import json, sys

RECORDS = sys.argv[1:] or ["BENCH_R21_A_cc240.json", "BENCH_R21_B_cc512.json"]
recs = [json.load(open(f)) for f in RECORDS]
rat = json.load(open("BASELINE.json"))["ratified"]["queries"]
r20 = json.load(open("BENCH_LOCAL_PREV.json"))  # driver r20 record (pre-r21 canonical)
q20 = r20["queries"]

best = {}
for r in recs:
    for k, v in r["queries"].items():
        if v and v > 0:
            best[k] = min(best.get(k, float("inf")), v)

CHANGED = {
    "attribution_last_touch": "CHANGED: window fused (2 Window ops -> 1) + denominator from cached rollup (second events scan removed)",
    "stream_attribution": "CHANGED: shares the fused single-Window credit log",
    "stream_pack_tws": "CHANGED: schema-seeded sink read + scratch-dir cleanup (ADVICE); plan unchanged",
    "diversity_kcenter": "CHANGED: n>=k contract guard (one count over the frame the loop reuses); plan unchanged",
}
ADJUDICATED = {
    "knn_graph": "O(n^2)-by-contract exact baseline (oracle-checked); 100 TB path is knn_graph_ivf",
    "knn_graph_allprobe": "allprobe identity witness of the IVF road; O(n^2/nCells) honest dial",
    "knn_graph_ivf": "fixed-dial O(n^2/nCells), sqrt(n) dial rule documented",
    "ann_bruteforce_topk": "exact baseline by contract",
    "ann_recall_report": "5-tier recall monitor - inherently plan-heavy (78 Exchanges) and codegen-heavy; monitor, not a serving path",
    "hybrid_recall_report": "fusion-quality monitor, same class",
    "graph_pagerank": "one-Exchange-per-round carry trade; checkpoint-stride A/B measured r17 (neutral)",
    "graph_label_prop": "one-Exchange-per-round; max_by sortless winner agg since r18; bar re-ratified r21 (adjudication_r21)",
    "graph_label_prop_delta": "delta-frontier sibling, same shape",
    "profile_columns": "exact multi-distinct is oracle-mandated (Expand x5); 100 TB swap is profile_columns_approx (same plan, HLL)",
    "partition_stats": "deliberate O(F log F) trade (adjudication_r20)",
    "dedup_edit_distance": "banded candidate gen + bounded DP by contract",
}
print("| key | r21 best s | vs ratified | vs r20 driver | disposition |")
print("| --- | --- | --- | --- | --- |")
for k in sorted(best):
    t = best[k]
    rr = f"{t/rat[k]:.2f}x" if rat.get(k, 0) > 0 else "-"
    dr = f"{t/q20[k]:.2f}x" if q20.get(k, 0) > 0 else "-"
    disp = CHANGED.get(k) or ADJUDICATED.get(k) or "examined: plan audited (PLANS.md r21 regen), no structural change needed"
    print(f"| {k} | {t:.2f} | {rr} | {dr} | {disp} |")
