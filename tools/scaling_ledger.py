#!/usr/bin/env python3
"""Cross-SF scaling ledger (round 19, verdict item 1).

Reads three Bench records (sf0.001, sf0.01, sf0.1), computes each
key's wall-time growth across the two 10x-ish data steps, normalizes
by the key's INPUT family growth (documents/embeddings deliberately do
NOT grow 10x per step in the driver's testdata), and emits:

  - SCALING.json          : the full per-key ledger
  - stdout markdown       : the SCALING section for BASELINE.md

Usage: python3 tools/scaling_ledger.py BENCH_sf0.001.json BENCH_sf0.01.json BENCH_sf0.1.json

Interpretation contract (written into the ledger):
  - t = c + a*n^e on n-scaled input with fixed per-query overhead c
    (session/JVM/task scheduling, ~0.1-0.5 s at local[32]); a ratio
    BELOW the data ratio is consistent with e <= 1.
  - A key is FLAGGED when its sf0.01->sf0.1 ratio exceeds
    1.6x its family's data ratio AND its sf0.1 time is over 0.75 s
    (sub-second keys are overhead + host noise, not data cost).
  - O(n^2)-BY-CONTRACT keys (exact oracle baselines / all-probe
    identity witnesses) are labeled and exempt: their job is to BE
    the quadratic reference the approximate tiers are priced against.
"""
import json, math, sys

# Keys whose declared contract is quadratic (oracle baselines and
# all-probe identity witnesses priced against serving tiers), or whose
# cost is deliberately rounds-driven rather than data-driven.
EXEMPT = {
    "ann_bruteforce_topk":  "O(n^2) BY CONTRACT: exact all-pairs baseline",
    "ann_filtered_topk":    "O(n^2) BY CONTRACT: exact filtered baseline",
    "knn_graph":            "O(n^2) BY CONTRACT: exact kNN graph baseline",
    "knn_graph_allprobe":   "O(n^2) BY CONTRACT: all-probe == brute identity witness",
    "ann_ivf_allprobe":     "all-probe identity witness (scores every cell)",
    "ann_filtered_allprobe": "all-probe identity witness (scores every cell)",
    "ann_ivfpq_allprobe":   "all-probe identity witness (scores every cell)",
    "ann_recall_report":    "prices ALL tiers incl. the exact baseline by definition",
    "dedup_embedding_cosine": "exact-verify stage over SRP-LSH candidates; candidate count grows superlinearly on the near-uniform test corpus by design",
    "knn_graph_ivf": "FIXED-DIAL contract: nCells is pinned for oracle replay, so candidates/node grow with cell occupancy (~n/nCells -> O(n^2/nCells) at a frozen dial); at scale the dial grows ~sqrt(n) (the standard IVF rule), restoring O(n*sqrt(n)) - the dial, not the plan, is what changes",
}

# Dominant input family per key family; per-key overrides below.
# data ratios (rows): step1 = sf0.001->sf0.01, step2 = sf0.01->sf0.1
FAMILY_RATIOS = {
    "tpch":       (10.0, 10.0),   # lineitem/orders/customer/part/supplier
    "events":     (10.0, 10.0),
    "documents":  (1.0, 10.0),    # 500 / 500 / 5000
    "embeddings": (1.0, 4.0),     # 500 / 500 / 2000
}

PREFIX_FAMILY = [
    ("ann_", "embeddings"), ("knn_", "embeddings"), ("kmeans", "embeddings"),
    ("embedding_", "embeddings"), ("stream_ann", "embeddings"),
    ("dedup_embedding", "embeddings"), ("dedup_incremental_embedding", "embeddings"),
    ("dedup_semantic", "embeddings"), ("semdedup", "embeddings"),
    ("dedup_", "documents"), ("text_", "documents"), ("token_", "documents"),
    ("langid", "documents"), ("top_ngrams", "documents"), ("doc_", "documents"),
    ("bm25", "documents"), ("inverted_index", "documents"),
    ("winnowing", "documents"), ("vocab_", "documents"),
    ("sample_", "documents"), ("pack_", "documents"), ("stream_pack", "documents"),
    ("mix_", "documents"), ("decontaminate", "documents"), ("corpus_", "documents"),
    ("seq_len", "documents"), ("bpe_", "documents"), ("pretrain", "documents"),
    ("curriculum", "documents"), ("shard_assign", "documents"),
    ("contamination", "documents"), ("split_leakage", "documents"),
    ("mm_", "documents"), ("paged_extract", "documents"),
    ("stream_dedup", "documents"),
]
OVERRIDES = {
    "stream_dedup_ids": "events",  # events-table dedup, not documents
    "doc_embedding_pool": "embeddings",
    # r20: hybrid fuses documents (bm25) + embeddings (IVF); documents
    # is the faster-growing input family, so it sets the bar
    "hybrid_rank_rrf": "documents",
    "hybrid_recall_report": "documents",
    "diversity_kcenter": "embeddings",
}

def family(key):
    if key in OVERRIDES:
        return OVERRIDES[key]
    for p, f in PREFIX_FAMILY:
        if key.startswith(p):
            return f
    return "tpch"   # TPC-H + events analytics/etl/graph/layout default

def main():
    f001, f01, f1 = sys.argv[1:4]
    recs = [json.load(open(f)) for f in (f001, f01, f1)]
    qs = [r["queries"] for r in recs]
    keys = sorted(set(qs[0]) & set(qs[1]) & set(qs[2]))
    ledger = {}
    flagged = []
    for k in keys:
        t = [qs[i].get(k, -1.0) for i in range(3)]
        if any(x is None or x <= 0 for x in t):
            continue
        fam = family(k)
        r1, r2 = FAMILY_RATIOS[fam]
        g1 = t[1] / t[0]
        g2 = t[2] / t[1]
        # growth exponent on the step where data actually grows
        e2 = math.log(g2) / math.log(r2) if r2 > 1 and g2 > 0 else None
        exempt = EXEMPT.get(k)
        flag = (exempt is None and t[2] > 0.75 and g2 > 1.6 * r2)
        ledger[k] = {
            "family": fam, "t_sf0.001": round(t[0], 3),
            "t_sf0.01": round(t[1], 3), "t_sf0.1": round(t[2], 3),
            "ratio_step1": round(g1, 2), "ratio_step2": round(g2, 2),
            "data_ratio_step2": r2,
            "exponent_step2": round(e2, 2) if e2 is not None else None,
            "contract_exempt": exempt, "flagged": flag,
        }
        if flag:
            flagged.append(k)
    out = {
        "inputs": {"sf0.001": f001, "sf0.01": f01, "sf0.1": f1},
        "loadavg_ambient": [r.get("loadavg_ambient") for r in recs],
        "degraded": [r.get("degraded") for r in recs],
        "n_keys": len(ledger), "n_flagged": len(flagged),
        "flagged": flagged, "keys": ledger,
    }
    json.dump(out, open("SCALING.json", "w"), indent=1)

    # markdown summary for BASELINE.md
    ratios = sorted(v["ratio_step2"] / v["data_ratio_step2"]
                    for v in ledger.values() if not v["contract_exempt"])
    def q(p):
        return ratios[min(len(ratios) - 1, int(p * (len(ratios) - 1)))]
    print(f"keys={len(ledger)} exempt={sum(1 for v in ledger.values() if v['contract_exempt'])} flagged={len(flagged)}")
    print(f"normalized step2 growth (time-ratio / data-ratio), non-exempt: "
          f"p10={q(.1):.2f} median={q(.5):.2f} p90={q(.9):.2f} max={ratios[-1]:.2f}")
    print("\nworst 15 non-exempt by normalized step2 growth:")
    rows = sorted(((v["ratio_step2"] / v["data_ratio_step2"], k, v)
                   for k, v in ledger.items() if not v["contract_exempt"]),
                  reverse=True)[:15]
    print("| key | family | t(0.001) | t(0.01) | t(0.1) | step2 ratio | data | norm | flag |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- | --- |")
    for norm, k, v in rows:
        print(f"| `{k}` | {v['family']} | {v['t_sf0.001']} | {v['t_sf0.01']} | "
              f"{v['t_sf0.1']} | {v['ratio_step2']} | {v['data_ratio_step2']} | "
              f"{norm:.2f} | {'FLAG' if v['flagged'] else ''} |")
    print("\nexempt (O(n^2)-by-contract / all-tier monitors):")
    for k, v in sorted(ledger.items()):
        if v["contract_exempt"]:
            print(f"| `{k}` | {v['t_sf0.01']} -> {v['t_sf0.1']} s | {v['contract_exempt']} |")

if __name__ == "__main__":
    main()
