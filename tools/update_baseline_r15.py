#!/usr/bin/env python3
"""One-shot: record the round-15 clean canonical bench (BENCH_LOCAL.json)
as BASELINE.json's internal_baseline_r15 block so every round-15 key has
a per-key baseline for round-16+ regression comparison. Refuses degraded
or partial records. Dev tool only."""
import json
import subprocess

bench = json.load(open("BENCH_LOCAL.json"))
assert not bench.get("degraded"), "refusing a degraded record as baseline"
assert not bench.get("partial"), "refusing a partial record as baseline"
assert bench.get("n_failed", 1) == 0, "refusing a record with failures"

commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()

base = json.load(open("BASELINE.json"))
base["internal_baseline_r15"] = {
    "note": ("Round-15 builder clean record (min-of-passes, commit %s, "
             "ambient loadavg %.2f). Carries the %d round-15 keys that had "
             "no baseline entry; for keys present in earlier blocks prefer "
             "round 10 (fastest host regime), then r11/r12. Compare per-key "
             "ratio DISTRIBUTIONS, never raw totals.") % (
                 commit, bench.get("loadavg_ambient", -1),
                 len([k for k in bench["queries"]
                      if k not in base.get("internal_baseline_r13", {}).get("queries", {})])),
    "commit": commit,
    "round": 15,
    "action": bench.get("action"),
    "passes": bench.get("passes"),
    "timing": bench.get("timing"),
    "sf": bench.get("sf"),
    "total_sec": bench.get("value"),
    "n_queries": bench.get("n_timed"),
    "n_failed": bench.get("n_failed"),
    "loadavg_ambient": bench.get("loadavg_ambient"),
    "queries": bench["queries"],
}
json.dump(base, open("BASELINE.json", "w"), indent=1)
print("recorded internal_baseline_r15: %d keys, %.1f s total" % (
    len(bench["queries"]), bench.get("value", -1)))
