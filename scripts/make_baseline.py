#!/usr/bin/env python3
"""Pin the committed per-query performance baseline.

Reads a full bench stats file (target/bench_stats.json — the
min-of-3-per-query record Bench writes every run) and emits
BASELINE_PERF.json at the repo root in the exact shape
graft.Bench.parseBaseline expects:

  {"sf":"/root/testdata/sf0.1","recorded":"<label>","passes":3,
   "queries":{"q1_agg":{"min":0.123,"slope":2.1}, ...}}

Bench then diffs every future run at the same scale factor against
this file: min-of-3 > 3x baseline min (+0.5s absolute) triggers one
automatic retry pass, and a query still over threshold after the
retry lands in the metric line's "regressions" field.

Usage: python3 scripts/make_baseline.py [stats_json] [label]
"""
import json
import sys

stats_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_stats.json"
label = sys.argv[2] if len(sys.argv) > 2 else "unlabeled"

with open(stats_path) as f:
    stats = json.load(f)

queries = {}
for name, q in sorted(stats["queries"].items()):
    entry = {"min": q["min"]}
    if "slope" in q:
        entry["slope"] = q["slope"]
    queries[name] = entry

out = {
    "sf": stats["sf"],
    "recorded": label,
    "passes": stats.get("passes", 3),
    "queries": queries,
}
with open("BASELINE_PERF.json", "w") as f:
    # compact separators: Bench's regex parser expects {"min": right
    # after each query key's opening brace (whitespace-tolerant, but
    # keep the canonical form canonical)
    json.dump(out, f, separators=(",", ":"), indent=None)
    f.write("\n")
print(f"BASELINE_PERF.json: {len(queries)} queries from {stats_path} ({label})")
