#!/usr/bin/env python3
"""Build the official BENCH_LOCAL_r{N}.json from 3+ clean full-battery
records (the round-11 protocol: per-query min over warmth-controlled
runs; shuffle bytes from the run that produced each query's min).

Usage: python3 tools/merge_local.py N BENCH_FULL_a.json BENCH_FULL_b.json ...
"""
import json
import sys

n = sys.argv[1]
files = sys.argv[2:]
recs = [json.load(open(f)) for f in files]
assert len({r["sf"] for r in recs}) == 1, "mixed scale factors"
queries, shuf = {}, {}
for r in recs:
    for q, t in r["queries"].items():
        if q not in queries or t < queries[q]:
            queries[q] = t
            m = r.get("shuffle_mb_rw", {}).get(q)
            if m:
                shuf[q] = m
out = {
    "metric": "total",
    "value": round(sum(t for q, t in queries.items()
                       if not q.endswith("_cold")), 3),
    "unit": "sec",
    "queries": queries,
    "sf": recs[0]["sf"],
    "n_queries": len([q for q in queries if not q.endswith("_cold")]),
    "note": ("per-query min over %d clean full runs (%s), "
             "warmth-controlled protocol: corpus pre-touch + 1 untimed "
             "warm run + 3 timed, min per run, min across runs"
             % (len(files), ", ".join(files))),
    "loadavgs": [r.get("loadavg", "") for r in recs],
    "ts_ms": max(r["ts_ms"] for r in recs),
    "shuffle_mb_rw": shuf,
}
path = "BENCH_LOCAL_r%s.json" % n
json.dump(out, open(path, "w"), indent=1)
print(path, "total", out["value"], "n", out["n_queries"])
