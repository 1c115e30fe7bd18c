#!/usr/bin/env python3
"""Build the two-decade scaling-curve record (BENCH_SCALE_r9.json).

Joins the sf1-equivalent full-battery record (BENCH_FULL_<tag>_*.json,
written by graft.Bench against scaledata/sf1) with the committed sf0.1
official record (BENCH_LOCAL_r*.json, highest round) and emits:

  - BENCH_SCALE_r9.json: per-query sf0.1 + sf1 seconds and growth factor
    (sf1/sf0.1), plus totals and run metadata;
  - a markdown growth table on stdout (top movers) for SURVEY §9.

Growth interpretation at 10x rows: <=1.5x = fixed overheads dominate
(the query has scale headroom); ~2-10x = sublinear-to-linear (healthy);
>10x flagged for a written rationale or a fix.

Usage: python3 tools/scale_curve.py BENCH_FULL_r9scale_<ts>.json
"""
import glob
import json
import re
import sys

scale_file = sys.argv[1]
scale = json.load(open(scale_file))

locals_ = sorted(glob.glob("BENCH_LOCAL_r*.json"),
                 key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
base = json.load(open(locals_[-1]))

sq, bq = scale["queries"], base["queries"]
common = sorted(set(sq) & set(bq))
rows = []
for q in common:
    b, s = bq[q], sq[q]
    rows.append({"query": q, "sf01_s": b, "sf1_s": s,
                 "growth": round(s / b, 2) if b > 0 else None})

out = {
    "metric": "scale_curve",
    "sf01_total_s": round(sum(bq[q] for q in common), 3),
    "sf1_total_s": round(sum(sq[q] for q in common), 3),
    "n_common": len(common),
    "sf01_source": locals_[-1],
    "sf1_source": scale_file,
    "sf1_loadavg": scale.get("loadavg"),
    "sf1_ts_ms": scale.get("ts_ms"),
    "replicas": 10,
    "queries": rows,
}
with open("BENCH_SCALE_r9.json", "w") as f:
    json.dump(out, f, indent=1)

rows.sort(key=lambda r: -(r["growth"] or 0))
print(f"total: sf0.1 {out['sf01_total_s']}s -> sf1 {out['sf1_total_s']}s "
      f"({out['sf1_total_s']/out['sf01_total_s']:.2f}x at 10x rows, "
      f"{len(common)} queries)")
print("\n| query | sf0.1 s | sf1 s | growth |\n|---|---|---|---|")
for r in rows[:20]:
    print(f"| {r['query']} | {r['sf01_s']:.2f} | {r['sf1_s']:.2f} "
          f"| {r['growth']}x |")
over = [r for r in rows if (r["growth"] or 0) > 10]
print(f"\n>10x growth (flagged): {[r['query'] for r in over] or 'none'}")
import statistics
g = [r["growth"] for r in rows if r["growth"]]
print(f"growth median {statistics.median(g):.2f}x, "
      f"p90 {sorted(g)[int(len(g)*0.9)]:.2f}x, max {max(g):.2f}x")
