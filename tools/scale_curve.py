#!/usr/bin/env python3
"""Build the scaling-curve record (BENCH_SCALE_r11.json) — round 10 adds
a THIRD decade and decomposition columns.

Inputs (all written by graft.Bench / graft.tools.PairCounts):
  - the committed sf0.1 official record (BENCH_LOCAL_r*.json, highest
    round) — decade 1;
  - an sf1 full-battery record (BENCH_FULL_<tag>_*.json against
    scaledata/sf1) — decade 2;
  - optionally, one or more sf10 records (BENCH_FULL or filtered-run
    stdout lines against scaledata/sf10 — e.g. the dedup/ANN family
    record plus the wide-battery extension record) — decade 3; several
    records merge per-query (min on collision, shuffle from the min's
    record);
  - optionally, pair-count JSON lines (graft.tools.PairCounts output)
    per sf, keyed by the "sf" field — emitted pair totals that decompose
    growth into workload (pairs grew) vs plan cost (sec/pair grew).

Each per-query row carries seconds per decade, growth factors, shuffle
read+write MB when the source record has shuffle_mb_rw, and pair counts
when provided. Stdout prints the SURVEY §9 growth table.

Usage:
  python3 tools/scale_curve.py SF1_RECORD.json [SF10_RECORD.json ...] \
      [pairs1.json pairs2.json ...]
"""
import glob
import json
import re
import statistics
import sys

args = sys.argv[1:]
pair_files = [a for a in args if "pair" in a]
rec_files = [a for a in args if a not in pair_files]
scale_file = rec_files[0]
sf10_files = rec_files[1:]

scale = json.load(open(scale_file))
sf10 = None
if sf10_files:
    parts = [json.load(open(f)) for f in sf10_files]
    sf10 = {"queries": {}, "shuffle_mb_rw": {},
            "loadavg": " | ".join(p.get("loadavg", "") for p in parts)}
    for p in parts:
        for q, t in p["queries"].items():
            if q not in sf10["queries"] or t < sf10["queries"][q]:
                sf10["queries"][q] = t
                m = p.get("shuffle_mb_rw", {}).get(q)
                if m:
                    sf10["shuffle_mb_rw"][q] = m

locals_ = sorted(glob.glob("BENCH_LOCAL_r*.json"),
                 key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
base = json.load(open(locals_[-1]))

# pair counts: {sf_dir_suffix: {query: n}}
pairs = {}
for pf in pair_files:
    d = json.load(open(pf))
    key = d["sf"].rstrip("/").split("/")[-1]  # sf0.1 / sf1 / sf10
    pairs[key] = d["pairs"]


def shuf(rec, q):
    m = (rec or {}).get("shuffle_mb_rw", {}).get(q)
    if m:
        return round(m[0] + m[1], 1)
    # curated merge records carry combined r+w for rows inherited from a
    # prior curve (the per-direction split lives in that curve's sources)
    c = (rec or {}).get("shuffle_mb", {}).get(q)
    return round(c, 1) if c is not None else None


sq, bq = scale["queries"], base["queries"]
tq = sf10["queries"] if sf10 else {}
common = sorted(set(sq) & set(bq))
rows = []
for q in common:
    b, s = bq[q], sq[q]
    row = {"query": q, "sf01_s": b, "sf1_s": s,
           "growth": round(s / b, 2) if b > 0 else None}
    if shuf(scale, q) is not None:
        row["sf1_shuffle_mb"] = shuf(scale, q)
    if q in tq:
        row["sf10_s"] = tq[q]
        row["growth10"] = round(tq[q] / s, 2) if s > 0 else None
        if shuf(sf10, q) is not None:
            row["sf10_shuffle_mb"] = shuf(sf10, q)
    for sf_key, label in (("sf0.1", "pairs_sf01"), ("sf1", "pairs_sf1"),
                          ("sf10", "pairs_sf10")):
        if q in pairs.get(sf_key, {}):
            row[label] = pairs[sf_key][q]
    rows.append(row)

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
if sf10:
    fam = sorted(set(tq) & set(sq))
    out["sf10_source"] = sf10_files
    out["sf10_loadavg"] = sf10.get("loadavg")
    out["sf10_family"] = fam
    out["sf10_family_total_s"] = round(sum(tq[q] for q in fam), 3)
    out["sf1_family_total_s"] = round(sum(sq[q] for q in fam), 3)

with open("BENCH_SCALE_r15.json", "w") as f:
    json.dump(out, f, indent=1)

rows.sort(key=lambda r: -(r["growth"] or 0))
print(f"total: sf0.1 {out['sf01_total_s']}s -> sf1 {out['sf1_total_s']}s "
      f"({out['sf1_total_s']/out['sf01_total_s']:.2f}x at 10x rows, "
      f"{len(common)} queries)")
print("\n| query | sf0.1 s | sf1 s | growth | sf1 shMB |"
      "\n|---|---|---|---|---|")
for r in rows[:20]:
    print(f"| {r['query']} | {r['sf01_s']:.2f} | {r['sf1_s']:.2f} "
          f"| {r['growth']}x | {r.get('sf1_shuffle_mb', '')} |")
over = [r for r in rows if (r["growth"] or 0) > 10]
print(f"\n>10x growth (flagged): {[r['query'] for r in over] or 'none'}")
g = [r["growth"] for r in rows if r["growth"]]
print(f"growth median {statistics.median(g):.2f}x, "
      f"p90 {sorted(g)[int(len(g)*0.9)]:.2f}x, max {max(g):.2f}x")

if sf10:
    print("\nthird decade (dedup/ANN family, sf1 -> sf10 at 10x rows):")
    print("| query | sf1 s | sf10 s | growth | pairs sf1 | pairs sf10 "
          "| pair growth | s/Mpair sf1 | s/Mpair sf10 |")
    print("|---|---|---|---|---|---|---|---|---|")
    skipped = []
    for q in out["sf10_family"]:
        # a query new this round has sf1/sf10 rows but no decade-1 base
        # entry yet (next official record supplies it) — skip the print,
        # the record still carries its sf1/sf10 seconds
        r = next((r for r in rows if r["query"] == q), None)
        if r is None:
            skipped.append(q)
            continue
        p1, p10 = r.get("pairs_sf1"), r.get("pairs_sf10")
        pg = round(p10 / p1, 2) if p1 and p10 else ""
        spp1 = round(r["sf1_s"] / p1 * 1e6, 2) if p1 else ""
        spp10 = round(r["sf10_s"] / p10 * 1e6, 2) if p10 else ""
        print(f"| {q} | {r['sf1_s']:.2f} | {r['sf10_s']:.2f} "
              f"| {r.get('growth10')}x | {p1} | {p10} | {pg} "
              f"| {spp1} | {spp10} |")
    # no silent caps: name every family row the table dropped
    if skipped:
        print(f"\nskipped {len(skipped)} family rows with no decade-1 "
              f"base yet: {skipped}")
