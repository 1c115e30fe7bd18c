#!/usr/bin/env python3
"""Offline BPE merge-table trainer (artifact generator, NOT runtime code).

Trains a classic byte-pair-encoding merge table on the lowercase letter-run
pre-tokens of the sf0.01 `documents` corpus and writes it to
src/main/resources/bpe_merges.txt (one "left right" pair per line, rank
order).  The runtime (graft.textanalysis.Bpe) and the DuckDB oracle both
apply these merges in rank order with a left-to-right non-overlapping pass
per rule — the exact convention used here during training, so application
is training-faithful.

Determinism: best pair by (frequency desc, then (l, r) lexicographic asc).
A candidate merge whose concatenated output string equals an already-vocab'd
symbol is skipped so every symbol string has exactly one id (the runtime
relies on this for its symbol -> id map).

Usage: python3 tools/train_bpe.py [n_merges] [sf_dir]
"""
import sys
import duckdb

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 48
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = "src/main/resources/bpe_merges.txt"

con = duckdb.connect()
rows = con.execute(
    f"""SELECT w, count(*) c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) w
          FROM read_parquet('{SF_DIR}/documents.parquet'))
        GROUP BY 1 ORDER BY 1"""
).fetchall()

# word -> (symbol tuple, freq)
vocab = {w: [list(w), c] for w, c in rows}
symbols = set(chr(ch) for ch in range(ord("a"), ord("z") + 1))
merges = []

def merge_pass(syms, l, r):
    """Left-to-right non-overlapping single pass (the runtime convention)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out

while len(merges) < N_MERGES:
    pairs = {}
    for syms, c in vocab.values():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + c
    # skip candidates whose output string collides with an existing symbol
    cands = {p: c for p, c in pairs.items() if p[0] + p[1] not in symbols}
    if not cands:
        break
    best = min(cands.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append(best)
    symbols.add(best[0] + best[1])
    for entry in vocab.values():
        entry[0] = merge_pass(entry[0], *best)

with open(OUT, "w") as f:
    for l, r in merges:
        f.write(f"{l} {r}\n")

print(f"wrote {len(merges)} merges to {OUT}")
for w, (syms, c) in sorted(vocab.items()):
    print(f"  {w:>10} -> {' '.join(syms)}")
