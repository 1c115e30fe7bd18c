#!/usr/bin/env python3
"""Offline BPE merge-table trainer (artifact generator, NOT runtime code).

Default mode trains a classic byte-pair-encoding merge table on the
lowercase letter-run pre-tokens of the sf0.01 `documents` corpus and
writes it to src/main/resources/bpe_merges.txt (one "left right" pair per
line, rank order).  The runtime (graft.textanalysis.Bpe) and the DuckDB
oracle both apply these merges in rank order with a left-to-right
non-overlapping pass per rule — the exact convention used here during
training, so application is training-faithful.

Determinism: best pair by (frequency desc, then (l, r) lexicographic asc).
A candidate merge whose concatenated output string equals an already-vocab'd
symbol is skipped so every symbol string has exactly one id (the runtime
relies on this for its symbol -> id map).

Usage:
  python3 tools/train_bpe.py [n_merges] [sf_dir]
  python3 tools/train_bpe.py <n_merges> --synthetic [out_file]

Synthetic mode (production-scale artifact): the test corpus has a 31-word
pool — far too small to train a realistic-size merge table — so this mode
trains on a DETERMINISTIC synthetic vocabulary (the FIXTURES.md pattern):
~30k distinct words composed from a 420-syllable pool (CV/CVC/VCVC
shapes, LCG-seeded), Zipf frequencies 1e6/rank, plus the real corpus
vocabulary at high frequency so the trained table genuinely compresses
the corpus words the declared query encodes.  Shared syllable structure
gives the merge table real morphology to learn, exactly like
natural-language BPE.  Training uses the EFFICIENT form (pair-count
index + lazy-deletion heap + per-pair word index, the standard fast-BPE
training shape); candidate selection is identical to the reference loop
(max frequency, ties by (l, r) lexicographic asc, collision candidates
banned), cross-checked by reproducing the committed 48-rule table.
"""
import heapq
import sys
from collections import defaultdict

import duckdb

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 48
SYNTHETIC = "--synthetic" in sys.argv
SF_DIR = (sys.argv[2] if len(sys.argv) > 2 and not SYNTHETIC
          else "/root/testdata/sf0.01")
OUT = "src/main/resources/bpe_merges.txt"

con = duckdb.connect()
rows = con.execute(
    f"""SELECT w, count(*) c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) w
          FROM read_parquet('{SF_DIR}/documents.parquet'))
        GROUP BY 1 ORDER BY 1"""
).fetchall()


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


def train_reference(word_freq, n_merges):
    """The straightforward quadratic loop (kept as the semantic spec)."""
    vocab = {w: [list(w), c] for w, c in sorted(word_freq.items())}
    symbols = set(chr(ch) for ch in range(ord("a"), ord("z") + 1))
    merges = []
    while len(merges) < n_merges:
        pairs = {}
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        cands = {p: c for p, c in pairs.items() if p[0] + p[1] not in symbols}
        if not cands:
            break
        best = min(cands.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        symbols.add(best[0] + best[1])
        for entry in vocab.values():
            entry[0] = merge_pass(entry[0], *best)
    return merges, vocab


def train_fast(word_freq, n_merges):
    """Same selection rule, heap + incremental pair counts (scales to 8k)."""
    vocab = [[list(w), c] for w, c in sorted(word_freq.items())]
    symbols = set(chr(ch) for ch in range(ord("a"), ord("z") + 1))
    pair_count = defaultdict(int)
    pair_words = defaultdict(set)

    def scan(idx, sign):
        syms, c = vocab[idx]
        touched = set()
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] += sign * c
            touched.add(p)
            if sign > 0:
                pair_words[p].add(idx)
        return touched

    for idx in range(len(vocab)):
        scan(idx, +1)
    heap = [(-c, p) for p, c in pair_count.items()]
    heapq.heapify(heap)

    merges, banned = [], set()
    while len(merges) < n_merges and heap:
        negc, p = heapq.heappop(heap)
        if p in banned or pair_count.get(p, 0) != -negc or -negc <= 0:
            continue
        if p[0] + p[1] in symbols:
            banned.add(p)
            continue
        merges.append(p)
        symbols.add(p[0] + p[1])
        touched = set()
        for idx in list(pair_words[p]):
            syms, _ = vocab[idx]
            touched |= scan(idx, -1)
            vocab[idx][0] = merge_pass(syms, *p)
            touched |= scan(idx, +1)
        pair_count.pop(p, None)
        pair_words.pop(p, None)
        for t in touched:
            if t != p and pair_count.get(t, 0) > 0:
                heapq.heappush(heap, (-pair_count[t], t))
    return merges


def synth_vocab(n_words=30000):
    state = 1234567891

    def rnd(n):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (state >> 33) % n

    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    syls = []
    for _ in range(420):
        pat = rnd(3)
        s = consonants[rnd(len(consonants))] + vowels[rnd(len(vowels))]
        if pat > 0:
            s += consonants[rnd(len(consonants))]
        if pat == 2:
            s = vowels[rnd(len(vowels))] + s
        syls.append(s)
    words = {}
    attempts = 0
    while len(words) < n_words and attempts < n_words * 50:
        attempts += 1
        n = 1 + rnd(4) + (1 if rnd(3) == 0 else 0)
        w = "".join(syls[rnd(len(syls))] for _ in range(n))
        if w not in words:
            words[w] = max(1, 1000000 // (len(words) + 1))
    return words


if SYNTHETIC:
    out8k = (sys.argv[3] if len(sys.argv) > 3
             else "src/main/resources/bpe_merges_8k.txt")
    # cross-check: the fast trainer reproduces the committed 48-rule table
    corpus_freq = {w: c for w, c in rows}
    fast48 = train_fast(corpus_freq, 48)
    ref48 = [tuple(l.split())
             for l in open("src/main/resources/bpe_merges.txt")]
    assert fast48 == ref48, "fast trainer diverges from the reference loop"
    print("fast trainer reproduces the committed 48-rule table")

    wf = synth_vocab()
    for w, c in rows:  # corpus words ride at high frequency
        wf[w] = wf.get(w, 0) + 5000000
    table = train_fast(wf, N_MERGES)
    with open(out8k, "w") as f:
        for l, r in table:
            f.write(f"{l} {r}\n")
    print(f"wrote {len(table)} merges to {out8k} (vocab {len(wf)} words)")
    sys.exit(0)

merges, vocab = train_reference({w: c for w, c in rows}, N_MERGES)
with open(OUT, "w") as f:
    for l, r in merges:
        f.write(f"{l} {r}\n")

print(f"wrote {len(merges)} merges to {OUT}")
for w, (syms, c) in sorted(vocab.items()):
    print(f"  {w:>10} -> {' '.join(syms)}")
