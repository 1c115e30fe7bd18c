#!/usr/bin/env python3
"""Offline quality-classifier trainer (artifact generator, NOT runtime code).

Trains a fastText-style linear classifier — logistic regression over the
32-dim feature-hashed bag of words (the hashing-trick vectorizer of
graft.textanalysis.TextAnalysis.hashVectors) — to DISTILL the heuristic
composite quality score (q_text_quality) into one broadcastable weight
vector, and writes it to src/main/resources/quality_clf.txt:

    bias <b>
    <dim> <w_dim>        (one line per dimension, 6-decimal fixed point)

The runtime (graft.textanalysis.QualityClassifier) computes
logit = bias + (Σ_tokens w_{h48(tok) mod 32}) / n_tok — exactly the
mean-of-hashed-features · weights dot product optimized here.

Determinism: zero init, fixed learning rate and iteration count, data
read in doc_id order; reruns write byte-identical artifacts.

Usage: python3 tools/train_classifier.py [sf_dir]
"""
import hashlib
import math
import sys

import duckdb

SF_DIR = (sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "--synthetic"
          else "/root/testdata/sf0.01")
OUT = "src/main/resources/quality_clf.txt"
DIM = 256            # QualityClassifier.ClfDim (independent of HashVecDim)
THRESHOLD = 0.35      # TextAnalysis.QualityThreshold
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it",
             "on", "for")  # TextAnalysis.QualityStopwords
ITERS = 20000
LR = 8.0


def h48(w: str) -> int:
    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:12], 16)


# --------------------------------------------------------------------------
# Production-scale artifact mode:
#   python3 tools/train_classifier.py --synthetic [dim] [out]
# (default dim 4096 -> src/main/resources/quality_clf_4k.txt).
#
# The 500-doc/31-word corpus cannot ground a realistic hash-space width,
# so this mode trains on a DETERMINISTIC synthetic corpus (the FIXTURES.md
# / train_bpe.py pattern): 2,000 docs of 10-60 words drawn from an
# LCG-seeded 4,000-word syllable vocabulary with stopwords injected at a
# per-doc rate, labeled by the SAME heuristic quality formula the 256-dim
# model distills (stopword ratio + distinct ratio + length term against
# THRESHOLD).  Training is the same full-batch logistic regression with
# SPARSE gradients (dense DIM-loops are infeasible at 4k+), zero init,
# fixed LR -- byte-identical artifacts on rerun.
# --------------------------------------------------------------------------
if "--synthetic" in sys.argv:
    args = [a for a in sys.argv[1:] if a != "--synthetic"]
    dim = int(args[0]) if args else 4096
    out = args[1] if len(args) > 1 else "src/main/resources/quality_clf_4k.txt"

    state = 24680135791
    def rnd(n):
        global state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (state >> 33) % n

    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    syls = []
    for _ in range(300):
        pat = rnd(3)
        w = consonants[rnd(len(consonants))] + vowels[rnd(len(vowels))]
        if pat > 0:
            w += consonants[rnd(len(consonants))]
        syls.append(w)
    pool = []
    while len(pool) < 4000:
        w = "".join(syls[rnd(len(syls))] for _ in range(1 + rnd(3)))
        pool.append(w)
    stop = list(STOPWORDS)

    docs = []
    for _ in range(2000):
        n = 10 + rnd(51)
        srate = rnd(40)          # stopword percentage 0..39
        # repetition pressure: a quarter of docs draw from tiny slices of
        # the vocabulary (degenerate boilerplate), so the distinct-ratio
        # term actually splits the label around the threshold
        width = [len(pool), len(pool), 40, 4][rnd(4)]
        toks = [stop[rnd(len(stop))] if rnd(100) < srate
                else pool[rnd(width)] for _ in range(n)]
        docs.append(toks)

    def quality(toks):
        n = float(len(toks))
        s = sum(1 for w in toks if w in STOPWORDS) / n
        d = len(set(toks)) / n
        al = min(sum(len(w) for w in toks) / n, 8.0) / 8.0
        return 0.4 * s + 0.4 * d + 0.2 * al

    examples = []
    for toks in docs:
        x = {}
        for w in toks:
            i = h48(w) % dim
            x[i] = x.get(i, 0.0) + 1.0
        n = float(len(toks))
        xs = {i: v / n for i, v in x.items()}
        examples.append((xs, 1.0 if quality(toks) >= THRESHOLD else 0.0))
    n_pos = sum(1 for _, y in examples if y > 0.5)
    print(f"synthetic corpus: {len(examples)} docs, {n_pos} positive")

    w = [0.0] * dim
    b = 0.0
    for it in range(2000):
        gw = {}
        gb = 0.0
        for xs, y in examples:
            z = b + sum(w[i] * v for i, v in xs.items())
            pr = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            d = pr - y
            gb += d
            for i, v in xs.items():
                gw[i] = gw.get(i, 0.0) + d * v
        m = float(len(examples))
        b -= LR * gb / m
        for i, g in gw.items():
            w[i] -= LR * g / m

    correct = sum(
        1 for xs, y in examples
        if ((b + sum(w[i] * v for i, v in xs.items())) > 0.0) == (y > 0.5))
    print(f"train accuracy {correct}/{len(examples)} "
          f"({100.0 * correct / len(examples):.1f}%) at dim={dim}")
    with open(out, "w") as f:
        f.write(f"bias {b:.6f}\n")
        for i, wi in enumerate(w):
            f.write(f"{i} {wi:.6f}\n")
    print(f"wrote {out}")
    sys.exit(0)


in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
rows = duckdb.connect().execute(
    f"""WITH f AS (SELECT doc_id, text,
          list_filter(string_split_regex(lower(text), '\\s+'),
                      x -> len(x) > 0) AS t
        FROM read_parquet('{SF_DIR}/documents.parquet'))
        SELECT text,
          0.4 * (CAST(len(list_filter(t, w -> w IN ({in_list}))) AS DOUBLE)
                 / len(t))
          + 0.4 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
          + 0.2 * least(CAST(list_reduce(list_prepend(0,
                list_transform(t, w -> len(w))), (a, x) -> a + x) AS DOUBLE)
                / len(t), 8.0) / 8.0 AS quality
        FROM f WHERE len(t) > 0 ORDER BY doc_id"""
).fetchall()

examples = []
for text, quality in rows:
    toks = [w for w in text.lower().split() if w]
    x = [0.0] * DIM
    for w in toks:
        x[h48(w) % DIM] += 1.0
    n = float(len(toks))
    examples.append(([v / n for v in x], 1.0 if quality >= THRESHOLD else 0.0))

w = [0.0] * DIM
b = 0.0
for _ in range(ITERS):
    gw = [0.0] * DIM
    gb = 0.0
    for x, y in examples:
        z = b + sum(wi * xi for wi, xi in zip(w, x))
        p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
        d = p - y
        gb += d
        for i, xi in enumerate(x):
            if xi:
                gw[i] += d * xi
    m = float(len(examples))
    b -= LR * gb / m
    w = [wi - LR * gi / m for wi, gi in zip(w, gw)]

correct = 0
for x, y in examples:
    z = b + sum(wi * xi for wi, xi in zip(w, x))
    correct += int((z > 0.0) == (y > 0.5))
print(f"train accuracy {correct}/{len(examples)} "
      f"({100.0 * correct / len(examples):.1f}%) on {SF_DIR}")

with open(OUT, "w") as f:
    f.write(f"bias {b:.6f}\n")
    for i, wi in enumerate(w):
        f.write(f"{i} {wi:.6f}\n")
print(f"wrote {OUT}")
