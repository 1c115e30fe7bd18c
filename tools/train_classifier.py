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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "src/main/resources/quality_clf.txt"
DIM = 256            # QualityClassifier.ClfDim (independent of HashVecDim)
THRESHOLD = 0.35      # TextAnalysis.QualityThreshold
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it",
             "on", "for")  # TextAnalysis.QualityStopwords
ITERS = 20000
LR = 8.0


def h48(w: str) -> int:
    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:12], 16)


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
