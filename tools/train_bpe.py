#!/usr/bin/env python3
"""Derive the checked-in BPE merge table in graft.functions.Bpe.merges.

Classic count-weighted BPE training over the `documents` corpus vocabulary:
per step, merge the adjacent token pair with the highest corpus-weighted
count (ties broken count-then-lexicographic, so the table is deterministic).
40 merges. The output is a fixed shipped artifact — like a production
tokenizer's vocab file — consumed as a plan-time constant by the
BpeTokenCount expression and re-stated as a VALUES list in the t16 DuckDB
oracle.

Usage: python3 tools/train_bpe.py [documents.parquet path]
Prints the Scala Seq literal to paste into Bpe.merges.
"""
import collections
import sys

import duckdb

PATH = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
N_MERGES = 40

con = duckdb.connect()
freq = dict(con.execute(
    "SELECT w, count(*) FROM (SELECT unnest(regexp_extract_all(lower(text), "
    "'[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS w FROM read_parquet(?)) GROUP BY w",
    [PATH]).fetchall())

words = {w: list(w) for w in freq}
merges = []
for _ in range(N_MERGES):
    pairs = collections.Counter()
    for w, toks in words.items():
        for i in range(len(toks) - 1):
            pairs[(toks[i], toks[i + 1])] += freq[w]
    if not pairs:
        break
    (a, b), _c = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
    merges.append((a, b))
    for w, toks in words.items():
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        words[w] = out

print("  val merges: Seq[(String, String)] = Seq(")
print("    " + ", ".join(f'("{a}", "{b}")' for a, b in merges) + ")")
