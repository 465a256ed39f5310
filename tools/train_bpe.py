#!/usr/bin/env python3
"""Derive the checked-in BPE merge table (src/main/resources/graft/bpe_merges.txt).

Classic count-weighted BPE training over the `documents` corpus vocabulary:
per step, merge the adjacent token pair with the highest corpus-weighted
count (ties broken count-then-lexicographic, so the table is deterministic).
Pair counts are maintained INCREMENTALLY — each merge touches only the words
that contain the merged pair — so realistic table sizes (8k+ merges) train in
seconds where the naive per-step full rescan was quadratic.

The output is a fixed shipped artifact — like a production tokenizer's vocab
file — consumed as a plan-time reference object by the BpeTokenCount
expression and re-stated as a VALUES list in the t16 DuckDB oracle.

Usage: python3 tools/train_bpe.py [testdata_sf_dir] [n_merges] [out_file]
Defaults: /root/testdata/sf0.1, 8192, stdout.
Output: one merge per line, "<left> <right>" (tokens never contain spaces —
the pre-tokenizer splits on whitespace).

Training corpus: the union of every text-bearing column in the sf dir
(documents text, part names/types, customer/supplier names, event props) —
the `documents` table alone has a ~30-word synthetic vocabulary that fully
merges after ~90 steps; the union's ~15k distinct pretokens (words AND digit
runs, the shape real tokenizers train on) support a realistic-size table.
"""
import collections
import os
import sys

import duckdb

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
OUT = sys.argv[3] if len(sys.argv) > 3 else None

SOURCES = [
    ("documents.parquet", "text"),
    ("part.parquet", "p_name"),
    ("part.parquet", "p_type"),
    ("customer.parquet", "c_name"),
    ("supplier.parquet", "s_name"),
    ("events.parquet", "props"),
]
selects = [
    f"SELECT {col} AS t FROM read_parquet('{DIR}/{f}')"
    for f, col in SOURCES if os.path.exists(f"{DIR}/{f}")
]
con = duckdb.connect()
freq = dict(con.execute(
    "SELECT w, count(*) FROM (SELECT unnest(regexp_extract_all(lower(t), "
    "'[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS w FROM ("
    + " UNION ALL ".join(selects) + ")) GROUP BY w").fetchall())

words = {w: list(w) for w in freq}


def pairs_of(toks):
    return collections.Counter(zip(toks, toks[1:]))


pair_counts = collections.Counter()
pair_words = collections.defaultdict(set)
for w, toks in words.items():
    for p, c in pairs_of(toks).items():
        pair_counts[p] += c * freq[w]
        pair_words[p].add(w)

merges = []
for _ in range(N_MERGES):
    live = [(c, p) for p, c in pair_counts.items() if c > 0]
    if not live:
        break
    # same greedy as the original trainer: highest corpus-weighted count,
    # ties to the lexicographically greatest pair
    _c, (a, b) = max(live, key=lambda cp: (cp[0], cp[1][0], cp[1][1]))
    merges.append((a, b))
    for w in list(pair_words[(a, b)]):
        toks = words[w]
        old = pairs_of(toks)
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        words[w] = out
        new = pairs_of(out)
        for p in old.keys() | new.keys():
            d = new.get(p, 0) - old.get(p, 0)
            if d:
                pair_counts[p] += d * freq[w]
            if new.get(p, 0):
                pair_words[p].add(w)
            else:
                pair_words[p].discard(w)

lines = "\n".join(f"{a} {b}" for a, b in merges) + "\n"
if OUT:
    with open(OUT, "w") as f:
        f.write(lines)
    print(f"wrote {len(merges)} merges to {OUT}", file=sys.stderr)
else:
    sys.stdout.write(lines)
