#!/usr/bin/env python3
"""Train the committed BPE merges fixture (src/main/resources/graft/bpe_merges.txt).

One-off, deterministic: trains byte-pair merges over the sf0.001 documents
corpus using the SAME pre-tokenizer regex as graft.functions.TextOps
.bpePretokenRe, greedy left-to-right merge semantics (str.replace), and a
(count DESC, pair ASC) tie-break. The output file is the single source of
truth both engines encode with: graft loads it as a resource; the DuckDB
oracle SQL is generated from the same lines. Re-running reproduces the
identical file — the fixture is committed so nothing at build or test time
depends on this script.
"""
import collections
import re
import sys

import duckdb

PRETOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +")
# capped BELOW the corpus's full-merge convergence (~127 on this word
# inventory) so typical words still split into 2-4 tokens — the fixture
# must exercise real sub-word segmentation, not whole-word lookup
N_MERGES = 64
SRC = "/root/testdata/sf0.001/documents.parquet"
OUT = "src/main/resources/graft/bpe_merges.txt"


def main():
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{SRC}' ORDER BY doc_id").fetchall()]
    piece_freq = collections.Counter()
    for t in texts:
        for p in PRETOKEN_RE.findall(t):
            piece_freq[p] += 1
    # word -> current symbol tuple
    words = {p: tuple(p) for p in piece_freq}
    merges = []
    for _ in range(N_MERGES):
        pairs = collections.Counter()
        for p, syms in words.items():
            f = piece_freq[p]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        top = max(pairs.values())
        l, r = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append((l, r))
        merged = l + r
        new_words = {}
        for p, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2  # greedy left-to-right, same as str.replace
                else:
                    out.append(syms[i])
                    i += 1
            new_words[p] = tuple(out)
        words = new_words
    with open(OUT, "w") as f:
        for l, r in merges:
            f.write(f"{l}\t{r}\n")
    print(f"wrote {len(merges)} merges to {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
