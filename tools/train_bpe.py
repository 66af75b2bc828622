#!/usr/bin/env python
"""Train the engine's BPE merge table (functions/bpe.py MERGES) from the
sf0.1 corpus word frequencies — the standard algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
repeatedly merge the most frequent adjacent token pair, tie-broken
lexicographically so training is fully deterministic.

The output is HARDCODED into functions/bpe.py (pretrained-tokenizer
semantics: encoding must not depend on the dataset being encoded, and
both engines must replay the exact same table). Re-run this only to
regenerate the table after changing N_MERGES; paste the printed literal.

Usage: python tools/train_bpe.py [n_merges]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

CORPUS = "/root/testdata/sf0.1/documents.parquet"
N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 24


def word_freqs() -> Counter:
    con = duckdb.connect()
    rows = con.execute(
        "WITH w AS (SELECT unnest(regexp_split_to_array(trim(text),'\\s+'))"
        f" AS word FROM '{CORPUS}')"
        " SELECT word, count(*) FROM w GROUP BY word"
    ).fetchall()
    return Counter(dict(rows))


def train(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    words: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for toks, c in words.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        l, r = best
        merged: dict[tuple[str, ...], int] = {}
        for toks, c in words.items():
            out: list[str] = []
            for t in toks:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        words = merged
    return merges


def main() -> None:
    merges = train(word_freqs(), N_MERGES)
    print(f"# trained on {CORPUS}, {N_MERGES} merges")
    print("MERGES: list[tuple[str, str]] = [")
    for l, r in merges:
        print(f"    ({l!r}, {r!r}),")
    print("]")


if __name__ == "__main__":
    main()
