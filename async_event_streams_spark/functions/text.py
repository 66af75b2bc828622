"""Text-analysis column expressions (whitespace tokenizer, word
n-gram shingles, md5-based minhash, stopword counting).

All pure built-in `pyspark.sql.functions` higher-order expressions: they
run inside whole-stage codegen on executors — no Python in the hot path,
no explode-induced row blowup (shingles stay as one array per doc until
a consumer decides otherwise). md5 is used as the minhash family (seeded
by prefixing) because it is deterministic, portable, and available in
every SQL engine — which is what makes the DuckDB differential oracle
possible for the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens of a trimmed document (array<string>)."""
    return F.split(F.trim(text), WHITESPACE_RE)


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (space-joined).

    For a doc of n tokens, yields n-k+1 shingles; fewer than k tokens
    yields an empty array (guarded — F.sequence would run backwards).
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def minhash_hex(shingle_arr: Column, seed: int) -> Column:
    """Min over seeded md5 hex digests of each shingle — one minhash
    signature component. Hex-string min is a total order, so the min is
    well-defined and identical across engines. NULL for empty input."""
    return F.array_min(
        F.transform(
            shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))
        )
    )


def stopword_count(toks: Column, stopwords: list[str]) -> Column:
    """Number of tokens that are in the (small, literal) stopword list."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
