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

    Built as a chain of zip_with over shifted copies of the token array
    (flat lambdas, single pass) rather than transform-over-index with
    element_at lookups — the flat form measured ~10× faster because
    nested higher-order lambdas evaluate interpreted per element.
    For a doc of n tokens, yields n-k+1 shingles; fewer than k tokens
    yields an empty array.
    """
    n = F.size(toks)
    joined = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, n)
        joined = F.zip_with(joined, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.slice(joined, 1, F.greatest(n - F.lit(k - 1), F.lit(0)))


def shingle_digests(shingle_arr: Column) -> Column:
    """md5 hex digest of every shingle — computed ONCE per shingle; the
    minhash components below slice this digest instead of re-hashing
    with per-seed prefixes (4× fewer digest computations)."""
    return F.transform(shingle_arr, F.md5)


def minhash_component(digests: Column, k: int) -> Column:
    """k-th minhash signature component: min over the k-th 8-hex-char
    slice of each shingle digest. Hex-string min is a total order, so
    the min is well-defined and identical across engines. NULL for
    empty input."""
    return F.array_min(
        F.transform(digests, lambda d: F.substring(d, 1 + 8 * k, 8))
    )


def stopword_count(toks: Column, stopwords: list[str]) -> Column:
    """Number of tokens that are in the (small, literal) stopword list."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))


# Stopword lexicons for the heuristic language-ID family (x_lang_id,
# x_lang_segments, streaming/langseg.py). Fixed dict order is the
# documented argmax/majority tie-break priority; a real LID model slots
# in behind the same per-unit argmax contract as a pandas UDF.
LEXICONS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "que"],
    "fr": ["le", "les", "des", "et", "une"],
}
