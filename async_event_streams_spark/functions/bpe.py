"""Byte-pair encoding (real subword tokenization, not a regex proxy).

Token budgets in a training pipeline (sequence packing, domain mixture
shares) only mean something if they count what the trainer's tokenizer
counts. This module encodes with a PRETRAINED merge table (trained once
by tools/train_bpe.py — standard Sennrich-style frequency BPE on the
sf0.1 corpus — and hardcoded here: encoding must not depend on the
dataset being encoded, and both engines must replay the same table).

Encoding algorithm: a word starts as characters; each merge (l, r), in
rank order, runs ONE left-to-right pass replacing adjacent token pairs
(l, r) with l+r. A single pass per merge is exact: a pass captures all
non-overlapping occurrences leftmost-first, and applying ranks in order
equals the canonical lowest-rank-first loop because merging a later
rank can never create an earlier-rank pair (pair (x, l+r) must have
been learned after l+r existed, so its rank is higher — the invariant
`tests/test_bpe.py` property-checks against a canonical reference
encoder).

Both engines express the pass as a FOLD with a string accumulator
(tokens joined by an unmergeable separator): Spark `F.aggregate`,
DuckDB `list_reduce` — same lambda, same result. The fold appends
`SEP + x`, or just `r` when the accumulator's last token is exactly
`l` and the next is `r` (the boundary check is `acc ends with SEP+l`
or `acc == l`, which cannot false-positive mid-token because SEP never
occurs inside a token).

Scale shape: the corpus vocabulary is tiny relative to the corpus
(Heaps' law), so encoding runs once per DISTINCT word and fans out by
broadcast join — the word-cache shape production tokenizers
(HuggingFace `tokenizers`) use. The distinct-word aggregation is the
only shuffle; it moves slim (word) rows with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator: never occurs in corpus text (asserted cheap at encode
# time would cost a pass; the corpus generator emits [a-z ] only).
SEP = "\x1f"

# trained on /root/testdata/sf0.1/documents.parquet, 24 merges
# (tools/train_bpe.py — rerun it to regenerate after changing N).
MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "r"),
    ("s", "t"),
    ("o", "w"),
    ("t", "a"),
    ("l", "u"),
    ("m", "er"),
    ("a", "r"),
    ("p", "ar"),
    ("u", "p"),
    ("par", "k"),
    ("s", "park"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("g", "e"),
    ("mer", "ge"),
    ("b", "l"),
    ("bl", "e"),
    ("ta", "ble"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
]


# ---------------------------------------------------------------------------
# Spark
# ---------------------------------------------------------------------------


def _one_pass(toks: Column, l: str, r: str) -> Column:
    """One left-to-right merge pass of (l, r) over a token array.

    The input column is referenced exactly ONCE: 24 chained passes
    otherwise triplicate the expression tree per pass (slice + size +
    element_at) and 3^24 nodes OOMs the analyzer. Folding from an
    empty-string sentinel (no token is empty) keeps tree growth linear
    while preserving the leftmost-nonoverlapping pass semantics."""
    folded = F.aggregate(
        toks,
        F.lit(""),
        lambda acc, x: F.when(acc == "", x)
        .when(
            ((acc == l) | acc.endswith(SEP + l)) & (x == r),
            F.concat(acc, F.lit(r)),
        )
        .otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return F.split(folded, SEP)


def bpe_tokens(word: Column) -> Column:
    """Word → array of BPE tokens (MERGES applied in rank order)."""
    toks = F.regexp_extract_all(word, F.lit("(.)"), F.lit(1))
    for l, r in MERGES:
        toks = _one_pass(toks, l, r)
    return toks


def encode_vocab(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Distinct words → (word, bpe_len) for the broadcast word cache.

    The empty word is excluded AT THE API BOUNDARY (not left to
    callers): Spark's empty-string-sentinel fold would encode '' as
    one token while the DuckDB twin's list_reduce hard-errors on the
    empty char array — filtering here pins one contract instead of a
    latent engine divergence (r6 ADVICE item 3)."""
    return (
        words.select(word_col)
        .filter(F.length(word_col) > 0)
        .distinct()
        .select(
            word_col,
            F.size(bpe_tokens(F.col(word_col))).cast("long").alias("bpe_len"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins (generated from the same MERGES table)
# ---------------------------------------------------------------------------


def _sql_one_pass(toks: str, l: str, r: str) -> str:
    return (
        f"string_split(list_reduce({toks}, (acc, x) -> CASE WHEN "
        f"(acc = '{l}' OR ends_with(acc, chr(31) || '{l}')) AND x = '{r}' "
        f"THEN acc || '{r}' ELSE acc || chr(31) || x END), chr(31))"
    )


def sql_bpe_ctes(vocab_cte: str = "vocab", word: str = "word") -> str:
    """Chained CTE stages applying the merge table to `vocab_cte`'s
    `word` column; the final stage is `bpe_enc(word, bpe_len)`."""
    stages = [
        # len(word) > 0 mirrors encode_vocab's boundary contract: the
        # empty word would hand list_reduce an empty array (hard error
        # here, 1-token sentinel artifact on the Spark side).
        f"bpe_v0 AS (SELECT {word}, regexp_extract_all({word}, '(.)', 1)"
        f" AS t FROM {vocab_cte} WHERE len({word}) > 0)"
    ]
    for i, (l, r) in enumerate(MERGES):
        stages.append(
            f"bpe_v{i + 1} AS (SELECT {word}, "
            f"{_sql_one_pass('t', l, r)} AS t FROM bpe_v{i})"
        )
    stages.append(
        f"bpe_enc AS (SELECT {word}, CAST(len(t) AS BIGINT) AS bpe_len "
        f"FROM bpe_v{len(MERGES)})"
    )
    return ",\n".join(stages)


# ---------------------------------------------------------------------------
# Canonical reference encoder (tests only — lowest-rank-first loop)
# ---------------------------------------------------------------------------


def encode_reference(word: str) -> list[str]:
    """Canonical BPE encode: repeatedly merge the lowest-rank adjacent
    pair present (leftmost occurrence first), the loop HF/GPT-2 style
    encoders run. tests/test_bpe.py checks the engines' rank-order
    passes produce identical tokens."""
    rank = {pair: i for i, pair in enumerate(MERGES)}
    toks = list(word)
    while len(toks) > 1:
        best, best_i = None, None
        for i, pair in enumerate(zip(toks, toks[1:])):
            r = rank.get(pair)
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks
