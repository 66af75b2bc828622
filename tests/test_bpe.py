"""Real-BPE encoder (functions/bpe.py): the rank-ordered merge-pass
implementation both engines run must equal the canonical
lowest-rank-first encoder, and pack budgets must match a pure-Python
reference end to end."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from async_event_streams_spark.functions.bpe import (
    MERGES,
    encode_reference,
    encode_vocab,
    sql_bpe_ctes,
)
from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.tables import table


def encode_rank_passes(word: str) -> list[str]:
    """Pure-Python twin of the engines' algorithm: one left-to-right
    pass per merge, in rank order."""
    toks = list(word)
    for l, r in MERGES:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == l and t == r:
                out[-1] = l + r
            else:
                out.append(t)
        toks = out
    return toks


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=14))
@settings(max_examples=300, deadline=None)
def test_rank_passes_equal_canonical(word):
    # The load-bearing claim in functions/bpe.py: applying merges in
    # rank order (one pass each) equals the canonical lowest-rank-first
    # loop, because no merge can create an earlier-rank pair.
    assert encode_rank_passes(word) == encode_reference(word)


TRICKY = [
    "erer",  # overlapping rank-0 pairs: leftmost-nonoverlap discipline
    "ererer",
    "iin",  # pair preceded by its own left token
    "inin",
    "sparkspark",  # full-word merges adjacent
    "wwindow",  # merged token preceded by its own first char
    "columnn",
    "tatata",
    "a",  # single char: no pairs at all
]


def test_spark_encoder_matches_reference(spark, sf_dir):
    corpus_vocab = [
        r.word
        for r in table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .distinct()
        .collect()
    ]
    words = sorted(set(TRICKY) | set(corpus_vocab))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: r.bpe_len for r in encode_vocab(df).collect()}
    assert got == {w: len(encode_reference(w)) for w in words}


def test_duckdb_encoder_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab(word VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in TRICKY])
    sql = f"WITH {sql_bpe_ctes('vocab')} SELECT word, bpe_len FROM bpe_enc"
    got = dict(con.execute(sql).fetchall())
    assert got == {w: len(encode_reference(w)) for w in TRICKY}


def test_pack_budgets_match_python_reference(spark, sf_dir):
    """x_pack_sequences end to end against a pure-Python replay: per-doc
    reference BPE counts -> prefix sum -> budget division."""
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    budget = 512
    expect = {}
    cum = 0
    for doc_id in sorted(docs):
        n = sum(len(encode_reference(w)) for w in docs[doc_id].split())
        expect[doc_id] = (n, cum // budget, cum % budget)
        cum += n
    got = {
        r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
        for r in QUERIES["x_pack_sequences"](spark, sf_dir).collect()
    }
    assert got == expect


def test_zero_word_docs_get_zero_count_rows(spark):
    """A document whose text yields no words (empty/whitespace/
    punctuation-only) must still appear in the per-doc BPE frame with
    (n_words, n_tokens) = (0, 0) — the explode+inner-join shape would
    silently drop it (r6 ADVICE item 2), and consumers like
    pack_sequences must pack EVERY document."""
    from async_event_streams_spark.queries.llm import _bpe_doc_tokens

    # the word cache is the corpus vocabulary (artifact keyed on
    # sf_dir), so the non-empty probe doc must use in-corpus words
    w1, w2 = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .limit(2)
        .collect()
    )
    docs = spark.createDataFrame(
        [(1, f"{w1.w} {w2.w}"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in _bpe_doc_tokens(
            spark, "/root/testdata/sf0.001", docs
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0) and got[3] == (0, 0)
    assert got[1][0] == 2 and got[1][1] >= 2


def reference_train_merges(word_counts, rounds):
    """Pure-Python BPE trainer: count weighted adjacent pairs, adopt
    the argmax (count desc, pair lexicographic), apply it with the
    canonical leftmost-nonoverlapping pass, repeat."""
    vocab = [(list(w), n) for w, n in word_counts.items() if w]
    merges = []
    for k in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for toks, n in vocab:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((k + 1, l, r, c))
        new_vocab = []
        for toks, n in vocab:
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab.append((out, n))
        vocab = new_vocab
    return merges


def test_train_merges_matches_python_reference(spark, sf_dir):
    """Third-implementation triangulation for the iterative trainer
    (the LPA/PageRank discipline): Spark loop and DuckDB unrolled
    oracle could share a misunderstanding, so the learned merge table
    is ALSO pinned against an independent pure-Python trainer run on
    the same corpus."""
    from collections import Counter

    from async_event_streams_spark.queries.llm import _BPE_MERGE_ROUNDS

    words = Counter(
        w
        for r in table(spark, sf_dir, "documents").select("text").collect()
        for w in r.text.split()
        if w
    )
    want = reference_train_merges(words, _BPE_MERGE_ROUNDS)
    got = [
        (r.rnk, r.left_sym, r.right_sym, r.pair_count)
        for r in QUERIES["x_bpe_train_merges"](spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    assert got == want
