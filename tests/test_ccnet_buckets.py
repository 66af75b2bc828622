"""x_ccnet_buckets semantics on a constructed corpus — the CCNet
head/middle/tail cut must (a) rank fluent (common-token) docs into the
head and rare-token gibberish into the tail WITHIN each language,
(b) cut by rank with the documented integer rule (3k <= n / 3k <= 2n),
and (c) agree with the DuckDB oracle on a corpus with real separation
(the driver corpus shares one vocabulary, so scores there are
near-uniform — correct but not discriminative)."""

from __future__ import annotations

import duckdb

from async_event_streams_spark.queries import ORACLES, QUERIES

# 'the' dominates the corpus (cheap bits); 'qqq'/'zzz' words are rare
COMMON = "the the the the the the the the"
MIDDLE = "the the alpha the the beta the the"
RARE_A = "qqq1 qqq2 qqq3 qqq4 qqq5 qqq6 qqq7 qqq8"
RARE_B = "zzz1 zzz2 zzz3 zzz4 zzz5 zzz6 zzz7 zzz8"


def _write(spark, tmp_path, rows):
    sf = str(tmp_path / "sf_ccnet")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_ccnet_buckets_rank_semantics(spark, tmp_path):
    rows = [
        (1, "en", "s0", COMMON),   # cheapest bits -> head
        (2, "en", "s0", MIDDLE),
        (3, "en", "s0", RARE_A),   # most expensive -> tail
        (4, "de", "s0", COMMON),   # per-language cut: de ranks alone
        (5, "de", "s0", RARE_B),
        (6, "de", "s0", MIDDLE),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r.doc_id: r for r in QUERIES["x_ccnet_buckets"](spark, sf).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}

    # en: n=3 -> k=1 head, k=2 middle, k=3 tail, ordered by bits
    assert got[1].bucket == "head"
    assert got[2].bucket == "middle"
    assert got[3].bucket == "tail"
    # de ranks independently of en (per-language partition)
    assert got[4].bucket == "head"
    assert got[6].bucket == "middle"
    assert got[5].bucket == "tail"
    # fluency ordering is reflected in the scores themselves
    assert got[1].bits_per_token < got[2].bits_per_token < got[3].bits_per_token


def test_ccnet_buckets_tercile_rule_n4(spark, tmp_path):
    """n=4: the integer rule gives 1 head (3*1<=4), 1 middle
    (3*2<=8), 2 tail — no interpolation ambiguity at the boundary."""
    rows = [
        (1, "en", "s0", COMMON),
        (2, "en", "s0", MIDDLE),
        (3, "en", "s0", RARE_A),
        (4, "en", "s0", RARE_B),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r.doc_id: r.bucket for r in QUERIES["x_ccnet_buckets"](spark, sf).collect()}
    buckets = sorted(got.values())
    assert buckets.count("head") == 1
    assert buckets.count("middle") == 1
    assert buckets.count("tail") == 2
    assert got[1] == "head"


def test_ccnet_buckets_oracle_on_constructed(spark, tmp_path):
    rows = [
        (1, "en", "s0", COMMON),
        (2, "en", "s0", MIDDLE),
        (3, "en", "s1", RARE_A),
        (4, "de", "s0", COMMON),
        (5, "de", "s1", RARE_B),
        (6, "zh", "s0", MIDDLE),  # singleton language: its only doc is tail? no: k=1,n=1 -> 3>1, 3>2 -> tail
    ]
    sf = _write(spark, tmp_path, rows)
    spark_rows = {
        r.doc_id: (r.lang, r.bits_per_token, r.bucket)
        for r in QUERIES["x_ccnet_buckets"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    oracle_rows = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLES["x_ccnet_buckets"]).fetchall()
    }
    assert spark_rows == oracle_rows
    # a singleton language's only doc lands in tail under the integer
    # rule (3*1 > 2*1) — both engines, by construction
    assert spark_rows[6][2] == "tail"
