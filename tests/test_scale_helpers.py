"""Scale tooling: salted aggregation equals the unsalted plan; writers
produce prunable partitioned/bucketed layouts; topic archival round-trips."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.functions.skew import salted_agg
from async_event_streams_spark.io import archive_topic, read_archive, write_partitioned
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry


@pytest.fixture()
def skewed(spark):
    """90% of rows on one key — the shape that melts a naive groupBy."""
    hot = spark.range(0, 9000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    rest = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionByName(rest)


def test_salted_agg_matches_unsalted(spark, skewed):
    plain = {
        r.k: (r.n, round(r.total, 6), round(r.avg_v, 6))
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.avg("v").alias("avg_v"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, round(r.total, 6), round(r.avg_v, 6))
        for r in salted_agg(
            skewed,
            ["k"],
            {"n": ("count", "*"), "total": ("sum", "v"), "avg_v": ("avg", "v")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_min_max(spark, skewed):
    got = salted_agg(
        skewed, ["k"], {"lo": ("min", "v"), "hi": ("max", "v")}, n_salts=4
    )
    plain = skewed.groupBy("k").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="decomposable"):
        salted_agg(skewed, ["k"], {"m": ("median", "v")})


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events").limit(500)
    path = str(tmp_path / "events_part")
    write_partitioned(events, path, ["event_type"])
    back = read_archive(spark, path)
    assert back.count() == 500
    # a filter on the partition column must prune to that directory
    plan = back.filter(F.col("event_type") == "click")._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "event_type" in plan


def test_topic_archive_roundtrip(spark, tmp_path):
    t = Topic(
        spark, "arch", "n long", str(tmp_path / "topics"), TopicRegistry()
    )
    t.post([{"n": i} for i in range(10)], event_type="tick")
    t.post([{"n": 10}], event_type="tock")
    path = str(tmp_path / "archive")
    assert archive_topic(t, path) == 11
    back = read_archive(spark, path)
    assert back.count() == 11
    assert back.filter(F.col("event_type") == "tock").count() == 1
    assert {r.n for r in back.collect()} == set(range(11))


def test_artifact_memo_builds_once_and_is_session_scoped(spark):
    from async_event_streams_spark.util import _ARTIFACTS, artifact

    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    a = artifact(spark, "test:memo", build)
    b = artifact(spark, "test:memo", build)
    assert a is b and len(calls) == 1
    assert a.count() == 5
    # the memo pins the session object (id-reuse safety)
    assert _ARTIFACTS[(id(spark), "test:memo")][0] is spark
    _ARTIFACTS.pop((id(spark), "test:memo"), None)


def test_salted_join_equals_plain_join(spark):
    """salted_join must equal the unsalted join exactly on a corpus
    with one pathologically hot key (90% of fact rows), for inner and
    left joins including unmatched fact keys."""
    from async_event_streams_spark.functions.skew import salted_join

    fact = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    for how in ("inner", "left"):
        plain = {
            tuple(r) for r in fact.join(dim, ["k"], how).collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(fact, dim, ["k"], n_salts=8, how=how).collect()
        }
        assert salted == plain, how
    # row MULTIPLICITY also preserved (sets hide dup-count bugs)
    assert (
        salted_join(fact, dim, ["k"], n_salts=8).count()
        == fact.join(dim, ["k"]).count()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")


def test_salted_join_rejects_reserved_salt_column(spark):
    from async_event_streams_spark.functions.skew import salted_join

    fact = spark.range(3).select(
        F.col("id").alias("k"), F.lit(1).alias("__salt")
    )
    dim = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim, ["k"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(dim, fact, ["k"])


def test_adaptive_lsh_plane_laws():
    """The corpus-adaptive plane counts: floors below the driver sfs
    (so shipped corpora keep their pre-r11 buckets bit-for-bit),
    doubling buckets with the corpus above, clamped at the baked
    lattice."""
    from async_event_streams_spark.queries.llm import (
        _nd_nplanes,
        _sem_nsub,
    )

    assert _nd_nplanes(0) == 10 and _nd_nplanes(500) == 10
    assert _nd_nplanes(2000) == 10  # sf0.1: unchanged semantics
    assert _nd_nplanes(16384) == 10  # exact power boundary: 2^14/16=2^10
    assert _nd_nplanes(16385) == 11
    assert _nd_nplanes(20000) == 11  # sf1
    assert _nd_nplanes(10**9) == 26
    assert _nd_nplanes(10**12) == 32  # clamp
    assert _sem_nsub(500) == 0 and _sem_nsub(2048) == 0  # pure cells
    assert _sem_nsub(2049) == 1
    assert _sem_nsub(20000) == 4  # sf1: 16 sub-buckets per cell
    assert _sem_nsub(10**9) == 19


def test_lsh_first_p_bits_equals_full_bucket_mod(spark):
    """The oracle computes the full 32-plane bucket and masks with
    % (1<<P); Spark computes only the first P planes. Equal by
    construction (bit p >= P contributes a multiple of 2^P) — pinned
    here against lattice reordering."""
    from pyspark.sql import functions as F

    from async_event_streams_spark.functions.similarity import lsh_bucket
    from async_event_streams_spark.queries.llm import _ND_PLANES
    from async_event_streams_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.01", "embeddings").limit(200)
    for P in (0, 7, 11):
        got = emb.select(
            (
                lsh_bucket(F.col("embedding"), _ND_PLANES[:P])
                - lsh_bucket(F.col("embedding"), _ND_PLANES)
                % F.lit(1 << P).cast("long")
            ).alias("d")
        ).agg(F.max(F.abs(F.col("d")))).first()[0]
        assert got == 0, P
