"""Property-based tests: the engine's JVM-side column expressions must
agree with straightforward Python reference implementations on
hypothesis-generated inputs (arbitrary whitespace, unicode-ish tokens,
negative/huge ints). Batched: each hypothesis example is a list of
inputs evaluated in ONE Spark job."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from async_event_streams_spark.functions.text import (
    minhash_component,
    shingle_digests,
    shingles,
    tokens,
)

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
texts = st.lists(
    st.lists(word, min_size=0, max_size=12).map(" ".join)
    # throw in irregular whitespace
    .flatmap(lambda s: st.sampled_from([s, f"  {s}", f"{s}\t x", s.replace(" ", "  ", 1)])),
    min_size=1,
    max_size=20,
)


def py_tokens(s: str) -> list[str]:
    return s.split()


def py_shingles(toks: list[str], k: int = 3) -> list[str]:
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


@given(texts)
@settings(**SETTINGS)
def test_shingles_match_python(spark, batch):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(batch)], "i long, text string")
    got = {
        r.i: r.sh
        for r in df.select("i", shingles(tokens(F.col("text"))).alias("sh")).collect()
    }
    for i, s in enumerate(batch):
        assert got[i] == py_shingles(py_tokens(s)), repr(s)


@given(texts)
@settings(**SETTINGS)
def test_minhash_components_match_python(spark, batch):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(batch)], "i long, text string")
    dg = shingle_digests(shingles(tokens(F.col("text"))))
    got = {
        r.i: (r.h0, r.h1)
        for r in df.select(
            "i",
            minhash_component(dg, 0).alias("h0"),
            minhash_component(dg, 1).alias("h1"),
        ).collect()
    }
    for i, s in enumerate(batch):
        digests = [
            hashlib.md5(sh.encode()).hexdigest()
            for sh in py_shingles(py_tokens(s))
        ]
        exp0 = min((d[0:8] for d in digests), default=None)
        exp1 = min((d[8:16] for d in digests), default=None)
        assert got[i] == (exp0, exp1), repr(s)


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_fizzbuzz_label_matches_python(spark, ns):
    from async_event_streams_spark.queries.reference import fizzbuzz_label

    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {r.n: r.label for r in df.select("n", fizzbuzz_label(F.col("n")).alias("label")).collect()}
    for n in ns:
        exp = (
            "fizzbuzz"
            if n % 15 == 0
            else "buzz" if n % 5 == 0 else "fizz" if n % 3 == 0 else "number"
        )
        assert got[n] == exp, n


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda v: tuple(v),
    )
)
@settings(**SETTINGS)
def test_lsh_bucket_matches_python(spark, vecs):
    from async_event_streams_spark.functions.similarity import lsh_bucket, lsh_planes

    planes = lsh_planes(3, 4, seed=7)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i long, e array<float>"
    )
    got = {r.i: r.b for r in df.select("i", lsh_bucket(F.col("e"), planes).alias("b")).collect()}
    import struct

    for i, v in enumerate(vecs):
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]  # float32 round-trip
        b = 0
        for p, plane in enumerate(planes):
            acc = 0.0
            for x, w in zip(v32, plane):
                acc += float(x) * w
            if acc >= 0:
                b |= 1 << p
        assert got[i] == b, (i, v)


# -- partition routing ------------------------------------------------------

keys = st.lists(
    st.one_of(
        st.text(min_size=0, max_size=24),
        st.integers(min_value=-(2**62), max_value=2**62),
    ),
    min_size=1,
    max_size=50,
)


@given(keys=keys, n=st.integers(min_value=1, max_value=16))
@settings(**SETTINGS)
def test_partition_routing_is_stable_and_total(keys, n):
    """Driver-side routing (zlib.crc32 of str(key)) is deterministic,
    in-range, and — for string keys — equals the JVM-side route
    F.crc32(cast as string) used by post_df. Spark-side agreement is
    covered end-to-end in test_partitioned_topic; here we pin the pure
    function against a from-scratch reimplementation on generated keys."""
    import zlib

    from async_event_streams_spark.topics.partitioned import _route

    for k in keys:
        p = _route(k, n)
        assert 0 <= p < n
        assert p == _route(k, n)  # stable
        assert p == zlib.crc32(str(k).encode("utf-8")) % n


# -- NTILE closed form ------------------------------------------------------


def test_ntile_closed_form_matches_reference():
    """The (rank, group size) closed form used by c_window_ntile /
    c_window_rank_variants must reproduce SQL-standard NTILE(4) for
    every group size: the first n%k tiles take ceil(n/k) rows, the
    rest floor(n/k). Exhaustive over n in 1..400."""
    import math

    k = 4
    for n in range(1, 401):
        q, rem = n // k, n % k
        big = rem * (q + 1)
        # reference: expand tile sizes then assign sequentially
        sizes = [q + 1] * rem + [q] * (k - rem)
        ref = []
        for tile0, size in enumerate(sizes):
            ref.extend([tile0 + 1] * size)
        for r in range(1, n + 1):
            if r <= big:
                got = math.ceil(r / (q + 1))
            else:
                got = rem + math.ceil((r - big) / q)
            assert got == ref[r - 1], (n, r)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # group (low-card)
            st.integers(min_value=0, max_value=50),  # order value (ties!)
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(**SETTINGS)
def test_grouped_rank_modes_agree(spark, rows):
    """Property: grouped_rank's two physical shapes (plain window vs
    range-partitioned prefix-sum) produce identical ranks for ANY
    grouping/ordering distribution — including heavy ties (broken by
    the unique id) and single-row/single-group edges. This is the
    invariant the auto mode relies on to switch shapes by size."""
    from async_event_streams_spark.functions.order import grouped_rank

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, v long, id long")
    out = {}
    for mode in ("window", "prefix"):
        out[mode] = {
            (r.g, r.id): r.rnk
            for r in grouped_rank(
                df, ["g"], ["v", "id"], n_partitions=5, mode=mode
            ).collect()
        }
    assert out["window"] == out["prefix"]


@given(texts)
@settings(**SETTINGS)
def test_char_entropy_matches_python(spark, batch):
    """x_char_entropy's log2 identity (log2 n - (1/n)·Σ k·log2 k) must
    equal the textbook -Σ p·log2 p on arbitrary strings."""
    import math
    from collections import Counter

    # empty texts are excluded by x_char_entropy's contract (the two
    # engines split '' differently; the query filters length > 0)
    batch = [s for s in batch if s]
    if not batch:
        return
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(batch)], "doc_id long, text string"
    )
    k = (
        df.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("k"))
    )
    got = {
        r.doc_id: r.h
        for r in k.groupBy("doc_id")
        .agg(
            (
                F.log2(F.sum("k").cast("double"))
                - F.sum(F.col("k") * F.log2("k"))
                / F.sum("k").cast("double")
            ).alias("h")
        )
        .collect()
    }
    for i, s in enumerate(batch):
        counts = Counter(s)
        n = len(s)
        want = -sum((c / n) * math.log2(c / n) for c in counts.values())
        assert abs(got[i] - want) < 1e-9, (repr(s), got[i], want)


@given(texts)
@settings(**SETTINGS)
def test_dup_spans_fraction_matches_python(spark, batch):
    """x_dup_spans's SHARED production core (dup_span_stats) must
    equal the direct python definition: the share of a doc's k-gram
    spans that occur in >= 2 distinct docs."""
    from collections import Counter

    from async_event_streams_spark.queries.llm import dup_span_stats

    K = 5
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(batch)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup)
        for r in dup_span_stats(df, k=K).collect()
    }
    spans = {
        i: py_shingles(py_tokens(s), k=K) for i, s in enumerate(batch)
    }
    docs_of = {}
    for i, ss in spans.items():
        for g in set(ss):
            docs_of.setdefault(g, set()).add(i)
    for i, ss in spans.items():
        if not ss:
            assert i not in got
            continue
        n_dup = sum(1 for g in ss if len(docs_of[g]) >= 2)
        assert got[i] == (len(ss), n_dup), (i, got[i], (len(ss), n_dup))


@given(
    st.decimals(min_value="-99999999.99", max_value="99999999.99", places=2),
)
@settings(max_examples=50, deadline=None)
def test_cents_recovery_is_exact_for_2dp_doubles(d):
    """THE assumption under every integer-cents rewrite (q1 scaled-long
    sums, q17/q20/q22 membership tests, histogram buckets): for any
    2-decimal value stored as its nearest double, round(value*100)
    recovers the EXACT cent count. If double drift ever exceeded half
    a cent, every cents-based comparison would diverge from the
    decimal spec — this pins the encoding, not an algebraic identity."""
    from fractions import Fraction

    v = float(d)  # nearest double to the 2-dp decimal
    exact_cents = int(Fraction(str(d)) * 100)
    prod = v * 100
    assert abs(prod - exact_cents) < 0.5, (d, prod)
    assert round(prod) == exact_cents, (d, prod)


@given(
    st.lists(
        st.decimals(min_value="0.01", max_value="99.99", places=2).map(str),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_q17_membership_on_spark_equals_rational_reference(spark, qty_strs):
    """c_tpch_q17's PRODUCTION membership pipeline (round(qty*100) →
    long, window counts/sums, 2·qty_c·n < Σ) run through Spark must
    select exactly the rows the spec's exact-rational definition
    (qty < ½·avg) selects — including boundary lists where a double
    avg would be ambiguous."""
    from fractions import Fraction

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, float(q)) for i, q in enumerate(qty_strs)]
    df = spark.createDataFrame(rows, "i long, qty double")
    w = Window.partitionBy(F.lit(1))
    got = {
        r.i
        for r in df.withColumn(
            "qty_c", F.round(F.col("qty") * 100).cast("long")
        )
        .withColumn("n", F.count("*").over(w))
        .withColumn("s", F.sum("qty_c").over(w))
        .filter(F.lit(2) * F.col("qty_c") * F.col("n") < F.col("s"))
        .collect()
    }
    fr = [Fraction(q) for q in qty_strs]
    avg = sum(fr) / len(fr)
    want = {i for i, q in enumerate(fr) if q < Fraction(1, 2) * avg}
    assert got == want, (qty_strs, got, want)


# ---------------------------------------------------------------------------
# Streaming-state merge invariants (r8): the delta-log disciplines rest
# on merge(partials per random batch split) == one-shot over all rows.
# The streaming suites prove this through real pipes on fixed splits;
# these properties prove it for ARBITRARY splits at the function level.
# ---------------------------------------------------------------------------

dq_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # row_id: collisions likely
        st.integers(min_value=0, max_value=5),  # user_id
        st.one_of(st.none(), st.floats(min_value=-10, max_value=2_000_000,
                                       allow_nan=False)),
    ),
    min_size=1,
    max_size=40,
)
splits = st.lists(st.integers(min_value=1, max_value=10), min_size=1, max_size=5)


@given(dq_rows, splits)
@settings(**SETTINGS)
def test_dq_merge_invariant_under_random_splits(spark, rows, sizes):
    """Counters merged from per-batch partials + PK duplicates derived
    from merged per-key counts must equal the one-shot audit, for ANY
    partition of the rows into batches."""
    from async_event_streams_spark.streaming.dq import (
        _counter_partials,
        _merge_counters,
        _merge_pk,
        _pk_partials,
        dq_batch_twin,
    )
    from pyspark.sql import functions as F

    schema = "row_id long, user_id long, value double"
    customer = spark.createDataFrame([(i,) for i in range(4)], "c_custkey long")
    all_df = spark.createDataFrame(rows, schema)

    # slice rows into batches by the random sizes (cycled)
    batches, i, k = [], 0, 0
    while i < len(rows):
        n = sizes[k % len(sizes)]
        batches.append(rows[i : i + n])
        i += n
        k += 1

    cparts = [
        _counter_partials(spark.createDataFrame(b, schema), customer)
        for b in batches
    ]
    pparts = [_pk_partials(spark.createDataFrame(b, schema)) for b in batches]
    cunion, punion = cparts[0], pparts[0]
    for c in cparts[1:]:
        cunion = cunion.unionAll(c)
    for p in pparts[1:]:
        punion = punion.unionAll(p)
    merged = {
        (r.check_name, r.n_checked, r.n_violations)
        for r in _merge_counters(cunion).collect()
    }
    keys = _merge_pk(punion)
    pk = keys.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_checked"),
        (F.coalesce(F.sum("n"), F.lit(0)) - F.count(F.lit(1)))
        .cast("long")
        .alias("n_violations"),
    ).collect()[0]
    merged.add(("events_pk_unique", pk.n_checked, pk.n_violations))

    want = {
        (r.check_name, r.n_checked, r.n_violations)
        for r in dq_batch_twin(all_df, customer).collect()
    }
    assert merged == want


bitmap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # row_id
        st.sampled_from(["a", "b", "c"]),  # etype
    ),
    min_size=1,
    max_size=60,
)


@given(bitmap_rows, splits)
@settings(**SETTINGS)
def test_bitmap_merge_invariant_under_random_splits(spark, rows, sizes):
    """bit_or of per-batch per-(type, word) masks == one-shot bitmap
    build, for ANY batch partition — including duplicate row_ids
    (idempotence) and words split across batches."""
    from pyspark.sql import functions as F

    WORD = 32
    schema = "row_id long, etype string"

    def build(df):
        return df.groupBy(
            "etype", F.expr(f"row_id DIV {WORD}").cast("long").alias("w")
        ).agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(row_id % {WORD} AS INT))")
            ).cast("long").alias("mask")
        )

    batches, i, k = [], 0, 0
    while i < len(rows):
        n = sizes[k % len(sizes)]
        batches.append(rows[i : i + n])
        i += n
        k += 1
    parts = [build(spark.createDataFrame(b, schema)) for b in batches]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    merged = {
        (r.etype, r.w, r.mask)
        for r in u.groupBy("etype", "w")
        .agg(F.bit_or("mask").cast("long").alias("mask"))
        .collect()
    }
    want = {
        (r.etype, r.w, r.mask)
        for r in build(spark.createDataFrame(rows, schema)).collect()
    }
    assert merged == want


# ---------------------------------------------------------------------------
# framestitch (round 9): bucketed frames == pure-Python frames on
# ARBITRARY row layouts (key spread, id gaps, negative values, tiny
# buckets) — the delta-log-merge-invariant discipline applied to the
# (L-1)-row carry.
# ---------------------------------------------------------------------------

frame_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user (few keys: collisions)
        st.integers(min_value=0, max_value=200),  # event id (gaps, clusters)
        st.integers(min_value=-(10**9), max_value=10**9),  # value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],  # unique event ids (the table invariant)
)


@given(frame_rows, st.sampled_from([3, 5, 8]), st.sampled_from([2, 4, 16]))
@settings(**SETTINGS)
def test_bucketed_frames_match_python_reference(spark, rows, L, bucket_rows):
    from async_event_streams_spark.functions.framestitch import (
        frame_values_bucketed,
    )

    df = spark.createDataFrame(rows, "user_id long, event_id long, x_micro long")
    got = {
        (r.user_id, r.event_id): list(r.frame)
        for r in frame_values_bucketed(df, L, bucket_rows=bucket_rows).collect()
    }
    hist: dict[int, list[int]] = {}
    want = {}
    for u, e, x in sorted(rows, key=lambda t: t[1]):
        h = hist.setdefault(u, [])
        h.append(x)
        want[(u, e)] = h[-L:]
    assert got == want
