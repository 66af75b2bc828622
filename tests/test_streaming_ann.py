"""Streaming IVF index maintenance: the incrementally-built index must
equal the batch-built one — same cell assignments, same search results
— no matter how the embedding stream was split into micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.queries.llm import ivf_assign
from async_event_streams_spark.streaming import (
    compact_state,
    ivf_index_pipe,
    search_ivf_index,
    state_dirs,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_streaming_ivf_index_equals_batch(spark, sf_dir, topic_root):
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(30).collect()
    centroids = [list(r.embedding) for r in rows[:8]]

    reg = TopicRegistry()
    vecs = Topic(
        spark, "ann_vecs", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/ivf-state"
    h = ivf_index_pipe(vecs, sdir, centroids, name="ann-pipe")
    try:
        for lo in range(0, 30, 10):  # three waves of 10
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in rows[lo : lo + 10]
                ],
                barrier="chain",
            )
        # 1) incremental index == batch assignment over all vectors
        streamed = {
            r.vec_id: r.cell
            for r in spark.read.parquet(*state_dirs(sdir)).collect()
        }
        v = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows],
            "vec_id long, e array<double>",
        )
        batch = {r.vec_id: r.cell for r in ivf_assign(v, centroids).collect()}
        assert streamed == batch and len(streamed) == 30

        # 2) search over the incremental index == search over a
        #    batch-built index dir; stable under compaction
        queries = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows[:5]],
            "query_id long, embedding array<double>",
        )
        got = sorted(
            map(tuple, search_ivf_index(spark, sdir, queries, centroids).collect())
        )
        bdir = f"{topic_root}/ivf-batch"
        ivf_assign(v, centroids).write.parquet(f"{bdir}/batch=0")
        want = sorted(
            map(tuple, search_ivf_index(spark, bdir, queries, centroids).collect())
        )
        assert got == want and len({g[0] for g in got}) == 5
        h.stop()
        assert compact_state(spark, sdir, upto_batch=10_000) >= 2
        after = sorted(
            map(tuple, search_ivf_index(spark, sdir, queries, centroids).collect())
        )
        assert after == got
    finally:
        h.stop()
        vecs.close()


def test_ivf_retrain_on_compaction_after_drift(spark, topic_root):
    """VERDICT r3 item 9: the incremental index assigns against fixed
    centroids, so a drifted stream (a cluster the initial centroids
    never saw) degrades cell balance. With retrain_on_compact the
    compaction boundary retrains centroids on everything indexed so
    far, rewrites the merged dir's cells, persists the new centroids,
    and keeps 1-probe search at full recall for BOTH the old and the
    new cluster."""
    import math

    from async_event_streams_spark.streaming import load_index_centroids

    dim = 4
    # cluster A along axis 0 (what the initial centroids know),
    # cluster B along axis 1 (the drift)
    a_vecs = [(i, [10.0 + 0.1 * i, float(i % 3), 0.0, 0.0]) for i in range(8)]
    b_vecs = [(100 + i, [float(i % 3), 10.0 + 0.1 * i, 0.0, 0.0]) for i in range(8)]
    initial = [[10.0, 0.0, 0.0, 0.0], [9.0, 1.0, 0.0, 0.0]]  # both A-ish

    reg = TopicRegistry()
    vecs = Topic(
        spark, "drift_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    sdir = f"{topic_root}/drift-state"
    h = ivf_index_pipe(
        vecs, sdir, initial, name="drift-pipe",
        compact_every=2, retrain_on_compact=True,
    )
    try:
        waves = [a_vecs[:8], b_vecs[:4], b_vecs[4:]]  # batch 2 retrains
        for wave in waves:
            vecs.send(
                [{"vec_id": i, "embedding": e} for i, e in wave],
                barrier="chain",
            )
        trained = load_index_centroids(sdir)
        assert trained is not None and trained != initial
        # k-means over A+B must place one centroid per cluster: exactly
        # one with dominant axis 0, one with dominant axis 1
        axes = sorted(
            max(range(dim), key=lambda d: abs(c[d])) for c in trained
        )
        assert axes == [0, 1], trained
        # the whole index (merged + post-retrain batches) is assigned
        # under the TRAINED centroids
        from async_event_streams_spark.queries.llm import ivf_assign

        allv = spark.createDataFrame(
            a_vecs + b_vecs, "vec_id long, e array<double>"
        )
        want = {r.vec_id: r.cell for r in ivf_assign(allv, trained).collect()}
        got = {
            r.vec_id: r.cell
            for r in spark.read.parquet(*state_dirs(sdir)).collect()
        }
        assert got == want and len(got) == 16

        # 1-probe search (persisted centroids by default) reaches full
        # recall on both clusters: the true nearest neighbor is always
        # in the query's own cell
        def cos(x, y):
            num = sum(p * q for p, q in zip(x, y))
            return num / (
                math.sqrt(sum(p * p for p in x)) * math.sqrt(sum(q * q for q in y))
            )

        all_map = dict(a_vecs + b_vecs)
        queries = spark.createDataFrame(
            [(i, e) for i, e in (a_vecs[:2] + b_vecs[:2])],
            "query_id long, embedding array<double>",
        )
        found = {
            r.query_id: r.neighbor_id
            for r in search_ivf_index(
                spark, sdir, queries, probes=1, k=1
            ).collect()
        }
        for qid, qe in a_vecs[:2] + b_vecs[:2]:
            truth = max(
                (i for i in all_map if i != qid),
                key=lambda i: (round(cos(qe, all_map[i]), 9), -i),
            )
            assert found[qid] == truth, (qid, found[qid], truth)
    finally:
        h.stop()
        vecs.close()


def test_sweep_retrain_heals_torn_swap(spark, tmp_path):
    """ADVICE r5: the retrain dir swap must never lose a dir's vectors.
    _sweep_retrain repairs every crash window the rename-aside
    discipline can leave behind: a complete tmp with the live dir gone
    (promote tmp), a stale tmp beside a live dir (drop tmp), and an old
    copy with no live dir (restore old)."""
    import os

    from async_event_streams_spark.streaming.ann import _sweep_retrain

    root = str(tmp_path / "ivfstate")
    os.makedirs(root)

    def mkdir_with(name: str, marker: str) -> str:
        d = os.path.join(root, name)
        os.makedirs(d)
        with open(os.path.join(d, marker), "w") as f:
            f.write("x")
        return d

    # window 1: crash after d moved aside, before tmp promoted
    mkdir_with("batch=1.retrain.tmp", "new")
    mkdir_with("batch=1.retrain.old", "old")
    # window 2: crash before the swap started (tmp beside live dir)
    mkdir_with("batch=2", "live")
    mkdir_with("batch=2.retrain.tmp", "stale")
    # window 3: crash after promote, before old reaped
    mkdir_with("batch=3", "live")
    mkdir_with("batch=3.retrain.old", "old")
    # window 4: old only (tmp already reaped by an earlier sweep)
    mkdir_with("batch=4.retrain.old", "old")

    _sweep_retrain(root)

    assert sorted(os.listdir(root)) == ["batch=1", "batch=2", "batch=3", "batch=4"]
    assert os.path.exists(os.path.join(root, "batch=1", "new"))  # promoted
    assert os.path.exists(os.path.join(root, "batch=2", "live"))  # kept
    assert os.path.exists(os.path.join(root, "batch=3", "live"))  # kept
    assert os.path.exists(os.path.join(root, "batch=4", "old"))  # restored


def test_dir_maxet_falls_back_without_footer_stats(spark, tmp_path):
    """ADVICE r5: when parquet footers lack __et statistics the pruning
    watermark must still advance via a one-off max(__et) scan — not
    silently return None and let state grow unbounded."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from async_event_streams_spark.streaming.neardedup import _dir_maxet

    d = str(tmp_path / "batch=0")
    os.makedirs(d)
    t = pa.table({"ord": [1, 2, 3], "__et": [100, 250, 175]})
    pq.write_table(t, os.path.join(d, "part-0.parquet"), write_statistics=False)

    memo: dict[str, int] = {}
    assert _dir_maxet(spark, d, memo) == 250  # via the Spark fallback
    assert memo[d] == 250  # memoized: the fallback scan runs once

    # with stats present the footer path answers (no Spark job needed)
    d2 = str(tmp_path / "batch=1")
    os.makedirs(d2)
    pq.write_table(t, os.path.join(d2, "part-0.parquet"))
    assert _dir_maxet(spark, d2, {}) == 250


def test_streaming_pq_codes_equal_batch(spark, sf_dir, topic_root):
    """r4 VERDICT item 6: the incrementally-maintained PQ code table
    must equal batch pq_encode over the same vectors — across waves,
    compaction + codebook retrain, and a pipe restart that must pick
    up the retrained codebooks from disk."""
    from async_event_streams_spark.queries.llm import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        pq_encode,
    )
    from async_event_streams_spark.streaming import (
        load_pq_codebooks,
        pq_index_pipe,
        read_pq_codes,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(30).collect()
    full = [list(r.embedding) for r in rows[:_PQ_K]]
    cbs = [
        [c[_PQ_SUB * j : _PQ_SUB * (j + 1)] for c in full]
        for j in range(_PQ_M)
    ]

    def codes_of(df):
        return {
            r.vec_id: tuple(r[f"c{j}"] for j in range(_PQ_M))
            for r in df.collect()
        }

    reg = TopicRegistry()
    vecs = Topic(
        spark, "pq_vecs", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/pq-state"
    h = pq_index_pipe(
        vecs, sdir, cbs, name="pq-pipe",
        compact_every=2, retrain_on_compact=True,
    )
    try:
        for lo in range(0, 20, 10):  # waves 1-2: initial codebooks
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in rows[lo : lo + 10]
                ],
                barrier="chain",
            )
        v20 = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows[:20]],
            "vec_id long, e array<double>",
        )
        assert codes_of(read_pq_codes(spark, sdir)) == codes_of(
            pq_encode(v20, cbs)
        )

        # wave 3 crosses compact_every=2 -> compaction + retrain; the
        # whole table must be re-encoded under the RETRAINED codebooks
        # and the new wave encoded consistently with them
        vecs.send(
            [
                {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                for r in rows[20:30]
            ],
            barrier="chain",
        )
        trained = load_pq_codebooks(sdir)
        assert trained is not None and trained != cbs
        v30 = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows],
            "vec_id long, e array<double>",
        )
        assert codes_of(read_pq_codes(spark, sdir)) == codes_of(
            pq_encode(v30, trained)
        )
        h.stop()

        # restart: the SAME pipe name resumes from its checkpoint (new
        # batch ids continue, no replay-overwrite of compacted dirs)
        # and must pick up the persisted trained codebooks, not the
        # constructor's stale ones
        h2 = pq_index_pipe(
            vecs, sdir, cbs, name="pq-pipe",
            compact_every=None, retrain_on_compact=False,
        )
        try:
            extra = emb.orderBy("vec_id").limit(35).collect()[30:35]
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in extra
                ],
                barrier="chain",
            )
            v35 = spark.createDataFrame(
                [(r.vec_id, list(r.embedding)) for r in rows]
                + [(r.vec_id, list(r.embedding)) for r in extra],
                "vec_id long, e array<double>",
            )
            assert codes_of(read_pq_codes(spark, sdir)) == codes_of(
                pq_encode(v35, trained)
            )
        finally:
            h2.stop()
    finally:
        h.stop()
        vecs.close()


def test_reject_stale_state_guard(tmp_path):
    """A fresh checkpoint (batch 0) over a state dir that already holds
    later batches means a new pipe name was pointed at an existing
    index — batch 0 would overwrite (possibly compacted) state. The
    guard must fail fast; legitimate cases (empty dir, crash-replay of
    batch 0 with only batch=0 present, any later batch id) pass."""
    import os

    import pytest as _pytest

    from async_event_streams_spark.streaming.state import reject_stale_state

    root = str(tmp_path / "state")
    os.makedirs(os.path.join(root, "batch=0"))
    reject_stale_state(root, 0, "t")  # replaying batch 0 alone: fine
    reject_stale_state(root, 5, "t")  # resumed checkpoint: fine
    os.makedirs(os.path.join(root, "batch=3"))
    reject_stale_state(root, 4, "t")  # later batch over later dirs: fine
    with _pytest.raises(ValueError, match="fresh checkpoint"):
        reject_stale_state(root, 0, "t")


def test_streaming_ivfpq_index_equals_batch(spark, sf_dir, topic_root):
    """The composed IVF×PQ streaming index must equal one-shot batch
    ivfpq_encode over the same vectors — across waves, a compaction
    that retrains BOTH quantizer levels, and a restart that must pick
    up the persisted (centroids, codebooks) pair."""
    from async_event_streams_spark.queries.llm import (
        _IVF_K,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        ivfpq_encode,
    )
    from async_event_streams_spark.streaming import (
        ivfpq_index_pipe,
        load_ivfpq_quantizers,
        read_ivfpq_index,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(35).collect()
    cents = [list(r.embedding) for r in rows[:_IVF_K]]
    full = [list(r.embedding) for r in rows[:_PQ_K]]
    cbs = [
        [c[_PQ_SUB * j : _PQ_SUB * (j + 1)] for c in full]
        for j in range(_PQ_M)
    ]

    def rows_of(df):
        return {
            r.vec_id: (r.cell, tuple(r[f"c{j}"] for j in range(_PQ_M)))
            for r in df.collect()
        }

    def vdf(rs):
        return spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rs],
            "vec_id long, e array<double>",
        )

    reg = TopicRegistry()
    vecs = Topic(
        spark, "ivfpq_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    sdir = f"{topic_root}/ivfpq-state"
    h = ivfpq_index_pipe(
        vecs, sdir, cents, cbs, name="ivfpq-pipe",
        compact_every=2, retrain_on_compact=True,
    )
    try:
        for lo in range(0, 20, 10):  # waves 1-2: constructor quantizers
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in rows[lo : lo + 10]
                ],
                barrier="chain",
            )
        assert rows_of(read_ivfpq_index(spark, sdir)) == rows_of(
            ivfpq_encode(vdf(rows[:20]), cents, cbs)
        )

        # wave 3 crosses compact_every=2: both quantizer levels retrain
        # and the whole table re-encodes under the new pair
        vecs.send(
            [
                {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                for r in rows[20:30]
            ],
            barrier="chain",
        )
        pair = load_ivfpq_quantizers(sdir)
        assert pair is not None
        tc, tb = pair
        assert tc != cents and tb != cbs
        assert rows_of(read_ivfpq_index(spark, sdir)) == rows_of(
            ivfpq_encode(vdf(rows[:30]), tc, tb)
        )
        h.stop()

        # restart with the STALE constructor quantizers: the pipe must
        # encode under the persisted trained pair instead
        h2 = ivfpq_index_pipe(
            vecs, sdir, cents, cbs, name="ivfpq-pipe",
            compact_every=None, retrain_on_compact=False,
        )
        try:
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in rows[30:35]
                ],
                barrier="chain",
            )
            assert rows_of(read_ivfpq_index(spark, sdir)) == rows_of(
                ivfpq_encode(vdf(rows), tc, tb)
            )
        finally:
            h2.stop()
    finally:
        h.stop()
        vecs.close()


def test_search_ivfpq_degenerates_to_ivf_search_with_wide_shortlist(
    spark, sf_dir, topic_root
):
    """Serving equivalence: with an unbounded shortlist the composed
    read path (cell probe → ADC → exact re-rank) must equal
    search_ivf_index exactly — the ADC stage only ever PRUNES; the
    exact re-rank restores true cosine order over whatever survives.
    With a tight shortlist, results must still be true-cosine-ranked
    and hit ≥0.8 recall@5 against the unbounded answer."""
    from async_event_streams_spark.queries.llm import (
        _IVF_K,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
    )
    from async_event_streams_spark.streaming import (
        ivf_index_pipe,
        ivfpq_index_pipe,
        search_ivf_index,
        search_ivfpq_index,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(40).collect()
    cents = [list(r.embedding) for r in rows[:_IVF_K]]
    full = [list(r.embedding) for r in rows[:_PQ_K]]
    cbs = [
        [c[_PQ_SUB * j : _PQ_SUB * (j + 1)] for c in full]
        for j in range(_PQ_M)
    ]
    payload = [
        {"vec_id": r.vec_id, "embedding": list(r.embedding)} for r in rows
    ]

    reg = TopicRegistry()
    v1 = Topic(
        spark, "sivf_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    v2 = Topic(
        spark, "sivfpq_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    d1, d2 = f"{topic_root}/sivf", f"{topic_root}/sivfpq"
    h1 = ivf_index_pipe(v1, d1, cents, name="sivf-pipe")
    h2 = ivfpq_index_pipe(v2, d2, cents, cbs, name="sivfpq-pipe")
    try:
        v1.send(payload, barrier="chain")
        v2.send(payload, barrier="chain")
        queries = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows[:6]],
            "query_id long, embedding array<double>",
        )
        want = {
            (r.query_id, r.neighbor_id, r.rnk, r.score)
            for r in search_ivf_index(
                spark, d1, queries, probes=3, k=5
            ).collect()
        }
        wide = {
            (r.query_id, r.neighbor_id, r.rnk, r.score)
            for r in search_ivfpq_index(
                spark, d2, queries, probes=3, k=5, shortlist=10_000
            ).collect()
        }
        assert wide == want

        tight = search_ivfpq_index(
            spark, d2, queries, probes=3, k=5, shortlist=8
        ).collect()
        per_q = {}
        for r in tight:
            per_q.setdefault(r.query_id, []).append(r)
        want_ids = {}
        for q, n, rnk, s in want:
            want_ids.setdefault(q, set()).add(n)
        hits = total = 0
        for q, rs in per_q.items():
            scores = [r.score for r in sorted(rs, key=lambda r: r.rnk)]
            assert scores == sorted(scores, reverse=True), q
            total += len(rs)
            hits += sum(1 for r in rs if r.neighbor_id in want_ids[q])
        assert total and hits / total >= 0.8, (hits, total)
    finally:
        h1.stop()
        h2.stop()
        v1.close()
        v2.close()


def test_resent_vector_updates_index_latest_wins(spark, sf_dir, topic_root):
    """A producer re-sending a vec_id in a later micro-batch UPDATES
    it: read/search paths must return the id once, scored under its
    newest embedding — not twice occupying two result ranks (the
    append-only batch=N layout holds both rows; dedup is the read
    contract, keyed by the stamped __batch column)."""
    from async_event_streams_spark.streaming import (
        ivf_index_pipe,
        search_ivf_index,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(12).collect()
    cents = [list(r.embedding) for r in rows[:4]]
    reg = TopicRegistry()
    vecs = Topic(
        spark, "upd_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    sdir = f"{topic_root}/upd-state"
    h = ivf_index_pipe(vecs, sdir, cents, name="upd-pipe")
    try:
        vecs.send(
            [
                {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                for r in rows[:10]
            ],
            barrier="chain",
        )
        # re-send id 5 with vector 11's embedding in a later batch
        updated = list(rows[11].embedding)
        vecs.send([{"vec_id": 5, "embedding": updated}], barrier="chain")

        idx = spark.read.parquet(*state_dirs(sdir))
        assert idx.filter(F.col("vec_id") == 5).count() == 2  # raw layout

        q = spark.createDataFrame(
            [(999, updated)], "query_id long, embedding array<double>"
        )
        res = search_ivf_index(spark, sdir, q, probes=4, k=10).collect()
        fives = [r for r in res if r.neighbor_id == 5]
        assert len(fives) == 1  # once, not twice
        # scored under the NEW embedding: cosine(updated, updated) = 1
        assert abs(fives[0].score - 1.0) < 1e-6
        assert fives[0].rnk == 1
    finally:
        h.stop()
        vecs.close()


def test_ivfpq_rows_before_json_crash_heals_on_next_retrain(
    spark, sf_dir, topic_root
):
    """The documented single-file caveat: a crash AFTER the retrain's
    re-encode loop but BEFORE the quantizer-pair publish leaves rows
    encoded under quantizers the json doesn't hold. The contract is
    forward-healing: the NEXT compaction+retrain re-encodes every dir
    under a freshly-trained pair and publishes it — after which the
    whole index must again equal batch ivfpq_encode under the
    persisted pair."""
    from async_event_streams_spark.queries.llm import (
        _IVF_K,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        ivfpq_encode,
    )
    from async_event_streams_spark.streaming import (
        ivfpq_index_pipe,
        load_ivfpq_quantizers,
        read_ivfpq_index,
    )
    from async_event_streams_spark.streaming.ann import _read_dirs

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(30).collect()
    cents = [list(r.embedding) for r in rows[:_IVF_K]]
    full = [list(r.embedding) for r in rows[:_PQ_K]]
    cbs = [
        [c[_PQ_SUB * j : _PQ_SUB * (j + 1)] for c in full]
        for j in range(_PQ_M)
    ]
    reg = TopicRegistry()
    vecs = Topic(
        spark, "tear_vecs", "vec_id long, embedding array<double>",
        topic_root, reg,
    )
    sdir = f"{topic_root}/tear-state"
    h = ivfpq_index_pipe(vecs, sdir, cents, cbs, name="tear-pipe")
    try:
        vecs.send(
            [
                {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                for r in rows[:10]
            ],
            barrier="chain",
        )
        h.stop()

        # SIMULATE the crash window: re-encode the existing dirs under
        # a DIFFERENT pair (shifted centroids/codebooks) but do NOT
        # publish it — rows now disagree with the persisted json.
        import os

        from async_event_streams_spark.streaming import state_dirs

        other_cents = [list(reversed(c)) for c in cents]
        other_cbs = [[list(reversed(c)) for c in cb] for cb in cbs]
        for d in state_dirs(sdir):
            src = _read_dirs(spark, d).select("vec_id", "e", "__batch")
            tmp = d + ".rewrite"
            ivfpq_encode(
                src, other_cents, other_cbs, keep=("e", "__batch")
            ).write.mode("overwrite").parquet(tmp)
            import shutil

            shutil.rmtree(d)
            os.rename(tmp, d)
        persisted = load_ivfpq_quantizers(sdir)
        assert persisted is not None  # json still holds the OLD pair

        # restart; the next waves cross compact_every -> retrain, which
        # must re-encode EVERYTHING under a fresh pair and publish it
        h2 = ivfpq_index_pipe(
            vecs, sdir, cents, cbs, name="tear-pipe",
            compact_every=2, retrain_on_compact=True,
        )
        try:
            for lo in (10, 20):
                vecs.send(
                    [
                        {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                        for r in rows[lo : lo + 10]
                    ],
                    barrier="chain",
                )
            pair = load_ivfpq_quantizers(sdir)
            assert pair is not None
            tc, tb = pair
            v30 = spark.createDataFrame(
                [(r.vec_id, list(r.embedding)) for r in rows],
                "vec_id long, e array<double>",
            )
            got = {
                r.vec_id: (r.cell, tuple(r[f"c{j}"] for j in range(_PQ_M)))
                for r in read_ivfpq_index(spark, sdir).collect()
            }
            want = {
                r.vec_id: (r.cell, tuple(r[f"c{j}"] for j in range(_PQ_M)))
                for r in ivfpq_encode(v30, tc, tb).collect()
            }
            assert got == want  # healed: one consistent pair everywhere
        finally:
            h2.stop()
    finally:
        h.stop()
        vecs.close()
