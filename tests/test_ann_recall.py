"""ANN quality: the approximate variants must be *useful* indexes, not
just oracle-consistent ones — an index whose buckets/cells were
uncorrelated with similarity would still hash-match its own oracle.

The honest metric on this synthetic corpus (near-orthogonal random
vectors — the hard case for every index family) is LIFT: recall divided
by the fraction of the corpus examined. Random candidate selection has
lift 1 by construction; a working index concentrates true neighbors in
its candidate set. Measured: LSH ~0.4% of corpus examined at 2-4%
recall (lift 5-9×); IVF ~25% examined at >0.9 recall (lift ~3.7×).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.functions.similarity import lsh_bucket
from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import _PLANES
from async_event_streams_spark.tables import table


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(exact: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    assert set(approx) <= set(exact)  # no phantom query ids
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return hits / sum(len(v) for v in exact.values())


def test_lsh_lift_over_random_bucketing(spark, sf_dir):
    exact = _topk_sets(QUERIES["x_cosine_topk"](spark, sf_dir))
    recall = _recall(exact, _topk_sets(QUERIES["x_ann_lsh"](spark, sf_dir)))
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    b = emb.select("vec_id", lsh_bucket(F.col("embedding"), _PLANES).alias("bucket"))
    sizes = {r.bucket: r.c for r in b.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    qb = {r.vec_id: r.bucket for r in b.filter("vec_id < 10").collect()}
    examined = sum((sizes[qb[q]] - 1) / (n - 1) for q in qb) / len(qb)
    lift = recall / examined
    assert lift >= 3.0, f"recall {recall:.3f} over {examined:.4f} examined = lift {lift:.1f}"


def test_trained_ivf_centroids(spark, sf_dir):
    """The production IVF path: k-means-trained centroids (MLlib,
    distributed) embedded as plan literals via ivf_cell. Two properties
    gate it: (a) recall beats random candidate selection (~25% of the
    corpus probed → random gives ~0.25; measured ~0.5), and (b) cells
    stay balanced — the point of *training* the quantizer is that no
    cell collects a disproportionate share, which at scale is the
    difference between a bounded per-cell scan and a hot-key stall.
    (The deterministic x_ann_ivf variant scores higher recall here only
    because its query vectors are their own centroids — a degenerate
    favorable case; it exists for SQL-oracle replayability.)"""
    _trained_ivf_gate(spark, sf_dir)


def test_trained_ivf_centroids_sf01(spark):
    """Same gate at sf0.1 (~5k vectors): training, cell balance, and
    recall lift must hold at the bench scale, not just the unit scale."""
    _trained_ivf_gate(spark, "/root/testdata/sf0.1")


def _trained_ivf_gate(spark, sf_dir):
    import math

    from pyspark.sql.window import Window

    from async_event_streams_spark.functions.similarity import (
        cosine,
        ivf_cell,
        train_ivf_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, "embedding", 16)
    assigned = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        ivf_cell("embedding", cents).alias("cell"),
    )
    sizes = [r["count"] for r in assigned.groupBy("cell").count().collect()]
    n = sum(sizes)
    assert max(sizes) <= 3 * (n / 16), f"hot cell: {max(sizes)} of {n}"

    q = {r.vec_id: list(r.embedding) for r in emb.filter("vec_id < 10").collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    probes = []
    for qid, qe in q.items():
        ranked = sorted(((cos(qe, c), i) for i, c in enumerate(cents)), reverse=True)
        probes += [(qid, i) for _, i in ranked[:4]]
    pdf = spark.createDataFrame(probes, "query_id long, cell int")
    qdf = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in q.items()],
        "query_id long, qe array<double>",
    )
    scored = (
        assigned.join(F.broadcast(pdf.join(qdf, "query_id")), "cell")
        .filter("vec_id <> query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("e")).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 9).desc(), "neighbor_id"
    )
    top = scored.withColumn("rn", F.row_number().over(w)).filter("rn <= 5")
    approx: dict[int, set[int]] = {}
    for r in top.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact = _topk_sets(QUERIES["x_cosine_topk"](spark, sf_dir))
    recall = _recall(exact, approx)
    assert recall >= 0.4, f"trained-IVF recall {recall:.3f}"


def test_ivf_recall(spark, sf_dir):
    """IVF probes 4/16 cells (~25% of the corpus) and must recover well
    over half the true top-5 — i.e., nearest-cell probing concentrates
    neighbors (measured ~0.92; random 25% sampling would give ~0.25)."""
    exact = _topk_sets(QUERIES["x_cosine_topk"](spark, sf_dir))
    recall = _recall(exact, _topk_sets(QUERIES["x_ann_ivf"](spark, sf_dir)))
    assert recall >= 0.5, f"x_ann_ivf recall {recall:.3f}"


def test_trained_pq_codebooks_recall_on_clustered_corpus(spark):
    """The production PQ pipeline: per-subspace k-means codebooks
    (MLlib via train_ivf_centroids on each slice), ADC scoring over the
    codes, then EXACT RE-RANK of the ADC shortlist — the standard PQ
    deployment, because quantization deliberately erases intra-cluster
    detail (same-cluster members share codes, so their relative ADC
    order is noise; measured recall@5 of raw ADC is ~0.2 here for
    exactly that reason). Two gates on a clustered corpus (the workload
    PQ exists for): (a) coarse fidelity — ADC's top-5 come from the
    query's true cluster; (b) end-to-end recall@5 after exact re-rank
    of the top-50 ADC shortlist vs exact cosine (random shortlisting
    would give ~0.12)."""
    import math
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from async_event_streams_spark.functions.similarity import (
        dot,
        train_ivf_centroids,
    )
    from async_event_streams_spark.queries.llm import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        pq_encode,
    )

    rng = random.Random(11)
    dim, n_clusters, n = _PQ_M * _PQ_SUB, 12, 400
    centers = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    vecs = []
    for i in range(n):
        c = centers[i % n_clusters]
        vecs.append((i, [x + rng.gauss(0, 0.15) for x in c]))
    v = spark.createDataFrame(vecs, "vec_id long, e array<double>")

    def cos(a, b):
        num = sum(p * q for p, q in zip(a, b))
        return num / math.sqrt(
            sum(p * p for p in a) * sum(q * q for q in b)
        )

    by_id = dict(vecs)
    exact = {
        q: set(
            sorted(
                (i for i in by_id if i != q),
                key=lambda i: (-round(cos(by_id[q], by_id[i]), 9), i),
            )[:5]
        )
        for q in range(10)
    }

    trained = []
    for j in range(_PQ_M):
        sub = v.select(F.slice("e", _PQ_SUB * j + 1, _PQ_SUB).alias("se"))
        trained.append(train_ivf_centroids(sub, "se", k=_PQ_K, seed=7))

    codes = pq_encode(v, trained)
    cb_rows = spark.createDataFrame(
        [
            (j, k, trained[j][k])
            for j in range(_PQ_M)
            for k in range(len(trained[j]))
        ],
        "j int, cid int, ce array<double>",
    )
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = codes.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    num = den2 = None
    for j in range(_PQ_M):
        cbj = cb_rows.filter(F.col("j") == j).select(
            F.col("cid").alias(f"c{j}"), F.col("ce").alias(f"ce{j}")
        )
        scored = scored.join(F.broadcast(cbj), f"c{j}")
        qs = F.slice("qe", _PQ_SUB * j + 1, _PQ_SUB)
        t = dot(qs, F.col(f"ce{j}"))
        n2 = dot(F.col(f"ce{j}"), F.col(f"ce{j}"))
        num = t if num is None else num + t
        den2 = n2 if den2 is None else den2 + n2
    scored = scored.withColumn(
        "score", num / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(den2))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    adc5 = scored.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 5")
    # (a) coarse fidelity: ADC's top-5 are from the query's true cluster
    same_cluster = 0
    for r in adc5.select("query_id", "vec_id").collect():
        same_cluster += (r.vec_id % n_clusters) == (r.query_id % n_clusters)
    assert same_cluster >= 45, same_cluster  # >= 90% of 10 queries x 5

    # (b) shortlist -> exact re-rank: top-50 by ADC, exact cosine top-5
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 50")
        .select("query_id", "qe", "vec_id")
    )
    reranked = (
        shortlist.join(v, "vec_id")
        .withColumn("xscore", F.round(dot(F.col("qe"), F.col("e"))
            / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("e"), F.col("e")))), 9))
        .withColumn(
            "xrnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("xscore").desc(), F.col("vec_id")
                )
            ),
        )
        .filter("xrnk <= 5")
    )
    approx = {}
    for r in reranked.select("query_id", "vec_id").collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    recall = _recall(exact, approx)
    assert recall >= 0.8, recall


def test_ivfpq_composed_recall_beats_components(spark):
    """The composed IVF x PQ index (r4 VERDICT item 5): IVF cell
    shortlist -> ADC over PQ codes within probed cells -> exact re-rank.
    Gate: on a clustered corpus with TRAINED quantizers, composed
    recall@5 must be >= the better of IVF-alone (exact scoring in the
    same probed cells — equal probe budget) and PQ-alone (ADC over the
    whole corpus + same-size re-rank) — i.e. composing the two
    restrictions loses nothing while scoring compressed codes over a
    fraction of the corpus."""
    import math
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from async_event_streams_spark.functions.similarity import (
        dot,
        train_ivf_centroids,
    )
    from async_event_streams_spark.queries.llm import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        ivf_assign,
        pq_encode,
    )

    rng = random.Random(23)
    dim, n_clusters, n = _PQ_M * _PQ_SUB, 12, 400
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    vecs = []
    for i in range(n):
        c = centers[i % n_clusters]
        vecs.append((i, [x + rng.gauss(0, 0.15) for x in c]))
    v = spark.createDataFrame(vecs, "vec_id long, e array<double>")

    def cos(a, b):
        return sum(p * q for p, q in zip(a, b)) / math.sqrt(
            sum(p * p for p in a) * sum(q * q for q in b)
        )

    by_id = dict(vecs)
    exact = {
        q: set(
            sorted(
                (i for i in by_id if i != q),
                key=lambda i: (-round(cos(by_id[q], by_id[i]), 9), i),
            )[:5]
        )
        for q in range(10)
    }

    cents = train_ivf_centroids(v, "e", k=16, seed=7)
    cbs = []
    for j in range(_PQ_M):
        sub = v.select(F.slice("e", _PQ_SUB * j + 1, _PQ_SUB).alias("se"))
        cbs.append(train_ivf_centroids(sub, "se", k=_PQ_K, seed=7))

    cells = ivf_assign(v, cents)  # (vec_id, e, cell)
    codes = pq_encode(v, cbs)  # (vec_id, c0..cM-1)
    cent_df = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(cents)],
        "centroid_id int, ce array<double>",
    )
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cs"), 9).desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .select(
            "query_id",
            "qe",
            "centroid_id",
            (dot(F.col("qe"), F.col("ce"))
             / F.sqrt(dot(F.col("ce"), F.col("ce")))).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter("rn <= 4")
        .select("query_id", "qe", F.col("centroid_id").alias("cell"))
    )

    def topk_sets(df, id_col="vec_id"):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r[id_col])
        return out

    w5 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )

    # IVF-alone: exact cosine within probed cells
    ivf_top5 = (
        cells.join(
            F.broadcast(probes),
            (cells.cell == probes.cell) & (cells.vec_id != probes.query_id),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qe"), F.col("e"))
                / (F.sqrt(dot(F.col("qe"), F.col("qe")))
                   * F.sqrt(dot(F.col("e"), F.col("e")))), 9
            ).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w5))
        .filter("rnk <= 5")
    )

    def adc_rerank(cand):
        """ADC-score candidates (query_id, qe, vec_id, c0..), shortlist
        50 (the same re-rank budget the trained-PQ gate uses — it must
        cover a cluster's ~33 members, because same-cluster codes are
        near-identical and ADC cannot order within a cluster), exact
        re-rank to top-5."""
        scored = cand
        num = den2 = None
        for j in range(_PQ_M):
            cbj = spark.createDataFrame(
                [(k, list(cbs[j][k])) for k in range(len(cbs[j]))],
                f"c{j} int, ce{j} array<double>",
            )
            scored = scored.join(F.broadcast(cbj), f"c{j}")
            qs = F.slice("qe", _PQ_SUB * j + 1, _PQ_SUB)
            t = dot(qs, F.col(f"ce{j}"))
            n2 = dot(F.col(f"ce{j}"), F.col(f"ce{j}"))
            num = t if num is None else num + t
            den2 = n2 if den2 is None else den2 + n2
        scored = scored.withColumn(
            "score",
            num / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(den2)),
        )
        short = (
            scored.withColumn("rnk", F.row_number().over(w5))
            .filter("rnk <= 50")
            .select("query_id", "qe", "vec_id")
        )
        return (
            F.broadcast(short)
            .join(v.select(F.col("vec_id").alias("nid"), "e"),
                  F.col("vec_id") == F.col("nid"))
            .select(
                "query_id",
                "vec_id",
                F.round(
                    dot(F.col("qe"), F.col("e"))
                    / (F.sqrt(dot(F.col("qe"), F.col("qe")))
                       * F.sqrt(dot(F.col("e"), F.col("e")))), 9
                ).alias("score"),
            )
            .withColumn("rnk", F.row_number().over(w5))
            .filter("rnk <= 5")
        )

    # PQ-alone: ADC over the WHOLE corpus + re-rank
    pq_cand = codes.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    pq_top5 = adc_rerank(pq_cand)

    # Composed: ADC only within probed cells + re-rank
    comp_cand = (
        cells.select("vec_id", "cell")
        .join(codes, "vec_id")
        .join(
            F.broadcast(probes.select("query_id", "qe", "cell")), "cell"
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    comp_top5 = adc_rerank(comp_cand)

    r_ivf = _recall(exact, topk_sets(ivf_top5))
    r_pq = _recall(exact, topk_sets(pq_top5))
    r_comp = _recall(exact, topk_sets(comp_top5))
    assert r_comp >= max(r_ivf, r_pq), (
        f"composed {r_comp:.3f} < max(ivf {r_ivf:.3f}, pq {r_pq:.3f})"
    )
    assert r_comp >= 0.8, f"composed recall {r_comp:.3f}"
