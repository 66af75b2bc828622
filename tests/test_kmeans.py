"""x_kmeans (round 9): Lloyd invariants the oracle can't state —
monotone inertia across rounds and assignment optimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import (
    _KM_ITERS,
    _KM_K,
    _km_assign,
    _km_update,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.util import materialize


def _prep(spark, sf_dir):
    from pyspark.sql.window import Window

    emb = table(spark, sf_dir, "embeddings")
    V = materialize(
        emb.select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda e: F.floor(e.cast("double") * 1000000).cast("long"),
            ).alias("x"),
        )
    )
    w0 = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    cent = materialize(
        V.select(
            F.row_number().over(w0).cast("long").alias("cid"),
            F.col("x").alias("c"),
        ).filter(F.col("cid") <= _KM_K)
    )
    return V, cent


def test_kmeans_inertia_monotone_and_assignment_optimal(spark, sf_dir):
    V, cent = _prep(spark, sf_dir)
    inertias = []
    for _ in range(_KM_ITERS + 1):
        a = _km_assign(V, cent)
        inertias.append(a.agg(F.sum("d")).collect()[0][0])
        cent = materialize(_km_update(a))
    # Lloyd with EXACT means decreases inertia every round; quantized
    # (truncate-divided) centroids can perturb that by at most the
    # lattice rounding, so assert non-strict monotonicity.
    assert all(b <= a for a, b in zip(inertias, inertias[1:])), inertias
    assert inertias[-1] < inertias[0]  # it actually moved


def test_kmeans_output_contract(spark, sf_dir):
    rows = QUERIES["x_kmeans"](spark, sf_dir).collect()
    assert len(rows) == len(set(r.vec_id for r in rows))  # one row per vec
    assert all(1 <= r.cluster <= _KM_K for r in rows)
    assert all(r.d_micro2 >= 0 for r in rows)
    assert len(set(r.cluster for r in rows)) > 1  # not degenerate
