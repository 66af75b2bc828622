"""Vector-similarity column expressions: dot/cosine via higher-order
functions (JVM-side, no Python), and a signed-random-projection LSH
bucketing for approximate nearest neighbors.

Scale notes (100 TB): cosine stays inside codegen (zip_with+aggregate
over array<float> promoted to double); LSH turns ANN from an all-pairs
cross join into an equi-join on bucket id — a plain shuffle-or-broadcast
hash join that Catalyst/AQE already knows how to scale and skew-split.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array columns.

    Accumulation is left-to-right in double, matching how a SQL oracle
    (DuckDB list_dot_product on DOUBLE[]) evaluates it.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def lsh_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Rademacher (±1) random hyperplanes.

    ±1 components keep the plan literals small and the projection a pure
    signed sum; seeded so the Spark plan and the SQL oracle embed the
    exact same planes.
    """
    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit p is set iff
    dot(vec, plane_p) >= 0. 2^n_planes buckets."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, plane_col) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def train_ivf_centroids(
    df, vec_col: str, k: int, seed: int = 42, max_iter: int = 10
) -> list[list[float]]:
    """Train IVF coarse centroids with distributed k-means (MLlib —
    itself a Spark DataFrame job, so training scales with the corpus).
    Returns plain float lists, ready to embed as plan literals in
    `ivf_cell`. The deterministic-centroid variant (queries/llm.py
    x_ann_ivf, vec_id<K picks) exists so a SQL oracle can replay the
    cells; this is the production path — trained cells follow the data
    distribution, so probing the nearest few recovers more true
    neighbors per candidate examined."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(v)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_cell(
    vec: Column, centroids: list[list[float]], round_dp: int | None = None
) -> Column:
    """Nearest-centroid cell id (argmax cosine, first index on ties) as
    one JVM-side expression over literal centroids — no join, no Python,
    and crucially NO exchange: assignment happens in the scan stage, so
    the N-row side never shuffles (a groupBy/max_by or window argmax
    moves every vector through an exchange for a value each row can
    compute locally). Built as array-of-scores + array_position(
    array_max): expression size is LINEAR in K (a chained `when` argmax
    doubles per step — 2^K nodes — and overflows plan conversion around
    K=16). `round_dp` rounds each score before the argmax so a SQL
    oracle's `ORDER BY ROUND(cs, dp) DESC, centroid_id` tie-break is
    reproduced exactly (first index on rounded ties == lowest id)."""
    scores = F.array(
        *[cosine(vec, F.array(*[F.lit(x) for x in c])) for c in centroids]
    )
    if round_dp is not None:
        scores = F.transform(scores, lambda s: F.round(s, round_dp))
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
