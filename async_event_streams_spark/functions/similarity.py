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
