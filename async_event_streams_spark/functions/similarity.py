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


def _sql_double(w: float) -> str:
    """A Spark SQL DOUBLE literal that round-trips the exact bits:
    repr() is the shortest string that parses back to the same double
    (both CPython strtod and Java Double.parseDouble round correctly),
    and the D suffix keeps Spark from typing `0.5` as DECIMAL."""
    return f"{float(w)!r}D"


def _sql_dot_lit(
    vec_sql: str,
    lits: list[float],
    assume_double: bool = False,
    offset: int = 0,
) -> str:
    """Unrolled dot product of an array column against Python-literal
    weights as SQL text: left-to-right double accumulation, bit-identical
    to the HOF `dot` and DuckDB's list_dot_product on DOUBLE[].
    `assume_double` skips the per-element CAST when the caller already
    cast the array to array<double> (one cast node instead of dim*K).
    `offset` indexes a SUBSPACE of the column ([offset, offset+len)) —
    the product-quantization path dots sub-slices without materializing
    slice() expressions per element.

    Two emission forms, same left-to-right double accumulation and
    bit-identical results (r13 collect-equality check): short vectors
    unroll into scalar multiply-adds (codegen-friendly straight-line
    code); long ones emit aggregate(zip_with(slice, <array literal>))
    — a runtime LOOP whose generated code is O(1) in the vector
    length. The unrolled form at K-centroid scale (16 centroids x
    16-64 dims per score array, several arrays per stage) blew the
    JVM's 64 KB method limit: janino failed, the whole stage fell
    back to INTERPRETED execution (53 'Code grows beyond 64 KB'
    fallbacks per bench run on the x_ann_ivf/pq/ivfpq builds), and
    the 'codegen-friendly' unrolling became the slowest path of all —
    measured 1.02 -> 0.65 s for the sf0.1 PQ encode scan after the
    switch. Spark's left-to-right fold in `aggregate` matches the
    unrolled `+` chain's association exactly, so oracle rounding
    discipline is untouched."""
    if len(lits) <= 8:
        if assume_double:
            terms = (
                f"{vec_sql}[{offset + i}] * {_sql_double(w)}"
                for i, w in enumerate(lits)
            )
        else:
            terms = (
                f"CAST({vec_sql}[{offset + i}] AS DOUBLE) * {_sql_double(w)}"
                for i, w in enumerate(lits)
            )
        return "(" + " + ".join(terms) + ")"
    arr = "array(" + ", ".join(_sql_double(w) for w in lits) + ")"
    x = "x" if assume_double else "CAST(x AS DOUBLE)"
    return (
        f"aggregate(zip_with(slice({vec_sql}, {offset + 1}, {len(lits)}), "
        f"{arr}, (x, y) -> {x} * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def ivf_cell(
    vec_sql: str, centroids: list[list[float]], round_dp: int | None = None
) -> Column:
    """Nearest-centroid cell id (argmax cosine, first index on ties) as
    one JVM-side expression over literal centroids — no join, no Python,
    and crucially NO exchange: assignment happens in the scan stage, so
    the N-row side never shuffles (a groupBy/max_by or window argmax
    moves every vector through an exchange for a value each row can
    compute locally). `vec_sql` is the vector column as SQL text (e.g.
    "embedding"): the whole argmax is generated as ONE SQL string and
    parsed by a single F.expr call — building the equivalent unrolled
    Column tree costs thousands of Py4J round-trips (~12 s for K=16,
    dim=64), and the HOF-cosine form evaluates interpreted per element.
    Scores are unrolled scalar multiply-adds (codegen-friendly) with
    centroid norms folded to Python-float literals (Python's L2R sum
    matches the engines' accumulation order, so the fold is
    bit-identical). The metric is dot/||centroid|| — the same argmax as
    full cosine, since the query-vector norm is a positive per-row
    constant — which keeps expression size LINEAR in K with no repeated
    self-dot. `round_dp` rounds each score before the argmax so a SQL
    oracle's `ORDER BY ROUND(cs, dp) DESC, centroid_id` tie-break is
    reproduced exactly (first index on rounded ties == lowest id)."""
    arr = ivf_scores_sql(vec_sql, centroids, round_dp)
    return F.expr(
        f"CAST(array_position({arr}, array_max({arr})) - 1 AS INT)"
    )


def pq_sub_scores_sql(
    vec_sql: str,
    subcentroids: list[list[float]],
    offset: int,
    round_dp: int | None = None,
    assume_double: bool = False,
) -> str:
    """Per-sub-centroid score array over ONE subspace of `vec_sql`
    (elements [offset, offset+sub_dim)) — `ivf_scores_sql` restricted
    to a slice, for product-quantization encoding: each subspace's
    argmax over its K sub-centroids is an in-scan expression, so
    encoding N vectors into m codes adds zero exchanges, exactly like
    `ivf_cell`. Same dot/||centroid|| metric and ROUND tie discipline
    so a SQL oracle replays the codes."""
    import math

    scores = []
    for c in subcentroids:
        cnorm = _sql_double(math.sqrt(sum(x * x for x in c)))
        s = f"({_sql_dot_lit(vec_sql, c, assume_double, offset)} / {cnorm})"
        scores.append(f"ROUND({s}, {round_dp})" if round_dp is not None else s)
    return f"array({', '.join(scores)})"


def ivf_scores_sql(
    vec_sql: str,
    centroids: list[list[float]],
    round_dp: int | None = None,
    assume_double: bool = False,
) -> str:
    """SQL text for the per-centroid score array underlying `ivf_cell`.
    Exposed separately so callers can bind it to a column in its own
    projection and take the argmax in a second one — `array_position(
    arr, array_max(arr))` repeats the K*dim score expression twice when
    inlined, and CollapseProject leaves the two-projection form alone
    (measured ~2x faster optimize+codegen at K=16, dim=64)."""
    import math

    scores = []
    for c in centroids:
        # dot/||centroid||: same argmax as full cosine (the query-vector
        # norm is a positive per-row constant factor), half the
        # expression — the 64-term self-dot isn't repeated per centroid.
        cnorm = _sql_double(math.sqrt(sum(x * x for x in c)))
        s = f"({_sql_dot_lit(vec_sql, c, assume_double)} / {cnorm})"
        scores.append(f"ROUND({s}, {round_dp})" if round_dp is not None else s)
    return f"array({', '.join(scores)})"
