"""Streaming ANN index maintenance: an IVF (inverted-file) cell index
over a growing embedding corpus, maintained by a pipe.

The batch twin is `queries/llm.py::x_ann_ivf`: vectors are assigned to
their nearest coarse centroid by a literal-centroid argmax evaluated in
the scan (zero exchanges), and search probes only the closest cells —
ANN reduced to an equi-join. Here the assignment runs per micro-batch
as embeddings arrive, appending to a batch-versioned parquet index
(same replay-safe layout as the dedup pipes: batch N owns `batch=N`
with overwrite), and `search_ivf_index` answers top-k queries against
everything indexed so far.

Scale shape: indexing is a stateless per-row map (the expensive
argmax literals are compiled once per micro-batch plan); the index is
partitioned parquet a cluster deployment would back with a real table,
compacted via `compact_state`. Search broadcasts the (small) query set
against only the probed cells' rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.similarity import dot
from .state import reject_partitioned_source, state_dirs


def ivf_index_pipe(
    source,
    state_dir: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "ivf-index",
):
    """Maintain the IVF index over a stream of embeddings: each
    micro-batch assigns `vec_col` to its nearest centroid (in-scan
    argmax, same plan as the batch x_ann_ivf) and appends
    (id, e, cell) rows to the index. Returns the PipeHandle."""
    from ..queries.llm import ivf_assign
    from ..topics.pipe import pipe
    from ..util import materialize

    reject_partitioned_source(source, "ivf_index_pipe")
    os.makedirs(state_dir, exist_ok=True)

    def index_batch(df, batch_id: int):
        v = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        assigned = materialize(ivf_assign(v, centroids))
        (
            assigned.write.mode("overwrite")  # replay-safe: batch N owns it
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        return assigned.select("vec_id", "cell")

    return pipe(source, fn=index_batch, sink_fn=lambda df, b: None, name=name)


def search_ivf_index(
    spark: SparkSession,
    state_dir: str,
    queries_df: DataFrame,
    centroids: list[list[float]],
    probes: int = 4,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector against everything
    indexed so far: rank the query's `probes` nearest cells (broadcast
    K-row centroid table), equi-join the index on cell, score, take
    top-k. Tie discipline matches the batch x_ann_ivf (score rounded to
    9 dp, neighbor_id ascending)."""
    dirs = state_dirs(state_dir)
    if not dirs:
        raise ValueError(f"no index under {state_dir}")
    index = spark.read.parquet(*dirs)
    cent = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)],
        "centroid_id int, ce array<double>",
    )
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cs"), 9).desc(), F.col("centroid_id")
    )
    probes_df = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "centroid_id",
            (dot(F.col("qe"), F.col("ce")) / F.sqrt(dot(F.col("ce"), F.col("ce")))).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= probes)
        .select("query_id", "qe", F.col("centroid_id").alias("cell"))
    )
    scored = (
        F.broadcast(probes_df)
        .join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qe"), F.col("e"))
                / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("e"), F.col("e"))))
            ).alias("score"),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )
