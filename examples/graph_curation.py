#!/usr/bin/env python
"""Corpus curation on the kNN-graph substrate: build the edge list
once, then run its three consumers — label-propagation communities
(name the topical structure), integer PageRank (importance weight),
greedy k-center (diversity sample) — and join them into one curation
report: which communities the diverse sample covers, and how central
its picks are.
Run: python examples/graph_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.queries.llm import (
    x_kcenter_sample,
    x_knn_communities,
    x_knn_graph,
    x_knn_pagerank,
)
from async_event_streams_spark.session import get_spark
from async_event_streams_spark.util import artifact


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="graph-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    # The edge artifact is session-memoized: the first consumer builds
    # it (bucket-local equi-join + WindowGroupLimit, never all-pairs),
    # the rest broadcast-reuse it.
    edges = artifact(
        spark, f"{sf_dir}:knn_edges", lambda: x_knn_graph(spark, sf_dir)
    )
    print(f"kNN edges: {edges.count()}")

    comm = x_knn_communities(spark, sf_dir)  # (vec_id, community)
    pr = x_knn_pagerank(spark, sf_dir)  # (vec_id, pr_units)
    sample = x_kcenter_sample(spark, sf_dir)  # (pick, vec_id, cov)

    # Community size distribution — the topical map.
    comm.groupBy("community").count().groupBy("count").agg(
        F.count("*").alias("n_communities")
    ).orderBy("count").show(10)

    # The curation report: each diversity pick with its community,
    # that community's size, and the pick's centrality percentile.
    n = pr.count()
    report = (
        sample.join(comm, "vec_id")
        .join(pr, "vec_id")
        .join(
            comm.groupBy("community").agg(
                F.count("*").alias("community_size")
            ),
            "community",
        )
        .select(
            "pick",
            "vec_id",
            "community",
            "community_size",
            "pr_units",
            F.round(F.col("cov"), 4).alias("coverage_at_pick"),
        )
        .orderBy("pick")
    )
    report.show()

    covered = sample.join(comm, "vec_id").select("community").distinct().count()
    total = comm.select("community").distinct().count()
    print(
        f"diversity sample covers {covered}/{total} communities "
        f"({n} vectors total)"
    )


if __name__ == "__main__":
    main()
