#!/usr/bin/env python
"""Round-9 retrieval surface in one pass: build the keyword side (the
block-partitioned inverted index + a conjunctive BM25 search answered
from the index alone) and the vector side (integer Lloyd k-means →
quality acceptance → IVF search over the TRAINED quantizer), then the
time-series/reporting additions (EWMA, rolling median, cumulative
reach, per-source dataset cards, share-of-parent). Every number here
is a registered, oracle-checked query — this example only composes
them; the pinned artifacts (posting lists, doc lengths, quantized
vectors, trained centroids) are built once and shared across stages,
which is the point.
Run: python examples/retrieval_tour.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.session import get_spark
from async_event_streams_spark.util import drain_artifact_events


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="retrieval-tour-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== inverted index: heaviest posting blocks ==")
    QUERIES["x_inverted_index"](spark, sf_dir).orderBy(
        "term", "block_id"
    ).show(10, truncate=False)

    print("== keyword search: conjunctive BM25 top-10, index-resolved ==")
    QUERIES["x_keyword_search"](spark, sf_dir).orderBy("rank").show(10)

    print("== k-means training: final assignment sample ==")
    QUERIES["x_kmeans"](spark, sf_dir).orderBy("vec_id").show(5)

    print("== quantizer acceptance: cohesion vs separation ==")
    QUERIES["x_kmeans_quality"](spark, sf_dir).orderBy("cluster").show(10)

    print("== IVF over the trained quantizer: top-5 per query ==")
    QUERIES["x_ann_ivf_trained"](spark, sf_dir).orderBy(
        "query_id", "rank"
    ).show(10)

    print("== hybrid search: keyword + vector RRF fusion ==")
    QUERIES["x_hybrid_rrf"](spark, sf_dir).orderBy("rank").show(10)

    ev = drain_artifact_events()
    builds = sum(1 for _, kind in ev if kind == "build")
    hits = sum(1 for _, kind in ev if kind == "hit")
    print(f"artifact economy: {builds} builds, {hits} hits "
          "(train once, search many)")

    print("== time series: EWMA + rolling median (one user) ==")
    QUERIES["c_ewma"](spark, sf_dir).filter("user_id = 1").orderBy(
        "event_id"
    ).show(5)
    QUERIES["c_window_rolling_median"](spark, sf_dir).filter(
        "user_id = 1"
    ).orderBy("event_id").show(5)

    print("== cumulative reach curve ==")
    QUERIES["c_cumulative_reach"](spark, sf_dir).orderBy("day").show(10)

    print("== dataset cards (per source) ==")
    QUERIES["x_dataset_card"](spark, sf_dir).orderBy("source").show(
        10, truncate=False
    )

    print("== share-of-parent rollup (top nations) ==")
    QUERIES["c_share_of_parent"](spark, sf_dir).orderBy(
        "region", "nation"
    ).show(10, truncate=False)


if __name__ == "__main__":
    main()
