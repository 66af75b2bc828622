#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 tables K× (with key offsets so
cardinalities grow realistically) and measure how the heavy plans scale
vs the sf0.1 baseline. A plan whose runtime grows ~linearly with input
(at fixed parallelism) is shuffle/skew-healthy; super-linear growth
flags a plan that won't survive the next 100×.

Usage: python tools/scale_probe.py [K] (default 10)
Writes replicated parquet under /tmp/scale_probe_sfK/ and prints one
JSON line with per-query times at both scales and the growth ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.session import get_spark

BASE = "/root/testdata/sf0.1"

# (table, key columns to offset so replicas don't collide)
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}

PROBE_QUERIES = [
    "c_agg_basic",
    "c_tpch_q3",
    "c_tpch_q5",
    "c_window_rank",
    "c_join_asof",
    "x_dedup_minhash",
    "x_cosine_topk",
    "b7_ordered_fanin",
    "c_pivot",
    "c_window_range_frame",
    "x_dedup_verified",
    "c_grouped_map_zscore",
    "x_ann_ivf",
    "x_ann_lsh",
    "x_frame_sample",
    # the adaptive order helpers: at 100x the input estimate crosses
    # SMALL_INPUT_BYTES, so these must take the prefix shape and stay
    # sub-linear (the plain window they use at sf0.1 would go ~linear)
    "c_window_ntile",
    "c_window_rank_variants",
    "x_shuffle_order",
    "x_pack_sequences",
    "x_length_percentiles",
    "x_dup_rate",
    # r4 additions: the scaled-long q1 path rides c_agg_basic above;
    # PQ scoring reads codes + broadcast codebooks, windowed dedup is
    # LSH-bounded pairs + slim et joins, sessionization one exchange
    "x_ann_pq",
    "x_dedup_windowed",
    "c_sessionize_gaps",
    "c_agg_approx_quantile",
    # r5 additions: size-adaptive connected components (union-find
    # single task under 1M pair edges, star contraction above)
    "x_dedup_clusters",
    # r5 TPC-H sweep representatives: q21 is the heaviest (window
    # pyramid over one orderkey exchange), q2 pre-aggregates the
    # part-pruned price list, q13 is the outer-join distribution,
    # q17's correlated-AVG rides a partkey window, q11's threshold is
    # a broadcast scalar; plus the corpus-stat additions (entropy's
    # char fan-out, novelty's double gram pass)
    "c_tpch_q21",
    "c_tpch_q2",
    "c_tpch_q13",
    "c_tpch_q17",
    "c_tpch_q11",
    "x_char_entropy",
    "x_ngram_novelty",
    # r6 additions: extraction is zero-shuffle per-row work, the BPE
    # family rides the broadcast word cache, kcenter is K bounded
    # rounds over the pinned edge artifact, bucketed sessionization is
    # the skew-lane answer (also probed by tools/skew_probe.py)
    "x_extract_text",
    "x_bpe_tokens",
    "x_token_count",
    "x_kcenter_sample",
    "c_sessionize_bucketed",
    # r8 additions: sketch-NDV profile lane, perceptual asset near-dup
    # (post the higher-order-fold rewrite), the estimator pair, the
    # text-quality family, and the honest-cost recall dashboard
    "c_table_profile_sketch",
    "x_asset_neardup",
    "c_join_cardinality",
    "c_join_estimate",
    "x_quality_classifier",
    "x_vocab_coverage",
    "x_embedding_qc",
    "x_mix_schedule",
    "x_shard_assign",
    "x_ann_recall",
    # r9 additions: the bounded-frame time-series pair (one user-keyed
    # exchange each), the salted join (dim replication is the cost —
    # must stay ~linear), KN's bigram-keyed join, the diversity metric
    # (gram-keyed distinct — the honest corpus cost), the index build
    # + index-resolved search, the per-source card, and integer Lloyd
    "c_ewma",
    "c_window_rolling_median",
    "c_join_salted",
    "x_kneser_ney",
    "x_distinct_ngrams",
    "x_inverted_index",
    "x_keyword_search",
    "x_dataset_card",
    "x_kmeans",
    "x_ann_ivf_trained",
    "x_kmeans_quality",
    "c_cumulative_reach",
    "c_histogram_equidepth",
    "c_share_of_parent",
    "x_l2_topk",
    "x_ann_recall_trained",
    "c_anomaly_ewma",
    "x_curriculum_order",
    "c_period_over_period",
    "c_sessionize_stats",
    "c_funnel_time",
    "c_data_skew_gini",
    "x_embedding_drift",
    "c_sliding_reach",
    "x_hybrid_rrf",
    "c_join_interval_banded",
    "x_sample_balanced",
    "x_oov_rate",
    "c_window_bollinger",
    "x_template_detect",
    "c_window_drawdown",
    # r11 additions: the banding tuner — candidate pairs grow ~linearly
    # (capped LSH buckets), the config grid is constant, so the 12×2
    # conditional-sum pass must stay ~linear; audience overlap — the
    # (type,user) distinct + bounded-fan-out user join and a
    # |types|-row sketch table must both stay ~linear
    "x_lsh_tune",
    "c_audience_overlap",
    # keep-best survivor: CC labels on the pinned pair artifact + the
    # zero-exchange classifier + two one-row-per-cluster aggregations
    "x_dedup_keepbest",
    # filtered ANN: same cell-keyed equi-join as the trained IVF plus a
    # slim label join — must track x_ann_ivf_trained's growth
    "x_ann_filtered",
    # span scrub: the dup_spans exchange skeleton + the slim canonical
    # join + island-merge intervals — must track x_dup_spans
    "x_span_scrub",
    # crossover dispatch: at K× the loose (label) predicates' survivor
    # counts grow K× (stay IVF) while tenant buckets stay ~20 rows
    # (stay exact) — the absolute-threshold rule must keep the same
    # lane split and the whole plan must stay ~linear
    "x_ann_crossover",
    "x_ann_crossover_cost",
]

KEY_STRIDE = 100_000_000


def replicate(spark, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, keys in OFFSETS.items():
        dst = f"{out_dir}/{name}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        if not keys or name in ("nation", "region", "part", "supplier"):
            df.write.mode("overwrite").parquet(dst)
            continue
        copies = []
        for i in range(k):
            c = df
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * KEY_STRIDE))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)


def time_query(name: str, sf_dir: str, spark) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/scale_probe_sf{k}"
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, out_dir, k)

    # warm
    QUERIES["b4_classify_fizzbuzz"](spark, BASE).write.mode("overwrite").format(
        "noop"
    ).save()

    # SCALE_PROBE_ONLY=name1,name2 restricts the run (a full 100x
    # sweep of the standing list takes tens of minutes; targeted
    # re-probes of the round's new queries don't need to pay that).
    only = os.environ.get("SCALE_PROBE_ONLY")
    probe_queries = (
        [n for n in only.split(",") if n] if only else PROBE_QUERIES
    )
    results = {}
    for name in probe_queries:
        base = min(time_query(name, BASE, spark) for _ in range(2))
        big = min(time_query(name, out_dir, spark) for _ in range(2))
        results[name] = {
            "sf0.1_sec": base,
            f"x{k}_sec": big,
            "growth": round(big / base, 2) if base > 0 else None,
        }
    print(json.dumps({"k": k, "results": results}))


if __name__ == "__main__":
    main()
