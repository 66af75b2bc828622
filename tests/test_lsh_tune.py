"""x_lsh_tune semantics: the banding tuner's S-curve table must obey
the analytic monotonicity laws of P(candidate | s) = 1 − (1 − s^r)^b
and agree with an independent pure-Python evaluation over the same
candidate-pair similarities (the triangulation discipline the BPE
trainer and graph consumers use)."""

from __future__ import annotations

import math

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import (
    _LSH_TUNE_GRID,
    _VERIFY_THRESHOLD,
)


def _rows(spark, sf_dir):
    df = QUERIES["x_lsh_tune"](spark, sf_dir)
    return {(r["rows_per_band"], r["n_bands"]): r for r in df.collect()}


def test_grid_complete_and_counts_config_independent(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    assert set(rows) == set(_LSH_TUNE_GRID)
    counts = {(v["n_dup_pairs"], v["n_noise_pairs"]) for v in rows.values()}
    assert len(counts) == 1  # the pair histogram does not depend on (r, b)
    for (r, b), v in rows.items():
        assert v["n_components"] == r * b


def test_s_curve_monotonicity(spark, sf_dir):
    """More bands at fixed r → P non-decreasing (recall AND noise up);
    more rows at fixed b → P non-increasing (both down)."""
    rows = _rows(spark, sf_dir)
    for metric in ("exp_recall_ppm", "exp_noise_ppm"):
        for (r, b), v in rows.items():
            up = rows.get((r, b * 2))
            if up is not None and v[metric] is not None:
                assert up[metric] >= v[metric], (r, b, metric)
            right = rows.get((r * 2, b))
            if right is not None and right[metric] is not None:
                assert right[metric] <= v[metric], (r, b, metric)


def test_matches_pure_python_on_candidate_pairs(spark, sf_dir):
    """Re-derive every cell from the verified pipeline's own pair
    similarities with plain Python floats (same left-assoc multiply
    chain), bit-for-bit."""
    cand = QUERIES["x_dedup_minhash"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    from async_event_streams_spark.functions.text import shingles, tokens

    sets = docs.select(
        "doc_id", F.array_distinct(shingles(tokens(F.col("text")))).alias("sh")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    pairs = cand.join(a, "doc_a").join(b, "doc_b").collect()
    sims = []
    for row in pairs:
        inter = len(set(row["sha"]) & set(row["shb"]))
        union = len(set(row["sha"])) + len(set(row["shb"])) - inter
        sims.append(float(inter) / union)
    rows = _rows(spark, sf_dir)
    tau = _VERIFY_THRESHOLD
    for r, bnd in _LSH_TUNE_GRID:
        dup_ppm, noise_ppm = [], []
        for s in sims:
            sr = 1.0
            for _ in range(r):
                sr = sr * s
            q = 1.0 - sr
            qb = 1.0
            for _ in range(bnd):
                qb = qb * q
            # Spark's HALF_UP on a non-negative double: floor(x + 0.5)
            p = (1.0 - qb) * 1000000.0
            (dup_ppm if s >= tau else noise_ppm).append(
                math.floor(p + 0.5)
            )
        got = rows[(r, bnd)]
        want_recall = (
            math.floor(sum(dup_ppm) / len(dup_ppm) + 0.5) if dup_ppm else None
        )
        want_noise = (
            math.floor(sum(noise_ppm) / len(noise_ppm) + 0.5)
            if noise_ppm
            else None
        )
        assert got["n_dup_pairs"] == len(dup_ppm)
        assert got["n_noise_pairs"] == len(noise_ppm)
        assert got["exp_recall_ppm"] == want_recall, (r, bnd)
        assert got["exp_noise_ppm"] == want_noise, (r, bnd)
