"""x_ann_crossover dispatch invariants: the lane choice follows the
survivor-count rule exactly, the filter-first lane is perfect-recall
by construction, and both lanes are actually exercised by the mixed
workload (loose label predicates -> IVF, absolute-size tenant
predicates -> exact) at the test scale."""

from __future__ import annotations

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import _CROSS_N, _IVFT_TOPK


def test_crossover_dispatch_rule(spark, sf_dir):
    cost = {
        r.query_id: r
        for r in QUERIES["x_ann_crossover_cost"](spark, sf_dir).collect()
        if r.query_id >= 0
    }
    assert cost, "no per-query rows"
    lanes = {r.lane for r in cost.values()}
    assert lanes == {"exact", "ivf"}, f"one-sided workload: {lanes}"
    for r in cost.values():
        want = "exact" if r.n_surv <= _CROSS_N else "ivf"
        assert r.lane == want, f"q{r.query_id}: {r.lane} != {want}"
        assert r.n_exact <= _IVFT_TOPK
        if r.lane == "exact":
            # filter-first scores every survivor: recall 1, scan = survivors
            assert r.recall_ppm == 1_000_000, r
            assert r.scan_rows == r.n_surv, r
        else:
            # the index lane scans probed cells, more than the survivors
            # it keeps but far fewer than the corpus
            assert r.scan_rows > 0


def test_crossover_lane_column_consistent(spark, sf_dir):
    res = QUERIES["x_ann_crossover"](spark, sf_dir).collect()
    assert res
    by_q: dict[int, set[str]] = {}
    for r in res:
        by_q.setdefault(r.query_id, set()).add(r.lane)
        assert 1 <= r.rank <= _IVFT_TOPK
    # dispatch is per-query exclusive: one lane per query
    assert all(len(ls) == 1 for ls in by_q.values()), by_q
