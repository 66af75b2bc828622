"""Third-implementation triangulation for the iterative kNN-graph
consumers: the Spark loop and the DuckDB unrolled-CTE oracle could in
principle share a systematic misunderstanding, so label propagation
and integer PageRank are ALSO pinned against independent pure-Python
references on small random graphs (the scd2/sessionize hypothesis
discipline applied to graph algorithms)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from async_event_streams_spark.queries.llm import (
    _LPA_ROUNDS,
    _PR_BASE,
    _PR_ROUNDS,
    _PR_SCALE,
    _lpa_round,
    _pagerank_round,
)

# directed weighted edges: (src, dst, w) with unique (src, dst)
EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=1000),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda e: (e[0], e[1]),
).map(lambda es: [e for e in es if e[0] != e[1]])

N_VERTS = 8


def reference_lpa(edges, rounds):
    labels = {v: v for v in range(N_VERTS)}
    for _ in range(rounds):
        nxt = {}
        for v in range(N_VERTS):
            weights: dict[int, int] = {}
            for s, d, w in edges:
                if s == v:
                    lab = labels[d]
                    weights[lab] = weights.get(lab, 0) + w
            if weights:
                # max weight, ties to smallest label
                nxt[v] = min(
                    (lab for lab in weights),
                    key=lambda lab: (-weights[lab], lab),
                )
            else:
                nxt[v] = labels[v]
        labels = nxt
    return labels


def reference_pagerank(edges, rounds):
    outdeg = {}
    for s, _d, _w in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: _PR_SCALE for v in range(N_VERTS)}
    for _ in range(rounds):
        inflow = {v: 0 for v in range(N_VERTS)}
        for s, d, _w in edges:
            inflow[d] += (85 * pr[s]) // (100 * outdeg[s])
        pr = {v: _PR_BASE + inflow[v] for v in range(N_VERTS)}
    return pr


@given(EDGES)
@settings(max_examples=10, deadline=None)
def test_lpa_rounds_match_python_reference(spark, edges):
    e = spark.createDataFrame(
        [(s, d, w) for s, d, w in edges] or [(0, 0, 0)],
        "vec_id long, neighbor_id long, w long",
    )
    if not edges:  # keep the frame non-empty but edge-free
        e = e.filter(F.col("w") > 0)
    labels = spark.createDataFrame(
        [(v, v) for v in range(N_VERTS)], "vec_id long, label long"
    )
    for _ in range(_LPA_ROUNDS):
        labels = _lpa_round(e, labels).localCheckpoint(eager=False)
    got = {r.vec_id: r.label for r in labels.collect()}
    assert got == reference_lpa(edges, _LPA_ROUNDS)


@given(EDGES)
@settings(max_examples=10, deadline=None)
def test_pagerank_rounds_match_python_reference(spark, edges):
    outdeg = {}
    for s, _d, _w in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    e = spark.createDataFrame(
        [(s, d, outdeg[s]) for s, d, _w in edges] or [(0, 0, 0)],
        "vec_id long, neighbor_id long, d long",
    )
    if not edges:
        e = e.filter(F.col("d") > 0)
    v = spark.createDataFrame([(i,) for i in range(N_VERTS)], "vec_id long")
    pr = v.select("vec_id", F.lit(_PR_SCALE).cast("long").alias("pr"))
    for _ in range(_PR_ROUNDS):
        pr = _pagerank_round(e, pr, v).localCheckpoint(eager=False)
    got = {r.vec_id: r.pr for r in pr.collect()}
    assert got == reference_pagerank(edges, _PR_ROUNDS)


@given(
    st.lists(
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([1, 4, 8]),
)
@settings(max_examples=10, deadline=None)
def test_weighted_pick_matches_python_reference(spark, weights, k):
    """PPS boundary selection: a row is picked iff its half-open mass
    interval (cum-w, cum] contains a multiple of step = max(total//k, 1)
    — triangulated against a direct Python replay."""
    from async_event_streams_spark.queries.llm import _weighted_pick

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "vec_id long, w long"
    )
    got = {(r.pick, r.vec_id, r.w) for r in _weighted_pick(df, "vec_id", "w", k).collect()}
    step = max(sum(weights) // k, 1)
    cum = 0
    want = set()
    for i, w in enumerate(weights):
        prev, cum = cum, cum + w
        if cum // step > prev // step:
            want.add((cum // step, i, w))
    assert got == want
    # picked rows are distinct boundary owners: never more than the
    # boundary count (a single heavy row may own several boundaries,
    # so <= not ==), and at least one row is always picked
    assert 1 <= len(want) <= sum(weights) // step


def reference_triangles(pairs):
    """Per-node degree and triangle counts over distinct undirected
    pairs, by brute force."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(ns) for n, ns in adj.items()}
    tri = dict.fromkeys(adj, 0)
    # visiting each triangle via all 3 of its edges counts every
    # vertex exactly once (a vertex has ONE opposite edge per
    # triangle), so the sums are already per-vertex triangle counts.
    for u, v in und:
        for w in adj[u] & adj[v]:
            tri[w] += 1
    return deg, tri


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_triangle_census_matches_python_reference(spark, pairs):
    from async_event_streams_spark.queries.llm import _triangle_census

    und_pairs = sorted({tuple(sorted(p)) for p in pairs if p[0] != p[1]})
    if not und_pairs:
        return
    und = spark.createDataFrame(und_pairs, "u long, v long")
    deg_df, tcnt_df = _triangle_census(spark, None, und)
    got_deg = {r.node: r.degree for r in deg_df.collect()}
    got_tri = {r.node: r.triangles for r in tcnt_df.collect()}
    ref_deg, ref_tri = reference_triangles(und_pairs)
    assert got_deg == ref_deg
    # tcnt only carries nodes in >=1 triangle
    assert got_tri == {n: c for n, c in ref_tri.items() if c > 0}
