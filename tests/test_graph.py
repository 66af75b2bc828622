"""Connected components (functions/graph.py): the large-star/small-star
contraction must label components with their minimum node id AND beat
plain min-label propagation's round count on long chains — the whole
point of the algorithm swap (r4 VERDICT item 4)."""

from __future__ import annotations

import random

from async_event_streams_spark.functions.graph import connected_components


def _labels(df):
    return {(r.node, r.label) for r in df.collect()}


def test_chain_converges_in_log_rounds(spark):
    """A 120-node chain has diameter 119: plain propagation needs ~119
    rounds; star contraction must finish in O(log n) — well under 15.
    `small_graph_edges=0` forces the distributed star path (the
    adaptive default would answer this tiny graph with union-find)."""
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "s long, d long"
    ).repartition(4)
    labels, rounds = connected_components(edges, small_graph_edges=0)
    assert 0 < rounds <= 12, f"chain took {rounds} rounds — not contracting"
    assert _labels(labels) == {(i, 0) for i in range(n)}


def test_small_graph_unionfind_matches_star_path(spark):
    """The size-adaptive cutover must be invisible in results: the
    single-task union-find answer equals the distributed star answer
    on the same graph."""
    rng = random.Random(3)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "s long, d long")
    uf_labels, uf_rounds = connected_components(df)  # small path
    star_labels, star_rounds = connected_components(df, small_graph_edges=0)
    assert uf_rounds == 0 and star_rounds > 0
    assert _labels(uf_labels) == _labels(star_labels)


def test_mixed_components_and_orientation(spark):
    """Several components, duplicate + reversed edges, non-contiguous
    ids: every node gets its component min; components stay separate."""
    comp_a = [(5, 9), (9, 5), (9, 14), (14, 5)]  # triangle {5, 9, 14}
    comp_b = [(100, 101)]
    comp_c = [(30, 31), (31, 32), (32, 33), (33, 30)]  # 4-cycle
    edges = spark.createDataFrame(
        comp_a + comp_b + comp_c, "s long, d long"
    )
    labels, _ = connected_components(edges)
    assert _labels(labels) == {
        (5, 5), (9, 5), (14, 5),
        (100, 100), (101, 100),
        (30, 30), (31, 30), (32, 30), (33, 30),
    }


def test_random_graph_matches_pure_python_cc(spark):
    """Erdos-Renyi-ish random graph vs a pure-Python union-find."""
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(x, find(x)) for x in parent}

    df = spark.createDataFrame(edges, "s long, d long").repartition(5)
    labels, rounds = connected_components(df, small_graph_edges=0)
    assert _labels(labels) == want
    assert 0 < rounds <= 12


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "s long, d long")
    labels, rounds = connected_components(edges)
    assert labels.count() == 0
    assert rounds == 0
