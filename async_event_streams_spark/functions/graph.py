"""Distributed connected components, size-adaptive.

The near-dup pair graphs this engine clusters are orders of magnitude
smaller than the corpora they come from (LSH + verify emits one edge
per confirmed duplicate pair, not per document), so the plan adapts to
the measured edge count — the same discipline as the size-adaptive
prefix-sum in functions/order.py:

- **Small graph** (edge count <= `small_graph_edges`): ONE
  single-partition `mapInPandas` task runs union-find over the whole
  edge list — a single Spark job, no iteration. 1M edges is ~16 MB in
  one task and sub-second; driver-side per-round fixed costs (plan
  analysis, job scheduling) would dominate any distributed loop at
  this size.
- **Large graph**: alternating large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14). Why not plain min-label propagation: propagation moves a
  label ONE hop per round, so rounds = graph diameter — a chain-shaped
  duplicate cluster (doc A ~ B ~ C ~ ... under a similarity threshold)
  costs O(n) shuffle rounds. The star operations contract paths
  aggressively (every node links to the minimum of its neighborhood,
  then stars collapse into their centers), converging in O(log d)
  rounds on the same chains. Each round is two window-min passes over
  the node key plus a distinct — no all-pairs blowup, no rows on the
  driver; the convergence probe is one (count, xor-hash) scalar pair
  per round, and at the fixpoint the edge set IS the answer: every
  component is a star whose center is the component's minimum node id.

The edge count that picks the path comes from the same probe that
seeds convergence detection — no extra job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import materialize


def _union_find_labels(E: DataFrame) -> DataFrame:
    """Single-task union-find over the full edge list: E is coalesced
    to one partition and labeled in one `mapInPandas` pass (union by
    minimum root + path compression, so every root is its component's
    minimum). Only reached below the small-graph threshold, where one
    task owns the whole (tiny) graph by design."""
    ndt = E.schema["u"].dataType.simpleString()

    def uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra  # union by MIN root -> root == min
        if parent:
            nodes = list(parent)
            yield pd.DataFrame(
                {"node": nodes, "label": [find(x) for x in nodes]}
            )

    return E.repartition(1).mapInPandas(uf, f"node {ndt}, label {ndt}")


def connected_components(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    max_iters: int = 25,
    dedup_input: bool = True,
    small_graph_edges: int = 1_000_000,
) -> tuple[DataFrame, int]:
    """Label every node of the undirected graph `edges` with its
    component's minimum node id. Returns (labels, rounds) where labels
    has columns (node, label) and rounds is the number of
    large-star+small-star rounds executed (0 when the single-task
    union-find path answered).

    Edge direction and duplicate edges in the input are irrelevant:
    edges are canonicalized to (u, v) with u > v and deduplicated
    up front. Self-loops are dropped (a node with only self-loops is
    not represented — callers' node sets here always come from real
    pairs). Pass `dedup_input=False` when the caller already guarantees
    unique undirected edges (e.g. verified near-dup pairs with
    doc_a < doc_b): it skips the up-front distinct's shuffle and the
    extra checkpoint. `small_graph_edges=0` forces the distributed
    star path (used by tests pinning round counts)."""

    def probe(df: DataFrame) -> tuple[int, object]:
        # Exact set signature: count + xor of a 64-bit row hash (xor is
        # order-independent and can't overflow, and plans cheaper than
        # a decimal sum). One scalar action per round; it doubles as
        # the job that materializes the round's checkpointed edge set.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row[0], row[1]

    E = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    if dedup_input:
        E = materialize(E.distinct())
    sig = probe(E)
    if 0 < sig[0] <= small_graph_edges:
        return _union_find_labels(E), 0
    rounds = 0
    # Neighborhood minima via window-min over the node key: ONE
    # key-partitioned exchange per star op, against three (groupBy +
    # both join sides) for a groupBy-then-self-join formulation. (A
    # pathological celebrity node makes one window partition big; that
    # is a single sorted spill-able task, the same skew exposure a
    # groupBy key would have.)
    w = Window.partitionBy("u")
    for _ in range(max_iters):
        if sig[0] == 0:
            break
        # -- large-star: every node links its LARGER neighbors to the
        #    minimum of its closed neighborhood ------------------------
        bid = E.unionByName(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            bid.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # -- small-star: every node folds its SMALLER neighbors (and
        #    itself) onto its minimum neighbor -------------------------
        # large's outputs are already u > v, the orientation small-star
        # partitions by (the larger endpoint owns the edge). The
        # center edge (u, m) is emitted once per incident row; the
        # round's distinct collapses them.
        si = large.withColumn("m", F.min("v").over(w))
        # Checkpoint EVERY round: iterative DataFrame loops compound
        # the logical plan; localCheckpoint truncates the lineage so
        # analysis cost stays constant per round instead of growing
        # until the planner falls over on long-diameter graphs.
        nxt = materialize(
            si.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .unionByName(si.select("u", F.col("m").alias("v")))
            .distinct()
        )
        nsig = probe(nxt)
        rounds += 1
        E = nxt
        if nsig == sig:
            break
        sig = nsig
    # Fixpoint edge set = stars centered on component minima: each
    # non-center node appears exactly once as u with v = its label, so
    # only the center side needs a distinct (one column, cheap), not
    # the whole union.
    labels = E.select(
        F.col("u").alias("node"), F.col("v").alias("label")
    ).unionByName(
        E.select("v").distinct().select(
            F.col("v").alias("node"), F.col("v").alias("label")
        )
    )
    return labels, rounds
