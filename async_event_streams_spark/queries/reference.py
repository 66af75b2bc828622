"""Reference-derived dataflow queries (SURVEY.md §2-B).

These re-express, as batch DataFrame programs over the `events` table,
the dataflow topologies the reference's tests build from its pub/sub
primitives: generate → broadcast fan-out → filter/map → route → merge →
ordered fan-in → stateful max-merge → causal lineage.

Reference citations (in /root/reference/):
- fizzbuzz classification oracle: tests/fizz_buzz.rs:44-61,
  tests/fizz_buzz_sink.rs:60-77
- fan-out topology: tests/fizz_buzz.rs:80-129
- parity route + merge + ordered fan-in: tests/event_test.rs:47-128
- max-merge sink: tests/fizz_buzz.rs:12-19,31-43
- causal (dependent) events: src/lib.rs:56-73, src/event.rs:66

The monotone `event_id` column stands in for the reference's arrival
order (its only ordering concept, src/lib.rs:41-42); fizzbuzz runs on
`event_id` exactly as the reference runs on the generated index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from . import query

# ---------------------------------------------------------------------------
# Shared fizzbuzz classification (FIXTURES.md §A2)
# ---------------------------------------------------------------------------

FIZZBUZZ_CASE_SQL = (
    "CASE WHEN {n} % 15 = 0 THEN 'fizzbuzz' "
    "WHEN {n} % 5 = 0 THEN 'buzz' "
    "WHEN {n} % 3 = 0 THEN 'fizz' "
    "ELSE 'number' END"
)

# Priority mirrors the reference's enum ordering used by the max-merge
# sink: Expected < Number < Fizz < Buzz < FizzBuzz (tests/fizz_buzz.rs:12-19).
FIZZBUZZ_PRIORITY_CASE_SQL = (
    "CASE WHEN {n} % 15 = 0 THEN 4 "
    "WHEN {n} % 5 = 0 THEN 3 "
    "WHEN {n} % 3 = 0 THEN 2 "
    "ELSE 1 END"
)


def fizzbuzz_label(n: Column) -> Column:
    return (
        F.when(n % 15 == 0, F.lit("fizzbuzz"))
        .when(n % 5 == 0, F.lit("buzz"))
        .when(n % 3 == 0, F.lit("fizz"))
        .otherwise(F.lit("number"))
    )


def fizzbuzz_priority(n: Column) -> Column:
    return (
        F.when(n % 15 == 0, F.lit(4))
        .when(n % 5 == 0, F.lit(3))
        .when(n % 3 == 0, F.lit(2))
        .otherwise(F.lit(1))
    )


# ---------------------------------------------------------------------------
# B1 — sequence generator source (tests/fizz_buzz_sink.rs:84-88)
# ---------------------------------------------------------------------------


@query(
    "b1_source_scan",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def b1_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the topic backlog: projection only — column pruning reaches
    the parquet reader, so ts/props are never read."""
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# B2 — broadcast fan-out: every subscriber sees every event
# (tests/fizz_buzz.rs:80-129; delivery loop src/event_streams.rs:129-136)
# ---------------------------------------------------------------------------


@query(
    "b2_fanout_counts",
    oracle=" UNION ALL ".join(
        f"SELECT 'branch_{i}' AS branch, COUNT(*) AS n_events FROM events"
        for i in range(4)
    ),
)
def b2_fanout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four branches off one source; each branch's count equals the
    total (the fan-out invariant the reference test asserts)."""
    src = table(spark, sf_dir, "events")
    branches = [
        src.agg(F.count("*").alias("n_events")).select(
            F.lit(f"branch_{i}").alias("branch"), "n_events"
        )
        for i in range(4)
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# ---------------------------------------------------------------------------
# B3 — stateless filter (tests/fizz_buzz.rs:97)
# ---------------------------------------------------------------------------


@query(
    "b3_filter_mod3",
    oracle="SELECT event_id, value FROM events WHERE event_id % 3 = 0",
)
def b3_filter_mod3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select("event_id", "value")
    )


# ---------------------------------------------------------------------------
# B4 — stateless map / classify-and-re-emit (tests/fizz_buzz_sink.rs:117-137)
# ---------------------------------------------------------------------------


@query(
    "b4_classify_fizzbuzz",
    oracle=(
        f"SELECT {FIZZBUZZ_CASE_SQL.format(n='event_id')} AS label, "
        "COUNT(*) AS n_events FROM events GROUP BY 1"
    ),
)
def b4_classify_fizzbuzz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: scan → project (CASE classification) → aggregate."""
    return (
        table(spark, sf_dir, "events")
        .select(fizzbuzz_label(F.col("event_id")).alias("label"))
        .groupBy("label")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# B5 — route / partition by predicate (tests/event_test.rs:67-105)
# ---------------------------------------------------------------------------


@query(
    "b5_route_parity",
    oracle=(
        "SELECT 'even' AS route, COUNT(*) AS n_events FROM events WHERE event_id % 2 = 0 "
        "UNION ALL "
        "SELECT 'odd' AS route, COUNT(*) AS n_events FROM events WHERE event_id % 2 = 1 "
        "UNION ALL "
        "SELECT 'all' AS route, COUNT(*) AS n_events FROM events"
    ),
)
def b5_route_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split one stream into disjoint even/odd routes; the 'all' row lets
    the oracle verify the partition reconciles (even + odd == all)."""
    src = table(spark, sf_dir, "events")
    evens = src.filter(F.col("event_id") % 2 == 0)
    odds = src.filter(F.col("event_id") % 2 == 1)
    rows = [
        evens.agg(F.count("*").alias("n_events")).select(
            F.lit("even").alias("route"), "n_events"
        ),
        odds.agg(F.count("*").alias("n_events")).select(
            F.lit("odd").alias("route"), "n_events"
        ),
        src.agg(F.count("*").alias("n_events")).select(
            F.lit("all").alias("route"), "n_events"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# B6 — fan-in / merge (tests/event_test.rs:111)
# ---------------------------------------------------------------------------


@query(
    "b6_union_merge",
    oracle=(
        "SELECT event_id, value FROM events WHERE event_id % 2 = 0 "
        "UNION ALL "
        "SELECT event_id, value FROM events WHERE event_id % 2 = 1"
    ),
)
def b6_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = table(spark, sf_dir, "events")
    evens = src.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
    odds = src.filter(F.col("event_id") % 2 == 1).select("event_id", "value")
    return evens.unionByName(odds)


# ---------------------------------------------------------------------------
# B7 — ordered fan-in with causal total order (tests/event_test.rs:113-123)
# ---------------------------------------------------------------------------


@query(
    "b7_ordered_fanin",
    oracle=(
        "WITH merged AS ("
        "  SELECT event_id FROM events WHERE event_id % 2 = 0"
        "  UNION ALL"
        "  SELECT event_id FROM events WHERE event_id % 2 = 1"
        "), ordered AS ("
        "  SELECT event_id, CAST(ROW_NUMBER() OVER (ORDER BY event_id) AS INTEGER)"
        "    AS pos FROM merged"
        ") SELECT event_id, pos, "
        f"{FIZZBUZZ_CASE_SQL.format(n='event_id')} AS label, "
        "(pos - 1 = event_id) AS in_order FROM ordered"
    ),
)
def b7_ordered_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity-split then merge; re-establish the reference's causal total
    order with the monotone event_id (SURVEY.md §3.3 / §8-H2). `in_order`
    encodes the reference's assertion that position i holds event i.

    The global numbering uses the range-partitioned prefix-sum scheme
    (functions/order.py), NOT `ROW_NUMBER() OVER (ORDER BY ...)` — the
    unpartitioned window would funnel the whole stream through one task
    at scale."""
    from ..functions.order import global_row_number

    src = table(spark, sf_dir, "events")
    evens = src.filter(F.col("event_id") % 2 == 0).select("event_id")
    odds = src.filter(F.col("event_id") % 2 == 1).select("event_id")
    merged = evens.unionByName(odds)
    return global_row_number(merged, ["event_id"]).select(
        "event_id",
        "pos",
        fizzbuzz_label(F.col("event_id")).alias("label"),
        (F.col("pos") - 1 == F.col("event_id")).alias("in_order"),
    )


# ---------------------------------------------------------------------------
# B8 — stateful upsert sink with max-merge policy (tests/fizz_buzz.rs:31-43)
# ---------------------------------------------------------------------------


@query(
    "b8_groupby_max",
    oracle=(
        "WITH classified AS ("
        "  SELECT event_id % 100 AS pos, "
        f"  {FIZZBUZZ_CASE_SQL.format(n='event_id')} AS label, "
        f"  {FIZZBUZZ_PRIORITY_CASE_SQL.format(n='event_id')} AS priority "
        "  FROM events"
        ") SELECT pos, MAX(priority) AS max_priority, "
        "MAX_BY(label, priority) AS max_label, COUNT(*) AS n_events "
        "FROM classified GROUP BY pos"
    ),
)
def b8_groupby_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins-by-priority merge: the reference's Sink keeps the
    max FizzBuzz label per position; here groupBy(pos).agg(max)."""
    src = table(spark, sf_dir, "events")
    classified = src.select(
        (F.col("event_id") % 100).alias("pos"),
        fizzbuzz_label(F.col("event_id")).alias("label"),
        fizzbuzz_priority(F.col("event_id")).alias("priority"),
    )
    return classified.groupBy("pos").agg(
        F.max("priority").alias("max_priority"),
        F.max_by("label", "priority").alias("max_label"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# B10 — causal chaining / lineage join (src/lib.rs:56-73, src/event.rs:66)
# ---------------------------------------------------------------------------


@query(
    "b10_lineage_join",
    oracle=(
        "WITH children AS ("
        "  SELECT event_id AS child_id, event_id - (event_id % 10) AS source_event_id"
        "  FROM events WHERE event_id % 10 <> 0"
        ") SELECT c.child_id, c.source_event_id, p.event_type AS parent_type, "
        "(c.source_event_id < c.child_id) AS causal_ok "
        "FROM children c JOIN events p ON p.event_id = c.source_event_id"
    ),
)
def b10_lineage_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependent events: derived events carry their cause's id
    (`source_event_id` lineage column, SURVEY.md §1.2). Deterministic
    synthetic lineage: each decade's anchor (id % 10 == 0) is the parent
    of the decade's other events. The join checks every child's parent
    exists and precedes it — the reference's happens-before invariant."""
    src = table(spark, sf_dir, "events")
    children = src.filter(F.col("event_id") % 10 != 0).select(
        F.col("event_id").alias("child_id"),
        (F.col("event_id") - (F.col("event_id") % 10)).alias("source_event_id"),
    )
    parents = src.select("event_id", "event_type")
    return (
        children.join(parents, children.source_event_id == parents.event_id)
        .select(
            "child_id",
            "source_event_id",
            F.col("event_type").alias("parent_type"),
            (F.col("source_event_id") < F.col("child_id")).alias("causal_ok"),
        )
    )
