"""SQL front door: spark.sql over the registered dataset views must
agree with the DataFrame path (same normalized tables, same plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.tables import TABLE_NAMES, create_views, sql, table


def test_views_cover_every_table(spark, sf_dir):
    names = create_views(spark, sf_dir)
    assert names == TABLE_NAMES
    for name in names:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() == 1


def test_sql_equals_dataframe_join_agg(spark, sf_dir):
    got = {
        (r.n_name, r.n_custs)
        for r in sql(
            spark,
            sf_dir,
            """
            SELECT n.n_name, COUNT(*) AS n_custs
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            """,
        ).collect()
    }
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    want = {
        (r.n_name, r.n_custs)
        for r in cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_custs"))
        .collect()
    }
    assert got == want and got


def test_sql_view_pushdown_reaches_scan(spark, sf_dir):
    """Views are inline subplans: a filter written in SQL must still be
    pushed into the parquet scan."""
    plan = sql(
        spark,
        sf_dir,
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0",
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in plan


def test_sql_sees_normalized_timestamps(spark, sf_dir):
    """events.ts is TIMESTAMP(NANOS) in parquet; through the view it
    must arrive as a usable timestamp (the nanos normalization runs)."""
    row = sql(
        spark, sf_dir, "SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events"
    ).collect()[0]
    assert row.lo is not None and row.hi >= row.lo
    assert row.lo.year >= 2020


def test_jsonl_ingestion_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """read_jsonl (io.py): explicit-schema JSONL ingestion returns the
    same rows parquet holds; malformed lines quarantine as rows (with
    the offending text) instead of failing the job."""
    import json as _json

    from async_event_streams_spark.io import read_jsonl, split_quarantine
    from async_event_streams_spark.tables import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    rows = [r.asDict() for r in docs.collect()]
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write('{"doc_id": 999999999, "lang": "xx", BROKEN\n')  # corrupt
    got = read_jsonl(
        spark,
        str(p),
        "doc_id long, lang string, source string, n_chars long",
    )
    good, bad = split_quarantine(got)
    assert bad.count() == 1
    assert "BROKEN" in bad.collect()[0]._corrupt_record
    assert sorted(good.columns) == ["doc_id", "lang", "n_chars", "source"]
    assert good.count() == len(rows)
    assert {r.doc_id for r in good.select("doc_id").collect()} == {
        r["doc_id"] for r in rows
    }
