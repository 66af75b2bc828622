"""Differential tests: every oracle-checkable query must hash-match its
DuckDB twin at the test scale factor (mirrors the driver's t2 gate)."""

from __future__ import annotations

import pytest

from async_event_streams_spark.queries import ORACLES, QUERIES

from .oracle_compare import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    result = compare(name, QUERIES[name](spark, sf_dir), con.execute(ORACLES[name]).df())
    assert result.ok, f"{name}: {result.detail or result}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
