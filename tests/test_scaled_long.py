"""The r4 scaled-long money-sum fast path must be EXACTLY the decimal
plan on any data satisfying its profiled preconditions, and its no-wrap
guard must actually trip (raise, not wrap) when a partition could
overflow an int64 partial. Hypothesis generates adversarial 2dp
corpora; each example runs both plans in one comparison."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from async_event_streams_spark.queries.relational import (
    _D38,
    _DEC_FRAC,
    _DEC_PRICE,
    _guarded_count,
    _q1_long_partials,
)

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# 2dp money rows: (returnflag, linestatus, quantity, price, discount, tax)
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "N", "R"]),
        st.sampled_from(["F", "O"]),
        st.integers(0, 5_000_000).map(lambda c: c / 100.0),      # quantity
        st.integers(0, 999_999_999).map(lambda c: c / 100.0),    # price
        st.integers(0, 100).map(lambda c: c / 100.0),            # discount
        st.integers(0, 100).map(lambda c: c / 100.0),            # tax
    ),
    min_size=1,
    max_size=60,
)

SCHEMA = (
    "l_returnflag string, l_linestatus string, l_quantity double, "
    "l_extendedprice double, l_discount double, l_tax double"
)


def _profile_of(rows):
    return {
        "max_l_quantity": max(r[2] for r in rows),
        "max_l_extendedprice": max(r[3] for r in rows),
        "max_l_discount": max(r[4] for r in rows),
        "max_l_tax": max(r[5] for r in rows),
    }


def _long_path(df, profile):
    partials, max_rows = _q1_long_partials(df, profile)
    n = F.sum("__n")
    s = lambda c: F.sum(F.col(c).cast(_D38))  # noqa: E731
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        (s("s_qty") / 100).cast("double").alias("sum_qty"),
        (s("s_price") / 100).cast("double").alias("sum_price"),
        F.round(s("s_disc") / 10_000, 2).cast("double").alias("sum_disc_price"),
        F.round(s("s_charge") / 1_000_000, 2).cast("double").alias("sum_charge"),
        _guarded_count(n, F.max("__n"), max_rows).alias("count_order"),
    )


def _decimal_path(df):
    dprice = lambda c: F.col(c).cast(_DEC_PRICE)  # noqa: E731
    disc_price = dprice("l_extendedprice") * (
        (1 - F.col("l_discount")).cast(_DEC_FRAC)
    )
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(dprice("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(dprice("l_extendedprice")), 2)
        .cast("double")
        .alias("sum_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(
            F.sum(disc_price * ((1 + F.col("l_tax")).cast(_DEC_FRAC))), 2
        )
        .cast("double")
        .alias("sum_charge"),
        F.count("*").cast("long").alias("count_order"),
    )


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_long_path_equals_decimal_path_on_2dp_data(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA).repartition(3)
    profile = _profile_of(rows)
    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    got = {key(r): tuple(r)[2:] for r in _long_path(df, profile).collect()}
    want = {key(r): tuple(r)[2:] for r in _decimal_path(df).collect()}
    assert got == want


def test_money_profile_rejects_rate_columns_out_of_range(spark, tmp_path):
    """ADVICE r5: the no-wrap bound in _q1_long_partials assumes
    l_discount <= 1 (and a sane tax ceiling); _money_profile must send
    data past those ranges to the decimal path (profile=None), because
    for discount > 2 |charge_l| can exceed the per_row bound and wrap an
    int64 partial without tripping the guard."""
    from async_event_streams_spark.queries.relational import _money_profile

    def write_lineitem(sub: str, discount: float, tax: float) -> str:
        d = tmp_path / sub
        df = spark.createDataFrame(
            [("A", "F", 1.0, 100.0, discount, tax)], SCHEMA
        )
        df.write.parquet(str(d / "lineitem.parquet"))
        return str(d)

    ok_dir = write_lineitem("ok", 0.10, 0.05)
    assert _money_profile(spark, ok_dir) is not None
    bad_disc = write_lineitem("bad_disc", 1.50, 0.05)
    assert _money_profile(spark, bad_disc) is None
    bad_tax = write_lineitem("bad_tax", 0.10, 2.50)
    assert _money_profile(spark, bad_tax) is None


def test_no_wrap_guard_trips_instead_of_wrapping(spark):
    """A partition big enough to overflow an int64 partial must RAISE,
    never silently wrap. Two independent layers can fire, and either is
    a pass: under ANSI mode (the engine session default) Spark's own
    sum raises ARITHMETIC_OVERFLOW at the wrapping addition; with ANSI
    off the sum wraps silently and the assert_true rows-per-partition
    guard raises USER_RAISED instead — the explicit check that makes
    the long path non-fragile on any deployment."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import (
        ArithmeticException,
        PythonException,
        SparkRuntimeException,
    )

    rows = [("A", "F", 1.0, 9_999_999_999.99, 0.0, 0.01)] * 2000
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)  # one big partition
    profile = _profile_of(rows)
    _, max_rows = _q1_long_partials(df, profile)
    assert max_rows < 2000  # the bound really is below the partition size
    with pytest.raises(
        (
            Py4JJavaError,
            SparkRuntimeException,
            ArithmeticException,
            PythonException,
        ),
        match="(?i)overflow",
    ):
        _long_path(df, profile).collect()
