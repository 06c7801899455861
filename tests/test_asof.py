"""As-of join semantics: backward-inclusive ties, per-key isolation,
tolerance — matching Polars join_asof(strategy='backward', by=key)
(SURVEY.md §7.3 item 1) — plus the forward/nearest strategy twins."""

import datetime as dt

from pyspark.sql import Row

from us_equity_datalake_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)

D = dt.date.fromisoformat


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "sym string, d date, x long")
    right = spark.createDataFrame(right_rows, "sym string, d date, v double")
    kw.setdefault("by", ["sym"])
    kw.setdefault("left_on", "d")
    kw.setdefault("right_on", "d")
    kw.setdefault("value_cols", ["v"])
    return asof_join_backward(left, right, **kw).collect()


def test_backward_picks_latest_at_or_before(spark):
    out = _run(
        spark,
        [Row(sym="A", d=D("2024-03-15"), x=1)],
        [Row(sym="A", d=D("2024-01-01"), v=10.0), Row(sym="A", d=D("2024-03-01"), v=20.0),
         Row(sym="A", d=D("2024-04-01"), v=30.0)],
    )
    assert out[0]["v"] == 20.0


def test_equal_dates_match_backward_inclusive(spark):
    """Polars backward includes ties: right row AT the left date matches."""
    out = _run(
        spark,
        [Row(sym="A", d=D("2024-03-01"), x=1)],
        [Row(sym="A", d=D("2024-03-01"), v=42.0)],
    )
    assert out[0]["v"] == 42.0


def test_no_earlier_row_gives_null(spark):
    out = _run(
        spark,
        [Row(sym="A", d=D("2024-01-01"), x=1)],
        [Row(sym="A", d=D("2024-02-01"), v=10.0)],
    )
    assert out[0]["v"] is None


def test_keys_do_not_leak(spark):
    out = _run(
        spark,
        [Row(sym="B", d=D("2024-03-15"), x=1)],
        [Row(sym="A", d=D("2024-01-01"), v=10.0)],
    )
    assert out[0]["v"] is None


def test_tolerance_nulls_stale_matches(spark):
    out = _run(
        spark,
        [Row(sym="A", d=D("2024-06-01"), x=1)],
        [Row(sym="A", d=D("2024-01-01"), v=10.0)],
        tolerance_days=30,
    )
    assert out[0]["v"] is None


def test_left_columns_and_cardinality_preserved(spark):
    out = _run(
        spark,
        [Row(sym="A", d=D("2024-02-01"), x=7), Row(sym="A", d=D("2024-03-01"), x=8)],
        [Row(sym="A", d=D("2024-01-15"), v=1.0), Row(sym="A", d=D("2024-01-20"), v=2.0)],
    )
    assert sorted((r["x"], r["v"]) for r in out) == [(7, 2.0), (8, 2.0)]


def _run_dir(spark, fn, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "sym string, d date, x long")
    right = spark.createDataFrame(right_rows, "sym string, d date, v double")
    kw.setdefault("by", ["sym"])
    kw.setdefault("left_on", "d")
    kw.setdefault("right_on", "d")
    kw.setdefault("value_cols", ["v"])
    return fn(left, right, **kw).collect()


def test_forward_picks_earliest_at_or_after(spark):
    out = _run_dir(
        spark,
        asof_join_forward,
        [Row(sym="A", d=D("2024-03-15"), x=1)],
        [Row(sym="A", d=D("2024-01-01"), v=10.0), Row(sym="A", d=D("2024-04-01"), v=30.0),
         Row(sym="A", d=D("2024-05-01"), v=40.0)],
    )
    assert out[0]["v"] == 30.0


def test_forward_equal_dates_inclusive(spark):
    out = _run_dir(
        spark,
        asof_join_forward,
        [Row(sym="A", d=D("2024-03-01"), x=1)],
        [Row(sym="A", d=D("2024-03-01"), v=42.0)],
    )
    assert out[0]["v"] == 42.0


def test_forward_no_later_row_gives_null(spark):
    out = _run_dir(
        spark,
        asof_join_forward,
        [Row(sym="A", d=D("2024-06-01"), x=1)],
        [Row(sym="A", d=D("2024-02-01"), v=10.0)],
    )
    assert out[0]["v"] is None


def test_forward_tolerance_nulls_far_matches(spark):
    out = _run_dir(
        spark,
        asof_join_forward,
        [Row(sym="A", d=D("2024-01-01"), x=1)],
        [Row(sym="A", d=D("2024-06-01"), v=10.0)],
        tolerance_days=30,
    )
    assert out[0]["v"] is None


def test_nearest_picks_closer_side(spark):
    out = _run_dir(
        spark,
        asof_join_nearest,
        [Row(sym="A", d=D("2024-03-10"), x=1)],
        [Row(sym="A", d=D("2024-03-01"), v=1.0), Row(sym="A", d=D("2024-03-12"), v=2.0)],
    )
    assert out[0]["v"] == 2.0


def test_nearest_equidistant_tie_goes_backward(spark):
    out = _run_dir(
        spark,
        asof_join_nearest,
        [Row(sym="A", d=D("2024-03-10"), x=1)],
        [Row(sym="A", d=D("2024-03-05"), v=1.0), Row(sym="A", d=D("2024-03-15"), v=2.0)],
    )
    assert out[0]["v"] == 1.0


def test_nearest_only_forward_available(spark):
    out = _run_dir(
        spark,
        asof_join_nearest,
        [Row(sym="A", d=D("2024-01-01"), x=1)],
        [Row(sym="A", d=D("2024-02-01"), v=5.0)],
    )
    assert out[0]["v"] == 5.0


def test_nearest_tolerance_is_absolute(spark):
    out = _run_dir(
        spark,
        asof_join_nearest,
        [Row(sym="A", d=D("2024-01-01"), x=1), Row(sym="A", d=D("2024-05-01"), x=2)],
        [Row(sym="A", d=D("2024-02-01"), v=5.0)],
        tolerance_days=40,
    )
    got = {r["x"]: r["v"] for r in out}
    assert got == {1: 5.0, 2: None}
