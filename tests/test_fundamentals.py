"""F1/F2/A7/A8/F3 normalization tests (FIXTURES.md §5 required cases;
reference collection/fundamental.py:193-287)."""

import datetime as dt

from pyspark.sql import Row

from us_equity_datalake_spark.equity.fundamentals import (
    derive_q4,
    latest_filed_per_frame,
    merge_tags,
    normalize_fundamental,
)

D = dt.date.fromisoformat


def dp(symbol="AAPL", concept="rev", value=0.0, accn="a1", form="10-Q",
       filed="2024-05-01", start="2024-01-01", end="2024-03-31", frame="CY2024Q1"):
    return Row(symbol=symbol, concept=concept, value=value, accn=accn, form=form,
               filed=D(filed), start=D(start), end=D(end), frame=frame)


def test_q4_derived_from_annual_minus_quarters(spark):
    rows = [
        dp(value=100.0, accn="q1", filed="2024-05-01", start="2024-01-01", end="2024-03-31", frame="CY2024Q1"),
        dp(value=110.0, accn="q2", filed="2024-08-01", start="2024-04-01", end="2024-06-30", frame="CY2024Q2"),
        dp(value=120.0, accn="q3", filed="2024-11-01", start="2024-07-01", end="2024-09-30", frame="CY2024Q3"),
        dp(value=460.0, accn="fy", form="10-K", filed="2025-02-15", start="2024-01-01", end="2024-12-31", frame="CY2024"),
    ]
    out = derive_q4(spark.createDataFrame(rows)).collect()
    derived = [r for r in out if r["frame"] == "CY2024"]
    assert len(derived) == 1
    r = derived[0]
    assert r["value"] == 130.0  # FY - Q1 - Q2 - Q3
    assert r["start"] == D("2024-10-01")  # Q3 end + 1 day (fundamental.py:257-276)
    assert r["end"] == D("2024-12-31")
    assert len(out) == 4  # 3 standalone quarters pass through + derived Q4


def test_q4_not_derived_when_quarter_missing(spark):
    rows = [
        dp(value=100.0, accn="q1", frame="CY2024Q1"),
        dp(value=110.0, accn="q2", frame="CY2024Q2"),
        dp(value=460.0, accn="fy", form="10-K", filed="2025-02-15", end="2024-12-31", frame="CY2024"),
    ]
    out = derive_q4(spark.createDataFrame(rows)).collect()
    assert all(r["frame"] != "CY2024" for r in out)
    assert len(out) == 2


def test_latest_filed_wins_per_frame(spark):
    rows = [
        dp(value=100.0, accn="orig", filed="2024-05-01", frame="CY2024Q1"),
        dp(value=105.0, accn="amend", form="10-Q/A", filed="2024-06-15", frame="CY2024Q1"),
    ]
    out = latest_filed_per_frame(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["value"] == 105.0 and out[0]["accn"] == "amend"  # fundamental.py:240-244


def test_merge_tags_dedups_by_accn_frame_filed(spark):
    rows = [
        Row(symbol="AAPL", concept="rev", tag="Revenues", tag_priority=1, value=100.0,
            accn="a1", form="10-Q", filed=D("2024-05-01"), start=D("2024-01-01"),
            end=D("2024-03-31"), frame="CY2024Q1"),
        Row(symbol="AAPL", concept="rev", tag="RevenueFromContracts", tag_priority=2, value=100.0,
            accn="a1", form="10-Q", filed=D("2024-05-01"), start=D("2024-01-01"),
            end=D("2024-03-31"), frame="CY2024Q1"),
    ]
    out = merge_tags(spark.createDataFrame(rows)).collect()
    assert len(out) == 1  # same datapoint under two XBRL tags -> one row (A8)


def test_full_pipeline_pit_columns(spark):
    raw = [
        Row(symbol="AAPL", concept="rev", tag="Revenues", tag_priority=1, value=100.0,
            accn="a1", form="10-Q", filed=D("2024-05-01"), start=D("2024-01-01"),
            end=D("2024-03-31"), frame="CY2024Q1"),
        Row(symbol="AAPL", concept="cce", tag="Cash", tag_priority=1, value=55.0,
            accn="a1", form="10-Q", filed=D("2024-05-01"), start=None,
            end=D("2024-03-31"), frame="CY2024Q1I"),
    ]
    out = {r["concept"]: r for r in normalize_fundamental(spark.createDataFrame(raw)).collect()}
    # as_of_date = FILED date (PIT reveal, F3), never the period end
    assert out["rev"]["as_of_date"] == D("2024-05-01")
    assert out["rev"]["is_instant"] is False
    assert out["cce"]["is_instant"] is True


def _dp_raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "symbol string, concept string, value double, accn string, form string, "
        "filed date, start date, end date, frame string",
    )


def test_duration_row_missing_start_is_dropped(spark):
    """Reference fundamental.py:212-217: a DURATION datapoint lacking start
    (or end/filed/frame) never reaches normalization."""
    rows = [
        Row(symbol="AAPL", concept="rev", value=100.0, accn="q1", form="10-Q",
            filed=D("2024-05-01"), start=None, end=D("2024-03-31"), frame="CY2024Q1"),
        Row(symbol="AAPL", concept="rev", value=110.0, accn="q2", form="10-Q",
            filed=D("2024-08-01"), start=D("2024-04-01"), end=D("2024-06-30"), frame="CY2024Q2"),
    ]
    out = derive_q4(_dp_raw(spark, rows)).collect()
    assert [r["frame"] for r in out] == ["CY2024Q2"]


def test_instant_rows_bypass_duration_normalization(spark):
    """Instant datapoints (null start, I-suffixed frame) bypass the duration
    pass untouched (reference gates the whole pass per concept,
    fundamental.py:349-350)."""
    rows = [
        Row(symbol="AAPL", concept="cce", value=50.0, accn="a1", form="10-Q",
            filed=D("2024-05-01"), start=None, end=D("2024-03-31"), frame="CY2024Q1I"),
    ]
    out = derive_q4(_dp_raw(spark, rows)).collect()
    assert len(out) == 1 and out[0]["value"] == 50.0 and out[0]["frame"] == "CY2024Q1I"


def test_q4_start_from_picked_instant_q3(spark):
    """When Q3 exists only as the I-suffixed fallback frame, _pick_frame
    chooses it and the derived Q4 start comes from THAT frame's end
    (fundamental.py:199-207, 273)."""
    rows = [
        Row(symbol="AAPL", concept="rev", value=100.0, accn="q1", form="10-Q",
            filed=D("2024-05-01"), start=D("2024-01-01"), end=D("2024-03-31"), frame="CY2024Q1"),
        Row(symbol="AAPL", concept="rev", value=110.0, accn="q2", form="10-Q",
            filed=D("2024-08-01"), start=D("2024-04-01"), end=D("2024-06-30"), frame="CY2024Q2"),
        Row(symbol="AAPL", concept="rev", value=120.0, accn="q3", form="10-Q",
            filed=D("2024-11-01"), start=D("2024-07-01"), end=D("2024-09-28"), frame="CY2024Q3I"),
        Row(symbol="AAPL", concept="rev", value=460.0, accn="fy", form="10-K",
            filed=D("2025-02-15"), start=D("2024-01-01"), end=D("2024-12-31"), frame="CY2024"),
    ]
    out = {r["frame"]: r for r in derive_q4(_dp_raw(spark, rows)).collect()}
    assert out["CY2024"]["value"] == 130.0
    assert out["CY2024"]["start"] == D("2024-09-29")  # picked (instant) Q3 end + 1
