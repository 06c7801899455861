"""W1 golden tests transplanted from the reference's unit suite
(tests/unit/derived/test_ttm.py — engine-agnostic arithmetic)."""

import datetime as dt

from pyspark.sql import Row

from us_equity_datalake_spark.equity.ttm import compute_ttm_long


def _fund_rows(symbol, concept, quarters):
    rows = []
    for i, (as_of, value) in enumerate(quarters):
        d = dt.date.fromisoformat(as_of)
        rows.append(
            Row(
                symbol=symbol,
                as_of_date=d,
                accn=f"a{i}",
                form="10-Q",
                concept=concept,
                value=value,
                start=d.replace(day=1),
                end=d,
                frame=f"CY{d.year}Q{(d.month - 1) // 3 + 1}",
            )
        )
    return rows


def test_ttm_four_quarters_sums_460(spark):
    rows = _fund_rows("AAPL", "rev", [
        ("2023-03-31", 100.0), ("2023-06-30", 110.0), ("2023-09-30", 120.0), ("2023-12-31", 130.0),
    ])
    out = compute_ttm_long(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 460.0  # test_ttm.py:32-57 golden
    assert r["as_of_date"] == dt.date(2023, 12, 31)
    assert r["start"] == dt.date(2023, 3, 1)  # window-start carried
    assert r["end"] == dt.date(2023, 12, 31)


def test_ttm_net_income_70(spark):
    rows = _fund_rows("AAPL", "net_inc", [
        ("2023-03-31", 10.0), ("2023-06-30", 15.0), ("2023-09-30", 20.0), ("2023-12-31", 25.0),
    ])
    out = compute_ttm_long(spark.createDataFrame(rows)).collect()
    assert [r["value"] for r in out] == [70.0]  # test_ttm.py:59-89 golden


def test_ttm_insufficient_quarters_no_row(spark):
    rows = _fund_rows("AAPL", "rev", [("2023-03-31", 100.0), ("2023-06-30", 110.0), ("2023-09-30", 120.0)])
    assert compute_ttm_long(spark.createDataFrame(rows)).count() == 0  # test_ttm.py:120


def test_ttm_null_rows_dropped_before_windowing(spark):
    """Reference derived/ttm.py:76-81: a null-value row is dropped BEFORE
    grouping, so the window forms over the 4 surviving quarters instead of
    being poisoned by the null."""
    rows = _fund_rows("AAPL", "rev", [
        ("2023-03-31", 100.0), ("2023-06-30", None), ("2023-09-30", 120.0),
        ("2023-12-31", 130.0), ("2024-03-31", 140.0),
    ])
    out = compute_ttm_long(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["value"] == 490.0  # 100 + 120 + 130 + 140 — null quarter skipped
    assert str(out[0]["as_of_date"]) == "2024-03-31"


def test_ttm_rolling_multiple_windows(spark):
    rows = _fund_rows("AAPL", "rev", [
        ("2023-03-31", 100.0), ("2023-06-30", 110.0), ("2023-09-30", 120.0),
        ("2023-12-31", 130.0), ("2024-03-31", 140.0),
    ])
    out = sorted(compute_ttm_long(spark.createDataFrame(rows)).collect(), key=lambda r: r["as_of_date"])
    assert [r["value"] for r in out] == [460.0, 500.0]


def test_ttm_partitions_by_symbol_and_concept(spark):
    rows = _fund_rows("AAPL", "rev", [
        ("2023-03-31", 100.0), ("2023-06-30", 110.0), ("2023-09-30", 120.0), ("2023-12-31", 130.0),
    ]) + _fund_rows("MSFT", "rev", [
        ("2023-03-31", 1.0), ("2023-06-30", 2.0), ("2023-09-30", 3.0), ("2023-12-31", 4.0),
    ])
    out = {r["symbol"]: r["value"] for r in compute_ttm_long(spark.createDataFrame(rows)).collect()}
    assert out == {"AAPL": 460.0, "MSFT": 10.0}
