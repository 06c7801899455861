"""24-metric pipeline golden tests — fixture and expected values transplanted
from the reference's tests/unit/derived/test_metrics.py:50-160 (engine-agnostic
arithmetic; formulas docs/derived_fundamentals.md:17-69)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from us_equity_datalake_spark.equity.metrics import METRIC_COLS, compute_metrics_long

DATES = ["2023-09-30", "2023-12-31", "2024-03-31", "2024-06-30", "2024-09-30"]
VALUES = {
    "rev": [90000.0, 95000.0, 98000.0, 100000.0, 110000.0],
    "cor": [54000.0, 57000.0, 59000.0, 60000.0, 65000.0],
    "op_inc": [27000.0, 28500.0, 29500.0, 30000.0, 35000.0],
    "net_inc": [22500.0, 24000.0, 24500.0, 25000.0, 28000.0],
    "dna": [4500.0, 4800.0, 4900.0, 5000.0, 5500.0],
    "std": [9000.0, 9500.0, 9800.0, 10000.0, 11000.0],
    "ltd": [48000.0, 49000.0, 49500.0, 50000.0, 52000.0],
    "cce": [18000.0, 19000.0, 19500.0, 20000.0, 22000.0],
    "ca": [76000.0, 78000.0, 79000.0, 80000.0, 85000.0],
    "cl": [47000.0, 48000.0, 49000.0, 50000.0, 52000.0],
    "cfo": [33000.0, 34000.0, 34500.0, 35000.0, 38000.0],
    "capex": [14000.0, 14500.0, 14800.0, 15000.0, 16000.0],
    "ta": [180000.0, 185000.0, 190000.0, 200000.0, 210000.0],
    "te": [110000.0, 113000.0, 116000.0, 120000.0, 125000.0],
    "inc_tax_exp": [7000.0, 7500.0, 7800.0, 8000.0, 9000.0],
    "ibt": [30000.0, 32000.0, 34000.0, 33000.0, 37000.0],
}


@pytest.fixture(scope="module")
def metrics_long(spark):
    rows = [
        Row(symbol="AAPL", as_of_date=dt.date.fromisoformat(d), concept=c, value=v)
        for c, vals in VALUES.items()
        for d, v in zip(DATES, vals)
    ]
    # fixture already contains stock concepts at the same dates: pass all
    # through the duration pivot and the stock as-of join paths
    duration = [r for r in rows if r.concept in ("rev", "cor", "op_inc", "net_inc", "dna", "cfo", "capex", "inc_tax_exp", "ibt")]
    stock = [r for r in rows if r.concept in ("std", "ltd", "cce", "ca", "cl", "ta", "te")]
    out = compute_metrics_long(spark.createDataFrame(duration), spark.createDataFrame(stock))
    return {(r["as_of_date"].isoformat(), r["metric"]): r["value"] for r in out.collect()}


def g(metrics_long, date, metric):
    return metrics_long.get((date, metric))


def test_profitability_goldens(metrics_long):
    assert g(metrics_long, "2024-06-30", "grs_pft") == pytest.approx(40000.0)
    assert g(metrics_long, "2024-06-30", "grs_mgn") == pytest.approx(0.4)
    assert g(metrics_long, "2024-06-30", "op_mgn") == pytest.approx(0.3)
    assert g(metrics_long, "2024-06-30", "net_mgn") == pytest.approx(0.25)
    assert g(metrics_long, "2024-06-30", "ebitda") == pytest.approx(35000.0)


def test_balance_sheet_goldens(metrics_long):
    assert g(metrics_long, "2024-06-30", "ttl_dbt") == pytest.approx(60000.0)
    assert g(metrics_long, "2024-06-30", "net_dbt") == pytest.approx(40000.0)
    assert g(metrics_long, "2024-06-30", "wc") == pytest.approx(30000.0)


def test_cash_flow_goldens(metrics_long):
    assert g(metrics_long, "2024-06-30", "fcf") == pytest.approx(20000.0)
    assert g(metrics_long, "2024-06-30", "fcf_mgn") == pytest.approx(0.2)
    assert g(metrics_long, "2024-06-30", "capex_ratio") == pytest.approx(15000.0 / 200000.0)


def test_return_metrics(metrics_long):
    # etr = 8000/33000; nopat = 30000 * (1 - etr)
    etr = 8000.0 / 33000.0
    assert g(metrics_long, "2024-06-30", "etr") == pytest.approx(etr)
    assert g(metrics_long, "2024-06-30", "nopat") == pytest.approx(30000.0 * (1 - etr))
    # inv_cap = te + ttl_dbt - cce = 120000 + 60000 - 20000
    assert g(metrics_long, "2024-06-30", "inv_cap") == pytest.approx(160000.0)


def test_accruals(metrics_long):
    assert g(metrics_long, "2024-06-30", "acc") == pytest.approx(-10000.0)  # 25000 - 35000
    # wc_acc = Δwc - dna = (30000 - 30000) - 5000
    assert g(metrics_long, "2024-06-30", "wc_acc") == pytest.approx(-5000.0)


def test_growth_metrics(metrics_long):
    assert g(metrics_long, "2024-06-30", "rev_grw") == pytest.approx(2000.0)  # 100000 - 98000
    assert g(metrics_long, "2024-06-30", "ast_grw") == pytest.approx(10000.0)  # 200000 - 190000


def test_lag_metrics_null_on_first_rows(metrics_long):
    """docs/derived_fundamentals.md:134-138: no t-1 -> None; null rows are
    dropped by the melt, so the keys must be absent."""
    assert ("2023-09-30", "rev_grw") not in metrics_long
    assert ("2023-09-30", "avg_ast") not in metrics_long
    # avg_ast needs lag-4: only the 5th quarter has it
    assert g(metrics_long, "2024-09-30", "avg_ast") == pytest.approx((210000.0 + 180000.0) / 2)
    assert ("2024-06-30", "avg_ast") not in metrics_long


def test_all_24_metrics_present_at_last_quarter(metrics_long):
    present = {m for (d, m) in metrics_long if d == "2024-09-30"}
    assert present == set(METRIC_COLS)
