"""Universe selection tests: common-stock predicate cases (reference
universe/current.py:20-88), liquidity top-k, snapshot transitions."""

from pyspark.sql import Row, functions as F

from us_equity_datalake_spark.equity.universe import filter_universe, is_common_stock, universe_transition
from us_equity_datalake_spark.operators.topk import top_liquidity

CASES = [
    ("Apple Inc Common Stock", True),
    ("Foo Preferred Series A", False),
    ("Bar Pfd Ser B", False),
    ("Acme Units", False),            # \bUnits?\b
    ("Uniti Group Inc", True),        # word boundary: Uniti is NOT Unit
    ("Baz Rights", False),
    ("Qux Warrants", False),
    ("Mega Corp ADR", False),         # case-sensitive
    ("Radr Industries", True),        # 'adr' lowercase inside word is fine
    ("7.5% Notes Due 2030", False),
    ("Muni Income Fund", False),      # Trust/Fund + debt keyword
    ("Growth Fund Opportunities", True),   # Fund without debt keyword survives
    ("Realty Income Trust", True),    # REIT overrides debt rule
    ("Pioneer Bond Fund", False),
    ("", False),
]


def test_is_common_stock_cases(spark):
    df = spark.createDataFrame([Row(name=n) for n, _ in CASES])
    got = {r["name"]: r["ok"] for r in df.select("name", is_common_stock(F.col("name")).alias("ok")).collect()}
    for name, expected in CASES:
        assert got[name] == expected, name


def test_filter_universe_flags_and_ticker(spark):
    rows = [
        Row(ticker="AAA", name="Aaa Inc Common Stock", etf="N", test_issue="N"),
        Row(ticker="BBB", name="Bbb ETF Trust Income", etf="Y", test_issue="N"),
        Row(ticker="CCC", name="Ccc Inc", etf="N", test_issue="Y"),
        Row(ticker="DD$", name="Dd Corp", etf="N", test_issue="N"),
        Row(ticker="AAA", name="Aaa Duplicate Listing", etf="N", test_issue="N"),
    ]
    out = filter_universe(spark.createDataFrame(rows))
    assert [r["ticker"] for r in out.collect()] == ["AAA"]
    assert out.collect()[0]["name"] == "Aaa Duplicate Listing"  # keep-first by name asc


def test_top_liquidity_golden(spark):
    rows = []
    for sym, close, vol, days in [("BIG", 100.0, 1000, 5), ("MID", 10.0, 500, 5), ("TINY", 1.0, 10, 5)]:
        rows += [Row(symbol=sym, close=close, volume=vol + i) for i in range(days)]
    out = top_liquidity(spark.createDataFrame(rows), min_adv=1000.0, k=2).collect()
    assert [r["symbol"] for r in out] == ["BIG", "MID"]
    assert out[0]["adv"] == 100.0 * (1000 + 2)  # avg(close*volume), volume mean 1002


def test_universe_transition_statuses(spark):
    prev = spark.createDataFrame([Row(ticker=t) for t in ["A", "B", "C"]])
    cur = spark.createDataFrame([Row(ticker=t) for t in ["B", "C", "D"]])
    out = {r["ticker"]: r["status"] for r in universe_transition(prev, cur).collect()}
    assert out == {"A": "disappeared", "B": "still_active", "C": "still_active", "D": "appeared"}
