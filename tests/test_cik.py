"""Vectorized CIK resolver vs the reference's unit cases
(tests/unit/storage/test_cik_resolver.py): primary-date hit, null-CIK →
None, fallback-date ladder, 2025+ SEC-mapping preference, symbol
normalization."""

import datetime as dt

from pyspark.sql import Row

from us_equity_datalake_spark.equity.cik import resolve_cik_batch

D = dt.date


def _master(spark):
    return spark.createDataFrame(
        [
            # AAPL: long interval, cik present
            Row(symbol="AAPL", cik="320193", start_date=D(2015, 1, 1), end_date=D(2024, 12, 31)),
            # GONE: only active early 2020 (primary miss, Q1-end hit for year=2020)
            Row(symbol="GONE", cik="111", start_date=D(2020, 1, 1), end_date=D(2020, 4, 15)),
            # NOCIK: interval matches but cik is null -> must resolve to None
            Row(symbol="NOCIK", cik=None, start_date=D(2015, 1, 1), end_date=D(2024, 12, 31)),
            # STOPS: null-CIK record covers the primary date; a non-null
            # record covers only the year-end fallback.  The reference
            # returns None at the FIRST hit (null CIK -> non-SEC filer,
            # "don't try more dates") so the ladder must NOT fall through
            # to the 222 record.
            Row(symbol="STOPS", cik=None, start_date=D(2020, 1, 1), end_date=D(2020, 6, 30)),
            Row(symbol="STOPS", cik="222", start_date=D(2020, 7, 1), end_date=D(2020, 12, 31)),
            # BRKB stored in CRSP form; requests arrive as BRK-B / BRK.B
            Row(symbol="BRKB", cik="1067983", start_date=D(2015, 1, 1), end_date=D(2024, 12, 31)),
        ],
        "symbol string, cik string, start_date date, end_date date",
    )


def _resolve(spark, reqs, sec_map=None):
    df = spark.createDataFrame(reqs, "symbol string, date string, year int")
    out = resolve_cik_batch(_master(spark), df, sec_map=sec_map)
    return {(r.symbol, str(r.date)): r.cik for r in out.collect()}


def test_primary_date_hit(spark):
    got = _resolve(spark, [Row(symbol="AAPL", date="2020-06-01", year=None)])
    assert got[("AAPL", "2020-06-01")] == "0000320193"  # zero-padded


def test_null_cik_returns_none(spark):
    got = _resolve(spark, [Row(symbol="NOCIK", date="2020-06-01", year=2020)])
    assert got[("NOCIK", "2020-06-01")] is None


def test_null_cik_hit_stops_ladder(spark):
    # primary 2020-06-01 hits STOPS's null-CIK interval -> None, even though
    # the 2020-12-31 fallback would find cik=222 (reference early return,
    # cik_resolver.py:104-113)
    got = _resolve(spark, [Row(symbol="STOPS", date="2020-06-01", year=2020)])
    assert got[("STOPS", "2020-06-01")] is None
    # a primary date inside the non-null interval still resolves normally
    got = _resolve(spark, [Row(symbol="STOPS", date="2020-08-01", year=None)])
    assert got[("STOPS", "2020-08-01")] == "0000000222"


def test_fallback_dates_used(spark):
    # primary 2020-12-01 misses GONE's [Jan 1, Apr 15] interval; with
    # year=2020 the ladder tries 12-31, 06-30, 09-30, then 03-31 -> hit
    got = _resolve(spark, [Row(symbol="GONE", date="2020-12-01", year=2020)])
    assert got[("GONE", "2020-12-01")] == "0000000111"
    # without the year there is no ladder -> miss
    got = _resolve(spark, [Row(symbol="GONE", date="2020-12-01", year=None)])
    assert got[("GONE", "2020-12-01")] is None


def test_2025_plus_prefers_sec_mapping(spark):
    sec = spark.createDataFrame(
        [Row(ticker="AAPL", cik="999")], "ticker string, cik string"
    )
    # year >= 2025 -> SEC snapshot wins even though the master would resolve
    got = _resolve(spark, [Row(symbol="AAPL", date="2024-06-01", year=2025)], sec_map=sec)
    assert got[("AAPL", "2024-06-01")] == "0000000999"
    # pre-2025 request ignores the snapshot
    got = _resolve(spark, [Row(symbol="AAPL", date="2024-06-01", year=2024)], sec_map=sec)
    assert got[("AAPL", "2024-06-01")] == "0000320193"
    # 2025+ by DATE alone also prefers SEC; ladder would miss anyway
    got = _resolve(spark, [Row(symbol="AAPL", date="2025-02-01", year=None)], sec_map=sec)
    assert got[("AAPL", "2025-02-01")] == "0000000999"


def test_sec_format_symbol_normalized(spark):
    for sym in ("BRK-B", "BRK.B", "BRKB"):
        got = _resolve(spark, [Row(symbol=sym, date="2020-06-01", year=None)])
        assert got[(sym, "2020-06-01")] == "0001067983"


def test_unknown_symbol_is_none(spark):
    got = _resolve(spark, [Row(symbol="ZZZQ", date="2020-06-01", year=2020)])
    assert got[("ZZZQ", "2020-06-01")] is None
