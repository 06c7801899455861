"""UTC→ET wall-clock semantics (hard-problem #9, SURVEY §7.3): golden values
at both DST boundaries, market-hours bounds, trading-date assignment."""

import datetime as dt

from pyspark.sql import Row, functions as F, types as T

from us_equity_datalake_spark.functions import timeops

SCHEMA = T.StructType([T.StructField("ts", T.TimestampType())])


def _wall(spark, utc_ts: dt.datetime) -> str:
    df = spark.createDataFrame([Row(ts=utc_ts)], SCHEMA)
    out = df.select(
        F.date_format(timeops.to_eastern_wallclock(F.col("ts")), "yyyy-MM-dd HH:mm").alias("w")
    ).collect()
    return out[0].w


def test_spring_forward_2024_03_10(spark):
    # 06:59 UTC = 01:59 EST; 07:01 UTC = 03:01 EDT (02:xx never exists)
    assert _wall(spark, dt.datetime(2024, 3, 10, 6, 59)) == "2024-03-10 01:59"
    assert _wall(spark, dt.datetime(2024, 3, 10, 7, 1)) == "2024-03-10 03:01"


def test_fall_back_2024_11_03(spark):
    # 05:59 UTC = 01:59 EDT; 06:01 UTC = 01:01 EST (01:xx happens twice)
    assert _wall(spark, dt.datetime(2024, 11, 3, 5, 59)) == "2024-11-03 01:59"
    assert _wall(spark, dt.datetime(2024, 11, 3, 6, 1)) == "2024-11-03 01:01"


def test_market_hours_bounds(spark):
    # EST (UTC-5): 14:30 UTC = 09:30 ET open (inclusive); 21:00 UTC = 16:00 close (exclusive)
    rows = [
        Row(ts=dt.datetime(2024, 1, 16, 14, 29)),  # 09:29 ET — pre-open
        Row(ts=dt.datetime(2024, 1, 16, 14, 30)),  # 09:30 ET — open
        Row(ts=dt.datetime(2024, 1, 16, 20, 59)),  # 15:59 ET — last minute
        Row(ts=dt.datetime(2024, 1, 16, 21, 0)),  # 16:00 ET — after close
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    et = df.select("ts", timeops.to_eastern_wallclock(F.col("ts")).alias("ets"))
    kept = et.filter(timeops.in_market_hours(F.col("ets"))).select("ts").collect()
    assert [r.ts.hour * 100 + r.ts.minute for r in kept] == [1430, 2059]


def test_et_trading_date_crosses_utc_midnight(spark):
    # 2024-01-17 01:30 UTC is still 2024-01-16 20:30 ET — belongs to Jan 16
    df = spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 17, 1, 30))], SCHEMA)
    out = df.select(
        timeops.et_trading_date(timeops.to_eastern_wallclock(F.col("ts"))).alias("d")
    ).collect()
    assert out[0].d == dt.date(2024, 1, 16)


def test_trade_day_range_utc_dst_boundaries():
    """Reference get_trade_day_range: 9:30-16:00 ET as UTC — EST days are
    UTC+5h, EDT days UTC+4h; the DST-transition days themselves pin the
    zoneinfo arithmetic."""
    from us_equity_datalake_spark.functions.timeops import month_range_utc, trade_day_range_utc

    # winter (EST, UTC-5)
    assert trade_day_range_utc("2024-01-15") == ("2024-01-15T14:30:00Z", "2024-01-15T21:00:00Z")
    # summer (EDT, UTC-4)
    assert trade_day_range_utc("2024-07-15") == ("2024-07-15T13:30:00Z", "2024-07-15T20:00:00Z")
    # spring-forward day: 9:30 ET is already EDT
    assert trade_day_range_utc("2024-03-10") == ("2024-03-10T13:30:00Z", "2024-03-10T20:00:00Z")
    # fall-back day: 9:30 ET is back on EST
    assert trade_day_range_utc("2024-11-03") == ("2024-11-03T14:30:00Z", "2024-11-03T21:00:00Z")

    # month range: 4:00 ET first day -> 20:00 ET last day; March spans the
    # DST change (start EST, end EDT), December closes on the 31st
    assert month_range_utc(2024, 3) == ("2024-03-01T09:00:00Z", "2024-04-01T00:00:00Z")
    assert month_range_utc(2024, 12) == ("2024-12-01T09:00:00Z", "2025-01-01T01:00:00Z")
