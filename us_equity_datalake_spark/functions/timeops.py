"""Date/time wall-clock operators (SURVEY.md §2.9 date/time family).

The reference stores minute bars in ET wall-clock with the tz dropped
(collection/alpaca_ticks.py:823-828: UTC → America/New_York →
``dt.replace(tzinfo=None)``), and filters market hours 9:30–16:00 ET.  Spark
form: ``from_utc_timestamp`` shifts the instant so that field extraction
under the UTC session timezone (session.py pins ``spark.sql.session.timeZone
= UTC``) yields ET wall-clock fields — DST-correct, via the JVM tz database.

DuckDB oracle twin: ``timezone('America/New_York', timezone('UTC', ts))``.

Hard-problem #9 (SURVEY §7.3): the DST boundaries are where naive
reimplementations break — golden tests pin 2024-03-10 (spring forward) and
2024-11-03 (fall back).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ET = "America/New_York"

# ET minutes-since-midnight bounds for the regular session: 9:30 <= t < 16:00
MARKET_OPEN_MIN = 9 * 60 + 30
MARKET_CLOSE_MIN = 16 * 60


def to_eastern_wallclock(ts: Column) -> Column:
    """UTC instant → ET wall-clock timestamp (tz-naive under a UTC session)."""
    return F.from_utc_timestamp(ts, ET)


def wallclock_minutes(et_ts: Column) -> Column:
    return F.hour(et_ts) * 60 + F.minute(et_ts)


def in_market_hours(et_ts: Column) -> Column:
    m = wallclock_minutes(et_ts)
    return (m >= MARKET_OPEN_MIN) & (m < MARKET_CLOSE_MIN)


def et_trading_date(et_ts: Column) -> Column:
    """ET calendar date of the bar (the reference's per-day minute layout key)."""
    return et_ts.cast("date")


def trade_day_range_utc(trade_day: str) -> tuple[str, str]:
    """ET trading day → UTC [9:30, 16:00] range, Z-suffixed ISO strings
    (reference alpaca_ticks.py:46-67 ``get_trade_day_range``) — the request
    window the ingest edge passes to the bars API.  DST-correct via zoneinfo."""
    import datetime as dt
    import zoneinfo

    eastern = zoneinfo.ZoneInfo(ET)
    d = dt.datetime.strptime(trade_day, "%Y-%m-%d").date()
    start = dt.datetime.combine(d, dt.time(9, 30), tzinfo=eastern)
    end = dt.datetime.combine(d, dt.time(16, 0), tzinfo=eastern)
    to_z = lambda t: t.astimezone(dt.timezone.utc).isoformat().replace("+00:00", "Z")  # noqa: E731
    return to_z(start), to_z(end)


def month_range_utc(year: int, month: int) -> tuple[str, str]:
    """ET month → UTC range from 4:00 ET (pre-market) on the 1st to 20:00 ET
    (after-hours) on the last day (reference alpaca_ticks.py:389-416)."""
    import datetime as dt
    import zoneinfo

    eastern = zoneinfo.ZoneInfo(ET)
    start_date = dt.date(year, month, 1)
    end_date = dt.date(year, 12, 31) if month == 12 else dt.date(year, month + 1, 1) - dt.timedelta(days=1)
    start = dt.datetime.combine(start_date, dt.time(4, 0), tzinfo=eastern)
    end = dt.datetime.combine(end_date, dt.time(20, 0), tzinfo=eastern)
    to_z = lambda t: t.astimezone(dt.timezone.utc).isoformat().replace("+00:00", "Z")  # noqa: E731
    return to_z(start), to_z(end)
