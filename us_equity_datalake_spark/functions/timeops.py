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
