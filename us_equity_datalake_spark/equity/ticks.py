"""Read-side query layer — the reference's ``TicksClient``
(storage/clients/ticks.py:59-171) as partition-pruned DataFrame functions.

The reference hand-routes reads (hot monthly objects vs consolidated
history.parquet, month-file pruning, ticks.py:148-292); here the ticks lake is
ONE logical table partitioned by ``year`` (SURVEY §1.4 redesign), so the same
routing is Catalyst partition pruning on the year predicate — verify with
``.explain``: PartitionFilters carries the year bounds, and only the needed
year directories are listed.

``read_daily_ticks`` is the §7.1 signature slice end to end: PIT symbol
resolution across symbol changes (J1 broadcast interval join), pruned scan
(P3/P4), split adjustment (P1/P5), calendar alignment (J4, nulls never
interpolated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from us_equity_datalake_spark.operators.calendar_align import align_to_calendar, date_spine


def symbol_intervals(master: DataFrame, symbol: str, start: str, end: str) -> DataFrame:
    """Validity intervals of ``symbol`` clipped to [start, end] — every
    security that traded under the symbol during the range (symbol changes:
    one symbol → different security_ids over disjoint intervals)."""
    return (
        master.filter(
            (F.col("symbol") == symbol)
            & (F.col("start_date") <= F.lit(end).cast("date"))
            & (F.col("end_date") >= F.lit(start).cast("date"))
        )
        .select(
            "security_id",
            F.greatest(F.col("start_date"), F.lit(start).cast("date")).alias("lo"),
            F.least(F.col("end_date"), F.lit(end).cast("date")).alias("hi"),
        )
    )


def drop_null_bar_rows(
    df: DataFrame,
    *,
    cols: tuple[str, ...] = ("open", "high", "low", "close", "volume"),
    how: str = "all",
) -> DataFrame:
    """P2 null-row discipline, both reference arms: ``how="all"`` drops rows
    where EVERY bar column is null (update/app.py:386-393 — a non-traded
    placeholder row), ``how="any"`` skips rows with ANY null bar column
    (crsp_ticks.py:281-295 — a partially-reported bar is unusable for
    adjustment math).  A partial-null row therefore survives the "all" arm
    and is dropped by the "any" arm — the distinction the daily job relies
    on.  Pure filter; pushes to the scan when the columns are stored."""
    return df.na.drop(how=how, subset=list(cols))


def adjust_splits(df: DataFrame) -> DataFrame:
    """P1 (crsp_ticks.py:141-155) applied lazily at read time when adjustment
    factor columns are present; 4dp like the reference (P5)."""
    if "cfacpr" not in df.columns:
        return df
    out = df
    for c in ("open", "high", "low", "close"):
        if c in df.columns:
            out = out.withColumn(c, F.round(F.col(c) / F.col("cfacpr"), 4))
    if "volume" in df.columns and "cfacshr" in df.columns:
        out = out.withColumn("volume", (F.col("volume") * F.col("cfacshr")).cast("long"))
    return out.drop("cfacpr", "cfacshr")


def read_daily_ticks(
    spark: SparkSession,
    ticks: DataFrame,
    master: DataFrame,
    *,
    symbol: str,
    start: str,
    end: str,
    calendar: DataFrame | None = None,
    adjust: bool = True,
) -> DataFrame:
    """Adjusted daily OHLCV for ``symbol`` over [start, end], across symbol
    changes, optionally calendar-aligned (nulls on non-traded days).

    The year predicate prunes lake partitions BEFORE the interval join; the
    interval table is a handful of rows — broadcast, never a shuffle.
    """
    iv = symbol_intervals(master, symbol, start, end)
    y_lo, y_hi = int(start[:4]), int(end[:4])
    pruned = ticks.filter(F.col("year").between(y_lo, y_hi)) if "year" in ticks.columns else ticks
    rows = pruned.join(
        F.broadcast(iv),
        (pruned["security_id"] == iv["security_id"])
        & pruned["timestamp"].between(F.col("lo"), F.col("hi")),
    ).drop(iv["security_id"]).drop("lo", "hi")
    if adjust:
        rows = adjust_splits(rows)
    if calendar is None:
        return rows.orderBy("timestamp")
    cal = calendar.filter(F.col("date").between(F.lit(start).cast("date"), F.lit(end).cast("date")))
    # output keeps the lake's column name: one row per calendar date, nulls
    # on non-traded days (never interpolated)
    return align_to_calendar(cal, rows, cal_date="date", fact_date="timestamp").orderBy("timestamp")


def read_daily_history(
    spark: SparkSession,
    ticks: DataFrame,
    master: DataFrame,
    *,
    symbol: str,
    as_of: str,
    adjust: bool = True,
) -> DataFrame:
    """Full history of the security trading as ``symbol`` on ``as_of`` —
    resolves to ONE security_id first (the reference's
    get_daily_ticks_history, ticks.py:81-128), then reads that id's whole
    series regardless of what symbols it traded under earlier.  Same
    adjustment default as ``read_daily_ticks``."""
    sid_rows = master.filter(
        (F.col("symbol") == symbol)
        & (F.col("start_date") <= F.lit(as_of).cast("date"))
        & (F.col("end_date") >= F.lit(as_of).cast("date"))
    ).select("security_id")
    rows = ticks.join(F.broadcast(sid_rows), "security_id")
    if adjust:
        rows = adjust_splits(rows)
    return rows.orderBy("timestamp")


def trading_calendar_spine(spark: SparkSession, start: str, end: str, *, weekdays_only: bool = True) -> DataFrame:
    """Dimension-list calendar (utils/calendar.py:92-130 analog): a date spine,
    weekday-filtered — production swaps in the exchange calendar table."""
    spine = date_spine(spark, start, end)
    if weekdays_only:
        spine = spine.filter(~F.dayofweek("date").isin(1, 7))  # Sun=1, Sat=7
    return spine


def minute_to_daily_ohlcv(
    bars: DataFrame,
    *,
    key: str = "security_id",
    ts_col: str = "ts",
    price_col: str = "price",
    size_col: str | None = None,
) -> DataFrame:
    """Minute bars → daily OHLCV (collectors.py:296-388 parse_minute_bars_to_
    daily): one map-side-combined groupBy per (key, day) — open/close via
    ``min_by``/``max_by`` on the timestamp (no sort, no window, no shuffle of
    raw bars beyond the single agg exchange).  Requires (key, ts) unique, which
    the minute-bar layout guarantees.
    """
    day = F.col(ts_col).cast("date").alias("d")
    aggs = [
        F.min_by(price_col, ts_col).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ts_col).alias("close"),
        F.count("*").cast("long").alias("n_bars"),
    ]
    if size_col:
        aggs.append(F.sum(size_col).cast("long").alias("volume"))
    return bars.groupBy(F.col(key), day).agg(*aggs)


def read_hot_cold(spark: SparkSession, hot_path: str, history_path: str) -> DataFrame:
    """Transparent hot + history view (reference clients/ticks.py:148-292
    hand-routes monthly objects vs history.parquet; with
    ``sources.lake.consolidate_year`` keeping completed years in history and
    the current year hot, the router is ONE diagonal union — year predicates
    partition-prune each side independently, so a completed-year query never
    lists hot files and a current-year query never lists history)."""
    import os

    frames = []
    for path in (history_path, hot_path):
        if os.path.exists(path):
            frames.append(spark.read.parquet(path))
    if not frames:
        raise FileNotFoundError(f"neither {history_path} nor {hot_path} exists")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
