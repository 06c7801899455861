"""Structured Streaming window operators (SURVEY.md §2.12 I8 capability
extension — the reference is a daily micro-batch system with no streaming
engine; these are the Spark-native streaming forms of the batch queries in
``plans.events``).

All helpers take an already-constructed streaming DataFrame (``readStream``)
so tests can drive them with a parquet directory + ``availableNow`` and
compare against the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum


def tumbling_counts(events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours",
                    exact_sum: bool = False) -> DataFrame:
    """Tumbling-window count/sum with a watermark for late data (I2 analog:
    the reference's 7-day filing lookback is its watermark).

    ``exact_sum=True`` routes the value sum through DECIMAL(30,6)
    (order-independent, engine-portable) so a parquet sink of this stream
    can be hash-compared against a SQL oracle — the r6
    ``streaming_tumbling_sink`` grading path."""
    total = dec_sum(F.col("value")) if exact_sum else F.sum("value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), total.alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, *, window: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "2 hours", exact_sum: bool = False) -> DataFrame:
    """Sliding-window counts (each event lands in window/slide windows).
    ``exact_sum=True`` adds the DECIMAL value sum so a parquet sink of this
    stream hash-compares against a SQL oracle (the r6
    ``streaming_sliding_sink`` grading path)."""
    aggs = [F.count("*").alias("n")]
    cols = [F.col("w.start").alias("window_start"), "n"]
    if exact_sum:
        aggs.append(dec_sum(F.col("value")).alias("total_value"))
        cols.append("total_value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(*aggs)
        .select(*cols)
    )


def session_counts(events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows (session_window) — the streaming form of the
    lag+cumsum batch sessionization in plans.events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "user_id", "n_events")
    )


def streaming_dedup(df: DataFrame, *, keys: list[str], watermark_col: str | None = None,
                    watermark: str = "1 day") -> DataFrame:
    """I4 in streaming form: exactly-once-per-key via dropDuplicates state
    (the reference's anti-join on accession numbers, update/app.py:896-900)."""
    if watermark_col:
        df = df.withWatermark(watermark_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    dim_cols: tuple[str, ...] = ("segment",),
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: join each event to a broadcast dimension
    row, then roll up per (tumbling window, dim attribute) — the canonical
    production topology (fact stream ⋈ slowly-changing dim) the batch J9
    broadcast joins express offline.  The static side is planned as a
    broadcast hash join in every micro-batch (no stream state for the join
    itself); watermark state is only the open windows of the downstream agg.
    DECIMAL value sums keep the parquet sink hash-comparable to a SQL oracle.
    """
    enriched = events.withWatermark("ts", watermark).join(F.broadcast(dim), key, "inner")
    return (
        enriched.groupBy(F.window("ts", window).alias("w"), *dim_cols)
        .agg(F.count("*").alias("n"), dec_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *dim_cols, "n", "total_value")
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (impressions ⋈ clicks attribution): right
    events join left events of the same key that happened within
    ``within`` BEFORE them.  Both sides carry watermarks so state is bounded
    — Spark drops left state once right's watermark passes left_ts + within.

    ``how='left_outer'`` additionally emits never-matched left rows with a
    NULL right side — but only once the watermark proves no match can still
    arrive (state eviction IS the emission trigger), so left rows inside the
    final ``watermark + within`` horizon of the stream's end stay in state
    and never reach the sink.

    Batch twin for tests: the same inequality join on static frames (results
    must match exactly on bounded input for the inner form; the outer form
    additionally withholds the unexpired tail).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).select(
        lw[key].alias(key), F.col(left_ts), F.col(right_ts)
    )
