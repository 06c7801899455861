"""Event-stream operators in batch form (SURVEY.md §2.12 I8 capability
extension + A10 stats): sessionization, tumbling & sliding windows, statistical
profiles, and the bucketed range self-join.  The streaming (readStream)
equivalents live in ``us_equity_datalake_spark.streaming``; these batch forms
are the oracle-checkable semantics.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.operators.rangejoin import within_tolerance_pairs
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

_GAP_S = 1800  # 30-minute session gap


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tus - prev > {_GAP_S} * 1000000 THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, sid, COUNT(*) AS n_ev, (MAX(tus) - MIN(tus)) // 1000000 AS span_s
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_ev) AS BIGINT) AS n_events,
           MAX(n_ev) AS longest_session_events,
           CAST(SUM(span_s) AS BIGINT) AS total_span_seconds
    FROM per_session GROUP BY user_id
    """,
    doc="Sessionization (gap > 30 min) via lag + cumulative sum — the batch "
    "equivalent of session_window; reference has I6-style stateful diffs only.",
)
def sessionize_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("tus").over(w).isNull() | (F.col("tus") - F.lag("tus").over(w) > _GAP_S * 1_000_000), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_ev"),
        F.expr("(max(tus) - min(tus)) div 1000000").alias("span_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("n_ev").alias("longest_session_events"),
        F.sum("span_s").alias("total_span_seconds"),
    )


@register(
    "tumbling_hourly_agg",
    oracle=f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
           COUNT(*) AS n, {dec_sum_sql('value')} AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling window aggregation (batch form of F.window(ts, '1 hour')).",
)
def tumbling_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dec_sum(F.col("value")).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_ts"), "event_type", "n", "total_value"
        )
    )


@register(
    "sliding_window_agg",
    oracle=f"""
    WITH assigned AS (
      SELECT epoch_us(date_trunc('hour', ts)) // 1000000
               + (CASE WHEN epoch_us(ts) - epoch_us(date_trunc('hour', ts)) >= 1800 * 1000000 THEN 1800 ELSE 0 END)
               AS b0,
             value
      FROM events
    ),
    two AS (
      SELECT b0 AS wstart, value FROM assigned
      UNION ALL
      SELECT b0 - 1800, value FROM assigned
    )
    SELECT wstart AS window_start, COUNT(*) AS n, {dec_sum_sql('value')} AS total_value
    FROM two GROUP BY wstart
    """,
    doc="Sliding window (1h window, 30min slide): each event lands in 2 windows; "
    "batch form of F.window(ts, '1 hour', '30 minutes').",
)
def sliding_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dec_sum(F.col("value")).alias("total_value"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), "n", "total_value")
    )


@register(
    "stat_profile_by_type",
    oracle=f"""
    SELECT event_type,
           COUNT(value) AS n,
           ROUND({dec_sum_sql('value')} / COUNT(value), 6) AS mean,
           ROUND(stddev_samp(value), 6) AS std,
           median(value) AS median,
           ROUND(MAX(value) - MIN(value), 6) AS val_range,
           ROUND(AVG(CASE WHEN value < 2.0 THEN 1.0 ELSE 0.0 END), 6) AS extreme_ratio,
           ROUND((AVG(value) - median(value)) / stddev_samp(value), 6) AS skew_pearson
    FROM events GROUP BY event_type
    """,
    doc="A10 (derived/sentiment.py:175-299): mean/std/median/range/extreme-ratio/"
    "Pearson-median skew — all native aggregates (median exact in Spark 3.4+).",
)
def stat_profile_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count(v).alias("n"),
        F.round(dec_sum(v) / F.count(v), 6).alias("mean"),
        F.round(F.stddev_samp(v), 6).alias("std"),
        F.median(v).alias("median"),
        F.round(F.max(v) - F.min(v), 6).alias("val_range"),
        F.round(F.avg(F.when(v < 2.0, 1.0).otherwise(0.0)), 6).alias("extreme_ratio"),
        F.round((F.avg(v) - F.median(v)) / F.stddev_samp(v), 6).alias("skew_pearson"),
    )


@register(
    "range_self_join_pairs",
    oracle="""
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(a.ts) AS t_a_us, epoch_us(b.ts) AS t_b_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= CAST(3600 AS BIGINT) * 1000000
    """,
    doc="J6-style range self-join: same-user event pairs within 1 hour, via "
    "tolerance-bucketed equi-join (no O(n²)-per-key theta join).",
)
def range_pairs_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return within_tolerance_pairs(ev, key="user_id", ts="ts", id_col="event_id", tolerance_seconds=3600)


# ---------------------------------------------------------------------------
# Funnel + cohort analytics (the classic event-stream product queries;
# capability extension over the reference's tick-only time series)
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                  THEN 1 ELSE 0 END AS s3
      FROM firsts
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n_view,
           CAST(SUM(s2) AS BIGINT) AS n_view_click,
           CAST(SUM(s3) AS BIGINT) AS n_full_funnel,
           ROUND(SUM(s3) * 1.0 / NULLIF(SUM(s1), 0), 6) AS conversion
    FROM staged
    """,
    doc="Ordered funnel (view -> click -> purchase): per-user first-event "
    "times via ONE conditional-min groupBy (no self-joins, no explode — the "
    "n-stage funnel is n conditional aggregates in a single shuffle), then "
    "strict ordering checks.  At 100 TB this is the canonical one-pass "
    "funnel; a join-based funnel would shuffle the event table per stage.",
)
def funnel_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    staged = firsts.select(
        s1.cast("long").alias("s1"), s2.cast("long").alias("s2"), s3.cast("long").alias("s3")
    )
    return staged.agg(
        F.sum("s1").alias("n_view"),
        F.sum("s2").alias("n_view_click"),
        F.sum("s3").alias("n_full_funnel"),
        F.round(F.sum("s3") / F.nullif(F.sum("s1"), F.lit(0)), 6).alias("conversion"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(date_diff('week', c.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT) AS week_offset
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
    )
    SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention: first-seen week per user via a window MIN "
    "over the user_id partitioning (no join — a per-user cohort table is "
    "fact-cardinality and must never be broadcast), activity weeks via "
    "distinct (user, week) pairs which REUSES the user_id partitioning "
    "(grouping keys are a superset of the partition key), offset in whole "
    "weeks.  One full shuffle of events + one tiny final shuffle, regardless "
    "of event volume.",
)
def cohort_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    uw = Window.partitionBy("user_id")
    with_cohort = ev.select(
        "user_id", week(F.col("ts")).alias("act_week")
    ).withColumn("cohort_week", F.min("act_week").over(uw))
    activity = with_cohort.select(
        "user_id",
        "cohort_week",
        (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
    ).distinct()
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )


@register(
    "funnel_windowed_conversion",
    oracle="""
    WITH stamped AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    s2 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'click' AND ts > t1
                       AND ts <= t1 + INTERVAL 2 DAY THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM stamped
    ),
    s3 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                       AND ts <= t2 + INTERVAL 3 DAY THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2
    ),
    per_user AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
    SELECT CAST(COUNT(t1) AS BIGINT) AS n_view,
           CAST(COUNT(t2) AS BIGINT) AS n_click_2d,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase_3d,
           ROUND(COUNT(t3) * 1.0 / NULLIF(COUNT(t1), 0), 6) AS conversion
    FROM per_user
    """,
    doc="Funnel with CONVERSION DEADLINES (view -> click within 2 days -> "
    "purchase within 3 days of the click): each stage's deadline depends on "
    "the previous stage's timestamp, so the one-pass conditional-min trick "
    "(funnel_conversion) no longer applies — three sequential window MINs "
    "over the SAME user_id partitioning compute t1/t2/t3 in one shuffle, "
    "then a distinct + global count.  The canonical attribution-window "
    "funnel at 100 TB: still exactly one shuffle of the event table.",
)
def funnel_windowed_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    uw = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(uw)
    stamped = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 2 DAY")),
            F.col("ts"),
        )
    ).over(uw)
    s2 = stamped.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 3 DAY")),
            F.col("ts"),
        )
    ).over(uw)
    per_user = s2.withColumn("t3", t3).select("user_id", "t1", "t2", "t3").distinct()
    return per_user.agg(
        F.count("t1").cast("long").alias("n_view"),
        F.count("t2").cast("long").alias("n_click_2d"),
        F.count("t3").cast("long").alias("n_purchase_3d"),
        F.round(F.count("t3") / F.nullif(F.count("t1").cast("double"), F.lit(0.0)), 6).alias("conversion"),
    )
