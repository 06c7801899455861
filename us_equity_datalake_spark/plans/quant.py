"""Oracle-gated quantitative-analytics queries (beyond the reference's
operator list but squarely in its domain — an equity datalake's derived
tier): calendar forward-fill (LOCF), VWAP, beta/correlation vs the market,
maximum drawdown, and an SCD2 dimension merge.

The events table stands in for minute bars (user_id → security_id, value →
price) exactly as `minute_to_daily_ohlcv` established; customer stands in for
the dimension table in the SCD2 merge.

Comparability: every cross-engine aggregate follows plans/base.py — exact
DECIMAL sums for anything accumulated (sums of products included: moment sums
for beta/corr are decimal, so the final double arithmetic is deterministic),
round(x, 6) on derived ratios, BIGINT casts on counts.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql, safe_div
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

# shared daily-close CTE: one bar per (security, day), close = last by ts
_DAILY_SQL = """
    daily AS (
      SELECT user_id AS security_id, CAST(ts AS DATE) AS d, value AS close
      FROM events WHERE value > 0
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC
      ) = 1
    )
"""


def _daily(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("value") > 0)
    return ev.groupBy(
        F.col("user_id").alias("security_id"), F.col("ts").cast("date").alias("d")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("close"))


@register(
    "locf_ffill_calendar",
    oracle=f"""
    WITH {_DAILY_SQL},
    span AS (
      SELECT security_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY security_id
    ),
    spine AS (
      SELECT security_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    ),
    joined AS (
      SELECT s.security_id, s.d, daily.close
      FROM spine s LEFT JOIN daily ON s.security_id = daily.security_id AND s.d = daily.d
    )
    SELECT security_id, d,
           ROUND(LAST_VALUE(close IGNORE NULLS) OVER (
             PARTITION BY security_id ORDER BY d ROWS UNBOUNDED PRECEDING
           ), 6) AS close_ff,
           CAST(close IS NULL AS BIGINT) AS filled
    FROM joined
    """,
    doc="Calendar-grid forward-fill (LOCF) — the PIT staple the reference "
    "does in pandas reindex/ffill form: per-security date spine via "
    "sequence+explode (no driver loop), sparse closes left-joined on, gaps "
    "filled by last(ignorenulls) over the security partitioning.  Spine "
    "generation, join, and window all share one shuffle on security_id; at "
    "100 TB the spine is generated per key, never materialized globally.",
)
def locf_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    span = daily.groupBy("security_id").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = span.select(
        "security_id", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    joined = spine.join(daily, ["security_id", "d"], "left")
    w = Window.partitionBy("security_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "security_id",
        "d",
        F.round(F.last("close", ignorenulls=True).over(w), 6).alias("close_ff"),
        F.col("close").isNull().cast("long").alias("filled"),
    )


@register(
    "vwap_daily",
    oracle=f"""
    SELECT user_id AS security_id, CAST(ts AS DATE) AS d,
           FLOOR({dec_sum_sql('value * (event_id % 100 + 1)')}
                 / {dec_sum_sql('event_id % 100 + 1')} * 1000000 + 0.5) / 1000000 AS vwap,
           CAST(SUM(event_id % 100 + 1) AS BIGINT) AS volume
    FROM events WHERE value > 0
    GROUP BY user_id, CAST(ts AS DATE)
    """,
    doc="Per-day VWAP — sum(price*size)/sum(size) in ONE map-side-combined "
    "groupBy (size synthesized deterministically from event_id: the test "
    "events table carries no size column).  Decimal numerator/denominator "
    "keep the division bit-identical across engines.  Single shuffle on "
    "(security, day); the canonical 100 TB shape.",
)
def vwap_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("value") > 0)
    size = (F.col("event_id") % 100 + 1).cast("long")
    return ev.groupBy(
        F.col("user_id").alias("security_id"), F.col("ts").cast("date").alias("d")
    ).agg(
        # floor(x*1e6+0.5)/1e6, NOT round(x, 6): integer sizes make exact
        # binary ties at the 6th decimal common (e.g. num/64), and Spark's
        # HALF_UP disagrees with DuckDB there; the floor form is pure IEEE
        # arithmetic, identical in any engine
        (
            F.floor(
                dec_sum(F.col("value") * size) / dec_sum(size.cast("double")) * 1e6 + 0.5
            ) / 1e6
        ).alias("vwap"),
        F.sum(size).cast("long").alias("volume"),
    )


@register(
    "beta_vs_market",
    oracle=f"""
    WITH {_DAILY_SQL},
    market AS (
      SELECT d, {dec_sum_sql('close')} / COUNT(*) AS mkt_close
      FROM daily GROUP BY d
    ),
    rets AS (
      SELECT daily.security_id, daily.d,
             daily.close / LAG(daily.close) OVER (
               PARTITION BY daily.security_id ORDER BY daily.d) - 1 AS r,
             market.mkt_close / LAG(market.mkt_close) OVER (
               PARTITION BY daily.security_id ORDER BY daily.d) - 1 AS m
      FROM daily JOIN market ON daily.d = market.d
    ),
    moments AS (
      SELECT security_id, CAST(COUNT(*) AS BIGINT) AS n,
             {dec_sum_sql('r')} AS sr, {dec_sum_sql('m')} AS sm,
             {dec_sum_sql('r * m', 12)} AS srm,
             {dec_sum_sql('r * r', 12)} AS srr,
             {dec_sum_sql('m * m', 12)} AS smm
      FROM rets WHERE r IS NOT NULL AND m IS NOT NULL GROUP BY security_id
    )
    SELECT security_id, n,
           ROUND((n * srm - sr * sm) / NULLIF(n * smm - sm * sm, 0), 6) AS beta,
           ROUND((n * srm - sr * sm)
                 / NULLIF(sqrt((n * srr - sr * sr) * (n * smm - sm * sm)), 0), 6) AS corr
    FROM moments
    """,
    doc="Per-security beta and correlation vs the equal-weight market: daily "
    "closes (one groupBy), per-day market close (second small groupBy — "
    "date-cardinality, broadcast back), lag returns per security, then "
    "beta/corr assembled from EXACT decimal moment sums (n, Σr, Σm, Σrm, "
    "Σr², Σm²) — the numerically-stable one-pass form, order-independent "
    "and therefore engine-identical.  Two shuffles of the bar table.",
)
def beta_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    market = daily.groupBy("d").agg(
        (dec_sum(F.col("close")) / F.count("*")).alias("mkt_close")
    )
    both = daily.join(F.broadcast(market), "d")  # market = one row per DATE: a true dim
    w = Window.partitionBy("security_id").orderBy("d")
    rets = both.select(
        "security_id",
        "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("r"),
        (F.col("mkt_close") / F.lag("mkt_close").over(w) - 1).alias("m"),
    ).filter(F.col("r").isNotNull() & F.col("m").isNotNull())
    dec12 = lambda c: F.sum(c.cast("decimal(30,12)")).cast("double")  # noqa: E731
    moments = rets.groupBy("security_id").agg(
        F.count("*").cast("long").alias("n"),
        dec_sum(F.col("r")).alias("sr"),
        dec_sum(F.col("m")).alias("sm"),
        dec12(F.col("r") * F.col("m")).alias("srm"),
        dec12(F.col("r") * F.col("r")).alias("srr"),
        dec12(F.col("m") * F.col("m")).alias("smm"),
    )
    n, sr, sm = F.col("n"), F.col("sr"), F.col("sm")
    srm, srr, smm = F.col("srm"), F.col("srr"), F.col("smm")
    cov_n = n * srm - sr * sm
    return moments.select(
        "security_id",
        "n",
        F.round(safe_div(cov_n, n * smm - sm * sm), 6).alias("beta"),
        F.round(safe_div(cov_n, F.sqrt((n * srr - sr * sr) * (n * smm - sm * sm))), 6).alias("corr"),
    )


@register(
    "max_drawdown",
    oracle="""
    WITH pr AS (
      SELECT user_id AS security_id, value,
             MAX(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
             ) AS peak
      FROM events WHERE value > 0
    )
    SELECT security_id,
           ROUND(MIN(value / peak - 1), 6) AS max_drawdown,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM pr GROUP BY security_id
    """,
    doc="Maximum drawdown per security: running peak via a cumulative MAX "
    "window (deterministic tiebreak on event_id), drawdown = price/peak - 1, "
    "then one MIN aggregate.  The window and the final groupBy share the "
    "security_id partitioning — one shuffle end to end.",
)
def drawdown_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("value") > 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pr = ev.select(
        F.col("user_id").alias("security_id"),
        "value",
        F.max("value").over(w).alias("peak"),
    )
    return pr.groupBy("security_id").agg(
        F.round(F.min(F.col("value") / F.col("peak") - 1), 6).alias("max_drawdown"),
        F.count("*").cast("long").alias("n_obs"),
    )


_SCD_EFF = "2024-06-10"


@register(
    "scd2_merge",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS k, c_mktsegment AS segment, c_nationkey AS nation,
             DATE '2020-01-01' AS start_date, CAST(NULL AS DATE) AS end_date
      FROM customer WHERE c_custkey <= 1500
    ),
    changes AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 8 = 0 THEN 'SEG' || CAST(c_nationkey AS VARCHAR)
                  ELSE c_mktsegment END AS segment,
             c_nationkey AS nation
      FROM customer WHERE c_custkey % 4 = 0 AND c_custkey <= 2000
    ),
    changed AS (
      SELECT d.k FROM dim d JOIN changes c ON d.k = c.k
      WHERE d.segment IS DISTINCT FROM c.segment OR d.nation IS DISTINCT FROM c.nation
    )
    SELECT k, segment, nation, start_date, end_date
    FROM dim WHERE k NOT IN (SELECT k FROM changed)
    UNION ALL
    SELECT d.k, d.segment, d.nation, d.start_date, DATE '{_SCD_EFF}' - 1
    FROM dim d WHERE d.k IN (SELECT k FROM changed)
    UNION ALL
    SELECT c.k, c.segment, c.nation, DATE '{_SCD_EFF}', CAST(NULL AS DATE)
    FROM changes c
    WHERE c.k IN (SELECT k FROM changed) OR c.k NOT IN (SELECT k FROM dim)
    """,
    doc="SCD2 dimension merge (operators/scd.py): change set = every 4th "
    "customer, half with a real segment change (must close + reopen), half "
    "identical (idempotent no-op), plus keys above the dimension (brand-new "
    "rows).  One equi-join + narrow unions; the same rule set the security "
    "master implements for symbols.",
)
def scd2_q(spark, sf_dir):
    from us_equity_datalake_spark.operators.scd import scd2_apply

    cust = load_table(spark, "customer", sf_dir)
    # dimension-sized fixtures: cache so scd2_apply's rule branches read one
    # InMemoryRelation each instead of re-scanning customer per branch
    # (same rationale as plans/lifecycle._materialize_dim)
    dim = cust.filter(F.col("c_custkey") <= 1500).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.lit("2020-01-01").cast("date").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
    )
    changes = cust.filter((F.col("c_custkey") % 4 == 0) & (F.col("c_custkey") <= 2000)).select(
        F.col("c_custkey").alias("k"),
        F.when(
            F.col("c_custkey") % 8 == 0,
            F.concat(F.lit("SEG"), F.col("c_nationkey").cast("string")),
        ).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.col("c_nationkey").alias("nation"),
    )
    return scd2_apply(
        dim.cache(), changes.cache(), key="k", attrs=["segment", "nation"],
        effective_date=_SCD_EFF,
    )


@register(
    "realized_vol_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    bars AS (
      SELECT user_id AS security_id, CAST(ts AS DATE) AS d, ts, event_id, value
      FROM events WHERE value > 0
    ),
    rets AS (
      SELECT security_id, d,
             value / LAG(value) OVER (
               PARTITION BY security_id, d ORDER BY ts, event_id) - 1 AS r
      FROM bars
    )
    SELECT security_id, d,
           CAST(COUNT(r) AS BIGINT) AS n_rets,
           ROUND(sqrt({dec_sum_sql('r * r', 12)}), 6) AS realized_vol
    FROM rets WHERE r IS NOT NULL
    GROUP BY security_id, d
    """,
    doc="Realized volatility per (security, day): sqrt of the sum of squared "
    "intraday returns — the microstructure vol estimator.  Returns via one "
    "lag window per (security, day); the squared-return sum is decimal "
    "(order-independent, engine-identical) with the sqrt applied to the "
    "exact sum.  Window and final groupBy share the (security, day) "
    "partitioning — one shuffle.",
)
def realized_vol_q(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("value") > 0)
    w = Window.partitionBy(F.col("user_id"), F.col("ts").cast("date")).orderBy("ts", "event_id")
    rets = ev.select(
        F.col("user_id").alias("security_id"),
        F.col("ts").cast("date").alias("d"),
        (F.col("value") / F.lag("value").over(w) - 1).alias("r"),
    ).filter(F.col("r").isNotNull())
    dec12 = lambda c: F.sum(c.cast("decimal(30,12)")).cast("double")  # noqa: E731
    return rets.groupBy("security_id", "d").agg(
        F.count("r").cast("long").alias("n_rets"),
        F.round(F.sqrt(dec12(F.col("r") * F.col("r"))), 6).alias("realized_vol"),
    )


@register(
    "ema_daily_close",
    oracle=f"""
    WITH {_DAILY_SQL},
    seq AS (
      SELECT security_id, d,
             FLOOR(close * 100 + 0.5) AS cents,
             ROW_NUMBER() OVER (PARTITION BY security_id ORDER BY d) AS t
      FROM daily
    ),
    acc AS (
      SELECT security_id, d, cents, t,
             cents * power(2.0, t) AS w,
             SUM(cents * power(2.0, t)) OVER (
               PARTITION BY security_id ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS s,
             FIRST_VALUE(cents) OVER (
               PARTITION BY security_id ORDER BY d) AS x1,
             FIRST_VALUE(cents * power(2.0, t)) OVER (
               PARTITION BY security_id ORDER BY d) AS w1
      FROM seq
    )
    SELECT security_id, d,
           power(0.5, t - 1) * x1 + 0.5 * power(2.0, -t) * (s - w1)
             AS ema_cents
    FROM acc
    """,
    doc="Exponential moving average (ewm(alpha=0.5, adjust=False) over "
    "integer-cent closes) — the recursive quant operator SQL cannot scan "
    "directly, expressed as ONE windowed prefix sum: ema_t = (1-a)^(t-1) "
    "x_1 + a*(1-a)^t * SUM_(i=2..t) x_i (1-a)^(-i), so the sequential "
    "recurrence becomes a parallel cumsum sharing the per-security "
    "shuffle with every other daily-bar window.  Cross-engine exactness "
    "is engineered, not hoped for: the smoothing factor is DYADIC (a = "
    "1/2, every power an exact exponent shift) and the inputs are "
    "INTEGER cents via floor(x*100+0.5), so every weighted term, every "
    "partial sum (< 2^53 at calendar-bounded t), and the final dyadic "
    "ema are exact doubles — the result is independent of summation "
    "ORDER, which matters because DuckDB's windowed SUM is a segment "
    "tree, not a sequential fold (measured: raw-double closed form "
    "differed by 1 ulp on 85 of 4006 rows; ROUND(,6) landed on exact .5 "
    "ties — the cms lesson twice over).  Production runs any a over a "
    "renormalized bounded horizon; the plan is identical.",
)
def ema_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    wo = Window.partitionBy("security_id").orderBy("d")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = daily.select(
        "security_id", "d",
        F.floor(F.col("close") * 100 + F.lit(0.5)).cast("double").alias("cents"),
    ).withColumn("t", F.row_number().over(wo))
    acc = (
        seq.withColumn("w", F.col("cents") * F.pow(F.lit(2.0), F.col("t")))
        .withColumn("s", F.sum("w").over(wc))
        .withColumn("x1", F.first("cents").over(wo))
        .withColumn("w1", F.first("w").over(wo))
    )
    ema = (
        F.pow(F.lit(0.5), F.col("t") - 1) * F.col("x1")
        + F.lit(0.5) * F.pow(F.lit(2.0), -F.col("t")) * (F.col("s") - F.col("w1"))
    )
    return acc.select("security_id", "d", ema.alias("ema_cents"))
