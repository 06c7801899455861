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
    # Exactness guard (ADVICE r8): the closed form is exact only while every
    # weighted term cents*2^t stays an exact double (< 2^53).  Outside that
    # regime fail loudly instead of silently diverging from the oracle —
    # long series belong to ema_daily_close_long's segmented scan.
    w_raw = F.col("cents") * F.pow(F.lit(2.0), F.col("t"))
    guarded_w = F.expr(
        "CASE WHEN _w_raw < 9007199254740992.0D THEN _w_raw ELSE raise_error("
        "'ema_daily_close: cents*2^t exceeds 2^53 — exactness bound violated; "
        "use the segmented ema_daily_close_long form for long series') END"
    )
    acc = (
        seq.withColumn("_w_raw", w_raw)
        .withColumn("w", guarded_w)
        .withColumn("s", F.sum("w").over(wc))
        .withColumn("x1", F.first("cents").over(wo))
        .withColumn("w1", F.first("w").over(wo))
    )
    ema = (
        F.pow(F.lit(0.5), F.col("t") - 1) * F.col("x1")
        + F.lit(0.5) * F.pow(F.lit(2.0), -F.col("t")) * (F.col("s") - F.col("w1"))
    )
    return acc.select("security_id", "d", ema.alias("ema_cents"))


# --- segmented EMA: the renormalized long-series form (VERDICT r8 #4) -------
#
# ema_daily_close's single prefix sum carries weights 2^t, so it is exact only
# while t + log2(cents) < 53 and finite only while t < ~1020 — fixture-sized
# series, not a 15-year daily history (~3,780 bars; reference CLAUDE.md:288).
# The production form is the classic BLOCKED SCAN (Blelloch two-level scan):
#   - split each per-security series into fixed blocks of L=32 rows; within a
#     block the closed form carries weights <= 2^32, so with integer cents
#     < 2^21 every in-block partial sum S_j = SUM x_i*2^(i-1) is an exact
#     integer < 2^53 (order-independent across engines);
#   - each block reduces to an affine map y_out = 2^-L * (y_in + S_L); the
#     per-security block-level fold over n/32 block summaries runs as ONE
#     sequential JVM fold (F.aggregate over the collected block array —
#     ~118 elements for 15 years, KB-sized state), NOT a third prefix sum,
#     because block-level weights 2^(32b) would overflow past b=31;
#   - per-row ema = 2^-j * (carry_in + S_j): one rounded add, one exact
#     exponent shift.  Both engines evaluate the same op sequence, so IEEE
#     determinism makes the result bit-identical even where rounding occurs.
# The oracle runs the identical fold as a recursive CTE — same anchor
# 2^-L*(0.0+S_L), same step 2^-L*(carry+S_L), same final 2^-j*(carry+S_j).
_EMA_LONG_N = 1500          # rows per security: past BOTH bounds of the naive form
_EMA_LONG_BLOCK = 32        # in-block weights <= 2^32; cents < 2^15 by construction


@register(
    "ema_daily_close_long",
    oracle=f"""
    WITH RECURSIVE sec AS (
      SELECT DISTINCT user_id AS security_id FROM events WHERE user_id <= 40
    ),
    seq AS (
      SELECT s.security_id,
             CAST(DATE '2010-01-04' + ((g.t - 1) * INTERVAL 1 DAY) AS DATE) AS d,
             g.t,
             CAST(5000 + ((s.security_id * 2654435761 + g.t * 40503) % 20000)
                  AS DOUBLE) AS cents
      FROM sec s
      CROSS JOIN (SELECT unnest(generate_series(1, {_EMA_LONG_N})) AS t) g
    ),
    blk AS (
      SELECT security_id, d, t, cents,
             CAST((t - 1) // {_EMA_LONG_BLOCK} AS BIGINT) + 1 AS block,
             CAST(((t - 1) % {_EMA_LONG_BLOCK}) + 1 AS BIGINT) AS j
      FROM seq
    ),
    cum AS (
      SELECT security_id, d, block, j,
             SUM(cents * power(2.0, j - 1)
                 * (CASE WHEN t = 1 THEN 2.0 ELSE 1.0 END)) OVER (
               PARTITION BY security_id, block ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS s
      FROM blk
    ),
    bs AS (
      SELECT security_id, block, MAX(j) AS len, MAX_BY(s, j) AS s_end
      FROM cum GROUP BY security_id, block
    ),
    fold AS (
      SELECT security_id, block, CAST(0.0 AS DOUBLE) AS c_in,
             power(2.0, -len) * (0.0 + s_end) AS c_out
      FROM bs WHERE block = 1
      UNION ALL
      SELECT b.security_id, b.block, f.c_out AS c_in,
             power(2.0, -b.len) * (f.c_out + b.s_end) AS c_out
      FROM fold f
      JOIN bs b ON b.security_id = f.security_id AND b.block = f.block + 1
    )
    SELECT c.security_id, c.d, power(2.0, -c.j) * (f.c_in + c.s) AS ema_cents
    FROM cum c
    JOIN fold f ON c.security_id = f.security_id AND c.block = f.block
    """,
    doc="Segmented (renormalized) EMA over a 1,500-row-per-security series — "
    "the long-series regime where ema_daily_close's single prefix sum first "
    "loses exactness (t+log2(cents) > 53) and then overflows outright "
    "(2^t -> inf past t~1020).  Blocked scan: exact in-block integer prefix "
    "sums under dyadic weights <= 2^32, then a per-security sequential JVM "
    "fold (F.aggregate) over the ~n/32 block summaries, then one exact "
    "exponent shift per row.  The DuckDB twin runs the identical fold as a "
    "recursive CTE, so every rounded operation happens in the same order in "
    "both engines — bit-identical without rounding the output.  The series "
    "is derived deterministically from the events table's key space "
    "(41 securities, modular-arithmetic cents < 2^15) so both engines "
    "compute the same fixture.  Scale: all shuffles hash on security_id; "
    "block fold state is KB per key (15y daily = 118 summaries); "
    "reference anchor: technical_indicators ewm usage (reference "
    "CLAUDE.md:288, 15-year daily series).",
)
def ema_long_q(spark, sf_dir):
    L = _EMA_LONG_BLOCK
    sec = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") <= 40)
        .select(F.col("user_id").alias("security_id"))
        .distinct()
    )
    seq = sec.select(
        "security_id",
        F.explode(F.sequence(F.lit(1), F.lit(_EMA_LONG_N))).alias("t"),
    ).select(
        "security_id",
        F.date_add(F.lit("2010-01-04").cast("date"), F.col("t") - 1).alias("d"),
        F.col("t").cast("long").alias("t"),
        (
            F.lit(5000)
            + (F.col("security_id") * F.lit(2654435761) + F.col("t") * F.lit(40503))
            % F.lit(20000)
        ).cast("double").alias("cents"),
    )
    blk = seq.select(
        "security_id", "d", "t", "cents",
        (F.expr(f"(t - 1) DIV {L}") + 1).cast("long").alias("block"),
        (((F.col("t") - 1) % L) + 1).cast("long").alias("j"),
    )
    wb = (
        Window.partitionBy("security_id", "block")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = blk.select(
        "security_id", "d", "block", "j",
        F.sum(
            F.col("cents")
            * F.pow(F.lit(2.0), F.col("j") - 1)
            * F.when(F.col("t") == 1, F.lit(2.0)).otherwise(F.lit(1.0))
        ).over(wb).alias("s"),
    )
    bs = cum.groupBy("security_id", "block").agg(
        F.max("j").alias("len"), F.max_by("s", "j").alias("s_end")
    )
    carr = bs.groupBy("security_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("block", "len", "s_end"))),
            F.expr("array(CAST(0.0 AS DOUBLE))"),
            lambda acc, x: F.array_append(
                acc,
                F.pow(F.lit(2.0), -x["len"]) * (F.element_at(acc, F.lit(-1)) + x["s_end"]),
            ),
        ).alias("carries")
    )
    # carries = [c_0=0, c_1, ..., c_B]; carry-IN of block b is element b (1-based)
    c_in = carr.select(
        "security_id",
        F.posexplode(
            F.slice(F.col("carries"), 1, F.size("carries") - 1)
        ).alias("pos", "c_in"),
    ).select("security_id", (F.col("pos") + 1).cast("long").alias("block"), "c_in")
    return cum.join(c_in, ["security_id", "block"]).select(
        "security_id", "d",
        (F.pow(F.lit(2.0), -F.col("j")) * (F.col("c_in") + F.col("s"))).alias("ema_cents"),
    )


@register(
    "linear_interpolate_calendar",
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
    ),
    br AS (
      SELECT security_id, d, close,
             LAST_VALUE(close IGNORE NULLS) OVER w_b AS prev_c,
             LAST_VALUE(CASE WHEN close IS NOT NULL THEN d END IGNORE NULLS) OVER w_b AS prev_d,
             FIRST_VALUE(close IGNORE NULLS) OVER w_f AS next_c,
             FIRST_VALUE(CASE WHEN close IS NOT NULL THEN d END IGNORE NULLS) OVER w_f AS next_d
      FROM joined
      WINDOW w_b AS (PARTITION BY security_id ORDER BY d ROWS UNBOUNDED PRECEDING),
             w_f AS (PARTITION BY security_id ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT security_id, d,
           ROUND(CASE WHEN close IS NOT NULL THEN close
                 ELSE prev_c + (next_c - prev_c)
                      * (CAST(date_diff('day', prev_d, d) AS DOUBLE)
                         / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
                 END, 6) AS close_li,
           CAST(close IS NULL AS BIGINT) AS interpolated
    FROM br
    """,
    doc="LINEAR interpolation to the calendar grid (pandas "
    "DataFrame.interpolate('time') — the other half of the reference's "
    "reindex discipline, where LOCF is a step function): every gap day "
    "takes prev + (next-prev) * elapsed/gap between its bracketing "
    "observed bars.  Brackets come from two IGNORE-NULLS windows (last "
    "preceding, first following) over the SAME per-security exchange the "
    "LOCF query uses — interpolation adds no shuffle.  Endpoints are "
    "always bracketed because the spine spans each security's observed "
    "[min, max].  The fraction is evaluated (elapsed/gap) in BOTH engines "
    "so the doubles agree bit-for-bit under round(6).",
)
def linear_interpolate_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    span = daily.groupBy("security_id").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = span.select("security_id", F.explode(F.sequence("lo", "hi")).alias("d"))
    joined = spine.join(daily, ["security_id", "d"], "left")
    wb = Window.partitionBy("security_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("security_id").orderBy("d").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_d = F.when(F.col("close").isNotNull(), F.col("d"))
    br = joined.select(
        "security_id", "d", "close",
        F.last("close", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("prev_d"),
        F.first("close", ignorenulls=True).over(wf).alias("next_c"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("next_d"),
    )
    frac = (
        F.datediff("d", "prev_d").cast("double")
        / F.datediff("next_d", "prev_d").cast("double")
    )
    return br.select(
        "security_id", "d",
        F.round(
            F.when(F.col("close").isNotNull(), F.col("close")).otherwise(
                F.col("prev_c") + (F.col("next_c") - F.col("prev_c")) * frac
            ), 6,
        ).alias("close_li"),
        F.col("close").isNull().cast("long").alias("interpolated"),
    )


@register(
    "factor_rank_ic",
    oracle=f"""
    WITH {_DAILY_SQL},
    rets0 AS (
      SELECT security_id, d,
             close / LAG(close) OVER (PARTITION BY security_id ORDER BY d) - 1 AS ret
      FROM daily
    ),
    rets AS (
      SELECT security_id, d, ret,
             LEAD(ret) OVER (PARTITION BY security_id ORDER BY d) AS fwd_ret
      FROM rets0
    ),
    obs AS (
      SELECT d, security_id, ret AS factor, fwd_ret AS target
      FROM rets WHERE ret IS NOT NULL AND fwd_ret IS NOT NULL
    ),
    ranked AS (
      SELECT d,
             CAST(ROW_NUMBER() OVER (PARTITION BY d ORDER BY factor, security_id) AS BIGINT) AS rx,
             CAST(ROW_NUMBER() OVER (PARTITION BY d ORDER BY target, security_id) AS BIGINT) AS ry
      FROM obs
    ),
    sums AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx * ry) AS sxy, SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      FROM ranked GROUP BY d
    )
    SELECT d, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                        * CAST((n * syy - sy * sy) AS DOUBLE)), 6) AS rank_ic
    FROM sums WHERE n >= 5
    """,
    doc="Per-day factor RANK IC (Spearman information coefficient) — the "
    "factor-research staple: yesterday's return as the factor, tomorrow's "
    "return as the target, Spearman = Pearson over cross-sectional ranks "
    "each day.  Ranks are total-ordered (value, security_id) row_numbers, "
    "so the moment sums are exact BIGINTs in both engines and the final "
    "correlation is one deterministic double expression under round(6).  "
    "One shuffle on security_id for the return windows, one on day for "
    "the ranking + aggregation; at 100 TB both partitionings are the "
    "natural ones (per-name history, per-day cross-section).",
)
def factor_rank_ic_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("security_id").orderBy("d")
    rets = daily.select(
        "security_id", "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("ret"),
    ).withColumn("fwd_ret", F.lead("ret").over(w))
    obs = rets.where(F.col("ret").isNotNull() & F.col("fwd_ret").isNotNull())
    rx = F.row_number().over(Window.partitionBy("d").orderBy("ret", "security_id"))
    ry = F.row_number().over(Window.partitionBy("d").orderBy("fwd_ret", "security_id"))
    ranked = obs.select("d", rx.cast("long").alias("rx"), ry.cast("long").alias("ry"))
    sums = ranked.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.where(F.col("n") >= 5).select(
        "d", "n", F.round(num / den, 6).alias("rank_ic")
    )


@register(
    "factor_backtest_report",
    oracle=f"""
    WITH {_DAILY_SQL},
    rets0 AS (
      SELECT security_id, d,
             close / LAG(close) OVER (PARTITION BY security_id ORDER BY d) - 1 AS ret
      FROM daily
    ),
    rets AS (
      SELECT security_id, d, ret,
             LEAD(ret) OVER (PARTITION BY security_id ORDER BY d) AS fwd_ret
      FROM rets0
    ),
    obs AS (
      SELECT d, security_id, ret AS factor, ROUND(fwd_ret, 6) AS target
      FROM rets WHERE ret IS NOT NULL AND fwd_ret IS NOT NULL
    ),
    sized AS (
      SELECT d, security_id, factor, target,
             CAST(ROW_NUMBER() OVER (PARTITION BY d ORDER BY factor DESC, security_id) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY d) AS BIGINT) AS n
      FROM obs
    ),
    members AS (
      SELECT d, security_id, target, n // 5 AS n_long FROM sized
      WHERE n >= 10 AND rk <= n // 5
    ),
    days AS (
      SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS day_seq
      FROM (SELECT DISTINCT d FROM members)
    ),
    port AS (
      SELECT m.d, dy.day_seq, m.n_long,
             {dec_sum_sql('m.target')} AS ret_sum
      FROM members m JOIN days dy ON m.d = dy.d
      GROUP BY m.d, dy.day_seq, m.n_long
    ),
    churn AS (
      SELECT t.d, CAST(COUNT(*) AS BIGINT) AS n_entered
      FROM members t
      JOIN days dt ON t.d = dt.d
      LEFT JOIN days dp ON dp.day_seq = dt.day_seq - 1
      LEFT JOIN members p ON p.d = dp.d AND p.security_id = t.security_id
      WHERE dt.day_seq > 1 AND p.security_id IS NULL
      GROUP BY t.d
    )
    SELECT port.d, port.n_long,
           ROUND(port.ret_sum / port.n_long, 6) AS port_ret,
           ROUND(CAST(COALESCE(churn.n_entered,
                               CASE WHEN port.day_seq = 1 THEN NULL ELSE 0 END)
                      AS DOUBLE) / port.n_long, 6) AS turnover
    FROM port LEFT JOIN churn ON port.d = churn.d
    """,
    doc="End-to-end FACTOR BACKTEST (the step after factor_rank_ic in a "
    "factor-research pipeline): each day go long the top quintile by "
    "factor (yesterday's return, total-ordered by (factor DESC, "
    "security_id)), hold for one day.  Graded per day: portfolio size "
    "(n/5 with an n>=10 floor), equal-weight next-day return (targets "
    "rounded to 6 THEN exact-decimal-summed, so the mean is one "
    "deterministic double), and TURNOVER = fraction of today's book that "
    "entered since yesterday's (NULL on the first day — no predecessor). "
    "Three natural partitionings, each one exchange: per-security return "
    "windows, per-day ranking, and the day-sequence self-join for churn "
    "(members-sized, broadcast).  At 100 TB the members table is "
    "portfolio-sized — thousands of rows per day — regardless of "
    "universe size.",
)
def factor_backtest_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("security_id").orderBy("d")
    rets = daily.select(
        "security_id", "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("factor"),
    ).withColumn("target", F.round(F.lead("factor").over(w), 6))
    obs = rets.where(F.col("factor").isNotNull() & F.col("target").isNotNull())
    rk = F.row_number().over(
        Window.partitionBy("d").orderBy(F.col("factor").desc(), "security_id")
    )
    n = F.count("*").over(Window.partitionBy("d"))
    sized = obs.select(
        "d", "security_id", "target",
        rk.cast("long").alias("rk"), n.cast("long").alias("n"),
    )
    # members is PORTFOLIO-sized (n/5 rows per day, whatever the universe);
    # persist it — three consumers (returns, churn stream, churn probe) would
    # otherwise each re-derive the full window chain from the bar table
    members = sized.where(
        (F.col("n") >= 10) & (F.col("rk") <= (F.col("n") / 5).cast("long"))
    ).select(
        "d", "security_id", "target", (F.col("n") / 5).cast("long").alias("n_long")
    ).persist()
    days = members.select("d").distinct().select(
        "d", F.row_number().over(Window.orderBy("d")).cast("long").alias("day_seq")
    ).persist()
    port = (
        members.join(days, "d")
        .groupBy("d", "day_seq", "n_long")
        .agg(dec_sum(F.col("target")).alias("ret_sum"))
    )
    prev = days.select(
        F.col("day_seq").alias("prev_seq"), F.col("d").alias("prev_d")
    )
    t = members.join(days, "d").join(
        prev, F.col("day_seq") - 1 == F.col("prev_seq"), "left"
    )
    p = members.select(F.col("d").alias("prev_d"), F.col("security_id").alias("sid"))
    churn = (
        t.where(F.col("day_seq") > 1)
        .join(
            p,
            (t["prev_d"] == p["prev_d"]) & (t["security_id"] == p["sid"]),
            "left_anti",
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("n_entered"))
    )
    first_day_null = F.when(F.col("day_seq") == 1, F.lit(None).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    return (
        port.join(churn, "d", "left")
        .select(
            "d", "n_long",
            F.round(F.col("ret_sum") / F.col("n_long"), 6).alias("port_ret"),
            F.round(
                F.coalesce(F.col("n_entered"), first_day_null).cast("double")
                / F.col("n_long"), 6,
            ).alias("turnover"),
        )
    )


@register(
    "xsec_zscore_report",
    oracle=f"""
    WITH {_DAILY_SQL},
    rets AS (
      SELECT security_id, d,
             close / LAG(close) OVER (
               PARTITION BY security_id ORDER BY d) - 1 AS r
      FROM daily
    ),
    valid AS (SELECT * FROM rets WHERE r IS NOT NULL),
    mom AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
             {dec_sum_sql('r', 12)} AS sx, {dec_sum_sql('r * r', 12)} AS sxx
      FROM valid GROUP BY d
    ),
    z AS (
      SELECT v.security_id, v.d,
             ROUND((v.r - m.sx / m.n)
                   / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 6) AS z,
             ROUND(CAST(ROW_NUMBER() OVER (
                     PARTITION BY v.d ORDER BY v.r, v.security_id) - 1 AS DOUBLE)
                   / (m.n - 1), 6) AS pr
      FROM valid v JOIN mom m ON v.d = m.d
      WHERE m.n >= 2 AND (m.sxx - m.sx * m.sx / m.n) > 0
    )
    SELECT security_id, CAST(COUNT(*) AS BIGINT) AS n_days,
           {dec_sum_sql('z')} AS z_sum, {dec_sum_sql('pr')} AS pr_sum
    FROM z GROUP BY security_id
    """,
    doc="CROSS-SECTIONAL NEUTRALIZATION — the factor-model preprocessing "
    "step (z-score + percentile rank within each date): daily returns per "
    "security, per-DATE moment sums (n, Σr, Σr² as exact decimals — the "
    "date frame is date-cardinality-sized and broadcast back), per-row "
    "z = (r - μ)/σ (sample σ from the closed form, engine-identical), and "
    "a deterministic percentile rank ((row_number-1)/(n-1), ties broken by "
    "security_id).  Graded per security as decimal sums of the ROUNDED "
    "per-row scores, so accumulation order cannot skew the comparison.  "
    "Two shuffles (security for the lag, date for the moments); the "
    "join back is a broadcast at any corpus size since dates are bounded.",
)
def xsec_zscore_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("security_id").orderBy("d")
    rets = daily.select(
        "security_id", "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("r"),
    ).filter(F.col("r").isNotNull())
    dec12 = lambda c: F.sum(c.cast("decimal(30,12)")).cast("double")  # noqa: E731
    mom = rets.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        dec12(F.col("r")).alias("sx"),
        dec12(F.col("r") * F.col("r")).alias("sxx"),
    )
    n, sx, sxx, r = F.col("n"), F.col("sx"), F.col("sxx"), F.col("r")
    var_num = sxx - sx * sx / n
    wd = Window.partitionBy("d").orderBy("r", "security_id")
    z = (
        rets.join(F.broadcast(mom), "d")
        .filter((n >= 2) & (var_num > 0))
        .select(
            "security_id",
            F.round(
                (r - sx / n) / F.sqrt(var_num / (n - 1)), 6
            ).alias("z"),
            F.round(
                (F.row_number().over(wd) - 1).cast("double") / (n - 1), 6
            ).alias("pr"),
        )
    )
    return z.groupBy("security_id").agg(
        F.count("*").cast("long").alias("n_days"),
        dec_sum(F.col("z")).alias("z_sum"),
        dec_sum(F.col("pr")).alias("pr_sum"),
    )


@register(
    "pairwise_corr_matrix",
    oracle=f"""
    WITH {_DAILY_SQL},
    rets AS (
      SELECT security_id, d,
             close / LAG(close) OVER (
               PARTITION BY security_id ORDER BY d) - 1 AS r
      FROM daily
    ),
    valid AS (SELECT * FROM rets WHERE r IS NOT NULL),
    top10 AS (
      SELECT security_id FROM valid GROUP BY security_id
      ORDER BY COUNT(*) DESC, security_id LIMIT 10
    ),
    sel AS (SELECT v.* FROM valid v JOIN top10 USING (security_id)),
    pairs AS (
      SELECT a.security_id AS sec_a, b.security_id AS sec_b,
             CAST(COUNT(*) AS BIGINT) AS n,
             {dec_sum_sql('a.r', 12)} AS sa, {dec_sum_sql('b.r', 12)} AS sb,
             {dec_sum_sql('a.r * b.r', 12)} AS sab,
             {dec_sum_sql('a.r * a.r', 12)} AS saa,
             {dec_sum_sql('b.r * b.r', 12)} AS sbb
      FROM sel a JOIN sel b ON a.d = b.d AND a.security_id < b.security_id
      GROUP BY a.security_id, b.security_id
    )
    SELECT sec_a, sec_b, n,
           ROUND((n * sab - sa * sb)
                 / NULLIF(sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 0),
                 6) AS corr
    FROM pairs WHERE n >= 2
    """,
    doc="PAIRWISE CORRELATION MATRIX over the k most-active securities "
    "(the risk-model building block): top-10 by bar count (deterministic "
    "tiebreak), returns self-joined on date with sec_a < sec_b (45 pairs), "
    "correlation from exact decimal moment sums — one pass, "
    "order-independent, engine-identical.  Scale story: k is a policy "
    "bound, so the matrix side of the join is k-bounded and BROADCAST; "
    "the date-aligned self-join never shuffles the full bar table twice — "
    "at 100 TB you bound k (or block the matrix) rather than cross every "
    "security, and each block reuses the same one-shuffle shape.",
)
def pairwise_corr_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("security_id").orderBy("d")
    rets = daily.select(
        "security_id", "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("r"),
    ).filter(F.col("r").isNotNull())
    top10 = (
        rets.groupBy("security_id").count()
        .orderBy(F.desc("count"), "security_id").limit(10)
        .select("security_id")
    )
    sel = rets.join(F.broadcast(top10), "security_id")
    a = sel.select(
        F.col("security_id").alias("sec_a"), "d", F.col("r").alias("ra")
    )
    b = sel.select(
        F.col("security_id").alias("sec_b"), "d", F.col("r").alias("rb")
    )
    dec12 = lambda c: F.sum(c.cast("decimal(30,12)")).cast("double")  # noqa: E731
    pairs = (
        a.join(F.broadcast(b), "d")
        .filter(F.col("sec_a") < F.col("sec_b"))
        .groupBy("sec_a", "sec_b")
        .agg(
            F.count("*").cast("long").alias("n"),
            dec12(F.col("ra")).alias("sa"),
            dec12(F.col("rb")).alias("sb"),
            dec12(F.col("ra") * F.col("rb")).alias("sab"),
            dec12(F.col("ra") * F.col("ra")).alias("saa"),
            dec12(F.col("rb") * F.col("rb")).alias("sbb"),
        )
    )
    n = F.col("n")
    sa, sb = F.col("sa"), F.col("sb")
    sab, saa, sbb = F.col("sab"), F.col("saa"), F.col("sbb")
    return pairs.filter(n >= 2).select(
        "sec_a", "sec_b", "n",
        F.round(
            safe_div(
                n * sab - sa * sb,
                F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            ),
            6,
        ).alias("corr"),
    )


@register(
    "portfolio_turnover_report",
    oracle=f"""
    WITH {_DAILY_SQL},
    topk AS (
      SELECT d, security_id FROM (
        SELECT d, security_id,
               ROW_NUMBER() OVER (
                 PARTITION BY d ORDER BY close DESC, security_id) AS rn
        FROM daily
      ) WHERE rn <= 10
    ),
    dd AS (SELECT d, DENSE_RANK() OVER (ORDER BY d) AS di
           FROM (SELECT DISTINCT d FROM topk)),
    t AS (SELECT dd.di, topk.security_id FROM topk JOIN dd USING (d)),
    j AS (
      SELECT COALESCE(a.di, b.di + 1) AS di,
             a.security_id AS cur, b.security_id AS prev
      FROM t a FULL JOIN t b
        ON a.security_id = b.security_id AND a.di = b.di + 1
    ),
    g AS (
      SELECT di,
             CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_entered,
             CAST(SUM(CASE WHEN cur IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exited,
             CAST(SUM(CASE WHEN cur IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
             CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prev
      FROM j GROUP BY di
    )
    SELECT dd.d, g.n_entered, g.n_exited,
           ROUND(CAST(g.n_entered + g.n_exited AS DOUBLE)
                 / (g.n_cur + g.n_prev), 6) AS turnover
    FROM g JOIN dd ON g.di = dd.di
    WHERE g.di > 1
    """,
    doc="PORTFOLIO MEMBERSHIP TURNOVER — the rebalance-cost staple: each "
    "day's equal-weight book is the top-10 securities by close "
    "(deterministic tiebreak); turnover between consecutive trading days "
    "= (entries + exits) / (|book_t| + |book_t-1|) — pure integer set "
    "arithmetic, so the grade is exact across engines.  Consecutive days "
    "pair through a FULL OUTER self-join on (security, day-index): one "
    "shuffle of the k-bounded membership table, never of the bar table; "
    "at 100 TB the book is policy-bounded and the join side broadcasts.",
)
def portfolio_turnover_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("d").orderBy(F.desc("close"), "security_id")
    topk = (
        daily.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") <= 10).select("d", "security_id")
    )
    # the global window runs on the DISTINCT-DATES dim (bounded: ~250
    # rows/year regardless of corpus size), never on the bar table
    dd = topk.select("d").distinct().withColumn(
        "di", F.dense_rank().over(Window.orderBy("d"))
    )
    t = topk.join(F.broadcast(dd), "d").select("di", "security_id")
    a = t.select(F.col("di").alias("dia"), F.col("security_id").alias("cur"))
    b = t.select((F.col("di") + 1).alias("dib"), F.col("security_id").alias("prev"))
    j = a.join(
        b, (a["cur"] == b["prev"]) & (a["dia"] == b["dib"]), "full_outer"
    ).select(
        F.coalesce(F.col("dia"), F.col("dib")).alias("di"), "cur", "prev"
    )
    g = j.groupBy("di").agg(
        F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0)).cast("long").alias("n_entered"),
        F.sum(F.when(F.col("cur").isNull(), 1).otherwise(0)).cast("long").alias("n_exited"),
        F.sum(F.when(F.col("cur").isNotNull(), 1).otherwise(0)).cast("long").alias("n_cur"),
        F.sum(F.when(F.col("prev").isNotNull(), 1).otherwise(0)).cast("long").alias("n_prev"),
    )
    return (
        g.where(F.col("di") > 1)
        .join(F.broadcast(dd), "di")
        .select(
            "d", "n_entered", "n_exited",
            F.round(
                (F.col("n_entered") + F.col("n_exited")).cast("double")
                / (F.col("n_cur") + F.col("n_prev")), 6,
            ).alias("turnover"),
        )
    )


def _ic_arm_sql(h: int) -> str:
    return f"""
      SELECT CAST({h} AS BIGINT) AS horizon,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             {dec_sum_sql('ic')} AS ic_sum,
             ROUND({dec_sum_sql('ic')} / COUNT(*), 6) AS avg_ic
      FROM (
        SELECT d,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                            * CAST((n * syy - sy * sy) AS DOUBLE)), 6) AS ic
        FROM (
          SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(rx * ry) AS sxy, SUM(rx) AS sx, SUM(ry) AS sy,
                 SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
          FROM (
            SELECT d,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY d ORDER BY factor, security_id) AS BIGINT) AS rx,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY d ORDER BY f{h}, security_id) AS BIGINT) AS ry
            FROM obs WHERE f{h} IS NOT NULL
          ) GROUP BY d
        ) WHERE n >= 5
      )
    """


@register(
    "factor_ic_decay",
    oracle=f"""
    WITH {_DAILY_SQL},
    rets AS (
      SELECT security_id, d,
             close / LAG(close) OVER (PARTITION BY security_id ORDER BY d) - 1 AS ret,
             LEAD(close, 1) OVER (PARTITION BY security_id ORDER BY d) / close - 1 AS fwd1,
             LEAD(close, 5) OVER (PARTITION BY security_id ORDER BY d) / close - 1 AS fwd5,
             LEAD(close, 10) OVER (PARTITION BY security_id ORDER BY d) / close - 1 AS fwd10
      FROM daily
    ),
    obs AS (
      SELECT d, security_id, ret AS factor,
             fwd1 AS f1, fwd5 AS f5, fwd10 AS f10
      FROM rets WHERE ret IS NOT NULL
    )
    {_ic_arm_sql(1)} UNION ALL {_ic_arm_sql(5)} UNION ALL {_ic_arm_sql(10)}
    """,
    doc="FACTOR IC DECAY — does the signal survive holding horizons? Per "
    "horizon h in (1, 5, 10) days: the per-day Spearman rank IC between "
    "the 1-day-return factor and the h-day FORWARD return (total-ordered "
    "ranks -> exact BIGINT moment sums -> one deterministic double, the "
    "factor_rank_ic idiom), then the horizon's average IC as a decimal "
    "sum of the rounded per-day ICs over the day count.  All three "
    "horizons share ONE returns frame (one security-window pass computes "
    "the lag and all three leads); each arm adds only a per-day rank "
    "exchange — the per-name/per-day partitionings a 100 TB backtest "
    "engine uses anyway.",
)
def factor_ic_decay_q(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("security_id").orderBy("d")
    rets = daily.select(
        "security_id", "d",
        (F.col("close") / F.lag("close").over(w) - 1).alias("factor"),
        (F.lead("close", 1).over(w) / F.col("close") - 1).alias("f1"),
        (F.lead("close", 5).over(w) / F.col("close") - 1).alias("f5"),
        (F.lead("close", 10).over(w) / F.col("close") - 1).alias("f10"),
    ).filter(F.col("factor").isNotNull())
    # the three horizon arms share this scan + per-security window; without
    # the persist each arm re-executes it (3 scans, VERDICT r11 #7) — the
    # frame is (securities x days)-sized, comfortably cacheable, and the
    # per-day rank exchanges below remain each arm's real cost
    rets = rets.persist()
    rets.count()

    def arm(h):
        col = f"f{h}"
        obs = rets.filter(F.col(col).isNotNull())
        rx = F.row_number().over(
            Window.partitionBy("d").orderBy("factor", "security_id")
        ).cast("long")
        ry = F.row_number().over(
            Window.partitionBy("d").orderBy(col, "security_id")
        ).cast("long")
        ranked = obs.select("d", rx.alias("rx"), ry.alias("ry"))
        sums = ranked.groupBy("d").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
            F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
            F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
            F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        ).where(F.col("n") >= 5)
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        ic = F.round(
            (n * F.col("sxy") - sx * sy).cast("double")
            / F.sqrt(
                (n * F.col("sxx") - sx * sx).cast("double")
                * (n * F.col("syy") - sy * sy).cast("double")
            ), 6,
        )
        per_day = sums.select(ic.alias("ic"))
        return per_day.agg(
            F.lit(h).cast("long").alias("horizon"),
            F.count("*").cast("long").alias("n_days"),
            dec_sum(F.col("ic")).alias("ic_sum"),
            F.round(dec_sum(F.col("ic")) / F.count("*"), 6).alias("avg_ic"),
        ).select("horizon", "n_days", "ic_sum", "avg_ic")

    return arm(1).unionByName(arm(5)).unionByName(arm(10))
