"""Reference-operator queries (SURVEY.md §2) expressed over the driver's
synthetic tables, each with a DuckDB oracle.

The equity-lake semantics are exercised on TPC-H-shaped data by constructing
the same *shapes* the reference works on (interval dimensions, point-in-time
facts, snapshots) deterministically inside the query — identically in Spark
and in the oracle SQL.

Cross-engine type discipline: derived integers are cast to BIGINT on the
Spark side (DuckDB's year()/datediff/COUNT are 64-bit).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.operators import dedup, pit, reshape, setops, topk, windows
from us_equity_datalake_spark.sources.registry import load_table
from .base import register
from us_equity_datalake_spark.sources.registry import local_frame

# ---------------------------------------------------------------------------
# J1 — point-in-time interval lookup (security_master.get_security_id analog)
# ---------------------------------------------------------------------------

_EPOCHS_SQL = """
    SELECT c_custkey, 'A' AS epoch, DATE '1995-01-01' AS start_date, DATE '1997-12-31' AS end_date FROM customer
    UNION ALL
    SELECT c_custkey, 'B', DATE '1998-01-01', DATE '2000-12-31' FROM customer
"""


@register(
    "pit_interval_lookup",
    oracle=f"""
    WITH epochs AS ({_EPOCHS_SQL})
    SELECT epoch, COUNT(*) AS n_orders, {dec_sum_sql('o_totalprice')} AS total
    FROM orders LEFT JOIN epochs
      ON o_custkey = c_custkey
     AND CAST(o_orderdate AS DATE) BETWEEN start_date AND end_date
    GROUP BY epoch
    """,
    doc="J1 (security_master.py:731-760): resolve facts to an interval dimension "
    "via broadcast equi+range join; unmatched rows keep null (left).",
)
def pit_interval_lookup(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    epochs = cust.select(
        "c_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit("A").alias("epoch"),
                    F.lit("1995-01-01").cast("date").alias("start_date"),
                    F.lit("1997-12-31").cast("date").alias("end_date"),
                ),
                F.struct(
                    F.lit("B").alias("epoch"),
                    F.lit("1998-01-01").cast("date").alias("start_date"),
                    F.lit("2000-12-31").cast("date").alias("end_date"),
                ),
            )
        ).alias("e"),
    ).select("c_custkey", "e.*")
    facts = load_table(spark, "orders", sf_dir).withColumn("o_date", F.col("o_orderdate").cast("date"))
    resolved = pit.pit_lookup(facts, epochs, key="o_custkey", dim_key="c_custkey", fact_date="o_date")
    return resolved.groupBy("epoch").agg(
        F.count("*").cast("long").alias("n_orders"), dec_sum(F.col("o_totalprice")).alias("total")
    )


# ---------------------------------------------------------------------------
# J2 — auto-resolve fuzzy temporal fallback
# ---------------------------------------------------------------------------

_YEAR_INTERVALS_SQL = """
    SELECT o_custkey AS custkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           MIN(CAST(o_orderdate AS DATE)) AS start_date,
           MAX(CAST(o_orderdate AS DATE)) AS end_date
    FROM orders WHERE o_custkey < 200
    GROUP BY o_custkey, year(o_orderdate)
"""


@register(
    "auto_resolve_nearest_interval",
    oracle=f"""
    WITH dim AS ({_YEAR_INTERVALS_SQL}),
    probes AS (
      SELECT c_custkey AS custkey, p AS probe_date
      FROM customer, (VALUES (DATE '1994-06-15'), (DATE '1997-07-04'), (DATE '2003-01-01')) v(p)
      WHERE c_custkey < 200
    ),
    ranked AS (
      SELECT p.custkey, p.probe_date, d.y,
             GREATEST(d.start_date - p.probe_date, p.probe_date - d.end_date, 0) AS dist,
             ROW_NUMBER() OVER (
               PARTITION BY p.custkey, p.probe_date
               ORDER BY GREATEST(d.start_date - p.probe_date, p.probe_date - d.end_date, 0), d.start_date
             ) AS rn
      FROM probes p JOIN dim d ON p.custkey = d.custkey
    )
    SELECT custkey, probe_date, y AS resolved_year, CAST(dist AS BIGINT) AS temporal_distance
    FROM ranked WHERE rn = 1
    """,
    doc="J2 (security_master.py:640-729): when no interval covers the date, rank "
    "all candidate intervals by temporal distance greatest(start-d, d-end, 0).",
)
def auto_resolve_nearest(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 200)
    dim = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.year("o_orderdate").cast("long").alias("y")
    ).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("start_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("end_date"),
    )
    probes = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") < 200)
        .select(F.col("c_custkey").alias("custkey"))
        .crossJoin(
            local_frame(
                spark, [("1994-06-15",), ("1997-07-04",), ("2003-01-01",)], "probe_date string"
            ).select(F.col("probe_date").cast("date"))
        )
    )
    resolved = pit.auto_resolve(
        probes, dim, key="custkey", query_date="probe_date", start="start_date", end="end_date",
        tiebreak=["start_date"],
    )
    return resolved.select(
        "custkey",
        "probe_date",
        F.col("y").alias("resolved_year"),
        F.col("temporal_distance").cast("long"),
    )


# ---------------------------------------------------------------------------
# J3 — as-of join backward
# ---------------------------------------------------------------------------


@register(
    "asof_backward_join",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    anchors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us, q.value AS view_value
    FROM anchors a ASOF LEFT JOIN quotes q
      ON a.user_id = q.user_id AND q.ts <= a.ts
    """,
    doc="J3 (collectors.py:777-782 join_asof backward): union + last-value window "
    "rewrite; ties are backward-inclusive like Polars.",
)
def asof_backward(spark, sf_dir):
    from us_equity_datalake_spark.operators.asof import asof_join_backward

    events = load_table(spark, "events", sf_dir)
    quotes = dedup.dedup_keep_first(
        events.filter(F.col("event_type") == "view").select("user_id", "ts", F.col("value").alias("view_value"), "event_id"),
        keys=["user_id", "ts"],
        order=[F.col("event_id").asc()],
    ).drop("event_id")
    anchors = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_backward(anchors, quotes, by=["user_id"], left_on="ts", right_on="ts", value_cols=["view_value"])
    return joined.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "view_value")


@register(
    "asof_forward_join",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    anchors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us, q.value AS view_value
    FROM anchors a ASOF LEFT JOIN quotes q
      ON a.user_id = q.user_id AND q.ts >= a.ts
    """,
    doc="J3 forward twin (Polars join_asof strategy='forward'): earliest right row "
    "at-or-after, via the mirrored first-value window over the same union.",
)
def asof_forward(spark, sf_dir):
    from us_equity_datalake_spark.operators.asof import asof_join_forward

    events = load_table(spark, "events", sf_dir)
    quotes = dedup.dedup_keep_first(
        events.filter(F.col("event_type") == "view").select("user_id", "ts", F.col("value").alias("view_value"), "event_id"),
        keys=["user_id", "ts"],
        order=[F.col("event_id").asc()],
    ).drop("event_id")
    anchors = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_forward(anchors, quotes, by=["user_id"], left_on="ts", right_on="ts", value_cols=["view_value"])
    return joined.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "view_value")


@register(
    "asof_nearest_join",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    anchors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
      CASE WHEN b.ts IS NOT NULL
                AND (f.ts IS NULL
                     OR (epoch_us(a.ts) - epoch_us(b.ts)) <= (epoch_us(f.ts) - epoch_us(a.ts)))
           THEN b.value ELSE f.value END AS view_value
    FROM anchors a
    ASOF LEFT JOIN quotes b ON a.user_id = b.user_id AND b.ts <= a.ts
    ASOF LEFT JOIN quotes f ON a.user_id = f.user_id AND f.ts > a.ts
    """,
    doc="J3 nearest twin (Polars join_asof strategy='nearest'): closer of the "
    "backward-inclusive and strictly-forward matches, equidistant ties backward; "
    "both directions fill from one shuffle+sort (shared window partitioning).",
)
def asof_nearest(spark, sf_dir):
    from us_equity_datalake_spark.operators.asof import asof_join_nearest

    events = load_table(spark, "events", sf_dir)
    quotes = dedup.dedup_keep_first(
        events.filter(F.col("event_type") == "view").select("user_id", "ts", F.col("value").alias("view_value"), "event_id"),
        keys=["user_id", "ts"],
        order=[F.col("event_id").asc()],
    ).drop("event_id")
    anchors = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_nearest(anchors, quotes, by=["user_id"], left_on="ts", right_on="ts", value_cols=["view_value"])
    return joined.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "view_value")


# ---------------------------------------------------------------------------
# J4 — calendar alignment
# ---------------------------------------------------------------------------


@register(
    "calendar_align_nulls",
    oracle=f"""
    WITH spine AS (
      SELECT CAST(gs AS DATE) AS d
      FROM generate_series(DATE '2024-01-01', DATE '2024-02-05', INTERVAL 1 DAY) t(gs)
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n, {dec_sum_sql('value')} AS total_value
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT spine.d AS date, daily.n, daily.total_value
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    doc="J4 (utils/mapping.py:24-88): calendar LEFT JOIN facts; non-traded days "
    "come back null, never interpolated.",
)
def calendar_align_nulls(spark, sf_dir):
    from us_equity_datalake_spark.operators.calendar_align import align_to_calendar, date_spine

    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.col("ts").cast("date").alias("date")).agg(
        F.count("*").alias("n"), dec_sum(F.col("value")).alias("total_value")
    )
    spine = date_spine(spark, "2024-01-01", "2024-02-05")
    return align_to_calendar(spine, daily, cal_date="date", fact_date="date")


# ---------------------------------------------------------------------------
# A6/A7 — deterministic dedups
# ---------------------------------------------------------------------------


@register(
    "latest_wins_dedup",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(l_shipdate AS DATE) AS shipdate, l_extendedprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber ASC) rn
      FROM lineitem WHERE l_orderkey < 2000
    ) WHERE rn = 1
    """,
    doc="A7 (fundamental.py:240-244 latest-filed-wins): keep max-recency row per "
    "key with a deterministic tiebreak.",
)
def latest_wins_q(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
    out = dedup.latest_wins(li, keys=["l_orderkey"], recency="l_shipdate", tiebreak=["l_linenumber"])
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long"),
        F.col("l_shipdate").cast("date").alias("shipdate"),
        "l_extendedprice",
    )


@register(
    "keep_first_dedup",
    oracle="""
    SELECT o_custkey, o_orderpriority, CAST(o_orderdate AS DATE) AS first_orderdate
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority ORDER BY o_orderdate ASC, o_orderkey ASC) rn
      FROM orders
    ) WHERE rn = 1
    """,
    doc="A6 (Polars unique(maintain_order=True) → explicit row_number ordering).",
)
def keep_first_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    out = dedup.dedup_keep_first(
        orders, keys=["o_custkey", "o_orderpriority"], order=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    )
    return out.select("o_custkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("first_orderdate"))


# ---------------------------------------------------------------------------
# R1/R2 — pivot / unpivot
# ---------------------------------------------------------------------------

_PIVOT_SQL = f"""
    SELECT l_linestatus,
           {dec_sum_sql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS A,
           {dec_sum_sql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS N,
           {dec_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS R
    FROM lineitem GROUP BY l_linestatus
"""


@register(
    "pivot_long_to_wide",
    oracle=_PIVOT_SQL,
    doc="R1 (metrics.py:76-81): pivot with explicit key vocabulary — skips the "
    "value-discovery pass.",
)
def pivot_q(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dec_sum(F.col("l_quantity")))
    )


@register(
    "unpivot_wide_to_long",
    oracle=f"""
    WITH wide AS ({_PIVOT_SQL})
    SELECT l_linestatus, rf AS returnflag, v AS sum_qty
    FROM (
      SELECT l_linestatus, 'A' AS rf, A AS v FROM wide
      UNION ALL SELECT l_linestatus, 'N', N FROM wide
      UNION ALL SELECT l_linestatus, 'R', R FROM wide
    ) WHERE v IS NOT NULL
    """,
    doc="R2 (metrics.py:231-237): unpivot + null drop.",
)
def unpivot_q(spark, sf_dir):
    wide = pivot_q(spark, sf_dir)
    return reshape.unpivot_wide_to_long(
        wide, index=["l_linestatus"], value_cols=["A", "N", "R"], key_name="returnflag", value_name="sum_qty"
    )


# ---------------------------------------------------------------------------
# T1/A3 — top-k by liquidity
# ---------------------------------------------------------------------------


@register(
    "topk_by_avg_value",
    oracle=f"""
    SELECT o_custkey, ROUND({dec_sum_sql('o_totalprice')} / COUNT(*), 6) AS adv
    FROM orders GROUP BY o_custkey
    HAVING ROUND({dec_sum_sql('o_totalprice')} / COUNT(*), 6) > 100000
    ORDER BY adv DESC, o_custkey ASC LIMIT 10
    """,
    doc="T1/A3 (universe/manager.py:229-243): mean dollar volume → filter → "
    "orderBy desc limit k (TakeOrderedAndProject; k-heap per task).",
)
def topk_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    adv = orders.groupBy("o_custkey").agg(
        F.round(dec_sum(F.col("o_totalprice")) / F.count("*"), 6).alias("adv")
    )
    return topk.top_k(adv.filter(F.col("adv") > 100000), order=[F.desc("adv"), F.asc("o_custkey")], k=10)


# ---------------------------------------------------------------------------
# U2/U3 — snapshot diff and anti-membership
# ---------------------------------------------------------------------------


@register(
    "universe_snapshot_diff",
    oracle="""
    WITH prev AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1996),
         cur  AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1997)
    SELECT COALESCE(prev.k, cur.k) AS custkey,
           CASE WHEN prev.k IS NOT NULL AND cur.k IS NOT NULL THEN 'still_active'
                WHEN cur.k IS NOT NULL THEN 'appeared'
                ELSE 'disappeared' END AS status
    FROM prev FULL OUTER JOIN cur ON prev.k = cur.k
    """,
    doc="U2 (security_master.py:1251-1259): universe membership diff → "
    "appeared/disappeared/still_active.",
)
def snapshot_diff_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    prev = orders.filter(F.year("o_orderdate") == 1996)
    cur = orders.filter(F.year("o_orderdate") == 1997)
    return setops.snapshot_diff(prev, cur, key="o_custkey").withColumnRenamed("o_custkey", "custkey")


@register(
    "anti_join_fresh_keys",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
    """,
    doc="U3/J8 (update/app.py:896-900): left-anti membership — customers with no "
    "1995 orders (fresh-filings / unwritten-partition probe).",
)
def anti_join_q(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    existing = load_table(spark, "orders", sf_dir).filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return setops.anti_members(cust, existing, on=["c_custkey"]).select("c_custkey")


# ---------------------------------------------------------------------------
# W4/W5 — change detection + running-count ID assignment
# ---------------------------------------------------------------------------


@register(
    "running_id_assignment",
    oracle="""
    SELECT c_custkey,
           CAST(1000 + SUM(CASE WHEN c_nationkey IS DISTINCT FROM prev_nk THEN 1 ELSE 0 END)
                  OVER (ORDER BY c_custkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS assigned_id
    FROM (
      SELECT c_custkey, c_nationkey, LAG(c_nationkey) OVER (ORDER BY c_custkey) AS prev_nk
      FROM customer
    )
    """,
    doc="W4+W5 (security_master.py:557-593): adjacent-row change detection via "
    "lag over the whole sorted frame, then id = base + cumsum(new_flag). "
    "Single-partition window — dimension-scale only by design.",
)
def running_id_q(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    w = Window.orderBy("c_custkey")
    flagged = cust.withColumn(
        "new_flag", ~F.col("c_nationkey").eqNullSafe(F.lag("c_nationkey").over(w))
    )
    out = windows.assign_running_ids(flagged, order=["c_custkey"], new_group=F.col("new_flag"), base=1000)
    return out.select("c_custkey", F.col("assigned_id").cast("long"))
