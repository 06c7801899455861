"""Equity-fundamentals pipeline operators (SURVEY.md §2.5 W1–W3, §2.11 F2,
§2.9 safe arithmetic) exercised on synthetic quarterly series derived from
``orders`` — the same shapes the reference computes on XBRL fundamentals.

Window sums are computed over DECIMAL so they are order-independent across
engines (DuckDB evaluates window aggregates with segment trees; Spark with
frame iteration — double addition order would differ).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql, safe_div
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

# Shared CTE: quarterly revenue per customer (custkey < 50), as DECIMAL(30,6).
_QREV_SQL = """
    SELECT o_custkey AS custkey,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q,
           SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
    FROM orders WHERE o_custkey < 50
    GROUP BY o_custkey, date_trunc('quarter', o_orderdate)
"""


def _quarterly_rev(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 50)
    return orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("q"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev"))


@register(
    "ttm_rolling_4q",
    oracle=f"""
    WITH qrev AS ({_QREV_SQL})
    SELECT custkey, q, CAST(rev AS DOUBLE) AS rev,
           CASE WHEN COUNT(*) OVER w = 4
                THEN CAST(SUM(rev) OVER w AS DOUBLE) END AS ttm
    FROM qrev
    WINDOW w AS (PARTITION BY custkey ORDER BY q ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="W1 (derived/ttm.py:111-147): trailing 4-quarter sum; null unless exactly "
    "4 observations in the window (test_ttm.py golden semantics).",
)
def ttm_q(spark, sf_dir):
    qrev = _quarterly_rev(spark, sf_dir)
    w = Window.partitionBy("custkey").orderBy("q").rowsBetween(-3, 0)
    return qrev.select(
        "custkey",
        "q",
        F.col("rev").cast("double").alias("rev"),
        F.when(F.count("rev").over(w) == 4, F.sum("rev").over(w)).otherwise(None).cast("double").alias("ttm"),
    )


@register(
    "lag_growth_metrics",
    oracle=f"""
    WITH qrev AS ({_QREV_SQL})
    SELECT custkey, q,
           CAST(rev AS DOUBLE) AS rev,
           CAST(rev - LAG(rev, 1) OVER w AS DOUBLE) AS rev_grw,
           CAST((rev + LAG(rev, 4) OVER w) / 2 AS DOUBLE) AS avg_rev_1y
    FROM qrev
    WINDOW w AS (PARTITION BY custkey ORDER BY q)
    """,
    doc="W2/W3 (metrics.py:158-207): lag-1 growth and lag-4 two-point average; "
    "null on first rows (no t-1) by construction.",
)
def lag_growth_q(spark, sf_dir):
    qrev = _quarterly_rev(spark, sf_dir)
    w = Window.partitionBy("custkey").orderBy("q")
    return qrev.select(
        "custkey",
        "q",
        F.col("rev").cast("double").alias("rev"),
        (F.col("rev") - F.lag("rev", 1).over(w)).cast("double").alias("rev_grw"),
        ((F.col("rev") + F.lag("rev", 4).over(w)) / 2).cast("double").alias("avg_rev_1y"),
    )


@register(
    "q4_derivation",
    oracle="""
    WITH qsum AS (
      SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS BIGINT) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS fy,
             SUM(CASE WHEN quarter(o_orderdate) = 1 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q1,
             SUM(CASE WHEN quarter(o_orderdate) = 2 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q2,
             SUM(CASE WHEN quarter(o_orderdate) = 3 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q3,
             SUM(CASE WHEN quarter(o_orderdate) = 4 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q4_actual
      FROM orders WHERE o_custkey < 100
      GROUP BY o_custkey, year(o_orderdate)
    )
    SELECT custkey, y,
           CAST(fy - q1 - q2 - q3 AS DOUBLE) AS q4_derived,
           CAST(q4_actual AS DOUBLE) AS q4_actual
    FROM qsum
    WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q3 IS NOT NULL
    """,
    doc="F2 (fundamental.py:193-287): Q4 = FY − Q1 − Q2 − Q3 per frame-year, "
    "derived only when the annual frame and all three standalone quarters exist.",
)
def q4_derivation_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 100)
    dec = F.col("o_totalprice").cast("decimal(30,6)")
    qn = F.quarter("o_orderdate")
    qsum = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.year("o_orderdate").cast("long").alias("y")
    ).agg(
        F.sum(dec).alias("fy"),
        F.sum(F.when(qn == 1, dec)).alias("q1"),
        F.sum(F.when(qn == 2, dec)).alias("q2"),
        F.sum(F.when(qn == 3, dec)).alias("q3"),
        F.sum(F.when(qn == 4, dec)).alias("q4_actual"),
    )
    return qsum.filter(
        F.col("q1").isNotNull() & F.col("q2").isNotNull() & F.col("q3").isNotNull()
    ).select(
        "custkey",
        "y",
        (F.col("fy") - F.col("q1") - F.col("q2") - F.col("q3")).cast("double").alias("q4_derived"),
        F.col("q4_actual").cast("double"),
    )


@register(
    "safe_ratio_metrics",
    oracle=f"""
    SELECT l_orderkey,
           {dec_sum_sql('l_extendedprice')} AS rev,
           CASE WHEN {dec_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")} IS NOT NULL
                 AND {dec_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")} <> 0
                THEN ROUND({dec_sum_sql('l_extendedprice')} / {dec_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")}, 6)
           END AS rev_per_returned
    FROM lineitem WHERE l_orderkey < 3000
    GROUP BY l_orderkey
    """,
    doc="Safe arithmetic (metrics.py:93-106): guarded division yields null — "
    "never NaN/Inf — on null/zero denominators (SURVEY.md §7.3 item 5).",
)
def safe_ratio_q(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 3000)
    agg = li.groupBy("l_orderkey").agg(
        dec_sum(F.col("l_extendedprice")).alias("rev"),
        dec_sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))).alias("ret_rev"),
    )
    return agg.select(
        "l_orderkey",
        "rev",
        F.round(safe_div(F.col("rev"), F.col("ret_rev")), 6).alias("rev_per_returned"),
    )


# ---------------------------------------------------------------------------
# CIK resolver ladder (reference storage/utils/cik_resolver.py:37-150)
# ---------------------------------------------------------------------------

_CIK_NORM_REQ = r"upper(regexp_replace(r.symbol, '[.\-]', '', 'g'))"
_CIK_NORM_C = r"upper(regexp_replace(c.symbol, '[.\-]', '', 'g'))"
_CIK_NORM_M = r"upper(regexp_replace(m.symbol, '[.\-]', '', 'g'))"
_CIK_NORM_S = r"upper(regexp_replace(s.ticker, '[.\-]', '', 'g'))"


@register(
    "cik_resolver_ladder",
    oracle=f"""
    WITH master AS (
      SELECT c_name AS symbol,
             CASE WHEN c_custkey % 10 = 0 THEN NULL
                  ELSE CAST(c_nationkey AS VARCHAR) END AS cik,
             DATE '2020-01-01' AS start_date,
             CASE WHEN c_custkey % 3 = 0 THEN DATE '2024-02-15'
                  ELSE DATE '2024-12-31' END AS end_date
      FROM customer WHERE c_custkey < 600
      UNION ALL
      -- overlapping null-CIK 2023 interval: a primary-date hit here must
      -- STOP the ladder with NULL (reference early-return), not fall through
      SELECT c_name, NULL, DATE '2023-01-01', DATE '2023-12-31'
      FROM customer WHERE c_custkey < 600 AND c_custkey % 7 = 0
    ),
    sec AS (
      SELECT c_name AS ticker, CAST(9000 + c_custkey AS VARCHAR) AS cik
      FROM customer WHERE c_custkey % 2 = 0 AND c_custkey < 900
    ),
    req AS (
      SELECT c_name AS symbol,
             CASE c_custkey % 5
               WHEN 0 THEN DATE '2024-01-15' WHEN 1 THEN DATE '2024-07-01'
               WHEN 2 THEN DATE '2025-02-01' WHEN 3 THEN DATE '2023-05-05'
               ELSE DATE '2024-03-01' END AS "date",
             CASE WHEN c_custkey % 4 = 0 THEN 2025
                  WHEN c_custkey % 4 = 1 THEN 2024 END AS year
      FROM customer WHERE c_custkey < 900
    ),
    cand AS (
      SELECT symbol, "date", year, 0 AS prio, "date" AS try_date FROM req
      UNION ALL SELECT symbol, "date", year, 1, make_date(year, 12, 31) FROM req
        WHERE year IS NOT NULL AND make_date(year, 12, 31) <> "date"
      UNION ALL SELECT symbol, "date", year, 2, make_date(year, 6, 30) FROM req
        WHERE year IS NOT NULL AND make_date(year, 6, 30) <> "date"
      UNION ALL SELECT symbol, "date", year, 3, make_date(year, 9, 30) FROM req
        WHERE year IS NOT NULL AND make_date(year, 9, 30) <> "date"
      UNION ALL SELECT symbol, "date", year, 4, make_date(year, 3, 31) FROM req
        WHERE year IS NOT NULL AND make_date(year, 3, 31) <> "date"
    ),
    best AS (
      SELECT symbol, "date", cik FROM (
        SELECT c.symbol, c."date", m.cik,
               ROW_NUMBER() OVER (
                 PARTITION BY c.symbol, c."date"
                 ORDER BY c.prio, m.start_date DESC, m.cik ASC NULLS LAST
               ) AS rn
        FROM cand c JOIN master m
          ON {_CIK_NORM_C} = {_CIK_NORM_M}
         AND c.try_date BETWEEN m.start_date AND m.end_date
      ) WHERE rn = 1
    )
    SELECT r.symbol, r."date", r.year,
           CASE WHEN (COALESCE(r.year, 0) >= 2025 OR year(r."date") >= 2025)
                     AND s.cik IS NOT NULL THEN lpad(s.cik, 10, '0')
                ELSE lpad(b.cik, 10, '0') END AS cik
    FROM req r
    LEFT JOIN best b ON r.symbol = b.symbol AND r."date" = b."date"
    LEFT JOIN sec s ON {_CIK_NORM_REQ} = {_CIK_NORM_S}
    """,
    doc="Vectorized CIKResolver (reference cik_resolver.py:37-150): quarterly "
    "fallback-date ladder (primary, year-end, mid-year, Q3, Q1 — the FIRST "
    "interval-containing hit wins; when that record's CIK is null the ladder "
    "STOPS and resolves NULL, mirroring the reference's non-SEC-filer early "
    "return at :104-113), 2025+ preference for the SEC official snapshot, "
    "zero-padded output.  Fixture exercises primary hits, short intervals "
    "that force ladder fallbacks, overlapping null-CIK intervals that must "
    "stop the ladder, symbols absent from the master, and the SEC-preference "
    "arm.  Dimension sides broadcast; one keep-best window on the request "
    "partitioning.",
)
def cik_resolver_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.cik import resolve_cik_batch

    cust = load_table(spark, "customer", sf_dir)
    master = cust.filter(F.col("c_custkey") < 600).select(
        F.col("c_name").alias("symbol"),
        F.when(F.col("c_custkey") % 10 != 0, F.col("c_nationkey").cast("string")).alias("cik"),
        F.lit("2020-01-01").cast("date").alias("start_date"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("2024-02-15"))
        .otherwise(F.lit("2024-12-31")).cast("date").alias("end_date"),
    ).unionByName(
        cust.filter((F.col("c_custkey") < 600) & (F.col("c_custkey") % 7 == 0)).select(
            F.col("c_name").alias("symbol"),
            F.lit(None).cast("string").alias("cik"),
            F.lit("2023-01-01").cast("date").alias("start_date"),
            F.lit("2023-12-31").cast("date").alias("end_date"),
        )
    )
    sec = cust.filter((F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") < 900)).select(
        F.col("c_name").alias("ticker"), (F.lit(9000) + F.col("c_custkey")).cast("string").alias("cik")
    )
    req = cust.filter(F.col("c_custkey") < 900).select(
        F.col("c_name").alias("symbol"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("2024-01-15"))
        .when(F.col("c_custkey") % 5 == 1, F.lit("2024-07-01"))
        .when(F.col("c_custkey") % 5 == 2, F.lit("2025-02-01"))
        .when(F.col("c_custkey") % 5 == 3, F.lit("2023-05-05"))
        .otherwise(F.lit("2024-03-01")).cast("date").alias("date"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(2025))
        .when(F.col("c_custkey") % 4 == 1, F.lit(2024)).cast("int").alias("year"),
    )
    return resolve_cik_batch(master.cache(), req, sec_map=sec.cache())


@register(
    "q4_operator_roundtrip",
    oracle="""
    WITH qsum AS (
      SELECT o_custkey AS custkey, year(o_orderdate) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS fy,
             SUM(CASE WHEN quarter(o_orderdate) = 1 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q1,
             SUM(CASE WHEN quarter(o_orderdate) = 2 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q2,
             SUM(CASE WHEN quarter(o_orderdate) = 3 THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS q3
      FROM orders WHERE o_custkey < 40
      GROUP BY o_custkey, year(o_orderdate)
    ),
    quarterly AS (
      SELECT custkey, 'CY' || CAST(y AS VARCHAR) || 'Q' || CAST(qn AS VARCHAR) AS frame,
             CAST(CASE qn WHEN 1 THEN q1 WHEN 2 THEN q2 ELSE q3 END AS DOUBLE) AS value,
             make_date(y, (qn - 1) * 3 + 1, 1) AS start
      FROM qsum CROSS JOIN (SELECT unnest([1, 2, 3]) AS qn)
      WHERE CASE qn WHEN 1 THEN q1 WHEN 2 THEN q2 ELSE q3 END IS NOT NULL
    ),
    derived AS (
      SELECT custkey, 'CY' || CAST(y AS VARCHAR) AS frame,
             -- double subtraction in the operator's left-to-right order: the
             -- Spark side runs on already-double frame values
             CAST(fy AS DOUBLE) - CAST(q1 AS DOUBLE) - CAST(q2 AS DOUBLE) - CAST(q3 AS DOUBLE) AS value,
             make_date(y, 10, 1) AS start
      FROM qsum
      WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q3 IS NOT NULL
    )
    SELECT * FROM quarterly UNION ALL SELECT * FROM derived
    """,
    doc="F2 through the REAL operator (equity/fundamentals.derive_q4, "
    "reference fundamental.py:193-287): quarterly frames built from orders "
    "pass through; an annual frame derives Q4 = FY − Q1 − Q2 − Q3 with "
    "start = Q3.end + 1 day, ONLY when all three standalone quarters exist "
    "(years missing a quarter exercise the gate).  The oracle reconstructs "
    "the expected frame set arithmetically — any passthrough/derivation/"
    "dedup drift in the operator breaks the hash.",
)
def q4_operator_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.fundamentals import derive_q4

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 40)
    dec = F.col("o_totalprice").cast("decimal(30,6)")
    qn = F.quarter("o_orderdate")
    qsum = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.year("o_orderdate").alias("y")
    ).agg(
        F.sum(dec).alias("fy"),
        F.sum(F.when(qn == 1, dec)).alias("q1"),
        F.sum(F.when(qn == 2, dec)).alias("q2"),
        F.sum(F.when(qn == 3, dec)).alias("q3"),
    ).cache()

    def frame_row(q):
        return qsum.filter(F.col(f"q{q}").isNotNull()).select(
            F.col("custkey").cast("string").alias("symbol"),
            F.lit("rev").alias("concept"),
            F.concat(F.lit("CY"), F.col("y"), F.lit(f"Q{q}")).alias("frame"),
            F.col(f"q{q}").cast("double").alias("value"),
            F.make_date("y", F.lit((q - 1) * 3 + 1), F.lit(1)).alias("start"),
            F.make_date("y", F.lit(q * 3), F.lit([31, 30, 30][q - 1])).alias("end"),
            F.make_date("y", F.lit(12), F.lit(31)).alias("filed"),
            F.lit("a1").alias("accn"),
            F.lit("10-Q").alias("form"),
            "custkey",
        )

    annual = qsum.select(
        F.col("custkey").cast("string").alias("symbol"),
        F.lit("rev").alias("concept"),
        F.concat(F.lit("CY"), F.col("y")).alias("frame"),
        F.col("fy").cast("double").alias("value"),
        F.make_date("y", F.lit(1), F.lit(1)).alias("start"),
        F.make_date("y", F.lit(12), F.lit(31)).alias("end"),
        F.make_date("y", F.lit(12), F.lit(31)).alias("filed"),
        F.lit("a0").alias("accn"),
        F.lit("10-K").alias("form"),
        "custkey",
    )
    dps = frame_row(1).unionByName(frame_row(2)).unionByName(frame_row(3)).unionByName(annual)
    out = derive_q4(dps)
    return out.select(
        "custkey",
        "frame",
        F.col("value").cast("double").alias("value"),
        "start",
    )


_NORM_R = r"upper(regexp_replace(r.symbol, '[.\-]', '', 'g'))"
_NORM_M2 = r"upper(regexp_replace(m.symbol, '[.\-]', '', 'g'))"
_DISPLAY = "concat(substr(c_name, 1, length(c_name) - 1), '-', substr(c_name, length(c_name), 1))"


@register(
    "symbol_normalizer_batch",
    oracle=f"""
    WITH master AS (
      SELECT c_name AS symbol, CAST(c_custkey AS BIGINT) AS sid,
             DATE '2020-01-01' AS s,
             CASE WHEN c_custkey % 5 = 0 THEN DATE '2022-12-31'
                  ELSE DATE '2025-12-31' END AS e
      FROM customer WHERE c_custkey < 600
      UNION ALL
      SELECT c_name, CAST(c_custkey + 100000 AS BIGINT), DATE '2023-01-01', DATE '2025-12-31'
      FROM customer WHERE c_custkey % 5 = 0 AND c_custkey < 600
    ),
    nd AS (
      SELECT upper(regexp_replace({_DISPLAY}, '[.\\-]', '', 'g')) AS key,
             MAX({_DISPLAY}) AS nasdaq
      FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey < 600
      GROUP BY 1
    ),
    req AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN {_DISPLAY} ELSE c_name END AS symbol,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  WHEN c_custkey % 4 = 1 THEN DATE '2021-06-01'
                  ELSE DATE '2024-06-01' END AS day
      FROM customer WHERE c_custkey < 700
    ),
    sid_orig AS (
      SELECT r.symbol, MIN(m.sid) AS sid
      FROM req r JOIN master m ON {_NORM_R} = {_NORM_M2} AND r.day BETWEEN m.s AND m.e
      GROUP BY r.symbol
    ),
    sid_latest AS (
      SELECT r.symbol, MIN(m.sid) AS sid
      FROM req r JOIN master m
        ON {_NORM_R} = {_NORM_M2} AND DATE '2024-12-31' BETWEEN m.s AND m.e
      GROUP BY r.symbol
    )
    SELECT r.symbol, r.day,
           CASE WHEN nd.nasdaq IS NULL THEN upper(r.symbol)
                WHEN r.day IS NULL THEN nd.nasdaq
                WHEN so.sid IS NOT NULL AND sl.sid IS NOT NULL AND so.sid = sl.sid
                     THEN nd.nasdaq
                ELSE upper(r.symbol) END AS nasdaq_symbol
    FROM req r
    LEFT JOIN nd ON {_NORM_R} = nd.key
    LEFT JOIN sid_orig so ON r.symbol = so.symbol
    LEFT JOIN sid_latest sl ON r.symbol = sl.symbol
    """,
    doc="SymbolNormalizer batch (reference security_master.py:30-141): "
    "CRSP→Nasdaq display conversion gated on security-id verification — the "
    "delisted-ABCD ≠ new-ABC.D edge (SURVEY §7.3 item 3).  Fixture: every "
    "5th symbol re-uses its spelling for a NEW security id after 2023 (the "
    "collision), every 3rd is missing from the current Nasdaq list "
    "(delisted), every 4th request has no date (skip validation).",
)
def symbol_normalizer_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.security_master import to_nasdaq_format_batch

    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") < 700)
    display = F.concat(
        F.expr("substring(c_name, 1, length(c_name) - 1)"),
        F.lit("-"),
        F.expr("substring(c_name, length(c_name), 1)"),
    )
    below = cust.filter(F.col("c_custkey") < 600)
    master = below.select(
        F.col("c_name").alias("symbol"),
        F.col("c_custkey").cast("long").alias("security_id"),
        F.lit("2020-01-01").cast("date").alias("start_date"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("2022-12-31"))
        .otherwise(F.lit("2025-12-31")).cast("date").alias("end_date"),
    ).unionByName(
        below.filter(F.col("c_custkey") % 5 == 0).select(
            F.col("c_name").alias("symbol"),
            (F.col("c_custkey") + 100000).cast("long").alias("security_id"),
            F.lit("2023-01-01").cast("date").alias("start_date"),
            F.lit("2025-12-31").cast("date").alias("end_date"),
        )
    )
    nasdaq = below.filter(F.col("c_custkey") % 3 != 0).select(display.alias("ticker"))
    req = cust.select(
        F.when(F.col("c_custkey") % 2 == 0, display).otherwise(F.col("c_name")).alias("symbol"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None))
        .when(F.col("c_custkey") % 4 == 1, F.lit("2021-06-01"))
        .otherwise(F.lit("2024-06-01")).cast("date").alias("day"),
    )
    return to_nasdaq_format_batch(master.cache(), nasdaq.cache(), req)


# ---------------------------------------------------------------------------
# N1 + N2 cross-engine gate: MD&A extraction over cleaned synthetic filings.
# Six fixture arms cover every rule in reference collection/sentiment.py:60-79,
# 189-238: the 10-K item-7 and 10-Q item-2 start patterns, PRIORITY order over
# POSITION (an item-2 heading earlier in the document loses to a later item-7
# heading), the no-end-pattern remainder fallback, the no-start -> None arm,
# and the <500-char minimum-length guard.  HTML cleaning (tag strip, entity
# decode, whitespace collapse — reference :152-187) runs inside the same UDF;
# the oracle replicates it with a regexp_replace/replace chain over the SAME
# deterministic filing construction, so the value hash grades both operators.
# ---------------------------------------------------------------------------

_MDNA_HEAD_7 = "Item 7. Management''s Discussion and Analysis"
_MDNA_HEAD_2 = "Item 2. Management''s Discussion and Analysis"


@register(
    "mdna_extraction_report",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id % 6 AS arm,
             substr(repeat(text || ' ', 10), 1, 650) AS body,
             substr(text, 1, 80) AS short
      FROM documents
    ),
    filing AS (
      SELECT doc_id, arm,
        CASE arm
          WHEN 0 THEN '<html><head><title>Form 10-K</title></head><body><p>Intro &lt;filed&gt; report.</p> {_MDNA_HEAD_7} ' || body || ' A &amp; B Item 7A. Quantitative and Qualitative Disclosures</body></html>'
          WHEN 1 THEN '<p>See Item 7 of annual report.</p> {_MDNA_HEAD_2} ' || body || ' Item 3. Quantitative and Qualitative Disclosures'
          WHEN 2 THEN 'Filed pursuant. {_MDNA_HEAD_7} ' || body
          WHEN 3 THEN '<p>quarterly summary</p> ' || body
          WHEN 4 THEN '{_MDNA_HEAD_7} ' || short || ' Item 7A. Quantitative and Qualitative'
          ELSE '{_MDNA_HEAD_2} early quarter section text. {_MDNA_HEAD_7} ' || body || ' Item 8. Financial Statements and Supplementary Data'
        END AS t
      FROM base
    ),
    cleaned AS (
      SELECT doc_id, arm,
        trim(regexp_replace(replace(replace(replace(
          regexp_replace(t, '<[^>]+>', ' ', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&amp;', '&'), '\\s+', ' ', 'g')) AS c
      FROM filing
    ),
    sec AS (
      SELECT doc_id, arm,
        CASE arm
          WHEN 0 THEN regexp_extract(c, 'Item 7\\. Management''s Discussion and Analysis(.*?)Item 7A\\. Quantitative and Qualitative', 1)
          WHEN 1 THEN regexp_extract(c, 'Item 2\\. Management''s Discussion and Analysis(.*?)Item 3\\. Quantitative and Qualitative', 1)
          WHEN 2 THEN regexp_extract(c, 'Item 7\\. Management''s Discussion and Analysis(.*)', 1)
          WHEN 4 THEN regexp_extract(c, 'Item 7\\. Management''s Discussion and Analysis(.*?)Item 7A\\. Quantitative and Qualitative', 1)
          WHEN 5 THEN regexp_extract(c, 'Item 7\\. Management''s Discussion and Analysis(.*?)Item 8\\. Financial Statements', 1)
          ELSE NULL
        END AS s
      FROM cleaned
    )
    SELECT doc_id, arm,
           CASE WHEN length(s) >= 500 THEN length(s) END AS mdna_len,
           CASE WHEN length(s) >= 500 THEN md5(s) END AS mdna_md5
    FROM sec
    """,
    doc="MD&A extraction (N1) + HTML cleaning (N2) graded cross-engine on six "
    "deterministic filing arms; the Spark side runs the REAL "
    "extract_mdna_udf (priority-ordered start patterns, earliest qualified "
    "end, 100KB fallback, 500-char guard) while the oracle replicates the "
    "expected section per arm with regexp extraction over the same "
    "construction.  Scale: one pandas-UDF pass, no shuffle.",
)
def mdna_extraction_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.sentiment import extract_mdna_udf

    docs = load_table(spark, "documents", sf_dir)
    body = F.substring(F.repeat(F.concat(F.col("text"), F.lit(" ")), 10), 1, 650)
    short = F.substring(F.col("text"), 1, 80)
    head7 = "Item 7. Management's Discussion and Analysis"
    head2 = "Item 2. Management's Discussion and Analysis"
    arm = (F.col("doc_id") % 6).cast("long")
    filing = (
        F.when(arm == 0, F.concat(
            F.lit("<html><head><title>Form 10-K</title></head><body><p>Intro &lt;filed&gt; report.</p> " + head7 + " "),
            body,
            F.lit(" A &amp; B Item 7A. Quantitative and Qualitative Disclosures</body></html>"),
        ))
        .when(arm == 1, F.concat(
            F.lit("<p>See Item 7 of annual report.</p> " + head2 + " "),
            body,
            F.lit(" Item 3. Quantitative and Qualitative Disclosures"),
        ))
        .when(arm == 2, F.concat(F.lit("Filed pursuant. " + head7 + " "), body))
        .when(arm == 3, F.concat(F.lit("<p>quarterly summary</p> "), body))
        .when(arm == 4, F.concat(
            F.lit(head7 + " "), short, F.lit(" Item 7A. Quantitative and Qualitative"),
        ))
        .otherwise(F.concat(
            F.lit(head2 + " early quarter section text. " + head7 + " "),
            body,
            F.lit(" Item 8. Financial Statements and Supplementary Data"),
        ))
    )
    mdna = extract_mdna_udf(filing)
    return docs.select(
        "doc_id",
        arm.alias("arm"),
        F.length(mdna).alias("mdna_len"),
        F.md5(mdna).alias("mdna_md5"),
    )
