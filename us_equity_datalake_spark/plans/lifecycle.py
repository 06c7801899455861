"""Oracle-gated security-master lifecycle queries (SURVEY §2 J-tier follow-on;
reference security_master.py:894-980 update_from_sec, :1198-1410
update_no_wrds).  Round-1 review flagged the lifecycle rules as pytest-only;
these derive deterministic master/universe/FIGI fixtures from the TPC-H tables
so the driver's DuckDB gate checks the decision rules cross-engine:

- extend: (symbol, cik) still present -> end_date advances
- rebrand: disappeared+appeared sharing a FIGI -> continuation row, SAME id
- delist: disappeared without a FIGI match -> end_date frozen (grace expired)
- IPO: appeared without a FIGI match -> fresh sequential id

Fixture derivation (pure column math, identical in both engines):
  master      = customers c_custkey < 600: symbol = c_name, id = c_custkey,
                end_date 2024-06-01
  prev        = symbols with c_custkey % 7 != 0
  current     = symbols with c_custkey % 5 != 0
  figi        = 'F' || c_custkey % 37 for customers with c_custkey % 3 == 0
                (the modulus forces figi collisions across the prev/current
                boundary -> genuine rebrand pairs)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from us_equity_datalake_spark.equity.security_master import update_from_sec, update_universe
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

_N = 600
_TODAY = "2024-06-10"
_PREV_DATE = "2024-05-01"  # 40 days before: grace period (14d) expired


def _materialize_dim(spark, df):
    """Cache a DIMENSION-SIZED frame (≤600 rows here by construction).
    update_universe/update_from_sec reference their inputs from many rule
    branches; left lazy, every branch re-derives the fixture from the parquet
    scan (r2 plan audit: 26 scans / 19 joins) — cached, the plan reads one
    InMemoryRelation per fixture and stays broadcast-joinable.  (A
    collect+createDataFrame local relation was measured 4x SLOWER end-to-end:
    parallelizing 600 Rows across 32 tasks costs more than the scans saved.)
    Bench/correctness harnesses clearCache() between queries, so the ~600-row
    entries never accumulate."""
    return df.cache()


def _master(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") < _N)
    return cust.select(
        F.col("c_custkey").cast("long").alias("security_id"),
        F.lit(None).cast("integer").alias("permno"),
        F.col("c_name").alias("symbol"),
        F.col("c_name").alias("company"),
        F.col("c_nationkey").cast("string").alias("cik"),
        F.lit(None).cast("string").alias("cusip"),
        F.lit("2020-01-01").cast("date").alias("start_date"),
        F.lit("2024-06-01").cast("date").alias("end_date"),
    )


_MASTER_SQL = f"""
  master AS (
    SELECT CAST(c_custkey AS BIGINT) AS security_id,
           c_name AS symbol, c_name AS company, CAST(c_nationkey AS VARCHAR) AS cik,
           DATE '2020-01-01' AS start_date, DATE '2024-06-01' AS end_date
    FROM customer WHERE c_custkey < {_N}
  )
"""


@register(
    "master_update_from_sec",
    oracle=f"""
    WITH {_MASTER_SQL},
    sec AS (
      SELECT c_name AS ticker, CAST(c_nationkey AS VARCHAR) AS cik, c_name AS title,
             CAST(c_custkey AS BIGINT) AS k
      FROM customer WHERE c_custkey % 3 = 0 AND c_custkey < {_N + 300}
    ),
    extended AS (
      SELECT m.security_id, m.symbol, m.cik,
             CASE WHEN s.ticker IS NOT NULL AND m.end_date < DATE '{_TODAY}'
                  THEN DATE '{_TODAY}' ELSE m.end_date END AS end_date,
             m.start_date
      FROM master m LEFT JOIN sec s ON m.symbol = s.ticker AND m.cik = s.cik
    ),
    fresh AS (
      SELECT (SELECT MAX(security_id) FROM master)
             + ROW_NUMBER() OVER (ORDER BY ticker, cik) AS security_id,
             ticker AS symbol, cik,
             DATE '{_TODAY}' AS start_date, DATE '{_TODAY}' AS end_date
      FROM sec WHERE NOT EXISTS (
        SELECT 1 FROM master m WHERE m.symbol = sec.ticker AND m.cik = sec.cik
      )
    )
    SELECT security_id, symbol, cik, start_date, end_date FROM extended
    UNION ALL
    SELECT security_id, symbol, cik, start_date, end_date FROM fresh
    """,
    doc="update_from_sec rules (security_master.py:894-980) cross-engine: "
    "stale (symbol, cik) rows still in the SEC file extend to today; unseen "
    "pairs append with sequential ids above the max.  Dimension-scale: both "
    "joins broadcast, the id assignment is one row_number over the "
    "(tiny) fresh set.",
)
def update_from_sec_q(spark, sf_dir):
    # one cached customer subset feeds BOTH fixture dims — a single parquet
    # scan populates the cache instead of master and sec scanning separately
    base = _materialize_dim(
        spark,
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") < _N + 300)
        .select("c_custkey", "c_name", "c_nationkey"),
    )
    master = base.filter(F.col("c_custkey") < _N).select(
        F.col("c_custkey").cast("long").alias("security_id"),
        F.lit(None).cast("integer").alias("permno"),
        F.col("c_name").alias("symbol"),
        F.col("c_name").alias("company"),
        F.col("c_nationkey").cast("string").alias("cik"),
        F.lit(None).cast("string").alias("cusip"),
        F.lit("2020-01-01").cast("date").alias("start_date"),
        F.lit("2024-06-01").cast("date").alias("end_date"),
    )
    sec = base.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("ticker"),
        F.col("c_nationkey").cast("string").alias("cik"),
        F.col("c_name").alias("title"),
    )
    out = update_from_sec(master, sec, today=_TODAY)
    return out.select("security_id", "symbol", "cik", "start_date", "end_date")


@register(
    "master_universe_lifecycle",
    oracle=f"""
    WITH {_MASTER_SQL},
    prev AS (SELECT symbol FROM master WHERE security_id % 7 <> 0),
    curr AS (SELECT symbol FROM master WHERE security_id % 5 <> 0),
    figi AS (
      SELECT c_name AS symbol, 'F' || CAST(c_custkey % 37 AS VARCHAR) AS figi
      FROM customer WHERE c_custkey % 3 = 0 AND c_custkey < {_N}
    ),
    prev_only AS (SELECT symbol FROM prev EXCEPT SELECT symbol FROM curr),
    curr_only AS (SELECT symbol FROM curr EXCEPT SELECT symbol FROM prev),
    rebrands AS (
      SELECT o.symbol AS old_symbol, n.symbol AS new_symbol, of.figi
      FROM prev_only o JOIN figi of ON o.symbol = of.symbol
      JOIN figi nf ON of.figi = nf.figi
      JOIN curr_only n ON n.symbol = nf.symbol
    ),
    updated AS (
      SELECT m.security_id, m.symbol,
             CASE WHEN c.symbol IS NOT NULL AND p.symbol IS NOT NULL
                  THEN DATE '{_TODAY}'
                  ELSE m.end_date END AS end_date,
             m.start_date
      FROM master m
      LEFT JOIN curr c ON m.symbol = c.symbol
      LEFT JOIN prev p ON m.symbol = p.symbol
    ),
    continuations AS (
      SELECT m.security_id, r.new_symbol AS symbol,
             DATE '{_TODAY}' AS end_date, DATE '{_TODAY}' AS start_date
      FROM rebrands r JOIN master m ON m.symbol = r.old_symbol
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY r.old_symbol ORDER BY m.start_date DESC, m.security_id
      ) = 1
    ),
    ipos AS (
      SELECT (SELECT MAX(security_id) FROM master)
             + ROW_NUMBER() OVER (ORDER BY symbol) AS security_id,
             symbol, DATE '{_TODAY}' AS end_date, DATE '{_TODAY}' AS start_date
      FROM curr_only
      WHERE symbol NOT IN (SELECT new_symbol FROM rebrands)
    )
    SELECT security_id, symbol, start_date, end_date FROM updated
    UNION ALL SELECT security_id, symbol, start_date, end_date FROM continuations
    UNION ALL SELECT security_id, symbol, start_date, end_date FROM ipos
    """,
    doc="update_no_wrds universe diff (security_master.py:1198-1410) "
    "cross-engine: extend still-active, freeze disappeared (grace expired: "
    "prev_date 40 days back), rebrand via FIGI identity keeping the id, "
    "IPO fresh sequential ids.  All sides dimension-sized -> broadcast "
    "joins; one narrow pass over the master.",
)
def universe_lifecycle_q(spark, sf_dir):
    master = _materialize_dim(spark, _master(spark, sf_dir))
    prev = master.filter(F.col("security_id") % 7 != 0).select("symbol")
    curr = master.filter(F.col("security_id") % 5 != 0).select("symbol")
    figi = _materialize_dim(
        spark,
        load_table(spark, "customer", sf_dir)
        .filter((F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") < _N))
        .select(
            F.col("c_name").alias("symbol"),
            F.concat(F.lit("F"), (F.col("c_custkey") % 37).cast("string")).alias("figi"),
        ),
    )
    out = update_universe(
        master, prev, curr, figi, today=_TODAY, prev_date=_PREV_DATE, grace_period_days=14
    )
    return out.select("security_id", "symbol", "start_date", "end_date")
