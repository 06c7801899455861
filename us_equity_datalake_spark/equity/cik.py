"""Vectorized CIK resolver (reference storage/utils/cik_resolver.py:37-150).

The reference resolves one (symbol, date) at a time with a driver-side cache;
the Spark form resolves a whole request table in one pass — the cache
becomes a broadcast join, the per-symbol retry loop becomes an exploded
candidate-date ladder.  Semantics preserved exactly:

1. Symbol normalization SEC→CRSP ('BRK-B'/'BRK.B' → 'BRKB').
2. 2025+ preference (:58-66): when the request year (explicit or from the
   date) is >= 2025, the SEC official ticker→CIK snapshot wins if it has the
   ticker; otherwise fall through to the master ladder.
3. Fallback-date ladder (:68-80): try the primary date, then — when a year
   is given — year-end, mid-year, Q3-end, Q1-end, de-duplicated preserving
   order; the FIRST date with an interval-containing master record wins,
   even when that record's CIK is null: the reference returns None
   immediately for a null-CIK record ("non-SEC filer — don't try more
   dates", :104-113), so a null hit STOPS the ladder rather than falling
   through to later dates.
4. Output zero-padded to 10 digits (:128-133); None when nothing matched.

Scale: master and SEC map are dimensions (broadcast); the request table is
the fact side and shuffles once for the keep-best window.  The ladder
multiplies requests by ≤5 before the join — bounded fan-out, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from us_equity_datalake_spark.equity.security_master import normalize_symbol


def resolve_cik_batch(
    master: DataFrame,
    requests: DataFrame,
    sec_map: DataFrame | None = None,
    *,
    symbol_col: str = "symbol",
    date_col: str = "date",
    year_col: str = "year",
) -> DataFrame:
    """(symbol, date[, year]) requests → + resolved ``cik`` (nullable).

    ``master``: (symbol, cik, start_date, end_date) intervals.
    ``sec_map``: (ticker, cik) current SEC snapshot (optional).
    Request rows are assumed unique on (symbol, date) — the reference's call
    site iterates unique pairs.
    """
    req = requests.select(
        F.col(symbol_col).alias("symbol"),
        F.col(date_col).cast("date").alias("date"),
        (F.col(year_col).cast("int") if year_col in requests.columns else F.lit(None).cast("int")).alias(
            "year"
        ),
    ).withColumn("__sym_n", normalize_symbol(F.col("symbol")))

    def _ymd(suffix: str):
        return F.concat(F.col("year").cast("string"), F.lit(suffix)).cast("date")

    ladder = F.when(
        F.col("year").isNotNull(),
        F.array_distinct(
            F.array(
                F.col("date"),
                _ymd("-12-31"),
                _ymd("-06-30"),
                _ymd("-09-30"),
                _ymd("-03-31"),
            )
        ),
    ).otherwise(F.array(F.col("date")))
    cand = req.select(
        "symbol", "date", "year", "__sym_n", F.posexplode(ladder).alias("prio", "try_date")
    )

    # Null-CIK master rows stay in the join: a null record that wins its
    # (symbol, date) group yields a NULL resolution and stops the ladder,
    # exactly like the reference's early `return None`.
    m = master.select(
        normalize_symbol(F.col("symbol")).alias("__m_sym"),
        F.col("cik").alias("__m_cik"),
        F.col("start_date").alias("__m_start"),
        F.col("end_date").alias("__m_end"),
    )
    hits = cand.join(
        F.broadcast(m),
        (F.col("__sym_n") == F.col("__m_sym"))
        & (F.col("try_date") >= F.col("__m_start"))
        & (F.col("try_date") <= F.col("__m_end")),
        "inner",
    )
    w = Window.partitionBy("symbol", "date").orderBy(
        F.col("prio").asc(), F.col("__m_start").desc(), F.col("__m_cik").asc_nulls_last()
    )
    best = (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("symbol", "date", F.col("__m_cik").alias("__ladder_cik"))
    )

    out = req.join(best, ["symbol", "date"], "left")
    if sec_map is not None:
        sec = sec_map.select(
            normalize_symbol(F.col("ticker")).alias("__sym_n"), F.col("cik").alias("__sec_cik")
        )
        out = out.join(F.broadcast(sec), "__sym_n", "left")
    else:
        out = out.withColumn("__sec_cik", F.lit(None).cast("string"))

    prefer_sec = (F.coalesce(F.col("year"), F.lit(0)) >= 2025) | (F.year("date") >= 2025)
    resolved = F.when(prefer_sec & F.col("__sec_cik").isNotNull(), F.col("__sec_cik")).otherwise(
        F.col("__ladder_cik")
    )
    return out.select(
        "symbol",
        "date",
        "year",
        F.when(resolved.isNotNull(), F.lpad(resolved.cast("string"), 10, "0")).alias("cik"),
    )
