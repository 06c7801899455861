"""Point-in-time security master: construction + resolution.

Reference: master/security_master.py — the system's central dimension.
Construction (reference :353-638): raw CRSP-style name history → CIK
enrichment → priority dedup → period rollup → change detection → running-ID
assignment.  Resolution (reference :640-806): PIT interval lookup (J1) with
fuzzy auto-resolve fallback (J2) — both delegated to ``operators.pit``.

Scale notes: the master is dimension-sized (~50k rows).  Construction uses
one global ordered window (W5) — fine at dimension scale, documented as such;
resolution always broadcasts the master so fact-side scans never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from us_equity_datalake_spark.operators import pit
from us_equity_datalake_spark.operators.dedup import dedup_keep_first

ID_BASE = 1000


def normalize_symbol(col: Column) -> Column:
    """CRSP/Nasdaq/SEC symbol-format normalization: strip separators, upper
    (reference security_master.py:103, 157-175: BRK.B == BRK-B == BRKB)."""
    return F.upper(F.regexp_replace(col, r"[.\-]", ""))


def coalesce_cik(wrds_cik: Column, sec_cik: Column) -> Column:
    """J5 (security_master.py:459-477): WRDS mapping first, SEC snapshot
    fallback; zero-pad to 10 digits."""
    return F.lpad(F.coalesce(wrds_cik, sec_cik).cast("string"), 10, "0")


def build_security_master(name_history: DataFrame) -> DataFrame:
    """Construct the interval dimension from a raw name history.

    ``name_history`` columns: permno (int), symbol, company, cik (nullable),
    cusip (nullable), start_date (date), end_date (date).  Steps
    (security_master.py:404-638):

    1. A6 priority dedup: one row per (permno, symbol, start_date) — longest
       validity first (explicit row_number, not order-dependent drop_duplicates).
    2. A1 rollup per (permno, symbol): min start, max end, first company/cusip
       by start_date, collect_set(cik).
    3. W4 change detection over the WHOLE frame ordered (permno, start_date):
       new business iff permno != previous row's permno.  (The reference
       shifts over the full sorted frame, not per-permno — preserved.)
    4. W5: security_id = ID_BASE + running count of new-business flags.
    """
    deduped = dedup_keep_first(
        name_history,
        keys=["permno", "symbol", "start_date"],
        order=[F.datediff("end_date", "start_date").desc(), F.col("cik").asc_nulls_last()],
    )
    rolled = (
        deduped.groupBy("permno", "symbol")
        .agg(
            F.min("start_date").alias("start_date"),
            F.max("end_date").alias("end_date"),
            F.min(F.struct("start_date", "company")).alias("__c"),
            F.min(F.struct("start_date", "cusip")).alias("__cu"),
            F.array_sort(F.collect_set("cik")).alias("ciks"),
        )
        .select(
            "permno",
            "symbol",
            F.col("__c.company").alias("company"),
            F.col("__cu.cusip").alias("cusip"),
            "ciks",
            "start_date",
            "end_date",
        )
    )
    # global ordered window — dimension-scale only (documented tradeoff)
    w = Window.orderBy("permno", "start_date")
    flagged = rolled.withColumn(
        "new_business", ~F.col("permno").eqNullSafe(F.lag("permno").over(w))
    )
    assigned = flagged.withColumn(
        "security_id",
        F.sum(F.col("new_business").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        + F.lit(ID_BASE),
    )
    return assigned.select(
        "security_id",
        "permno",
        "symbol",
        "company",
        F.element_at("ciks", 1).alias("cik"),
        "cusip",
        "start_date",
        "end_date",
    )


def resolve_pit(facts: DataFrame, master: DataFrame, *, symbol_col: str = "symbol", date_col: str = "date") -> DataFrame:
    """J1: exact point-in-time resolution of (symbol, date) facts."""
    dim = master.select("security_id", F.col("symbol").alias(symbol_col), "start_date", "end_date")
    return pit.pit_lookup(facts, dim, key=symbol_col, fact_date=date_col)


def resolve_auto(queries: DataFrame, master: DataFrame, *, symbol_col: str = "symbol", date_col: str = "date") -> DataFrame:
    """J2: fuzzy fallback — nearest validity interval among all securities
    that ever used the symbol (security_master.py:640-729)."""
    dim = master.select("security_id", F.col("symbol").alias(symbol_col), "start_date", "end_date")
    return pit.auto_resolve(
        queries, dim, key=symbol_col, query_date=date_col, tiebreak=["start_date", "security_id"]
    )
