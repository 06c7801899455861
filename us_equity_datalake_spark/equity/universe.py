"""Universe selection: common-stock predicate, liquidity top-k, snapshot
state machine (SURVEY.md §2.2 P6, §2.6 T1, §2.12 I6).

The common-stock rule filter (reference universe/current.py:20-88) is a pure
boolean column expression — contains/rlike chains, fully codegen'd; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from us_equity_datalake_spark.operators.topk import top_liquidity  # noqa: F401  (re-export)

_DIRECT_EXCLUSIONS = [
    "Preferred", "Preference", "Pfd Ser", "Series", "Subordinate", "Notes",
    "Limited Partner", "Beneficial Interest", "Cmn Shs of BI",
    "Closed End Fund", "Depositary Share", "Depositary Receipt",
    "Redeemable", "Perpetual", "Convertible",
]
_WORD_BOUNDARY_EXCLUSIONS = [r"\bUnits?\b", r"\bRights?\b", r"\bWarrants?\b"]
_CASE_SENSITIVE_EXCLUSIONS = ["ADS", "ADR", "ETN"]
_DEBT_KEYWORDS = ["Income", "Municipal", "Bond", "Term", "Securities", "Premium", "Rate", "Yield"]
_REIT_KEYWORDS = ["Realty", "Real Estate", "REIT"]


def is_common_stock(name: Column) -> Column:
    """P6 (universe/current.py:20-88): name-based common-stock predicate.

    Exclusion keyword lists, word-boundary regexes, case-sensitive ADS/ADR/ETN,
    '%' check, and the Trust/Fund-vs-REIT debt rule — all as one boolean
    column expression.
    """
    ok = name.isNotNull() & (F.trim(name) != "")
    for kw in _DIRECT_EXCLUSIONS:
        ok = ok & ~name.contains(kw)
    for pat in _WORD_BOUNDARY_EXCLUSIONS:
        ok = ok & ~name.rlike(pat)
    for kw in _CASE_SENSITIVE_EXCLUSIONS:
        ok = ok & ~name.contains(kw)
    ok = ok & ~name.contains("%")
    has_trust_fund = F.lit(False)
    for kw in ["Trust", "Fund"]:
        has_trust_fund = has_trust_fund | name.contains(kw)
    is_debt = F.lit(False)
    for kw in _DEBT_KEYWORDS:
        is_debt = is_debt | name.contains(kw)
    is_debt = has_trust_fund & is_debt
    is_reit = F.lit(False)
    for kw in _REIT_KEYWORDS:
        is_reit = is_reit | name.contains(kw)
    return ok & (is_reit | ~is_debt)


def filter_universe(df: DataFrame, *, name_col: str = "name", ticker_col: str = "ticker",
                    etf_col: str | None = "etf", test_issue_col: str | None = "test_issue") -> DataFrame:
    """Full Nasdaq-directory filter (universe/current.py:140-163): drop ETFs,
    test issues, non-common-stock names, '$'-tickers; dedup tickers keep-first."""
    out = df
    if etf_col and etf_col in df.columns:
        out = out.filter(F.col(etf_col) == "N")
    if test_issue_col and test_issue_col in df.columns:
        out = out.filter(F.col(test_issue_col) == "N")
    out = out.filter(is_common_stock(F.col(name_col)))
    out = out.filter(~F.col(ticker_col).contains("$"))
    from us_equity_datalake_spark.operators.dedup import dedup_keep_first

    return dedup_keep_first(out, keys=[ticker_col], order=[F.col(name_col).asc()])


def universe_transition(prev: DataFrame, cur: DataFrame, *, key: str = "ticker",
                        grace_days: int = 14, as_of: str | None = None) -> DataFrame:
    """I6 (security_master.py:1198-1410): snapshot state machine.

    Output statuses: still_active / appeared (IPO or rebrand target) /
    disappeared (delist candidate — callers apply the ``grace_days`` window
    against ``last_seen`` before finalizing a delist).
    """
    from us_equity_datalake_spark.operators.setops import snapshot_diff

    diff = snapshot_diff(prev, cur, key=key)
    if as_of is not None:
        diff = diff.withColumn("as_of", F.lit(as_of).cast("date")).withColumn(
            "delist_after", F.date_add(F.col("as_of"), grace_days)
        )
    return diff
