"""The 24 derived financial-ratio metrics (SURVEY.md §2.8/§2.5 W2/W3;
reference derived/metrics.py:76-237 and docs/derived_fundamentals.md:17-69).

Pipeline: TTM long → pivot wide (R1, explicit concept list) → as-of join of
instant balance-sheet concepts (J3 backward, by symbol) → safe-arithmetic
metric expressions (null, never NaN/Inf) with lag windows (W2/W3) → unpivot
back to long (R2) dropping null values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from us_equity_datalake_spark.functions.safe_math import safe_add, safe_div, safe_mul, safe_sub
from us_equity_datalake_spark.operators.asof import asof_join_backward
from us_equity_datalake_spark.operators.reshape import pad_missing_columns, unpivot_wide_to_long

DURATION_INPUTS = ["rev", "cor", "op_inc", "net_inc", "dna", "cfo", "capex", "inc_tax_exp", "ibt"]
STOCK_INPUTS = ["std", "ltd", "cce", "ca", "cl", "ta", "te"]

METRIC_COLS = [
    "grs_pft", "grs_mgn", "op_mgn", "net_mgn", "ebitda",
    "ttl_dbt", "net_dbt", "wc",
    "fcf", "fcf_mgn", "capex_ratio",
    "avg_ast", "avg_eqt", "etr", "roa", "roe", "nopat", "inv_cap", "roic",
    "rev_grw", "ast_grw", "inv_rt",
    "acc", "wc_acc",
]


def pivot_concepts(long_df: DataFrame, concepts: list[str]) -> DataFrame:
    """R1: long -> wide with the known concept vocabulary (no discovery pass)."""
    wide = (
        long_df.groupBy("symbol", "as_of_date")
        .pivot("concept", concepts)
        .agg(F.first("value"))
    )
    return pad_missing_columns(wide, concepts)


def join_stock_asof(ttm_wide: DataFrame, stock_long: DataFrame) -> DataFrame:
    """J3: attach the last balance-sheet snapshot at-or-before each TTM row
    (collectors.py:777-782, Polars join_asof backward by symbol)."""
    stock_dedup = stock_long.groupBy("symbol", "as_of_date", "concept").agg(F.last("value").alias("value"))
    stock_wide = pivot_concepts(stock_dedup, STOCK_INPUTS)
    return asof_join_backward(
        ttm_wide,
        stock_wide,
        by=["symbol"],
        left_on="as_of_date",
        right_on="as_of_date",
        value_cols=STOCK_INPUTS,
    )


def compute_metric_columns(wide: DataFrame) -> DataFrame:
    """The 24 formulas with the reference's exact null discipline.

    Batched into THREE ``withColumns`` calls by dependency level (base-only,
    needs-level-1, needs-level-2): a 24-deep ``withColumn`` chain re-analyzes
    the whole (already join-deep) plan once per column — measured ~0.5 s of
    pure driver time per invocation on the incremental-maintenance plan; the
    3-batch form is one analysis pass per level.  The expressions themselves
    are byte-identical to the chained form, so results (and the unpivoted
    column set) are unchanged."""
    c = F.col
    w = Window.partitionBy("symbol").orderBy("as_of_date")
    # level 1: only base concepts (incl. the W2 lag-4 averages / W3 lag-1 diffs)
    df = wide.withColumns(
        {
            "grs_pft": safe_sub(c("rev"), c("cor")),
            "op_mgn": safe_div(c("op_inc"), c("rev")),
            "net_mgn": safe_div(c("net_inc"), c("rev")),
            "ebitda": safe_add(c("op_inc"), c("dna")),
            "ttl_dbt": safe_add(c("std"), c("ltd")),
            "wc": safe_sub(c("ca"), c("cl")),
            "fcf": safe_sub(c("cfo"), c("capex")),
            "capex_ratio": safe_div(c("capex"), c("ta")),
            "avg_ast": (c("ta") + F.lag("ta", 4).over(w)) / 2,
            "avg_eqt": (c("te") + F.lag("te", 4).over(w)) / 2,
            "etr": safe_div(c("inc_tax_exp"), c("ibt")),
            "rev_grw": c("rev") - F.lag("rev", 1).over(w),
            "ast_grw": c("ta") - F.lag("ta", 1).over(w),
            "inv_rt": safe_div(c("capex"), c("ta")),
            "acc": safe_sub(c("net_inc"), c("cfo")),
        }
    )
    # level 2: formulas over level-1 columns
    df = df.withColumns(
        {
            "grs_mgn": safe_div(c("grs_pft"), c("rev")),
            "net_dbt": safe_sub(c("ttl_dbt"), c("cce")),
            "fcf_mgn": safe_div(c("fcf"), c("rev")),
            "roa": safe_div(c("net_inc"), c("avg_ast")),
            "roe": safe_div(c("net_inc"), c("avg_eqt")),
            "nopat": safe_mul(c("op_inc"), F.lit(1) - c("etr")),
            "inv_cap": safe_sub(safe_add(c("te"), c("ttl_dbt")), c("cce")),
            "wc_acc": safe_sub(c("wc") - F.lag("wc", 1).over(w), c("dna")),
        }
    )
    # level 3: needs nopat + inv_cap
    return df.withColumn("roic", safe_div(c("nopat"), c("inv_cap")))


def compute_metrics_long(ttm_long: DataFrame, stock_long: DataFrame | None = None) -> DataFrame:
    """Full metrics pipeline -> metrics_long (symbol, as_of_date, metric, value)."""
    wide = pivot_concepts(ttm_long, DURATION_INPUTS)
    if stock_long is not None:
        wide = join_stock_asof(wide, stock_long)
    else:
        wide = pad_missing_columns(wide, STOCK_INPUTS)
    computed = compute_metric_columns(wide)
    return unpivot_wide_to_long(
        computed,
        index=["symbol", "as_of_date"],
        value_cols=METRIC_COLS,
        key_name="metric",
        value_name="value",
        drop_null=True,
    )
