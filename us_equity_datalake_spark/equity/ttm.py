"""Trailing-twelve-month rollup (W1).

Reference: derived/ttm.py:111-147 — per (symbol, concept) sorted by
as_of_date, each row from the 4th onward gets the sum of itself + 3 prior
rows; windows containing any null value are skipped; the TTM row carries the
window-start ``start`` and the current row's ``end``/accn/form/frame.

Spark form: one rows-based trailing window — a single shuffle on
(symbol, concept), sort within partition, whole-stage codegen; the
reference's Python loop over sorted groups becomes
``sum(value).over(rowsBetween(-3, 0))`` with a count guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compute_ttm_long(fund_long: DataFrame, *, periods: int = 4) -> DataFrame:
    """fundamental_long (duration concepts) -> ttm_long.

    Exactly-``periods`` semantics: a row emits a TTM value only when its
    trailing window holds ``periods`` non-null values AND ``periods`` rows
    (fewer rows -> no row; a null inside the window -> window skipped,
    matching the reference's ``any value is None -> continue``).
    """
    w = (
        Window.partitionBy("symbol", "concept")
        .orderBy("as_of_date")
        .rowsBetween(-(periods - 1), 0)
    )
    ttm = (
        fund_long.withColumn("__n_rows", F.count("*").over(w))
        .withColumn("__n_vals", F.count("value").over(w))
        .withColumn("__sum", F.sum("value").over(w))
        .withColumn("__start", F.first("start").over(w))
        .filter((F.col("__n_rows") == periods) & (F.col("__n_vals") == periods))
    )
    return ttm.select(
        "symbol",
        "as_of_date",
        "accn",
        "form",
        "concept",
        F.col("__sum").alias("value"),
        F.col("__start").alias("start"),
        F.col("end"),
    )
