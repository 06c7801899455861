"""Trailing-twelve-month rollup (W1).

Reference: derived/ttm.py:60-147 — rows with a null value / as_of_date /
frame are DROPPED before grouping (:76-81 ``continue``), then per
(symbol, concept) sorted by as_of_date each surviving row from the 4th
onward gets the sum of itself + 3 prior surviving rows; the TTM row carries
the window-start ``start`` and the current row's ``end``/accn/form/frame.
(The reference's in-window ``any value is None -> continue`` check is dead
code — nulls never reach the window — so a null quarter shifts the window
over the survivors rather than poisoning it.)

Spark form: a narrow filter then one rows-based trailing window — a single
shuffle on (symbol, concept), sort within partition, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compute_ttm_long(fund_long: DataFrame, *, periods: int = 4) -> DataFrame:
    """fundamental_long (duration concepts) -> ttm_long.

    Reference null discipline (derived/ttm.py:76-81): rows with null
    value/as_of_date (and null frame, when the column exists) are dropped
    up front; windows then need exactly ``periods`` consecutive SURVIVING
    rows — fewer rows emit nothing.
    """
    filtered = fund_long.filter(F.col("value").isNotNull() & F.col("as_of_date").isNotNull())
    has_frame = "frame" in fund_long.columns
    if has_frame:
        filtered = filtered.filter(F.col("frame").isNotNull())
    w = (
        Window.partitionBy("symbol", "concept")
        .orderBy("as_of_date")
        .rowsBetween(-(periods - 1), 0)
    )
    ttm = (
        filtered.withColumn("__n_rows", F.count("*").over(w))
        .withColumn("__sum", F.sum("value").over(w))
        .withColumn("__start", F.first("start").over(w))
        .filter(F.col("__n_rows") == periods)
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
        *(["frame"] if has_frame else []),
    )
