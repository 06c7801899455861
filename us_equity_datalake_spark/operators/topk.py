"""Top-k operators (SURVEY.md §2.6): the reference's top-3000-by-liquidity
(universe/manager.py:229-243) and per-group top-k.

``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each task keeps a
k-sized heap, only k rows per partition reach the driver: no global sort, the
plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k(df: DataFrame, *, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_by_group(df: DataFrame, *, partition: list[str], order: list[Column], k: int, rank_col: str = "rank") -> DataFrame:
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def top_liquidity(
    ticks: DataFrame,
    *,
    key: str = "symbol",
    close: str = "close",
    volume: str = "volume",
    min_adv: float = 1000.0,
    k: int = 3000,
) -> DataFrame:
    """T1/A3: mean dollar volume per key → filter > min_adv → top-k desc
    (deterministic tiebreak on key for oracle parity)."""
    adv = ticks.groupBy(key).agg(F.avg(F.col(close) * F.col(volume)).alias("adv"))
    return top_k(adv.filter(F.col("adv") > min_adv), order=[F.desc("adv"), F.col(key).asc()], k=k)
