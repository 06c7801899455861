"""Reshaping: long→wide pivot, wide→long unpivot, missing-column padding
(SURVEY.md §2.8 R1–R3; reference derived/metrics.py:76-91, 231-237).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pivot_long_to_wide(
    df: DataFrame,
    *,
    index: list[str],
    key: str = "concept",
    value: str = "value",
    known_keys: list[str] | None = None,
) -> DataFrame:
    """R1: ``groupBy(index).pivot(key, known_keys).agg(first(value))``.

    Passing the explicit key vocabulary (26 concepts) skips the extra distinct
    job Spark otherwise runs to discover pivot values — one less pass over a
    100 TB fact table.
    """
    p = df.groupBy(*index).pivot(key, known_keys) if known_keys else df.groupBy(*index).pivot(key)
    return p.agg(F.first(value))


def unpivot_wide_to_long(
    df: DataFrame,
    *,
    index: list[str],
    value_cols: list[str],
    key_name: str = "metric",
    value_name: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """R2: melt via native ``unpivot`` + null drop (metrics.py:231-237)."""
    out = df.unpivot([F.col(c) for c in index], [F.col(c) for c in value_cols], key_name, value_name)
    return out.na.drop(subset=[value_name]) if drop_null else out


def pad_missing_columns(df: DataFrame, cols: list[str], dtype: str = "double") -> DataFrame:
    """R3: add typed null columns for absent concepts before arithmetic
    (metrics.py:83-91)."""
    missing = {c: F.lit(None).cast(dtype) for c in cols if c not in df.columns}
    return df.withColumns(missing) if missing else df
