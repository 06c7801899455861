"""Deterministic sampling / dataset splitting for training pipelines.

Random `df.sample()` is non-reproducible across runs, engines, and —
critically — across *re-partitionings* of the same 100 TB corpus.  Training
splits must be a pure function of the row's identity, so membership is
decided by a hash of the id column:

  bucket(id) = md5_64bits(id) mod 100   →   train < 80 ≤ valid < 90 ≤ test

Properties that matter at scale:

- **Stable under reprocessing**: adding or removing other rows never moves an
  existing row between splits (no dependence on row order or partition count).
- **Join-free leakage control**: all rows sharing an id (e.g. chunks of one
  document) land in the same split, preventing train/test contamination.
- **Engine-portable**: md5-based (functions.hashing), so the exact same split
  reproduces in DuckDB — the oracle checks membership, not just counts.

Narrow transformation: no shuffle; the split column is computed at scan time
and is a partition-pruning-friendly write key (`partitionBy("split")`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from us_equity_datalake_spark.functions.hashing import md5_long60, md5_long60_sql


def split_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the id's md5."""
    return (md5_long60(id_col.cast("string")) % n_buckets).cast("int")


def split_bucket_sql(id_expr: str, n_buckets: int = 100) -> str:
    return f"CAST({md5_long60_sql(f'CAST({id_expr} AS VARCHAR)')} % {n_buckets} AS INT)"


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    train: int = 80,
    valid: int = 10,
    n_buckets: int = 100,
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/'test') decided by id hash.

    ``train`` and ``valid`` are bucket counts out of ``n_buckets``; the
    remainder is test.
    """
    b = split_bucket(F.col(id_col), n_buckets)
    return df.withColumn(
        "split",
        F.when(b < train, F.lit("train"))
        .when(b < train + valid, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def hash_split_sql(id_expr: str, *, train: int = 80, valid: int = 10, n_buckets: int = 100) -> str:
    b = split_bucket_sql(id_expr, n_buckets)
    return (
        f"CASE WHEN {b} < {train} THEN 'train' "
        f"WHEN {b} < {train + valid} THEN 'valid' ELSE 'test' END"
    )


def deterministic_sample(df: DataFrame, id_col: str, *, rate_pct: int, n_buckets: int = 100) -> DataFrame:
    """Keep ~rate_pct% of rows, decided by id hash — a reproducible
    `TABLESAMPLE` that survives reprocessing and engine changes."""
    return df.filter(split_bucket(F.col(id_col), n_buckets) < rate_pct)
