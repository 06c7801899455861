"""Distinct-count sketching (KMV / K-minimum-values) — approximate
aggregates for the 100 TB tier.

The reference computes exact ``n_unique`` everywhere (SURVEY §2.4 A9);
exact distinct over 100 TB means shuffling every key.  A KMV sketch keeps
only the k smallest *hash values* per group: if the kth-smallest of n
uniformly-hashed distinct keys is h_k, then E[h_k] ≈ k/n of the hash
space, so n̂ = (k-1) · M / h_k (M = hash-space size).  Error ~ 1/√k.

Built on md5 (functions.hashing) instead of Spark's builtin hash so the
sketch — and therefore the estimate — is bit-identical in DuckDB, making
an *approximate* operator oracle-checkable exactly.

Scale note: this implementation ranks hashes with a per-group window
(one shuffle + sort) which is fine up to ~10⁹ rows/group; the true
streaming form is an `Aggregator` keeping a k-heap per partition then
merging heaps (partial aggregation, no sort).  The algebra — and the
estimate — is identical, so the oracle gates that too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from us_equity_datalake_spark.functions.hashing import md5_long60, md5_long60_sql

# md5_long60 yields uniform hashes in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key: str,
    *,
    by: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-``by``-group KMV distinct estimate of ``key`` plus the exact count
    (so the query result exhibits the sketch's error directly).

    Groups with fewer than k distinct keys are exact by construction
    (the sketch holds every hash).
    """
    hashed = df.select(*by, md5_long60(F.col(key).cast("string")).alias("__h")).distinct()
    rn = F.row_number().over(Window.partitionBy(*by).orderBy("__h"))
    ranked = hashed.withColumn("__rn", rn)
    return (
        ranked.groupBy(*by)
        .agg(
            F.count("*").alias("exact_distinct"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
        )
        .select(
            *by,
            "exact_distinct",
            F.when(
                F.col("__hk").isNull(), F.col("exact_distinct").cast("double")
            )
            .otherwise(
                F.round((k - 1) * F.lit(_HASH_SPACE) / F.col("__hk").cast("double"), 6)
            )
            .alias("est_distinct"),
        )
    )


def kmv_distinct_sql(table_expr: str, key_expr: str, by: list[str], k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hashes, same estimate)."""
    bys = ", ".join(by)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {bys}, {md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")} AS h
      FROM {table_expr}
    ),
    ranked AS (
      SELECT {bys}, h, ROW_NUMBER() OVER (PARTITION BY {bys} ORDER BY h) AS rn
      FROM hashed
    )
    SELECT {bys},
           COUNT(*) AS exact_distinct,
           CASE WHEN MAX(CASE WHEN rn = {k} THEN h END) IS NULL
                THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ROUND(({k} - 1) * CAST({_HASH_SPACE!r} AS DOUBLE)
                           / CAST(MAX(CASE WHEN rn = {k} THEN h END) AS DOUBLE), 6)
           END AS est_distinct
    FROM ranked
    GROUP BY {bys}
    """
