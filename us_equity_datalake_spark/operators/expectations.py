"""Declarative data-quality expectations: named predicates audited in ONE
pass over the table (the Deequ/Great-Expectations shape, Spark-native).

The reference validates at the ingest edge row-by-row (utils/validation.py:9-56
regex guards; pipeline/validation.py:84-216 existence probes); a lake-scale
pipeline additionally needs post-load auditing — "how many rows violate each
constraint" — without one scan per constraint.  Every check compiles to a
conditional SUM aggregate, so N checks = one table scan with map-side partial
aggregation, and the result is N narrow rows.

A check predicate states what a GOOD row satisfies; null predicate results
count as violations (unknown ≠ pass) except for explicit non-null checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(check, n_rows, n_violations, violation_rate): one row per named check,
    computed in a single aggregation pass."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).alias(f"__v_{name}")
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        "n_rows",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("check"), F.col(f"__v_{name}").alias("n_violations")
                )
                for name in checks
            ])
        ).alias("kv"),
    )
    return stacked.select(
        F.col("kv.check").alias("check"),
        "n_rows",
        F.col("kv.n_violations").alias("n_violations"),
        F.round(F.col("kv.n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
    )


def audit_sql(table: str, checks: dict[str, str]) -> str:
    """DuckDB twin of :func:`audit` for oracle queries: same one-pass
    conditional aggregation, stacked via UNION ALL."""
    wide = ", ".join(
        f"SUM(CASE WHEN COALESCE({pred}, FALSE) THEN 0 ELSE 1 END) AS v_{i}"
        for i, pred in enumerate(checks.values())
    )
    arms = " UNION ALL ".join(
        f'SELECT \'{name}\' AS "check", n_rows, CAST(v_{i} AS BIGINT) AS n_violations, '
        f"ROUND(CAST(v_{i} AS DOUBLE) / n_rows, 6) AS violation_rate FROM wide"
        for i, name in enumerate(checks)
    )
    return f"WITH wide AS (SELECT COUNT(*) AS n_rows, {wide} FROM {table}) {arms}"
