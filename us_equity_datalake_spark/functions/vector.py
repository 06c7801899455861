"""Vector (embedding) column functions over ``array<float>`` columns.

All JVM-side via higher-order functions (``zip_with``/``aggregate``) — no
Python in the hot path.  Inputs are float32; arithmetic is carried out in
double (exact products for 24-bit mantissas; rounded results are presented at
fixed precision so they hash-match the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin — explicit, order-preserving fold like Spark ``aggregate``."""
    d = f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"(CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) ELSE NULL END)"
