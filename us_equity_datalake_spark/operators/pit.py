"""Point-in-time (interval) resolution — the reference system's signature join.

J1 (reference master/security_master.py:731-760 ``get_security_id``): resolve a
(symbol, date) fact to the dimension row whose validity interval covers the
date:  ``symbol == s AND start_date <= d AND end_date >= d``.

J2 auto-resolve (security_master.py:640-729): when no interval covers the
date, consider every dimension row that *ever* used the symbol and pick the
one with minimum temporal distance ``greatest(start - d, d - end, 0)``.

Scale design: the dimension (security master ~50k rows) is always broadcast,
so the interval predicate is evaluated inside a BroadcastHashJoin/
BroadcastNestedLoop on the *small* side — the 100 TB fact side streams through
without a shuffle.  Never express this as a non-broadcast theta join: that
degenerates to a cartesian sort-merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def pit_lookup(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    fact_date: str,
    dim_key: str | None = None,
    start: str = "start_date",
    end: str = "end_date",
    how: str = "left",
) -> DataFrame:
    """J1: equi-join on ``key`` + interval containment on ``fact_date``.

    The equi key keeps the physical plan a broadcast **hash** join (the range
    predicates become post-join filters on the hash-matched rows), which is the
    plan that survives a 100 TB fact side.
    """
    dim_key = dim_key or key
    d = dim.alias("dim")
    f = facts.alias("f")
    cond = (
        (F.col(f"f.{key}") == F.col(f"dim.{dim_key}"))
        & (F.col(f"f.{fact_date}") >= F.col(f"dim.{start}"))
        & (F.col(f"f.{fact_date}") <= F.col(f"dim.{end}"))
    )
    return f.join(F.broadcast(d), cond, how)


def temporal_distance(d: Column, start: Column, end: Column) -> Column:
    """Days outside [start, end]; 0 when covered (security_master.py:699-713)."""
    return F.greatest(F.datediff(start, d), F.datediff(d, end), F.lit(0))


def auto_resolve(
    queries: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    query_date: str,
    dim_key: str | None = None,
    start: str = "start_date",
    end: str = "end_date",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """J2: fuzzy temporal fallback as a ranked broadcast join.

    Candidate set = every dim row matching the key regardless of dates; winner
    = rank 1 by (temporal distance, tiebreak columns).  Returns one row per
    query row (left rows with no candidate are preserved with nulls).
    """
    dim_key = dim_key or key
    q = queries.alias("q")
    d = dim.alias("dim")
    joined = q.join(F.broadcast(d), F.col(f"q.{key}") == F.col(f"dim.{dim_key}"), "left")
    dist = temporal_distance(F.col(f"q.{query_date}"), F.col(f"dim.{start}"), F.col(f"dim.{end}"))
    order = [F.col(f"dim.{dim_key}").isNull().asc(), dist.asc()] + [
        F.col(f"dim.{c}").asc() for c in (tiebreak or [start])
    ]
    w = Window.partitionBy(*[F.col(f"q.{c}") for c in queries.columns]).orderBy(*order)
    dim_payload = [c for c in dim.columns if c not in queries.columns]
    return (
        joined.withColumn("__dist", dist)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"q.{c}").alias(c) for c in queries.columns],
            *[F.col(f"dim.{c}").alias(c) for c in dim_payload],
            F.col("__dist").alias("temporal_distance"),
        )
    )
