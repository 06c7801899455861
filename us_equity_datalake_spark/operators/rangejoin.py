"""Range / interval-overlap joins (J6-style: equi-on-expression + interval
predicate, reference security_master.py:370-393).

For a big-big temporal join (|ts_a − ts_b| <= tolerance) the scalable plan is
**bucketed equi-join**: quantize time into tolerance-sized buckets, join on
(key, bucket) for the bucket and its neighbor, then apply the exact predicate.
This turns an O(n²)-per-key theta join into a hash join whose per-bucket
fan-out is bounded — the plan that holds when one key has millions of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def within_tolerance_pairs(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    id_col: str,
    tolerance_seconds: int,
    payload: list[str] | None = None,
) -> DataFrame:
    """Self-join: pairs of rows with the same key whose timestamps are within
    tolerance, id_a < id_b.  Bucketed equi-join as described above."""
    tol_us = tolerance_seconds * 1_000_000
    sel = [F.col(key).alias("k"), F.unix_micros(F.col(ts)).alias("t"), F.col(id_col).alias("id")] + [
        F.col(c) for c in (payload or [])
    ]
    base = df.select(*sel).withColumn("b", F.expr(f"t div {tol_us}"))
    # each left row probes its own bucket and the next; pairs in adjacent
    # buckets are found exactly once, same-bucket pairs deduped by id order.
    left = base.select("k", "t", "id", F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb"))
    right = base.withColumnRenamed("b", "jb")
    pairs = (
        left.alias("a")
        .join(right.alias("b"), ["k", "jb"])
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.t") - F.col("b.t")) <= tol_us)
        )
        .select(
            F.col("k").alias(key),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.t").alias("t_a_us"),
            F.col("b.t").alias("t_b_us"),
        )
        .distinct()
    )
    return pairs


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    equi: list[tuple[Column, Column]],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    how: str = "inner",
    broadcast_b: bool = True,
) -> DataFrame:
    """J6: equi conditions (possibly on expressions, e.g. substr(cusip,1,8))
    plus interval-overlap ``a.start <= b.end AND b.start <= a.end``.  The equi
    part keeps Spark on a hash join; broadcast the dimension side."""
    cond = None
    for l, r in equi:
        c = l == r
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col(f"a.{a_start}") <= F.col(f"b.{b_end}")) & (F.col(f"b.{b_start}") <= F.col(f"a.{a_end}"))
    bb = F.broadcast(b.alias("b")) if broadcast_b else b.alias("b")
    return a.alias("a").join(bb, cond, how)
