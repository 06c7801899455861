"""Slowly-changing-dimension type-2 merge (beyond-reference, §2.14 scale
toolkit adjacency): the security master's extend/rebrand rules
(equity/security_master.py) are a special case of the general SCD2 upsert —
close the current interval when a tracked attribute changes, open a new one.

Scale shape: one equi-join of the current dimension slice against the change
set on the business key (change sets are usually dimension-sized → broadcast;
at fact-sized change volume the join shuffles on the key, still a single
exchange), then narrow unions.  No windows, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    attrs: list[str],
    effective_date: str,
    start_col: str = "start_date",
    end_col: str = "end_date",
) -> DataFrame:
    """Apply an SCD2 upsert and return the full new dimension.

    ``dim``: all versions; current rows have ``end_col`` NULL.  ``changes``:
    one row per business key carrying the new values of ``attrs``.  Rules:

    - current row whose attrs all null-safe-equal the change → untouched
      (idempotent re-apply of the same change set is a no-op);
    - current row with a differing attr → closed out (``end_col`` =
      effective_date - 1 day) and a new current row opens at effective_date;
    - change key with no current row → brand-new current row;
    - historical rows (``end_col`` non-null) pass through untouched.

    Non-tracked, non-key columns are carried on closed rows and NULL on newly
    opened rows (the change feed doesn't know them).
    """
    eff = F.lit(effective_date).cast("date")
    current = dim.filter(F.col(end_col).isNull())
    history = dim.filter(F.col(end_col).isNotNull())

    # presence flag instead of attr-null heuristics: a change row of all-NULL
    # attrs is still a real change
    ch = changes.select(
        key, *[F.col(a).alias(f"__new_{a}") for a in attrs]
    ).withColumn("__present", F.lit(1))

    joined = current.join(ch, on=key, how="left")
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
    changed = joined.filter(F.col("__present").isNotNull() & differs)
    unchanged = joined.join(changed.select(key), on=key, how="left_anti").select(*dim.columns)

    closed = changed.select(
        *[F.date_sub(eff, 1).alias(end_col) if c == end_col else F.col(c) for c in dim.columns]
    )
    new_cols = [key] + [f"__new_{a}" for a in attrs]
    new_current = changed.select(*new_cols).unionByName(
        ch.join(current.select(key), on=key, how="left_anti").select(*new_cols)  # brand-new keys
    )
    opened = new_current.select(
        key,
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        eff.alias(start_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
    )
    for c in dim.columns:  # pad non-tracked columns for a clean union
        if c not in opened.columns:
            opened = opened.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
    opened = opened.select(*dim.columns)

    return history.unionByName(unchanged).unionByName(closed).unionByName(opened)
