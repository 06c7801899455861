"""As-of joins (backward / forward / nearest) — align each left row to the
closest right row in the chosen direction.

The reference uses Polars ``join_asof(strategy="backward", by=key)``
(storage/pipeline/collectors.py:777-782) to attach the last balance-sheet
snapshot at-or-before each TTM row; forward/nearest complete the Polars
strategy set.  Spark has no native as-of join; the scalable rewrite is
**union + last-value window**:

  1. tag right rows (carrying their payload) and left rows (payload null),
  2. union on (key, time),
  3. ``last(payload, ignorenulls=True)`` over
     ``partitionBy(key).orderBy(time, side)`` rows unbounded-preceding..current,
  4. keep left rows.

Cost: ONE shuffle of (left ∪ right) on the by-key — same as the shuffle any
join would need — plus a per-partition sort; no range explosion, no skew from
interval widths.  Ties (equal timestamps) match the Polars backward semantics:
right rows sort *before* left rows at the same timestamp, so an equal-date
right row is visible to the left row (backward inclusive).

An alternative ``applyInPandas`` + ``pd.merge_asof`` per key group is provided
for very wide payloads; the window rewrite is preferred (stays in Tungsten).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None,
) -> tuple[DataFrame, list[str], list[str]]:
    """Union left (side 1, null payload) and right (side 0, payload + __rt)
    rows on (by, time) — the shared first step of every as-of variant."""
    value_cols = value_cols or [c for c in right.columns if c not in by and c != right_on]
    lcols = left.columns

    # single-select construction (NOT per-column withColumn loops: each
    # withColumn is a full analysis pass over the whole input plan — on a
    # join/pivot-deep left side the loops cost ~0.4 s of pure driver time
    # per as-of join; the one-shot selects are one pass each and produce the
    # identical projection)
    for c in value_cols:
        if c in lcols:
            raise ValueError(f"value column {c!r} collides with a left column")
    l_tag = left.select(
        *lcols,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_on].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )

    r_base_cols = set(by) | {"__t", "__side", "__rt"} | set(value_cols)
    r_tag = right.select(
        *by,
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
        F.col(right_on).alias("__rt"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in r_base_cols
        ],
    )

    unioned = l_tag.select(*lcols, "__t", "__side", "__rt", *value_cols).unionByName(
        r_tag.select(*lcols, "__t", "__side", "__rt", *value_cols)
    )
    return unioned, lcols, value_cols


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    tolerance_days: int | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns + right ``value_cols``.

    ``tolerance_days``: if set, a matched right row older than the tolerance
    (in days, for date/timestamp keys) is nulled out — Polars' ``tolerance``.
    """
    unioned, lcols, value_cols = _tag_union(left, right, by, left_on, right_on, value_cols)

    # right rows (side 0) sort before left rows (side 1) at equal __t:
    # backward-inclusive tie semantics.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        "__t",
        F.last("__rt", ignorenulls=True).over(w).alias("__matched_t"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_days is not None:
        stale = F.datediff(F.col("__t"), F.col("__matched_t")) > tolerance_days
        out = out.select(
            *lcols,
            "__matched_t",
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
        )
    return out.select(*lcols, *value_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    tolerance_days: int | None = None,
) -> DataFrame:
    """Forward as-of join: earliest right row at-or-after each left row
    (Polars ``strategy="forward"``, inclusive at equal timestamps).

    Same single-shuffle union + window rewrite as backward, mirrored:
    ``first(value, ignorenulls=True)`` over currentRow..unboundedFollowing;
    at equal __t left rows sort *before* right rows so an equal-time right
    row is inside the left row's following frame.
    """
    unioned, lcols, value_cols = _tag_union(left, right, by, left_on, right_on, value_cols)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        "__t",
        F.first("__rt", ignorenulls=True).over(w).alias("__matched_t"),
        *[F.first(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_days is not None:
        stale = F.datediff(F.col("__matched_t"), F.col("__t")) > tolerance_days
        out = out.select(
            *lcols,
            "__matched_t",
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
        )
    return out.select(*lcols, *value_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    tolerance_days: int | None = None,
) -> DataFrame:
    """Nearest as-of join: whichever of the backward (inclusive) or strictly-
    forward match is closer in time; equidistant ties take the backward row.

    Both directions fill from ONE union with ONE sort — the two window frames
    (unboundedPreceding..current and current..unboundedFollowing) share the
    same partitioning and ordering, so Spark reuses a single shuffle+sort.
    Distances compare as exact epoch-microsecond longs, not doubles, so the
    equidistant tie-break is deterministic across engines.
    """
    unioned, lcols, value_cols = _tag_union(left, right, by, left_on, right_on, value_cols)

    order = [F.col("__t").asc(), F.col("__side").asc()]  # right first at ties
    wb = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # same sort => equal-time right rows fall *before* the left row, making
    # the forward direction strict (the tie belongs to backward).
    wf = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        "__t",
        F.last("__rt", ignorenulls=True).over(wb).alias("__bt"),
        F.first("__rt", ignorenulls=True).over(wf).alias("__ft"),
        *[F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}") for c in value_cols],
        *[F.first(c, ignorenulls=True).over(wf).alias(f"__f_{c}") for c in value_cols],
    ).filter(F.col("__side") == 1)

    # cast covers DateType time keys; µs longs keep the comparison exact
    t_us, bt_us, ft_us = (F.unix_micros(F.col(c).cast("timestamp")) for c in ("__t", "__bt", "__ft"))
    pick_back = F.col("__bt").isNotNull() & (
        F.col("__ft").isNull() | ((t_us - bt_us) <= (ft_us - t_us))
    )
    matched = F.when(pick_back, F.col("__bt")).otherwise(F.col("__ft"))
    out = filled.select(
        *lcols,
        "__t",
        matched.alias("__matched_t"),
        *[
            F.when(pick_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(c)
            for c in value_cols
        ],
    )
    if tolerance_days is not None:
        stale = F.abs(F.datediff(F.col("__t"), F.col("__matched_t"))) > tolerance_days
        out = out.select(
            *lcols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
        )
    return out.select(*lcols, *value_cols)
