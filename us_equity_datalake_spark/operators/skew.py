"""Skew and co-location tools (SURVEY §4 / scale checklist).

AQE's skew-join splitting handles most runtime skew; these are the explicit
forms for the cases AQE can't see:

- ``salted_agg``: two-stage aggregation for heavy-hitter GROUP BY keys — the
  map-side partial agg already absorbs most skew for algebraic aggregates, but
  a single hot key still lands its partials on one reducer; salting spreads
  stage one across ``n_salts`` reducers, stage two combines the per-salt
  partials (rows = |keys| × n_salts, tiny).
- ``salted_join``: replicate the small side to every salt, deterministically
  salt the big side (hash of the row, not rand() — reruns must be
  reproducible), so one hot join key fans across n_salts tasks.
- ``write_bucketed`` / co-located joins: pre-shuffle both tables into the
  same bucket layout at write time; equi-joins on the bucket key then run
  with ZERO exchange (verified in tests by asserting no Exchange under the
  SortMergeJoin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    *,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: output_name -> (fn, col) with fn in {sum, count, min, max} —
    the algebraic aggregates that re-combine exactly.  ``salt_on`` defaults to
    a deterministic hash of the full row (never rand(): task retries must
    reproduce the same salt or results drift).
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _) in aggs.items():
        if fn not in fns:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate (use sum/count/min/max)")
    salt = F.pmod(salt_on if salt_on is not None else _default_salt(df), F.lit(n_salts))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[fns[fn](c).alias(name) for name, (fn, c) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[recombine[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def _default_salt(df: DataFrame):
    """Deterministic salt that also spreads duplicate rows: full-row hash
    alone maps identical rows (the degenerate hot-key case, e.g. millions of
    identical count events) to ONE salt; adding the partition id spreads them
    across at least as many salts as input partitions.  Both components are
    stable across task retries for deterministic scans — never rand()."""
    return F.hash(*df.columns) + F.spark_partition_id()


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: big side salted deterministically, small side
    replicated ``n_salts``× (only viable when small is dimension-sized —
    replication multiplies it).  Join key becomes (on, salt).

    Only inner/left are supported: in a right/full outer join every unmatched
    small-side row would survive once PER SALT replica (n_salts duplicates)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: outer joins "
            "would duplicate unmatched small-side rows n_salts times"
        )
    big_s = big.withColumn("__salt", F.pmod(_default_salt(big), F.lit(n_salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    *,
    table: str,
    path: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist with a fixed bucket layout so future equi-joins/aggs on the
    bucket key are exchange-free (the write pays the one shuffle that every
    subsequent join would otherwise repeat).  External table: data at
    ``path``, bucketing metadata in the session catalog."""
    w = df.write.mode(mode).option("path", path).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
