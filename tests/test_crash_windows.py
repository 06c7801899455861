"""Crash-window tests for the lake write paths (VERDICT r4 #6): the
I3/I4 "exactly-once by rewrite" claims get the same assert treatment the
plans got.  Each test fabricates the exact on-disk state a crash at a given
step leaves behind, re-runs the job, and asserts the lake converges to the
no-crash result.

Windows covered:
- read_check_append's cache_fresh persist spans a count + write pair; a
  crash after the count (nothing written, possibly a Spark _temporary dir
  left inside the lake) must re-append exactly once on retry.
- update_fundamentals' bucket migration is write-aside + two renames; every
  intermediate state (tmp written / between renames / before cleanup) must
  recover to a lake row-identical to the uncrashed run.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from us_equity_datalake_spark.equity.daily_job import LakePaths, update_fundamentals
from us_equity_datalake_spark.equity.fundamentals import normalize_fundamental
from us_equity_datalake_spark.sources.lake import read_check_append

from tests.test_daily_job import _FUND_SCHEMA, _fund_days, _fund_raw_rows  # noqa: F401


def _rows_of(spark, path):
    try:
        return sorted(map(str, spark.read.parquet(path).collect()))
    except Exception:
        return []


# ---------------------------------------------------------------------------
# I4: read_check_append crash windows
# ---------------------------------------------------------------------------

def test_append_crash_after_count_is_idempotent(spark, tmp_path):
    """Crash between the emptiness probe and the write: the lake is
    unchanged, so the retry must append the full fresh set exactly once —
    and a third run must be a no-op."""
    path = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert read_check_append(spark, base, path, keys=["k"]) == 2

    fresh = spark.createDataFrame([(2, "b"), (3, "c")], "k long, v string")
    # the simulated crash wrote nothing; the retry IS this call
    assert read_check_append(spark, fresh, path, keys=["k"]) == 1
    assert read_check_append(spark, fresh, path, keys=["k"]) == 0  # replay: no-op
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [1, 2, 3]


def test_append_crash_mid_write_leftover_temporary_dir(spark, tmp_path):
    """A job that dies mid-write leaves Spark's _temporary staging dir inside
    the lake (committer v1 exposes output files only on commit).  The
    underscore prefix keeps readers blind to it; the retry must dedup-append
    normally and converge to the no-crash contents."""
    path = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    read_check_append(spark, base, path, keys=["k"])

    # fabricate the crash debris: a task attempt that never reached
    # commitTask sits under _temporary/<job>/_temporary/<attempt> — the next
    # job's commit DELETES this subtree (committer v1 promotes only task_*
    # dirs), so the junk must vanish, not surface as lake data
    staging = os.path.join(path, "_temporary", "0", "_temporary", "attempt_000")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not really parquet")

    fresh = spark.createDataFrame([(2, "b")], "k long, v string")
    assert read_check_append(spark, fresh, path, keys=["k"]) == 1
    assert read_check_append(spark, fresh, path, keys=["k"]) == 0
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [1, 2]


# ---------------------------------------------------------------------------
# Bucket-migration crash windows (write-aside + two renames)
# ---------------------------------------------------------------------------

@pytest.fixture()
def legacy_lake(spark, tmp_path):
    """A flat (pre-bucketing) fundamental lake plus derived tables — the
    layout that routes update_fundamentals down the migration path."""
    lk = LakePaths(str(tmp_path / "legacy"))
    day1, day2 = _fund_days(spark)
    normalize_fundamental(day1).write.parquet(lk.fundamental)
    for sub in ("derived/ttm", "derived/metrics"):
        normalize_fundamental(day1).limit(1).write.parquet(f"{lk.root}/{sub}")
    return lk, day1, day2


def _expected(spark, tmp_path, day1, day2):
    """The no-crash result: same migration, no injected failure."""
    ref = LakePaths(str(tmp_path / "ref"))
    normalize_fundamental(day1).write.parquet(ref.fundamental)
    for sub in ("derived/ttm", "derived/metrics"):
        normalize_fundamental(day1).limit(1).write.parquet(f"{ref.root}/{sub}")
    update_fundamentals(spark, ref, day2, incremental=True)
    return {
        sub: _rows_of(spark, f"{ref.root}/{sub}")
        for sub in ("raw/fundamental", "derived/ttm", "derived/metrics")
    }


@pytest.mark.parametrize("window", ["after_tmp_write", "between_renames", "before_cleanup"])
def test_migration_crash_windows_recover(spark, tmp_path, legacy_lake, window):
    lk, day1, day2 = legacy_lake
    base = lk.fundamental.rstrip("/")
    tmp, old = base + ".__migrate_tmp", base + ".__replaced"

    # fabricate the exact state each crash leaves: the migrated copy is just
    # the bucketed rewrite of the flat lake
    migrated = (
        normalize_fundamental(day1)
        .withColumn("sym_bucket", F.pmod(F.hash(F.col("symbol")), F.lit(64)))
    )
    if window == "after_tmp_write":
        migrated.write.partitionBy("sym_bucket").parquet(tmp)
    elif window == "between_renames":
        migrated.write.partitionBy("sym_bucket").parquet(tmp)
        shutil.move(lk.fundamental, old)  # rename #1 happened, #2 did not
    elif window == "before_cleanup":
        migrated.write.partitionBy("sym_bucket").parquet(tmp)
        shutil.move(lk.fundamental, old)
        shutil.move(tmp, lk.fundamental)  # both renames happened, cleanup did not

    r = update_fundamentals(spark, lk, day2, incremental=True)
    assert r["derived_buckets_rebuilt"] == 64  # recovery forces the full rebuild

    exp = _expected(spark, tmp_path, day1, day2)
    for sub in ("raw/fundamental", "derived/ttm", "derived/metrics"):
        assert _rows_of(spark, f"{lk.root}/{sub}") == exp[sub], (window, sub)
    # no debris
    assert not os.path.exists(tmp) and not os.path.exists(old)

    # and the run after recovery is incremental again
    day3 = spark.createDataFrame(_fund_raw_rows("BBB", [(2023, 4)], val=200.0), _FUND_SCHEMA)
    r3 = update_fundamentals(spark, lk, day3, incremental=True)
    assert 0 < r3["derived_buckets_rebuilt"] < 64
