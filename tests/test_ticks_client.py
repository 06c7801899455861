"""Read-side query layer (§3.3 TicksClient, §7.1 signature slice): PIT
resolution across a symbol change, partition pruning on the year predicate,
split adjustment, calendar alignment with null preservation."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from us_equity_datalake_spark.equity import ticks as tk
from us_equity_datalake_spark.sources.lake import write_partitioned

D = dt.date


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """FB→META-style rename: sid 1001 trades as OLD through 2021, as NEW from
    2022; sid 2002 picks up OLD in 2023 (symbol reuse)."""
    path = str(tmp_path_factory.mktemp("ticks_lake") / "daily")
    rows = []
    for sid, y0, y1, base in [(1001, 2021, 2023, 100.0), (2002, 2023, 2023, 500.0)]:
        for y in range(y0, y1 + 1):
            for m in (1, 7):
                rows.append(
                    Row(security_id=sid, timestamp=D(y, m, 4), open=base, close=base + 1.0,
                        volume=1000, cfacpr=2.0, cfacshr=0.5, year=y)
                )
    write_partitioned(spark.createDataFrame(rows), path, partition_by=["year"])

    master = spark.createDataFrame(
        [
            Row(security_id=1001, symbol="OLD", start_date=D(2021, 1, 1), end_date=D(2021, 12, 31)),
            Row(security_id=1001, symbol="NEW", start_date=D(2022, 1, 1), end_date=D(2099, 12, 31)),
            Row(security_id=2002, symbol="OLD", start_date=D(2023, 1, 1), end_date=D(2099, 12, 31)),
        ]
    )
    return spark.read.parquet(path), master


def test_pit_resolution_across_symbol_change(spark, lake):
    ticks_df, master = lake
    # NEW over 2021-2023 → only sid 1001 rows from 2022 onward
    out = tk.read_daily_ticks(
        spark, ticks_df, master, symbol="NEW", start="2021-01-01", end="2023-12-31", adjust=False
    ).collect()
    assert {r.security_id for r in out} == {1001}
    assert min(r.timestamp for r in out) == D(2022, 1, 4)
    # OLD in 2023 → the re-used symbol resolves to sid 2002, not 1001
    out2 = tk.read_daily_ticks(
        spark, ticks_df, master, symbol="OLD", start="2023-01-01", end="2023-12-31", adjust=False
    ).collect()
    assert {r.security_id for r in out2} == {2002}


def test_partition_pruning_on_year(spark, lake):
    ticks_df, master = lake
    df = tk.read_daily_ticks(spark, ticks_df, master, symbol="OLD", start="2021-01-01", end="2021-12-31")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "year" in plan.split("PartitionFilters")[1][:200]  # year bounds reached the scan


def test_split_adjustment_applied(spark, lake):
    ticks_df, master = lake
    r = tk.read_daily_ticks(
        spark, ticks_df, master, symbol="OLD", start="2021-01-01", end="2021-12-31"
    ).collect()[0]
    assert r.open == 50.0 and r.close == 50.5  # /cfacpr 2.0
    assert r.volume == 500  # *cfacshr 0.5
    assert "cfacpr" not in r.asDict()


def test_calendar_alignment_preserves_nulls(spark, lake):
    ticks_df, master = lake
    cal = tk.trading_calendar_spine(spark, "2021-01-01", "2021-01-08")
    out = tk.read_daily_ticks(
        spark, ticks_df, master, symbol="OLD", start="2021-01-01", end="2021-01-08", calendar=cal
    ).collect()
    by_date = {r.timestamp: r.close for r in out}
    assert len(out) == 6  # weekdays only (Jan 1 Fri .. Jan 8 Fri 2021)
    assert by_date[D(2021, 1, 4)] == 50.5  # the traded Monday, split-adjusted
    assert by_date[D(2021, 1, 5)] is None  # aligned weekday with no trade stays null


def test_history_by_resolved_sid(spark, lake):
    ticks_df, master = lake
    # NEW as of 2023 → sid 1001 → full 2021-2023 series including the OLD era
    out = tk.read_daily_history(spark, ticks_df, master, symbol="NEW", as_of="2023-06-01").collect()
    assert {r.security_id for r in out} == {1001}
    assert min(r.timestamp for r in out) == D(2021, 1, 4)
    assert len(out) == 6
