"""CLI surface tests (reference update/cli.py, consolidate/cli.py parity) —
parser wiring + the backfill-range guard; the update path itself is covered by
test_daily_job (the CLI is a thin loader around run_daily_update)."""

import pytest

from us_equity_datalake_spark.cli import MAX_BACKFILL_DAYS, _build_parser, backfill_dates


def test_parser_update_flags():
    args = _build_parser().parse_args(
        ["update", "--lake", "/tmp/l", "--date", "2024-06-07",
         "--filings-feed", "/tmp/feed.parquet", "--lookback", "10"]
    )
    assert args.cmd == "update" and args.lake == "/tmp/l"
    assert args.filings_feed == "/tmp/feed.parquet" and args.lookback == 10


def test_parser_compact_flags():
    args = _build_parser().parse_args(
        ["compact", "--lake", "/tmp/l", "--table", "raw/ticks/daily",
         "--predicate", "year = 2024", "--partition-by", "year,month"]
    )
    assert args.cmd == "compact" and args.target_files == 1
    assert args.partition_by == "year,month"


def test_backfill_dates_inclusive_and_guarded():
    days = backfill_dates("2024-06-01", "2024-06-03")
    assert days == ["2024-06-01", "2024-06-02", "2024-06-03"]
    with pytest.raises(ValueError):
        backfill_dates("2024-06-07", "2024-06-01")  # reversed
    with pytest.raises(ValueError):
        backfill_dates("2024-01-01", "2024-12-31")  # > MAX_BACKFILL_DAYS
    assert len(backfill_dates("2024-06-01", "2024-06-01")) == 1
    assert MAX_BACKFILL_DAYS == 30



def test_parser_consolidate_flags():
    args = _build_parser().parse_args(
        ["consolidate", "--lake", "/tmp/l", "--hot", "raw/ticks/daily",
         "--history", "raw/ticks/history", "--year", "2025", "--force"]
    )
    assert args.cmd == "consolidate" and args.year == 2025 and args.force
    args = _build_parser().parse_args(
        ["consolidate", "--lake", "/tmp/l", "--hot", "h", "--history", "hist", "--year", "2024"]
    )
    assert not args.force
