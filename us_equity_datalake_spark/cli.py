"""Console entry points (reference update/cli.py, consolidate/cli.py,
storage/cli.py — the operator-facing surface).

Three subcommands over the library:

    python -m us_equity_datalake_spark.cli update   --lake ... --date ... [inputs]
    python -m us_equity_datalake_spark.cli compact  --lake ... --table ... --predicate ...
    python -m us_equity_datalake_spark.cli backfill --lake ... --from ... --to ... [inputs]

Inputs are parquet paths already landed by the ingest edge (this CLI is pure
compute + lake writes, like equity.daily_job).  Backfill loops
``run_daily_update`` over the date range — each day idempotent, so a crashed
backfill re-runs from the start safely (reference MAX_BACKFILL_DAYS guard
kept).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys

MAX_BACKFILL_DAYS = 30


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="us-equity-datalake-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    upd = sub.add_parser("update", help="run the daily incremental update")
    upd.add_argument("--lake", required=True, help="lake root directory")
    upd.add_argument("--date", help="target date YYYY-MM-DD (default: yesterday)")
    upd.add_argument("--universe", help="parquet path: universe snapshot")
    upd.add_argument("--figi", help="parquet path: (symbol, figi) map for lifecycle rules")
    upd.add_argument("--ticks", help="parquet path: daily ticks batch")
    upd.add_argument("--fundamental", help="parquet path: raw fundamental datapoints")
    upd.add_argument("--filings", help="parquet path: the day's filings")
    upd.add_argument("--filings-feed", help="parquet path: submissions feed for the I2 lookback")
    upd.add_argument("--calendar", help="parquet path: trading calendar (market-open gate)")
    upd.add_argument("--lookback", type=int, default=7, help="filing lookback days (default 7)")

    bf = sub.add_parser("backfill", help="run updates over a date range")
    bf.add_argument("--lake", required=True)
    bf.add_argument("--backfill-from", required=True, dest="start", help="YYYY-MM-DD")
    bf.add_argument("--date", required=True, dest="end", help="YYYY-MM-DD (inclusive end)")
    for flag in ("--universe", "--figi", "--ticks", "--fundamental", "--filings", "--filings-feed", "--calendar"):
        bf.add_argument(flag)
    bf.add_argument("--lookback", type=int, default=7)

    cp = sub.add_parser("compact", help="rewrite partitions into few large files")
    cp.add_argument("--lake", required=True)
    cp.add_argument("--table", required=True, help="table path relative to the lake root")
    cp.add_argument("--predicate", required=True, help="partition predicate, e.g. \"year = 2024\"")
    cp.add_argument("--partition-by", required=True, help="comma-separated partition columns")
    cp.add_argument("--target-files", type=int, default=1)

    cy = sub.add_parser(
        "consolidate", help="move a completed year from hot monthly files into history"
    )
    cy.add_argument("--lake", required=True)
    cy.add_argument("--hot", required=True, help="hot table path relative to the lake root")
    cy.add_argument("--history", required=True, help="history table path relative to the lake root")
    cy.add_argument("--year", required=True, type=int, help="year to consolidate (e.g., 2025)")
    cy.add_argument("--force", action="store_true", help="overwrite a year already in history")

    return p


def backfill_dates(start: str, end: str, *, max_days: int = MAX_BACKFILL_DAYS) -> list[str]:
    """Inclusive date range with the reference's MAX_BACKFILL_DAYS guard."""
    s, e = dt.date.fromisoformat(start), dt.date.fromisoformat(end)
    span = (e - s).days
    if span < 0:
        raise ValueError(f"--backfill-from {start} is after --date {end}")
    if span > max_days:
        raise ValueError(f"backfill range {span} days exceeds max {max_days}")
    return [(s + dt.timedelta(days=i)).isoformat() for i in range(span + 1)]


def _load(spark, path):
    return spark.read.parquet(path) if path else None


def _run_update(spark, args, target_date: str) -> dict:
    from us_equity_datalake_spark.equity.daily_job import LakePaths, run_daily_update

    return run_daily_update(
        spark,
        LakePaths(args.lake),
        target_date=target_date,
        universe_snapshot=_load(spark, args.universe),
        figi_map=_load(spark, args.figi),
        ticks_batch=_load(spark, args.ticks),
        fundamental_raw=_load(spark, args.fundamental),
        filings=_load(spark, args.filings),
        filings_feed=_load(spark, args.filings_feed),
        lookback_days=args.lookback,
        calendar=_load(spark, args.calendar),
    )


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from us_equity_datalake_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    try:
        if args.cmd == "update":
            target = args.date or (dt.date.today() - dt.timedelta(days=1)).isoformat()
            report = _run_update(spark, args, target)
            print(json.dumps(report, default=str))
        elif args.cmd == "backfill":
            try:
                days = backfill_dates(args.start, args.end)
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
            for day in days:
                report = _run_update(spark, args, day)
                print(json.dumps(report, default=str))
        elif args.cmd == "compact":
            import os

            from us_equity_datalake_spark.sources.lake import compact_partition

            compact_partition(
                spark,
                os.path.join(args.lake, args.table),
                partition_by=args.partition_by.split(","),
                predicate=args.predicate,
                target_files=args.target_files,
            )
            print(json.dumps({"compacted": args.table, "predicate": args.predicate}))
        elif args.cmd == "consolidate":
            import os

            from us_equity_datalake_spark.sources.lake import consolidate_year

            try:
                out = consolidate_year(
                    spark,
                    os.path.join(args.lake, args.hot),
                    os.path.join(args.lake, args.history),
                    year=args.year,
                    force=args.force,
                )
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
            print(json.dumps({"year": args.year, **out}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
