#!/usr/bin/env python
"""Physical-plan audit: for every registered query, summarize the properties
that matter at 100 TB — parquet filter pushdown, column pruning (ReadSchema),
join strategies, exchange (shuffle) count, whole-stage-codegen coverage.

Usage: python tools/explain_audit.py [sf_dir] [query ...] [--full]
       (--full prints the formatted plan instead of the summary line)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
args = [a for a in sys.argv[1:] if a != "--full"]
FULL = "--full" in sys.argv
if args and os.path.isdir(args[0]):
    SF_DIR = args.pop(0)
ONLY = set(args)


def summarize(plan: str) -> dict:
    # count ONLY the numbered detail blocks — formatted explain prints every
    # node twice (tree + "(n) NodeName" detail), so raw substring counts
    # double every node while PushedFilters/ReadSchema print once per scan
    nodes = re.findall(r"^\(\d+\) ([A-Za-z][A-Za-z ]*)", plan, re.M)
    n = lambda name: sum(1 for x in nodes if x.startswith(name))  # noqa: E731
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": n("Scan parquet"),
        "pushed": sum(1 for p in pushed if p.strip()),
        "max_read_cols": max((len(s.split(",")) for s in schemas if s), default=0),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        # shuffle exchanges only; BroadcastExchange tracked via the join counts
        "exchanges": n("Exchange"),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pyeval": n("BatchEvalPython") + n("ArrowEvalPython") + n("MapInPandas") + n("FlatMapGroupsInPandas"),
    }


def main() -> None:
    from us_equity_datalake_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("explain-audit")
    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        if FULL:
            print(f"{'=' * 70}\n{name}\n{'=' * 70}\n{plan}")
            continue
        s = summarize(plan)
        flags = []
        if s["bnlj"]:
            flags.append("NESTED-LOOP")
        if s["smj"] and not s["bhj"]:
            flags.append("SMJ-only")
        if s["scans"] and not s["pushed"] and "documents" not in plan and "embeddings" not in plan:
            flags.append("no-pushdown")
        rows.append((name, s, " ".join(flags)))
    if not FULL:
        print(f"{'query':<34} scans push cols bhj smj nlj exch cg py flags")
        for name, s, flags in rows:
            print(
                f"{name:<34} {s['scans']:>5} {s['pushed']:>4} {s['max_read_cols']:>4} "
                f"{s['bhj']:>3} {s['smj']:>3} {s['bnlj']:>3} {s['exchanges']:>4} "
                f"{s['codegen']:>2} {s['pyeval']:>2} {flags}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
