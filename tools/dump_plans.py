#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r12 --suffix before q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from us_equity_datalake_spark.session import get_spark

    import __spark_entry__ as entrymod

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if False else os.path.dirname(os.path.abspath(__file__)) + "/../plans", args.tag)
    outdir = os.path.normpath(outdir)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    qmap = entrymod.queries()
    for name in args.queries:
        df = qmap[name](spark, args.sf)
        out = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as f, redirect_stdout(f):
            df.explain("formatted")
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
