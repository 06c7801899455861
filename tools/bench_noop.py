#!/usr/bin/env python
"""Auxiliary FULL-materialization bench: times every query to a noop-sink
write (``df.write.format("noop")``), which forces computation of every output
column — the stricter denominator bench.py's count() protocol documents
(count() lets Catalyst prune terminal projections a row count does not need).

The headline stays bench.py's count() protocol for cross-round
comparability; this records the delta so the pruning effect is measured,
not guessed.  Results land under BENCH_DETAIL.json ``noop_sink`` with the
per-query ratio vs the count() number from the same file.

Usage: python tools/bench_noop.py [SF_DIR]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from us_equity_datalake_spark.session import get_spark

    spark = get_spark("bench-noop")
    qs = entrymod.queries()

    # warmup (codegen + fs cache), same protocol as bench.py
    for name, fn in qs.items():
        try:
            fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warmup {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

    out: dict[str, float] = {}
    for name, fn in qs.items():
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best < 0 else min(best, dt)
        except Exception as e:
            print(f"{name} failed: {e}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
        out[name] = round(best, 3)

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(detail_path)) if os.path.exists(detail_path) else {}
    count_times = detail.get("queries", {})
    ratios = {
        n: round(t / count_times[n], 2)
        for n, t in out.items()
        if t > 0 and count_times.get(n, 0) > 0
    }
    big = {n: r for n, r in sorted(ratios.items(), key=lambda kv: -kv[1]) if r >= 1.5}
    detail["noop_sink"] = {
        "protocol": "df.write.format('noop') — full materialization of every "
        "output column (the stricter denominator); ratio = noop / count() "
        "from this file's queries map; rows >= 1.5x are where count()-pruning "
        "was skipping terminal projection work",
        "total_sec": round(sum(t for t in out.values() if t > 0), 3),
        "queries": out,
        "ratio_vs_count": ratios,
        "over_1p5x": big,
    }
    json.dump(detail, open(detail_path, "w"), indent=1)
    print(json.dumps({"noop_total": detail["noop_sink"]["total_sec"],
                      "count_total": round(sum(t for t in count_times.values() if t > 0), 3),
                      "n_over_1p5x": len(big),
                      "worst": dict(list(big.items())[:8])}))
    spark.stop()


if __name__ == "__main__":
    main()
