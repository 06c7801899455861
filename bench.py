#!/usr/bin/env python
"""Headline benchmark: runs the engine's query inventory at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE COMPACT JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {<slowest 10>}, "n_queries": N, "sf": 0.1,
   "detail": "BENCH_DETAIL.json"}

The driver's stdout capture truncates long lines (BENCH_r1/r2 recorded
``parsed: null`` against the full 104-entry map), so the final line carries
only the total + the 10 slowest queries; the FULL per-query map is written to
``BENCH_DETAIL.json`` next to this script.

A priming pass excludes JVM/codegen warmup from the numbers (BASELINE.md).
Each query is timed to a NOOP-SINK write (``df.write.format("noop")``),
best-of-N — full materialization of every output row and column, so nothing
Catalyst can prune out of the timed plan (the round-6 headline protocol,
VERDICT r5 #2: count() let Catalyst skip terminal projections a row count
does not need — measured 102.3 s noop vs 70.0 s count at r5, 36 queries
>= 1.5x).  The DuckDB oracle denominator fetches full rows, so both sides
of every ratio now pay the same materialization.  Set
``SPARK_GRAFT_BENCH_ACTION=count`` for the r1-r5 count() protocol
(cross-round comparisons; tools/bench_noop.py records the delta).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO_DIR = os.path.dirname(os.path.abspath(__file__))
ACTION = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "noop")


def _materialize(df) -> None:
    """The timed action.  ``noop`` (default): full materialization through
    the noop sink — every output column computed, nothing pruned, matching
    what the correctness gate always pays.  ``count``: the r1-r5 legacy
    protocol (Catalyst prunes unreferenced terminal projections)."""
    if ACTION == "count":
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()


def _warmup_dirs() -> list[str]:
    """Warmup scale-factor dirs derived from SF_DIR's parent (never hardcoded
    absolute paths: on any other layout a silent isdir-skip would cost the
    HOF/md5-heavy queries a 5-30x cold-JVM penalty with no signal)."""
    parent = os.path.dirname(SF_DIR.rstrip("/"))
    dirs = []
    for sf_name in ("sf0.001", "sf0.01"):
        d = os.path.join(parent, sf_name)
        if os.path.isdir(d) and os.path.abspath(d) != os.path.abspath(SF_DIR.rstrip("/")):
            dirs.append(d)
        else:
            print(f"bench: warmup dir {d} missing/==SF_DIR, skipping", file=sys.stderr)
    return dirs


def main() -> None:
    import __spark_entry__ as entrymod
    from us_equity_datalake_spark.session import get_spark

    spark = get_spark("bench")
    # Warm up: JVM, codegen, parquet footer caches.  The HOF/array/md5-heavy
    # text+vector queries additionally need their interpreted-expression and
    # generated-code paths C2-compiled — cold, the SAME query runs 5-20x
    # slower purely on JVM warmup (measured), which BASELINE.md's protocol
    # excludes.  Two passes: every HOF/md5-heavy shape once at the smallest
    # sf (codegen compile), then ONLY the heaviest dedup/ANN pipelines again
    # at the next sf for enough row volume to cross C2 compile thresholds.
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    warm_prefixes = (
        "doc_", "emb_", "near_dup", "multimodal", "source_mixture", "filing_",
        "decontaminate", "boilerplate", "token_length",
    )
    heavy = (
        "doc_minhash_lsh_pairs", "doc_ngram_jaccard_pairs", "doc_simhash_pairs",
        "doc_exact_dedup", "doc_winnow_fingerprints", "doc_rep_2gram_fraction",
        "emb_near_dup_pairs", "near_dup_components", "emb_lsh_topk",
    )
    warm = _warmup_dirs()
    passes = [(warm[0], None)] if warm else []
    if len(warm) > 1:
        passes.append((warm[1], heavy))
    for warm_dir, only in passes:
        for name, fn in entrymod.queries().items():
            if name.startswith(warm_prefixes) and (only is None or name in only):
                try:
                    _materialize(fn(spark, warm_dir))
                except Exception:
                    pass
        spark.catalog.clearCache()

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # Best-of-N per query (default 2): BASELINE.md defines the gate as warm-JVM
    # wall clock with codegen warmup excluded — run 1 pays the per-query codegen
    # compile, the min is the steady-state number a resident engine would see.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(entrymod.queries().items()):
        best = -1.0
        try:
            for _ in range(max(1, runs)):
                t0 = time.time()
                _materialize(fn(spark, SF_DIR))
                dt = time.time() - t0
                best = dt if best < 0 else min(best, dt)
        except Exception as e:  # a failing query gets a sentinel, not a crash
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            best = -1.0
        timings[name] = round(best, 3)
        # drop any caches a query materialized so suite state never leaks into
        # the next query's timing (isolated == suite numbers)
        spark.catalog.clearCache()
        # flush dirty pages OUTSIDE the timed window: the write-path queries
        # (lake round-trips, bucketed tables, incremental maintenance) leave
        # hundreds of MB of dirty page cache behind, and the kernel's
        # writeback then taxes whatever query runs next — measured 0.25 s
        # isolated vs 5 s in-suite for the read-only query that followed the
        # two big writers after the r4 window rotation put them adjacent.
        try:
            os.sync()
        except Exception:
            pass
        if (i + 1) % 10 == 0:
            # 100+ sequential plans in one JVM accumulate codegen-cache and
            # old-gen pressure that taxes later queries ~2.5x vs isolated
            # (VERDICT r2 measured 3.9s in-suite vs 1.6s isolated); a periodic
            # full GC between query families keeps suite ~= isolated.
            try:
                spark._jvm.System.gc()
            except Exception:
                pass

    # ------------------------------------------------------------------
    # Environment-outlier re-measurement (VERDICT r4 #2): the driver's bench
    # run shares the host with whatever else the harness does, and BENCH_r04
    # measured the SAME head inflated 85.5 -> 107.3 s purely on host
    # conditions (one query 10 -> 24 s, sub-second rows 4-6x).  Every query
    # whose in-suite best exceeds 2x its committed clean-run reference
    # (BENCH_CLEAN.json, refreshed whenever plans change) is re-measured
    # ISOLATED — sync + full GC first, best-of-3 — and the final number is
    # the min of in-suite and isolated.  Both numbers are emitted so the
    # delta is attributable: a real regression reproduces isolated; host
    # noise does not.
    # ------------------------------------------------------------------
    clean_ref: dict[str, float] = {}
    clean_path = os.path.join(REPO_DIR, "BENCH_CLEAN.json")
    if os.path.exists(clean_path):
        try:
            ref_doc = json.load(open(clean_path))
            # refs are sf- AND protocol-specific (noop materializes ~45% more
            # work than count(); comparing across protocols would flag
            # phantom outliers)
            if ref_doc.get("sf") == sf and ref_doc.get("action", "count") == ACTION:
                clean_ref = ref_doc.get("queries", {})
        except Exception:
            clean_ref = {}
    insuite = dict(timings)
    env_outliers: dict[str, dict] = {}
    qmap = entrymod.queries()
    for name, t in list(timings.items()):
        ref = clean_ref.get(name, -1.0)
        if t <= 0 or ref <= 0 or t <= 2.0 * ref or (t - ref) < 0.2:
            continue
        try:
            os.sync()
        except Exception:
            pass
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        best = t
        try:
            for _ in range(3):
                t0 = time.time()
                _materialize(qmap[name](spark, SF_DIR))
                best = min(best, time.time() - t0)
        except Exception as e:
            print(f"bench: isolated re-measure {name} failed: {e}", file=sys.stderr)
        finally:
            # always clear — a partially-run query's cache must not leak into
            # the next outlier's isolated measurement
            spark.catalog.clearCache()
        env_outliers[name] = {
            "insuite": round(t, 3),
            "isolated": round(best, 3),
            "clean_ref": ref,
        }
        timings[name] = round(best, 3)

    total = sum(t for t in timings.values() if t > 0)

    # ------------------------------------------------------------------
    # Oracle denominator: time each query's DuckDB oracle_sql on the SAME
    # parquet, single-threaded AND at $SPARK_GRAFT_CPUS threads.  BASELINE.md
    # carries no reference compute numbers, so the "within 2x" gate is graded
    # against the multi-threaded DuckDB wall time (ratio_vs_oracle_mt = spark
    # best / duckdb-mt best).  DuckDB fetches all rows (its execution model);
    # Spark is timed to full noop-sink materialization — both sides of the
    # ratio pay the whole answer (protocol aligned in r6).
    # ------------------------------------------------------------------
    oracle_1t: dict[str, float] = {}
    oracle_mt: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0":
        import duckdb

        oracles = entrymod.oracle_sql()
        tables = ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]
        mt_threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        for label, threads, store, nruns in (
            ("1t", 1, oracle_1t, 1),
            ("mt", mt_threads, oracle_mt, max(1, runs)),
        ):
            con = duckdb.connect()
            con.execute(f"SET threads TO {threads}")
            for t in tables:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
                )
            for name in timings:
                sql = oracles.get(name)
                if sql is None:
                    continue
                best = -1.0
                try:
                    for _ in range(nruns):
                        t0 = time.time()
                        con.execute(sql).fetchall()
                        dt = time.time() - t0
                        best = dt if best < 0 else min(best, dt)
                except Exception as e:
                    print(f"bench: oracle[{label}] {name} failed: {e}", file=sys.stderr)
                    best = -1.0
                store[name] = round(best, 3)
            con.close()

    ratios = {}
    for name, t in timings.items():
        om = oracle_mt.get(name, -1.0)
        ratios[name] = round(t / om, 2) if (t > 0 and om > 0) else None
    real_ratios = [r for r in ratios.values() if r]
    geomean = (
        round(math.exp(sum(math.log(r) for r in real_ratios) / len(real_ratios)), 2)
        if real_ratios
        else None
    )
    n_over_2x = sum(1 for r in real_ratios if r > 2.0)

    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t > 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    detail_path = os.path.join(REPO_DIR, "BENCH_DETAIL.json")
    detail = {
        "metric": "query_inventory_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_insuite": insuite,
        "env_outliers": env_outliers,
        "oracle_sec_1t": oracle_1t,
        "oracle_sec_mt": oracle_mt,
        "ratio_vs_oracle_mt": ratios,
        "sf": sf,
        "runs": runs,
        "action": ACTION,
    }
    if os.path.exists(detail_path):
        try:  # preserve sections other runs wrote (e.g. the sf1 scale smoke)
            prev = json.load(open(detail_path))
            for k, v in prev.items():
                if k not in detail:
                    detail[k] = v
        except Exception:
            pass
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "query_inventory_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "n_env_outliers": len(env_outliers),
                "env_outliers": {
                    n: v["isolated"] for n, v in sorted(
                        env_outliers.items(),
                        key=lambda kv: kv[1]["insuite"] - kv[1]["isolated"],
                        reverse=True,
                    )[:5]
                },
                "action": ACTION,
                "geomean_ratio_vs_oracle_mt": geomean,
                "n_over_2x_oracle_mt": n_over_2x,
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
