"""Plan-shape regression pins for the round-6 additions: properties that were
verified by hand in PLANS.md become assertions, so a refactor that silently
doubles a scan, drops a pushed filter, or de-broadcasts a dimension fails
here instead of surfacing as a 2x wall regression three rounds later."""

import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _plan(spark, name):
    from us_equity_datalake_spark.plans import all_queries

    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _count(plan, node):
    return len(re.findall(rf"^\(\d+\) {node}", plan, re.M))


def test_theta_set_report_scans_each_slice_once_per_purpose(spark):
    # 2 sketch passes + 2 exact-count passes; the old separate-theta shape
    # re-executed the distinct+rank chain (6 scans) — pinned at 4
    plan = _plan(spark, "theta_set_report")
    assert _count(plan, "Scan parquet") == 4, "theta sketch re-scans a slice"
    # the NLJs are one-row stat broadcasts, never data-sized sides
    assert _count(plan, "BroadcastNestedLoopJoin") <= 3


def test_orc_roundtrip_pushes_predicate_to_orc_scan(spark):
    plan = _plan(spark, "orc_roundtrip_report")
    m = re.search(r"Scan orc.*?PushedFilters: \[([^\]]*)\]", plan, re.S)
    assert m and "GreaterThanOrEqual(l_shipdate" in m.group(1), plan[:500]


def test_pagerank_rounds_join_shape(spark):
    # 3 rounds: every rank->edge and degree join is a broadcast hash join at
    # this scale (rank/degree frames are node-sized); no SMJ explosion, no
    # cartesian anywhere
    plan = _plan(spark, "graph_pagerank_report")
    assert _count(plan, "BroadcastNestedLoopJoin") == 0
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "BroadcastHashJoin") >= 6


def test_incremental_dedup_hashes_only_the_delta(spark):
    # exactly ONE Arrow kernel (the delta signatures); the lake side must
    # enter via the signature-store parquet, never a second kernel pass
    plan = _plan(spark, "doc_incremental_dedup_report")
    n_kernels = _count(plan, "MapInPandas")
    assert n_kernels == 1, f"expected 1 delta kernel, saw {n_kernels}"


def test_dq_drift_monitor_two_exchanges(spark):
    # daily agg + the single-partition 30-row control window; anything more
    # means the window stopped being dimension-sized
    plan = _plan(spark, "dq_drift_monitor")
    assert _count(plan, "Exchange") <= 2
    assert _count(plan, "Scan parquet") == 1
