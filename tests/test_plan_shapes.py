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


def test_transition_feed_dv_reads_only_vectored_files(spark, tmp_path):
    """The O(Δ) dispatch contract, pinned at the plan level: a delete_dv
    transition's feed must scan ONLY the newly-vectored files — an untouched
    carried-over file appearing in the scan means the fast path silently
    regressed to an O(table) read."""
    from pyspark.sql import functions as F

    from us_equity_datalake_spark.sources import snapshots

    path = str(tmp_path / "t")
    # file A: ids 0..9 (commit 1); file B: ids 100..109 (commit 2)
    snapshots.commit(spark.range(0, 10).coalesce(1), path)
    snapshots.commit(spark.range(100, 110).coalesce(1), path)
    snapshots.delete_where_dv(spark, path, F.col("id") == 105)  # vectors file B only
    feed, mode = snapshots._transition_feed(spark, path, 2, key="id", cols=[])
    assert mode == "dv"
    plan = feed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m2 = snapshots.read_manifest(path, 2)
    m3 = snapshots.read_manifest(path, 3)
    (file_b,) = [f for f in m3["dv"]]
    (file_a,) = [f for f in m2["files"] if f != file_b]
    assert os.path.basename(file_b) in plan
    assert os.path.basename(file_a) not in plan
    assert [r["id"] for r in feed.collect()] == [105]
