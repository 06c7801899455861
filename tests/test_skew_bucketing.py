"""Skew/co-location tools: salted aggregation and join must be result-
identical to their plain forms; bucketed tables must join with no Exchange."""

import pytest
from pyspark.sql import Row, functions as F

from us_equity_datalake_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (0) with 5k rows, a long tail of singletons
    rows = [Row(k=0, v=float(i % 7)) for i in range(5000)] + [
        Row(k=i, v=float(i)) for i in range(1, 200)
    ]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in skew.salted_agg(
            skewed, keys=["k"], aggs={"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="algebraic"):
        skew.salted_agg(skewed, keys=["k"], aggs={"a": ("avg", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(0, 50)])
    plain = sorted((r.k, r.v, r.name) for r in skewed.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in skew.salted_join(skewed, dim, on="k", n_salts=8).collect())
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.createDataFrame([Row(k=i, a=float(i)) for i in range(1000)])
    right = spark.createDataFrame([Row(k=i, b=float(2 * i)) for i in range(1000)])
    skew.write_bucketed(left, table="t_bkt_l", path=str(tmp_path / "l"), buckets=4, bucket_cols=["k"], sort_cols=["k"])
    skew.write_bucketed(right, table="t_bkt_r", path=str(tmp_path / "r"), buckets=4, bucket_cols=["k"], sort_cols=["k"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_bkt_l").join(spark.table("t_bkt_r"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located: zero shuffle
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
        spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the runtime half of the skew toolkit: with
    the skew thresholds lowered to test scale, a hot-key join must show
    skew-split partitions in the final adaptive plan (the salted operators
    exist for the shapes AQE can't see; this pins that AQE itself is active
    for the ones it can)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 60000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            # incompressible payload: shuffle blocks are LZ4'd, and a
            # repetitive pad would compress below the skew threshold
            F.concat(
                *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"s{i}")), 256) for i in range(4)]
            ).alias("payload"),
        )
        # plain projection on the right: OptimizeSkewedJoin only fires when
        # BOTH join children are direct shuffle reads — an aggregate between
        # the shuffle and the join disqualifies the pattern
        right = spark.range(0, 60000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("r"))
        joined = big.join(right, "k")
        # collect() executes THIS DataFrame's own queryExecution (count()
        # would wrap it in a new plan and leave this one isFinalPlan=false)
        n = len(joined.collect())
        assert n == 60000  # every big row keeps exactly one match
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
