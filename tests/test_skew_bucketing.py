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
