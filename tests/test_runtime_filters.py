"""Runtime-filtering behaviors that matter at 100 TB but are invisible in
row-count tests: dynamic partition pruning (a filtered dimension prunes the
fact table's partitions at runtime) and runtime bloom-filter injection (a
selective join side pre-filters the scan of the big side).  Both are plan
assertions — the point is that OUR query shapes let Catalyst apply them."""

import pytest
from pyspark.sql import Row, functions as F


@pytest.fixture(scope="module")
def partitioned_lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dpp")
    fact = spark.createDataFrame(
        [Row(k=i % 50, year=2020 + (i % 5), v=float(i)) for i in range(5000)]
    )
    fact.write.mode("overwrite").partitionBy("year").parquet(str(root / "fact"))
    dim = spark.createDataFrame(
        [Row(year=2020 + i, name=f"y{i}") for i in range(5)]
    )
    dim.write.mode("overwrite").parquet(str(root / "dim"))
    return root


def test_dynamic_partition_pruning_applies(spark, partitioned_lake):
    """Join the year-partitioned fact against a dim filtered to one year:
    the fact scan must carry a dynamicpruning partition filter, so at scale
    only 1/5 of the partitions are read."""
    fact = spark.read.parquet(str(partitioned_lake / "fact"))
    dim = spark.read.parquet(str(partitioned_lake / "dim")).filter(F.col("name") == "y2")
    joined = fact.join(dim, "year").groupBy("name").agg(F.sum("v").alias("s"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    rows = joined.collect()
    assert len(rows) == 1 and rows[0].name == "y2"


def test_runtime_bloom_filter_injected(spark, partitioned_lake):
    """With the (size) thresholds lowered to test scale, a selective build
    side must inject a bloom filter into the probe-side scan — the runtime
    row-filtering analog of DPP for non-partition keys."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join so the filter pays
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(str(partitioned_lake / "fact"))
        dim = (
            spark.read.parquet(str(partitioned_lake / "dim"))
            .filter(F.col("name") == "y2")
            .select(F.col("year").alias("k2"))
        )
        joined = fact.join(dim, F.col("k") == F.col("k2"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        assert joined.count() == sum(1 for i in range(5000) if i % 50 == 2022)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
