"""SparkSession factory tuned for the local[32] test harness while keeping
settings that carry to a real cluster (AQE, adaptive skew join, Arrow).

Scale notes: everything here except master/driver-memory is what we would set
on a 1000-executor cluster too.  ``spark.sql.shuffle.partitions`` is sized for
local runs; on a cluster AQE coalescing makes the initial number mostly
irrelevant as long as it is an upper bound.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — coalesce post-shuffle partitions, convert
    # sort-merge to broadcast when runtime stats allow, split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas interchange / pandas UDFs (the sanctioned Python path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: reference semantics are null-propagating (x/0 -> null).
    "spark.sql.ansi.enabled": "false",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "quantlake-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32);
    shuffle partitions default to the same so a local shuffle neither
    over- nor under-parallelizes.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
