"""Incremental job harness: the reference's daily micro-batch pipeline
(I1: cron → run_daily_update) expressed as ``Trigger.AvailableNow`` streaming
jobs — process everything that has arrived, then stop; idempotent by
checkpoint + exactly-once sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_stream(spark: SparkSession, path: str, schema, *, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(schema).load(path)


def run_available_now(
    df: DataFrame,
    *,
    checkpoint: str,
    output_mode: str = "append",
    query_name: str = "job",
    foreach_batch=None,
) -> StreamingQuery:
    """Start an availableNow query; caller awaits termination.  With
    ``foreach_batch`` the sink is a callable (df, epoch_id) — the idempotent
    exactly-once pattern for parquet/partition-overwrite sinks."""
    writer = df.writeStream.outputMode(output_mode).option("checkpointLocation", checkpoint).trigger(
        availableNow=True
    )
    if foreach_batch is not None:
        writer = writer.foreachBatch(foreach_batch)
    else:
        writer = writer.format("memory").queryName(query_name)
    return writer.start()
