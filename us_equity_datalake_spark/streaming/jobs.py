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


def partition_overwrite_sink(path: str, *, partition_by: list[str]):
    """foreachBatch sink implementing I3 (update/app.py:296-445: total refetch
    of the hot slice, overwrite the partition — "no merge logic"): each
    micro-batch dynamically overwrites exactly the partitions it carries.
    Replays of a micro-batch rewrite the same partitions with the same rows —
    idempotent, so checkpoint + this sink gives effective exactly-once."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            batch_df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return sink
