"""Structured Streaming equivalence tests: the streaming window operators
must agree with their batch forms on the same data (availableNow + memory
sink drives a bounded stream to completion synchronously)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from us_equity_datalake_spark.streaming.jobs import read_stream, run_available_now
from us_equity_datalake_spark.streaming.windows import session_counts, streaming_dedup, tumbling_counts

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_src") / "data")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=i, ts=base + dt.timedelta(minutes=7 * i), user_id=i % 3,
            event_type=["view", "click"][i % 2], value=float(i))
        for i in range(40)
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(path)
    return path


def _run_to_memory(spark, df, name, checkpoint, output_mode="append"):
    q = run_available_now(df, checkpoint=checkpoint, output_mode=output_mode, query_name=name)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark, event_dir, tmp_path):
    stream = read_stream(spark, event_dir, SCHEMA)
    out = _run_to_memory(
        spark, tumbling_counts(stream), "tumble_out", str(tmp_path / "ck1"), output_mode="complete"
    ).collect()
    batch = (
        spark.read.schema(SCHEMA).parquet(event_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .collect()
    )
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch))


def test_streaming_sessions_match_batch_gaps(spark, event_dir, tmp_path):
    stream = read_stream(spark, event_dir, SCHEMA)
    out = _run_to_memory(spark, session_counts(stream, gap="30 minutes"), "sess_out", str(tmp_path / "ck2"), output_mode="complete").collect()
    # events are 7-minute spaced per stream but 21-minute spaced per user (3 users):
    # gap 30min -> one session per user containing all its events
    per_user = {r["user_id"]: r["n_events"] for r in out}
    assert per_user == {0: 14, 1: 13, 2: 13}


def test_streaming_dedup_drops_repeated_keys(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    rows = [Row(accession_number=f"a{i % 3}", value=float(i)) for i in range(9)]
    schema = T.StructType([
        T.StructField("accession_number", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = read_stream(spark, src, schema)
    out = _run_to_memory(
        spark, streaming_dedup(stream, keys=["accession_number"]), "dedup_out", str(tmp_path / "ck3")
    ).collect()
    assert sorted(r["accession_number"] for r in out) == ["a0", "a1", "a2"]
