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


def test_foreach_batch_partition_overwrite_idempotent(spark, tmp_path):
    """I3 streaming form: micro-batches overwrite their month partitions;
    re-running the whole stream from a fresh checkpoint yields an identical
    table (idempotence), and a corrected re-land replaces only its partition."""
    from us_equity_datalake_spark.streaming.jobs import partition_overwrite_sink

    src = str(tmp_path / "src")
    sink_path = str(tmp_path / "lake")
    schema = T.StructType([
        T.StructField("security_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("month", T.IntegerType()),
    ])
    base = dt.datetime(2024, 1, 15)
    rows1 = [Row(security_id=1, ts=base, close=10.0, month=1),
             Row(security_id=1, ts=base + dt.timedelta(days=31), close=11.0, month=2)]
    spark.createDataFrame(rows1, schema).write.parquet(src)

    def run(ck):
        stream = read_stream(spark, src, schema)
        q = run_available_now(stream, checkpoint=str(tmp_path / ck),
                              foreach_batch=partition_overwrite_sink(sink_path, partition_by=["month"]))
        q.awaitTermination(120)

    run("ck1")
    first = sorted(tuple(r) for r in spark.read.parquet(sink_path).select("security_id", "close", "month").collect())
    run("ck2")  # full replay from scratch -> identical table
    assert sorted(tuple(r) for r in spark.read.parquet(sink_path).select("security_id", "close", "month").collect()) == first

    # corrected re-land of month 2 only: month 1 untouched, month 2 replaced
    spark.createDataFrame([Row(security_id=1, ts=base + dt.timedelta(days=32), close=99.0, month=2)], schema) \
        .write.mode("append").parquet(src)
    run("ck3")
    out = spark.read.parquet(sink_path)
    assert out.filter("month = 1").collect()[0].close == 10.0
    assert {r.close for r in out.filter("month = 2").collect()} == {11.0, 99.0} or \
           {r.close for r in out.filter("month = 2").collect()} == {99.0}


def test_stream_static_pit_enrichment(spark, event_dir, tmp_path):
    """Stream-static join: a micro-batch event stream enriched against the
    (static, broadcastable) security-master dimension with PIT interval
    predicates — the streaming form of J1.  Streaming result must equal the
    batch join on the same data."""
    from pyspark.sql.functions import broadcast

    dim = spark.createDataFrame(
        [
            # user_id doubles as the entity key; validity windows split the tape
            Row(user_id=0, security_id=1001,
                start_ts=dt.datetime(2024, 1, 1, 0, 0), end_ts=dt.datetime(2024, 1, 1, 2, 0)),
            Row(user_id=0, security_id=2001,
                start_ts=dt.datetime(2024, 1, 1, 2, 0), end_ts=dt.datetime(2024, 1, 2, 0, 0)),
            Row(user_id=1, security_id=1002,
                start_ts=dt.datetime(2024, 1, 1, 0, 0), end_ts=dt.datetime(2024, 1, 2, 0, 0)),
        ]
    )

    def enrich(df):
        d = broadcast(dim)
        return df.join(
            d,
            (df.user_id == d.user_id) & (df.ts >= d.start_ts) & (df.ts < d.end_ts),
            "left",
        ).select(df.event_id, df.ts, df.user_id, d.security_id)

    stream = read_stream(spark, event_dir, SCHEMA)
    got = _run_to_memory(spark, enrich(stream), "pit_out", str(tmp_path / "ck_pit")).collect()
    want = enrich(spark.read.schema(SCHEMA).parquet(event_dir)).collect()
    key = lambda r: (r.event_id,)
    assert sorted(got, key=key) == sorted(want, key=key)
    # user 0's events straddle the 02:00 boundary -> both ids must appear
    ids = {r.security_id for r in got if r.user_id == 0}
    assert ids == {1001, 2001}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (view->click attribution within 30 min)
    over availableNow must produce exactly the batch inequality-join rows."""
    from us_equity_datalake_spark.streaming.windows import stream_stream_interval_join

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    views = [Row(event_id=i, ts=base + dt.timedelta(minutes=10 * i), user_id=i % 3,
                 event_type="view", value=float(i)) for i in range(12)]
    clicks_schema = T.StructType([
        T.StructField("click_id", T.LongType()),
        T.StructField("ts_r", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ])
    clicks = [Row(click_id=100 + i, ts_r=base + dt.timedelta(minutes=10 * i + 5), user_id=(i + 1) % 3)
              for i in range(12)]
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, SCHEMA).write.parquet(vdir)
    spark.createDataFrame(clicks, clicks_schema).write.parquet(cdir)

    vstream = read_stream(spark, vdir, SCHEMA).select("user_id", "ts")
    cstream = read_stream(spark, cdir, clicks_schema)
    joined = stream_stream_interval_join(vstream, cstream)
    got = _run_to_memory(spark, joined, "ss_join_out", str(tmp_path / "ck_ss"))

    vb = spark.read.parquet(vdir).select("user_id", "ts")
    cb = spark.read.parquet(cdir)
    expect = vb.join(
        cb,
        (vb.user_id == cb.user_id)
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 30 minutes")),
    ).select(vb.user_id, "ts", "ts_r")

    g = sorted((r.user_id, str(r.ts), str(r.ts_r)) for r in got.collect())
    e = sorted((r.user_id, str(r.ts), str(r.ts_r)) for r in expect.collect())
    assert g == e and len(g) > 0
