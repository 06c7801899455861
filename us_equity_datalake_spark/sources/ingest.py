"""Ingest-edge connectors (SURVEY.md §2.1 S4–S9, S12; §2.13 rate limiting /
retry).  Everything network-shaped takes an injectable ``fetch`` callable so
the connectors are unit-testable offline and swappable for real clients
(WRDS JDBC, Alpaca REST, SEC EDGAR, Nasdaq FTP) in production.

Spark-first design: fetching happens at the EDGE — either driver-side (small
snapshot/dimension fetches, reference S7/S8) or distributed via
``mapInPandas`` fan-out over a key table (bulk per-symbol ingest, reference's
50-thread pools, handlers/fundamental.py:71-88) — and lands immediately in a
DataFrame with an explicit schema (§1.3: never infer for lake tables).  Rate
limiting survives only at this edge (token bucket per task/driver); Spark
task retries cover compute, HTTP retries stay here.

Reference anchors: crsp_ticks.py:141-172 (SQL source), alpaca_ticks.py:418-596
(paginated REST), fundamental.py:123-187 (JSON doc REST), universe/current.py:
91-177 (FTP pipe-delimited), collection/sentiment.py:120-150 (full text),
pipeline/validation.py:84-216 (existence probe), storage/utils/
rate_limiter.py:12-49 (token bucket), utils/wrds.py:8-53 (retry).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from us_equity_datalake_spark.sources.registry import local_frame

# ---------------------------------------------------------------------------
# §2.13 — token-bucket rate limiter + retry with exponential backoff
# ---------------------------------------------------------------------------


class TokenBucket:
    """Token bucket (rate_limiter.py:12-49): ``acquire()`` blocks until a
    token is available.  One instance per process — driver-side for snapshot
    fetches, per-executor (module-level singleton) inside mapInPandas ingest."""

    def __init__(self, rate: float, capacity: int | None = None, clock=time.monotonic, sleep=time.sleep):
        self.rate = float(rate)
        self.capacity = float(capacity if capacity is not None else max(1, int(rate)))
        self.tokens = self.capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()

    def _refill(self) -> None:
        now = self._clock()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, n: float = 1.0) -> None:
        self._refill()
        while self.tokens < n:
            self._sleep((n - self.tokens) / self.rate)
            self._refill()
        self.tokens -= n


def retry_with_backoff(
    fn: Callable[[], Any],
    *,
    retries: int = 3,
    base_delay: float = 0.5,
    backoff: float = 2.0,
    retriable: tuple[type[BaseException], ...] = (Exception,),
    sleep=time.sleep,
) -> Any:
    """Exponential backoff around a fetch (utils/wrds.py:8-53,
    fundamental.py:131-148).  Re-raises the last error after ``retries``."""
    delay = base_delay
    for attempt in range(retries + 1):
        try:
            return fn()
        except retriable:
            if attempt == retries:
                raise
            sleep(delay)
            delay *= backoff


# ---------------------------------------------------------------------------
# S4 — JDBC (WRDS Postgres analog): predicate-pushing reader configuration
# ---------------------------------------------------------------------------


def jdbc_options(
    url: str,
    query: str,
    *,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Options for ``spark.read.format('jdbc')`` replacing the reference's
    hand-built SQL strings (crsp_ticks.py:141-172): the WHERE clauses the
    reference interpolates become Catalyst-pushed filters on ``query``, and
    the 200-symbol chunking (crsp_ticks.py:413-415) becomes JDBC partition
    bounds — parallel range reads instead of a driver loop."""
    opts = {"url": url, "query": query, "fetchsize": str(fetch_size)}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column requires lower_bound/upper_bound/num_partitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


# ---------------------------------------------------------------------------
# S5 — paginated REST (Alpaca bars analog)
# ---------------------------------------------------------------------------


def fetch_paginated(
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    *,
    limiter: TokenBucket | None = None,
    max_pages: int = 10_000,
) -> Iterator[dict]:
    """Drain a next-page-token API (alpaca_ticks.py:418-468): yields records
    across pages, honoring the rate limiter per request."""
    token: str | None = None
    for _ in range(max_pages):
        if limiter is not None:
            limiter.acquire()
        records, token = fetch_page(token)
        yield from records
        if token is None:
            return
    raise RuntimeError(f"pagination did not terminate within {max_pages} pages")


def rows_to_df(spark: SparkSession, rows: list[dict], schema: T.StructType) -> DataFrame:
    """Land driver-fetched records with an explicit schema (S5/S7 pattern:
    small snapshot fetches → broadcast dimensions)."""
    return local_frame(spark, rows, schema=schema)


def fanout_fetch(
    keys_df: DataFrame,
    fetch_for_key: Callable[[Any], list[dict]],
    out_schema: T.StructType,
    *,
    key_col: str = "key",
    rate: float | None = None,
) -> DataFrame:
    """Distributed per-key ingest: replaces the reference's 50-worker thread
    pools (handlers/fundamental.py:71-88, update/app.py:424-439) with a
    ``mapInPandas`` fan-out — each task drains its slice of the key table,
    calling ``fetch_for_key`` (network/IO) per key with a PER-EXECUTOR token
    bucket so an N-executor cluster stays under N×rate aggregate.

    Repartition ``keys_df`` to control fetch parallelism; results carry the
    key column plus ``out_schema`` fields.
    """
    import pandas as pd

    fields = [T.StructField(key_col, keys_df.schema[key_col].dataType)] + list(out_schema.fields)
    schema = T.StructType(fields)
    colnames = [f.name for f in schema.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        limiter = _executor_bucket(rate) if rate else None
        for pdf in batches:
            out: list[dict] = []
            for key in pdf[key_col].tolist():
                if limiter is not None:
                    limiter.acquire()
                for rec in fetch_for_key(key):
                    out.append({key_col: key, **rec})
            yield pd.DataFrame(out, columns=colnames) if out else pd.DataFrame(columns=colnames)

    return keys_df.select(key_col).mapInPandas(run, schema)


_EXECUTOR_BUCKETS: dict[float, TokenBucket] = {}


def _executor_bucket(rate: float) -> TokenBucket:
    bucket = _EXECUTOR_BUCKETS.get(rate)
    if bucket is None:
        bucket = _EXECUTOR_BUCKETS.setdefault(rate, TokenBucket(rate))
    return bucket


# ---------------------------------------------------------------------------
# S6 / §1.3 — semi-structured JSON document normalization (SEC companyfacts)
# ---------------------------------------------------------------------------

# facts[taxonomy][tag]['units'][unit] -> [datapoint...] (fundamental.py:81-118)
_DATAPOINT = T.StructType(
    [
        T.StructField("end", T.StringType()),
        T.StructField("start", T.StringType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("accn", T.StringType()),
        T.StructField("fy", T.LongType()),
        T.StructField("fp", T.StringType()),
        T.StructField("form", T.StringType()),
        T.StructField("filed", T.StringType()),
        T.StructField("frame", T.StringType()),
    ]
)
COMPANYFACTS_SCHEMA = T.StructType(
    [
        T.StructField("cik", T.LongType()),
        T.StructField(
            "facts",
            T.MapType(  # taxonomy -> tag -> {units: unit -> [datapoint]}
                T.StringType(),
                T.MapType(
                    T.StringType(),
                    T.StructType(
                        [
                            T.StructField("label", T.StringType()),
                            T.StructField("units", T.MapType(T.StringType(), T.ArrayType(_DATAPOINT))),
                        ]
                    ),
                ),
            ),
        ),
    ]
)

UNIT_PRIORITY = ["USD", "shares"]  # fundamental.py:418-426: USD > shares > first


def normalize_companyfacts(docs: DataFrame, *, json_col: str = "json") -> DataFrame:
    """EDGAR companyfacts JSON → long fundamental rows, entirely JVM-side:
    permissive ``from_json`` + three ``explode``s over the nested maps
    (§1.3's one semi-structured source).  Unit selection = min by priority
    rank per (cik, taxonomy, tag) — USD > shares > first alphabetical.

    Output: (cik, taxonomy, tag, unit, end, start, val, accn, fy, fp, form,
    filed, frame) — the input to F1 multi-tag merge.
    """
    parsed = docs.select(F.from_json(F.col(json_col), COMPANYFACTS_SCHEMA).alias("d")).select(
        F.col("d.cik").alias("cik"), F.explode("d.facts").alias("taxonomy", "tags")
    )
    tags = parsed.select("cik", "taxonomy", F.explode("tags").alias("tag", "body"))
    units = tags.select("cik", "taxonomy", "tag", F.explode("body.units").alias("unit", "points"))
    prio = F.coalesce(
        *[F.when(F.col("unit") == u, F.lit(i)) for i, u in enumerate(UNIT_PRIORITY)],
        F.lit(len(UNIT_PRIORITY)),
    )
    chosen = (
        units.withColumn("__prio", prio)
        .groupBy("cik", "taxonomy", "tag")
        .agg(F.min_by(F.struct("unit", "points"), F.struct("__prio", "unit")).alias("__b"))
        .select("cik", "taxonomy", "tag", F.col("__b.unit").alias("unit"), F.col("__b.points").alias("points"))
    )
    return chosen.select(
        "cik", "taxonomy", "tag", "unit", F.explode("points").alias("p")
    ).select(
        "cik",
        "taxonomy",
        "tag",
        "unit",
        F.col("p.end").cast("date").alias("end"),
        F.col("p.start").cast("date").alias("start"),
        F.col("p.val").alias("val"),
        F.col("p.accn").alias("accn"),
        F.col("p.fy").alias("fy"),
        F.col("p.fp").alias("fp"),
        F.col("p.form").alias("form"),
        F.col("p.filed").cast("date").alias("filed"),
        F.col("p.frame").alias("frame"),
    )


# ---------------------------------------------------------------------------
# S8 — pipe-delimited symbol directory (Nasdaq FTP analog)
# ---------------------------------------------------------------------------


def read_pipe_delimited(spark: SparkSession, path: str, *, schema: T.StructType | None = None) -> DataFrame:
    """nasdaqtraded.txt-shaped files (universe/current.py:91-177): '|' sep,
    header row; the trailing 'File Creation Time' footer row must be dropped
    by the caller's predicate (its first field differs)."""
    reader = spark.read.option("sep", "|").option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


# ---------------------------------------------------------------------------
# S9 — full-text corpus
# ---------------------------------------------------------------------------


def read_fulltext(spark: SparkSession, path: str, *, whole: bool = True) -> DataFrame:
    """One row per file (wholetext) with the source path — the filing-text
    layout (collection/sentiment.py:120-150) as a DataFrame."""
    df = spark.read.option("wholetext", whole).text(path)
    return df.withColumn("src", F.input_file_name()).withColumnRenamed("value", "text")


# ---------------------------------------------------------------------------
# S12 — existence probe: skip keys already persisted
# ---------------------------------------------------------------------------


def filter_unwritten(spark: SparkSession, df: DataFrame, target_path: str, *, keys: list[str]) -> DataFrame:
    """Anti-join the candidate batch against the keys already in the target
    table (validation.py:84-216's head_object probes, re-expressed as one
    distinct scan + left_anti join — the idempotence guard for I4 appends).

    Only a MISSING path means "first write"; any other read error re-raises —
    treating a transient storage failure as first-write would append
    duplicate keys, the exact corruption this probe exists to prevent."""
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(target_path).select(*keys).distinct()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return df
    return df.join(existing, on=keys, how="left_anti")


# ---------------------------------------------------------------------------
# S11 — JSON state (checkpoints, prev-universe snapshots)
# ---------------------------------------------------------------------------


def write_json_state(path: str, state: dict) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(state, fh, sort_keys=True)


def read_json_state(path: str) -> dict | None:
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None
