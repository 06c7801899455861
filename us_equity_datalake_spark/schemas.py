"""Code-declared StructTypes for every lake table.

The reference enforces fixed schemas with explicit casts at every ingest
boundary (reference: storage/pipeline/collectors.py:53-60, 609-619); we do the
same with ``StructType`` + ``spark.read.schema`` — never inference for lake
tables (SURVEY.md §1.3).

Type-mapping decisions (SURVEY.md §1.2):
- daily tick timestamps are real ``DateType`` (the reference stores
  ``"YYYY-MM-DD"`` strings and relies on lexicographic compares,
  collection/crsp_ticks.py:694-696 — string-prefix filtering is an
  anti-pattern at scale; a typed date gets min/max row-group pruning).
- minute bars are ``TimestampNTZType`` ET wall-clock (reference converts
  UTC->America/New_York then drops tz, collection/alpaca_ticks.py:823-828).
- money is DoubleType rounded to 4dp at ingest (collectors.py:55-58).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Equity-lake tables (reference-shaped; FIXTURES.md)
# ---------------------------------------------------------------------------

TICKS_DAILY = T.StructType(
    [
        T.StructField("security_id", T.LongType(), False),
        T.StructField("timestamp", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)

TICKS_MINUTE = T.StructType(
    [
        T.StructField("security_id", T.LongType(), False),
        T.StructField("timestamp", T.TimestampNTZType(), False),  # ET wall-clock
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("num_trades", T.LongType(), True),
        T.StructField("vwap", T.DoubleType(), True),
    ]
)

SECURITY_MASTER = T.StructType(
    [
        T.StructField("security_id", T.LongType(), False),
        T.StructField("permno", T.IntegerType(), True),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("company", T.StringType(), True),
        T.StructField("cik", T.StringType(), True),  # zero-padded 10 digits
        T.StructField("cusip", T.StringType(), True),
        T.StructField("start_date", T.DateType(), False),
        T.StructField("end_date", T.DateType(), False),
        T.StructField("share_class_figi", T.StringType(), True),
    ]
)

CALENDAR = T.StructType([T.StructField("timestamp", T.DateType(), False)])

FUNDAMENTAL_LONG = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("as_of_date", T.DateType(), False),  # filing (reveal) date — PIT
        T.StructField("accn", T.StringType(), True),
        T.StructField("form", T.StringType(), True),
        T.StructField("concept", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("start", T.DateType(), True),  # null for instant concepts
        T.StructField("end", T.DateType(), True),
        T.StructField("frame", T.StringType(), True),  # CY2024Q1 / CY2024Q3I / CY2024
        T.StructField("is_instant", T.BooleanType(), True),
    ]
)

TTM_LONG = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("as_of_date", T.DateType(), False),
        T.StructField("accn", T.StringType(), True),
        T.StructField("form", T.StringType(), True),
        T.StructField("concept", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("start", T.DateType(), True),
        T.StructField("end", T.DateType(), True),
    ]
)

METRICS_LONG = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("as_of_date", T.DateType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

SENTIMENT_LONG = T.StructType(
    [
        T.StructField("cik", T.StringType(), False),
        T.StructField("as_of_date", T.DateType(), False),
        T.StructField("filing_type", T.StringType(), True),
        T.StructField("fiscal_year", T.IntegerType(), True),
        T.StructField("fiscal_quarter", T.IntegerType(), True),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("model_name", T.StringType(), True),
        T.StructField("model_version", T.StringType(), True),
    ]
)

FILING_TEXTS = T.StructType(
    [
        T.StructField("cik", T.StringType(), False),
        T.StructField("accession_number", T.StringType(), False),
        T.StructField("filing_date", T.DateType(), False),
        T.StructField("filing_type", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# The 26-concept vocabulary (reference configs/approved_mapping.yaml:1-126).
FUNDAMENTAL_CONCEPTS = [
    "rev", "cor", "op_inc", "net_inc", "ibt", "inc_tax_exp", "int_exp", "rnd",
    "sga", "dna", "cce", "ar", "inv", "ca", "ppe", "gw", "ia", "ta", "ap",
    "std", "cpltd", "cl", "ltd", "tl", "te", "sho", "cfo", "cfi", "cff",
    "capex", "div", "sto_isu",
]

# The 24 derived metrics (reference derived/metrics.py:214-227).
METRIC_NAMES = [
    "grs_pft", "grs_mgn", "op_mgn", "net_mgn", "ebitda", "ttl_dbt", "net_dbt",
    "wc", "fcf", "fcf_mgn", "capex_ratio", "avg_ast", "avg_eqt", "etr", "roa",
    "roe", "nopat", "inv_cap", "roic", "rev_grw", "ast_grw", "inv_rt", "acc",
    "wc_acc",
]

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md) — declared so reads never infer.
# ---------------------------------------------------------------------------

TPCH = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.LongType(), False),
            T.StructField("r_name", T.StringType(), False),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.LongType(), False),
            T.StructField("n_name", T.StringType(), False),
            T.StructField("n_regionkey", T.LongType(), False),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_name", T.StringType(), False),
            T.StructField("c_nationkey", T.LongType(), False),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_name", T.StringType(), False),
            T.StructField("s_nationkey", T.LongType(), False),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), False),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_custkey", T.LongType(), False),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), False),
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("l_suppkey", T.LongType(), False),
            T.StructField("l_linenumber", T.IntegerType(), False),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            # at rest: parquet timestamp[us] — read natively as TimestampType.
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = list(TPCH.keys())
