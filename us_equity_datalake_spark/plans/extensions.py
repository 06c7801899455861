"""Scale-tier extension queries beyond the reference's own surface:
multi-level aggregation (ROLLUP/CUBE), sketch-based approximate distinct
(KMV), deterministic train/valid/test splitting, rank-based exact
quantiles, and near-dup cluster formation (connected components).

The reference has "no grouping sets / cube / rollup, no approximate
aggregates" (SURVEY §2.4 note) — these are the capabilities a 100 TB
training-data pipeline adds on top of its operator set.  All are
oracle-gated: even the *approximate* sketch is bit-reproducible in DuckDB
because it hashes with md5 (functions.hashing), and the connected-components
fixpoint is mirrored by a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.functions.vector import cosine_sql, lsh_bucket_sql
from us_equity_datalake_spark.operators import components, expectations, sampling, sketch, zorder
from us_equity_datalake_spark.operators.similarity import cosine_near_dup_pairs
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

# ---------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP and CUBE
# ---------------------------------------------------------------------------


@register(
    "rollup_priority_status",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           COUNT(*) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy (priority → status → grand total) in one pass — "
    "Spark computes all levels with partial aggregation, no per-level rescan; "
    "a capability the reference lacks (SURVEY §2.4 note).",
)
def rollup_priority_status(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_status_year",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), '(all)') AS order_year,
           COUNT(*) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, EXTRACT(year FROM o_orderdate))
    """,
    doc="CUBE over (status, year): all 4 grouping sets from one shuffle; "
    "year keys stringified so the '(all)' sentinel is type-stable.",
)
def cube_status_year(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return (
        orders.cube("o_orderstatus", "order_year")
        .agg(F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce(F.col("order_year").cast("string"), F.lit("(all)")).alias("order_year"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "grouping_sets_source_lang",
    oracle=f"""
    SELECT COALESCE(source, '(all)') AS source,
           COALESCE(lang, '(all)') AS lang,
           COUNT(*) AS n_docs,
           {dec_sum_sql('n_chars')} AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((source, lang), (lang), ())
    """,
    doc="Explicit GROUPING SETS ((source,lang),(lang),()) — the irregular "
    "multi-level shape neither ROLLUP nor CUBE produces, still one shuffle "
    "with partial aggregation per set.",
)
def grouping_sets_source_lang(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupingSets([["source", "lang"], ["lang"], []], "source", "lang")
        .agg(F.count("*").alias("n_docs"), dec_sum(F.col("n_chars")).alias("total_chars"))
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

_KMV_K = 64


@register(
    "kmv_distinct_customers",
    oracle=sketch.kmv_distinct_sql("orders", "o_custkey", ["o_orderpriority"], k=_KMV_K),
    doc="K-minimum-values distinct sketch (k=64) of customers per priority, "
    "alongside the exact count: the approximate-aggregate tier the reference "
    "lacks, made oracle-checkable by md5 hashing (error ~1/√k ≈ 12%).",
)
def kmv_distinct_customers(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    return sketch.kmv_distinct(orders, "o_custkey", by=["o_orderpriority"], k=_KMV_K)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch
# ---------------------------------------------------------------------------


@register(
    "hll_distinct_report",
    oracle=f"""
    WITH keyed AS (
      SELECT *, CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS line_id
      FROM lineitem
    ),
    arm_raw AS ({sketch.hll_distinct_sql('keyed', 'line_id', ['l_returnflag'])}),
    arm_lc AS ({sketch.hll_distinct_sql('lineitem', 'l_partkey', ['l_returnflag'])})
    SELECT 'lineid' AS arm, * FROM arm_raw
    UNION ALL
    SELECT 'partkey' AS arm, * FROM arm_lc
    """,
    doc="HyperLogLog(b=12) distinct sketch per return flag, two arms: "
    "a near-row-cardinality key (raw-estimate branch) and a low-cardinality "
    "key (linear-counting branch), each alongside the exact count. "
    "Fixed 4 KiB register state per group, exact-integer register sums "
    "(order-independent), rho by integer comparisons — the estimate is "
    "bit-identical in DuckDB, so the approximate operator is graded exactly.",
)
def hll_distinct_report(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    keyed = li.withColumn(
        "line_id",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ),
    )
    arm_raw = sketch.hll_distinct(keyed, "line_id", by=["l_returnflag"]).select(
        F.lit("lineid").alias("arm"), "*"
    )
    arm_lc = sketch.hll_distinct(li, "l_partkey", by=["l_returnflag"]).select(
        F.lit("partkey").alias("arm"), "*"
    )
    return arm_raw.unionByName(arm_lc)


# ---------------------------------------------------------------------------
# Iterative PageRank (fixed rounds, exact-decimal contribution sums)
# ---------------------------------------------------------------------------

_PR_EDGES_CTE = """edges_raw AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT src, dst FROM edges_raw
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges_raw
    )"""


@register(
    "graph_pagerank_report",
    oracle=components.pagerank_sql(_PR_EDGES_CTE, iters=3),
    doc="Fixed-3-round PageRank over the symmetrized customer-supplier "
    "purchase graph (suppliers offset by 1e6 to keep the id spaces "
    "disjoint) — the canonical Spark iterative workload: each round is one "
    "co-locatable join + one aggregation shuffle over a persisted edge "
    "table.  Contribution sums go through DECIMAL(30,15) so the ranks are "
    "bit-identical in the unrolled-CTE DuckDB oracle; in curation this "
    "weights documents/domains by link authority before sampling.",
)
def graph_pagerank_report(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    raw = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )
    sym = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return components.pagerank(sym, iters=3)


# ---------------------------------------------------------------------------
# Theta-sketch set operations (KMV-as-sample)
# ---------------------------------------------------------------------------


@register(
    "theta_set_report",
    oracle=sketch.theta_set_sql(
        "(SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')",
        "(SELECT * FROM orders WHERE o_orderpriority = '2-HIGH')",
        "o_custkey",
    ),
    doc="Theta-sketch set algebra: intersection / union / Jaccard of the "
    "customer sets behind two order-priority slices, estimated from two "
    "k=256 KMV samples instead of a distinct-join — the 'overlap between "
    "two corpora' question answered from two ~2 KiB sketches at 100 TB. "
    "md5 hashing keeps sample membership (and thus every estimate) "
    "bit-identical in DuckDB; exact counts ride along to exhibit the error.",
)
def theta_set_report_query(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    a = orders.where(F.col("o_orderpriority") == "1-URGENT")
    b = orders.where(F.col("o_orderpriority") == "2-HIGH")
    return sketch.theta_set_report(a, b, "o_custkey")


# ---------------------------------------------------------------------------
# Deterministic hash split
# ---------------------------------------------------------------------------


@register(
    "hash_split_report",
    oracle=f"""
    SELECT {sampling.hash_split_sql('doc_id')} AS split,
           lang,
           COUNT(*) AS n_docs,
           ROUND({dec_sum_sql('n_chars')} / COUNT(*), 6) AS avg_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Deterministic 80/10/10 train/valid/test split by md5(doc_id) — "
    "reproducible across runs, engines, and repartitionings (no dependence "
    "on row order); report checks stratification by language.",
)
def hash_split_report(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    split = sampling.hash_split(docs, "doc_id")
    return split.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(dec_sum(F.col("n_chars")) / F.count("*"), 6).alias("avg_chars"),
    )


_WS_K = 50
_STRAT_K = 20


@register(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           {sampling.weighted_priority_sql('doc_id', 'n_chars')} AS priority
    FROM documents
    ORDER BY priority, doc_id
    LIMIT {_WS_K}
    """,
    doc="Deterministic weighted sampling (weight = n_chars): k smallest of "
    "priority = md5(id)*SCALE div weight — integer-only A-ES-style priority "
    "sampling, bit-identical across engines; planned as TakeOrderedAndProject "
    "(per-partition heaps, no global sort).",
)
def weighted_sample_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample(docs, "doc_id", "n_chars", k=_WS_K)


@register(
    "stratified_sample_langs",
    oracle=f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {sampling.md5_long60_sql('CAST(doc_id AS VARCHAR)')}, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_STRAT_K}
    """,
    doc="Equal-allocation stratified sample (20 docs per language) by md5 "
    "rank: rebalances language skew in a multilingual corpus; deterministic "
    "under any physical row order / partitioning.",
)
def stratified_sample_langs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "source")
    return sampling.stratified_sample(docs, "doc_id", ["lang"], k=_STRAT_K)


# ---------------------------------------------------------------------------
# Rank-based exact quantiles (engine-portable: no interpolation)
# ---------------------------------------------------------------------------

_QUANTILES = [25, 50, 75, 90]  # percent


def _q_idx_sql(p: int) -> str:
    # lower-nearest-rank: element at floor(p/100 * (n-1)) + 1 of the sorted group
    return f"CAST(FLOOR({p} / 100.0 * (cnt - 1)) AS BIGINT) + 1"


@register(
    "quantile_profile_totalprice",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(cnt) AS n,
           {', '.join(f"MAX(CASE WHEN rn = {_q_idx_sql(p)} THEN o_totalprice END) AS p{p}" for p in _QUANTILES)}
    FROM ranked
    GROUP BY o_orderstatus
    """,
    doc="Exact per-group quantiles via rank selection (lower-nearest-rank, "
    "no interpolation → bit-identical across engines).  One shuffle+sort "
    "serves every quantile; at the 100 TB tier swap in approx_percentile "
    "(KLL/GK sketch) — same query shape, mergeable partials.",
)
def quantile_profile_totalprice(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w.orderBy("o_totalprice")).alias("rn"),
        F.count("*").over(w).alias("cnt"),
    )
    idx = {p: (F.floor(F.lit(p) / 100.0 * (F.col("cnt") - 1)) + 1) for p in _QUANTILES}
    return ranked.groupBy("o_orderstatus").agg(
        F.max("cnt").alias("n"),
        *[
            F.max(F.when(F.col("rn") == idx[p], F.col("o_totalprice"))).alias(f"p{p}")
            for p in _QUANTILES
        ],
    )


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional data skipping)
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 10  # 1024 contiguous z-ranges


@register(
    "zorder_bucket_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT o_custkey, date_diff('day', DATE '1992-01-01', o_orderdate) AS order_day,
             {zorder.z_value_sql(['o_custkey', "date_diff('day', DATE '1992-01-01', o_orderdate)"], bits=_Z_BITS)} AS z
      FROM orders
    )
    SELECT z >> {_Z_BUCKET_SHIFT} AS z_bucket,
           COUNT(*) AS n,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(order_day) AS min_day, MAX(order_day) AS max_day
    FROM keyed GROUP BY 1
    """,
    doc="Z-order (Morton) clustering demo: interleave (custkey, order-day) "
    "bits, bucket by contiguous z-range, report per-bucket min/max of BOTH "
    "dims — the footer stats a z-sorted file layout would expose, tight on "
    "every dimension at once (multi-dim data skipping; the scale "
    "generalization of the reference's single-dim year/month pruning).",
)
def zorder_bucket_stats(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    day = F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
    keyed = orders.select(
        "o_custkey",
        day.alias("order_day"),
        zorder.z_value([F.col("o_custkey"), day], bits=_Z_BITS).alias("z"),
    )
    return keyed.groupBy(F.shiftright("z", _Z_BUCKET_SHIFT).alias("z_bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        F.min("order_day").alias("min_day"),
        F.max("order_day").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations audit (one scan, N constraints)
# ---------------------------------------------------------------------------

def _dq_spark_checks():
    # built lazily: Column construction needs an active SparkContext
    return {
        "qty_in_range": F.col("l_quantity").between(1, 50),
        "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        "tax_in_range": F.col("l_tax").between(0, 0.08),
        "discount_in_range": F.col("l_discount").between(0, 0.1),
        "price_positive": F.col("l_extendedprice") > 0,
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "linestatus_domain": F.col("l_linestatus").isin("O", "F"),
    }


_DQ_SQL = {
    "qty_in_range": "l_quantity BETWEEN 1 AND 50",
    "shipdate_not_null": "l_shipdate IS NOT NULL",
    "tax_in_range": "l_tax BETWEEN 0 AND 0.08",
    "discount_in_range": "l_discount BETWEEN 0 AND 0.1",
    "price_positive": "l_extendedprice > 0",
    "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
    "linestatus_domain": "l_linestatus IN ('O', 'F')",
}


@register(
    "dq_audit_lineitem",
    oracle=expectations.audit_sql("lineitem", _DQ_SQL),
    doc="Declarative data-quality audit (Deequ shape): 7 named constraints "
    "compiled into ONE conditional-sum scan of lineitem (map-side partial "
    "agg, N checks never means N scans); unknown (null predicate) counts as "
    "violation.",
)
def dq_audit_lineitem(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return expectations.audit(li, _dq_spark_checks())


# ---------------------------------------------------------------------------
# Theta-sketch mergeability (bottom-k merge identity)
# ---------------------------------------------------------------------------


@register(
    "theta_merge_report",
    oracle=sketch.theta_merge_sql(
        [
            ("s1", "(SELECT * FROM orders WHERE o_orderstatus = 'O')"),
            ("s2", "(SELECT * FROM orders WHERE o_orderstatus = 'F')"),
            ("s3", "(SELECT * FROM orders WHERE o_orderstatus = 'P')"),
        ],
        "o_custkey",
    ),
    doc="Bottom-k sketches are EXACTLY mergeable — the property that makes "
    "them lake-incremental state: per-status customer sketches merged "
    "(union samples below the min slice theta, keep k smallest, re-derive "
    "the threshold) must equal the direct sketch of all orders "
    "value-for-value.  Both arms are in the graded result, so the identity "
    "itself is what the oracle hashes — per-day sketches roll up at 100 TB "
    "without ever rescanning history.",
)
def theta_merge_report(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    samples = None
    for s in ("O", "F", "P"):
        sk = sketch.kmv_theta_sample(
            orders.where(F.col("o_orderstatus") == s), "o_custkey"
        )
        samples = sk if samples is None else samples.unionByName(sk)
    merged = sketch.kmv_theta_merge(samples)
    direct = sketch.kmv_theta_sample(orders, "o_custkey")

    def summ(sample, arm):
        frac = F.min("theta").cast("double") / F.lit(float(sketch._FULL_THETA))
        return sample.agg(
            F.min("theta").alias("theta"),
            F.count("*").alias("n_sample"),
            F.round(F.count("*") / frac, 6).alias("est_distinct"),
        ).select(
            F.lit(arm).alias("arm"),
            F.lit(sketch.THETA_K).alias("k"),
            "theta",
            "n_sample",
            "est_distinct",
        )

    return summ(merged, "merged").unionByName(summ(direct, "direct"))


# ---------------------------------------------------------------------------
# Bloom-filter membership (decontamination shape)
# ---------------------------------------------------------------------------


_BLOOM_M = 4096  # loaded operating point: kn/m ~ 1.6 so the FP arm is non-trivial


@register(
    "bloom_decontamination_report",
    oracle=sketch.bloom_report_sql(
        "(SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders WHERE o_orderpriority = '1-URGENT')",
        "(SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders)",
        "key",
        m=_BLOOM_M,
    ),
    doc="Bloom-filter membership — the decontamination shape at 100 TB: the "
    "'training' key set (urgent-order customers) compresses to <= m set-bit "
    "positions, every probe key is checked against the BROADCAST filter, "
    "and the graded row proves the two defining properties exactly — zero "
    "false negatives by construction, and the false-positive rate the "
    "m/k/n operating point implies.  Mergeable like the HLL registers "
    "(slice filters union their positions); md5 positions keep the filter "
    "bit-identical in DuckDB.",
)
def bloom_decontamination_report(spark, sf_dir):
    from us_equity_datalake_spark.operators import _cache

    orders = load_table(spark, "orders", sf_dir)
    key = F.col("o_custkey").cast("string").alias("key")
    members = orders.where(F.col("o_orderpriority") == "1-URGENT").select(key).distinct()
    probes = orders.select(key).distinct()
    # bits is referenced by the probe join AND the n_set_bits rider — persist
    # so the member scan runs once (release via operators.release_caches())
    bits = _cache.track(sketch.bloom_build(members, "key", m=_BLOOM_M).persist())
    hits = sketch.bloom_probe(bits, probes, "key", m=_BLOOM_M)
    joined = hits.join(
        members.withColumn("is_member", F.lit(True)), "key", "left"
    ).withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    stats = joined.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long").alias("n_hits"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_negatives"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).cast("long").alias("__n_non"),
    )
    n_bits = bits.agg(F.count("*").alias("n_set_bits"))
    n_mem = members.agg(F.count("*").alias("n_members"))
    return (
        stats.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_mem))
        .select(
            F.lit(_BLOOM_M).alias("m"),
            F.lit(sketch.BLOOM_K).alias("k"),
            "n_set_bits",
            "n_members",
            "n_probes",
            "n_hits",
            "n_false_positives",
            "n_false_negatives",
            F.round(
                F.col("n_false_positives")
                / F.greatest(F.col("__n_non").cast("double"), F.lit(1.0)),
                6,
            ).alias("fp_rate"),
        )
    )


# ---------------------------------------------------------------------------
# CMS join-size estimation (inner product of two Count-Min grids)
# ---------------------------------------------------------------------------

_CMS_JS_WIDTH = 8192


@register(
    "cms_join_size_report",
    oracle=sketch.cms_join_size_sql(
        "(SELECT CAST(l_partkey AS VARCHAR) AS pk FROM lineitem WHERE l_returnflag = 'A')",
        "(SELECT CAST(l_partkey AS VARCHAR) AS pk FROM lineitem WHERE l_returnflag = 'N')",
        "pk",
        width=_CMS_JS_WIDTH,
    ),
    doc="Join-cardinality estimation from two Count-Min grids (the CMS "
    "inner-product estimator): |returned ⋈ current on partkey| sized from "
    "two depth x 8192 integer summaries instead of scanning either side — "
    "how an optimizer plans a 100 TB join.  Always an overestimate "
    "(collision cross-terms ~N_A*N_B/width); the exact join size rides "
    "along and the overestimate ratio (as integer parts-per-million — a "
    "ROUND(double,6) column diverged on the r7 driver, Spark decimal-HALF_UP "
    "vs DuckDB float round) is part of the graded row.  Integer arithmetic "
    "end-to-end, so every column grades bit-exactly.",
)
def cms_join_size_report(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    pk = F.col("l_partkey").cast("string").alias("pk")
    a = li.where(F.col("l_returnflag") == "A").select(pk)
    b = li.where(F.col("l_returnflag") == "N").select(pk)
    return sketch.cms_join_size(a, b, "pk", width=_CMS_JS_WIDTH)


# ---------------------------------------------------------------------------
# Fuzzy entity resolution: blocked Levenshtein record linkage
# ---------------------------------------------------------------------------


@register(
    "fuzzy_part_match",
    oracle="""
    WITH clean AS (
      SELECT p_partkey AS clean_key,
             p_name || '#' || CAST(p_partkey AS VARCHAR) AS clean_name
      FROM part
    ),
    dirty AS (
      SELECT clean_key AS dirty_key,
             substr(clean_name, 1, 8) || substr(clean_name, 10) AS dirty_name
      FROM clean WHERE clean_key % 10 = 0
    ),
    clean_keys AS (
      SELECT clean_key, clean_name,
             unnest(array_concat([clean_name],
               list_transform(generate_series(1, length(clean_name)),
                 i -> substr(clean_name, 1, i - 1) || substr(clean_name, i + 1))
             )) AS bkey
      FROM clean
    ),
    dirty_keys AS (
      SELECT dirty_key, dirty_name,
             unnest(array_concat([dirty_name],
               list_transform(generate_series(1, length(dirty_name)),
                 i -> substr(dirty_name, 1, i - 1) || substr(dirty_name, i + 1))
             )) AS bkey
      FROM dirty
    ),
    pairs AS (
      SELECT d.dirty_key, c.clean_key, d.dirty_name, c.clean_name
      FROM dirty d JOIN clean c ON right(d.dirty_name, 6) = right(c.clean_name, 6)
      UNION
      SELECT DISTINCT dk.dirty_key, ck.clean_key, dk.dirty_name, ck.clean_name
      FROM dirty_keys dk JOIN clean_keys ck USING (bkey)
    ),
    cand AS (
      SELECT dirty_key, clean_key,
             levenshtein(dirty_name, clean_name) AS dist
      FROM pairs
      WHERE levenshtein(dirty_name, clean_name) <= 2
    ),
    best AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY dirty_key ORDER BY dist, clean_key) AS rn,
             COUNT(*) OVER (PARTITION BY dirty_key) AS n_candidates
      FROM cand
    )
    SELECT d.dirty_key, b.clean_key AS matched_key,
           CAST(b.dist AS BIGINT) AS distance,
           COALESCE(b.n_candidates, 0) AS n_candidates,
           COALESCE(b.clean_key = d.dirty_key, FALSE) AS is_original
    FROM dirty d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (dirty_key)
    """,
    doc="Record linkage with MULTI-KEY blocking: a 'dirty feed' (every 10th "
    "unique entity name with its 9th character dropped) is resolved against "
    "the clean dimension by Levenshtein distance <= 2, candidates = union "
    "of a 6-char-SUFFIX pass (high-entropy, near-singleton blocks) and a "
    "SymSpell DELETION-NEIGHBORHOOD pass (Garbe's symmetric-delete "
    "blocking: each side explodes to itself + its length single-deletion "
    "variants; any pair within one insert/delete/substitute shares a key, "
    "and key entropy grows WITH the corpus because the variants carry the "
    "unique key digits).  The deletion pass replaced round 6's 8-char-"
    "PREFIX pass after the sf1 ladder measured the prefix blocks quadratic "
    "— name-prefix cardinality is flat (64 distinct names), so 10x "
    "entities made 105x wall; deletion blocking is linear (~len keys per "
    "row) at full recall for deletion-class corruption.  Exhaustive "
    "distance-2 coverage (e.g. two substitutions apart) needs deletion "
    "depth 2 (cost ~len^2 keys) — the documented production knob.  "
    "Unmatched dirty rows stay in the result with n_candidates = 0; both "
    "engines compute the same integer edit distance, so the match set "
    "grades exactly.",
)
def fuzzy_part_match(spark, sf_dir):
    part = load_table(spark, "part", sf_dir)
    clean = part.select(
        F.col("p_partkey").alias("clean_key"),
        F.concat(
            F.col("p_name"), F.lit("#"), F.col("p_partkey").cast("string")
        ).alias("clean_name"),
    )
    dirty = clean.where(F.col("clean_key") % 10 == 0).select(
        F.col("clean_key").alias("dirty_key"),
        F.concat(
            F.substring("clean_name", 1, 8), F.expr("substring(clean_name, 10)")
        ).alias("dirty_name"),
    )
    by_suffix = dirty.join(
        clean, F.substring("dirty_name", -6, 6) == F.substring("clean_name", -6, 6)
    )

    # SymSpell symmetric-delete blocking: a row's keys are itself plus every
    # single-deletion variant; the join key therefore carries the unique
    # key-digit tail, so blocks stay near-singleton as the corpus grows
    def _del_keys(name_col: str):
        return F.explode(
            F.expr(
                f"array_union(array({name_col}), transform("
                f"sequence(1, length({name_col})), i -> "
                f"concat(substring({name_col}, 1, i - 1), substring({name_col}, i + 1))))"
            )
        ).alias("bkey")

    dirty_keys = dirty.select("dirty_key", "dirty_name", _del_keys("dirty_name"))
    clean_keys = clean.select("clean_key", "clean_name", _del_keys("clean_name"))
    by_deletion = dirty_keys.join(clean_keys, "bkey").drop("bkey")
    pairs = by_suffix.unionByName(by_deletion).distinct()
    cand = (
        pairs.withColumn("dist", F.levenshtein("dirty_name", "clean_name"))
        .where(F.col("dist") <= 2)
        .select("dirty_key", "clean_key", "dist")
    )
    w = Window.partitionBy("dirty_key").orderBy("dist", "clean_key")
    wc = Window.partitionBy("dirty_key")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .withColumn("n_candidates", F.count("*").over(wc))
        .where(F.col("rn") == 1)
    )
    return dirty.select("dirty_key").join(best, "dirty_key", "left").select(
        "dirty_key",
        F.col("clean_key").alias("matched_key"),
        F.col("dist").cast("long").alias("distance"),
        F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        F.coalesce(F.col("clean_key") == F.col("dirty_key"), F.lit(False)).alias(
            "is_original"
        ),
    )


_DRIFT_WIN = 7  # trailing days in the control window


@register(
    "dq_drift_monitor",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT day, n,
             SUM(n) OVER w AS s,
             SUM(n * n) OVER w AS ss,
             COUNT(*) OVER w AS cnt
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN {_DRIFT_WIN} PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT day, n, s, cnt,
             CASE WHEN cnt = {_DRIFT_WIN}
                  THEN (ss - s * s / CAST(cnt AS DOUBLE)) / (cnt - 1) END AS var
      FROM t
    )
    SELECT day, n,
           CASE WHEN cnt = {_DRIFT_WIN} THEN ROUND(s / CAST(cnt AS DOUBLE), 6) END AS trailing_mean,
           CASE WHEN var > 0 THEN ROUND((n - s / CAST(cnt AS DOUBLE)) / sqrt(var), 6) END AS z,
           CASE WHEN var IS NULL OR var <= 0 THEN 'baseline'
                WHEN abs((n - s / CAST(cnt AS DOUBLE)) / sqrt(var)) > 3 THEN 'alert'
                WHEN abs((n - s / CAST(cnt AS DOUBLE)) / sqrt(var)) > 2 THEN 'warn'
                WHEN abs((n - s / CAST(cnt AS DOUBLE)) / sqrt(var)) > 1 THEN 'watch'
                ELSE 'ok' END AS zone
    FROM z
    """,
    doc="Control-chart drift monitor over daily event volumes: each day's "
    "count vs a trailing 7-day window, z-scored and classified into Western "
    "Electric zones (1/2/3 sigma).  The trailing mean/variance come from "
    "exact INTEGER window sums (SUM(n), SUM(n*n)) — never a float stddev "
    "whose accumulation order differs between engines — so the z-scores are "
    "bit-identical in the oracle.  The ops-monitoring tier a daily 100 TB "
    "ingest needs: a partition whose volume breaks the control band is "
    "flagged before it poisons downstream aggregates.",
)
def dq_drift_monitor(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n"))
    w = Window.orderBy("day").rowsBetween(-_DRIFT_WIN, -1)
    t = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
        F.count("*").over(w).alias("cnt"),
    )
    full = F.col("cnt") == _DRIFT_WIN
    mean = F.col("s") / F.col("cnt").cast("double")
    var = F.when(full, (F.col("ss") - F.col("s") * F.col("s") / F.col("cnt").cast("double")) / (F.col("cnt") - 1))
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var))
    zone = (
        F.when(z.isNull(), F.lit("baseline"))
        .when(F.abs(z) > 3, F.lit("alert"))
        .when(F.abs(z) > 2, F.lit("warn"))
        .when(F.abs(z) > 1, F.lit("watch"))
        .otherwise(F.lit("ok"))
    )
    return t.select(
        "day",
        "n",
        F.when(full, F.round(mean, 6)).alias("trailing_mean"),
        F.round(z, 6).alias("z"),
        zone.alias("zone"),
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: connected components over cosine near-dup pairs
# ---------------------------------------------------------------------------

# mirror plans.vectors: same hyperplanes => same candidate blocking
from .vectors import _DUP_T, _N_PLANES, _PLANES  # noqa: E402

# mirror plans.textops: same tokenizer + stopword list => same quality score
from us_equity_datalake_spark.functions import text as _text_mod  # noqa: E402

_SW_LIST_EXT = "['" + "','".join(sorted(_text_mod.EN_STOPWORDS)) + "']"


@register(
    "near_dup_components",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT vec_id AS id, embedding AS v,
             {lsh_bucket_sql('embedding', _PLANES)} AS bkt
      FROM embeddings
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM t a JOIN t b ON a.bkt = b.bkt AND a.id < b.id
      WHERE ROUND({cosine_sql('a.v', 'b.v')}, 6) >= {_DUP_T}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS n FROM edges),
    -- transitive closure by recursion; MIN over everything reachable = the
    -- component label (edges are symmetric, so min label is reachable)
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u
    ),
    cc AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)
    SELECT component, COUNT(*) AS cluster_size, MIN(node) AS canonical_id
    FROM cc GROUP BY component
    """,
    doc="Transitive closure of the near-dup relation: cosine pairs → "
    "connected components (iterative min-label propagation, one shuffle per "
    "round, O(cluster-diameter) rounds) → per-cluster canonical survivor. "
    "The step pairwise dedup alone cannot express (A~B, B~C ⇒ {{A,B,C}}).",
)
def near_dup_components(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    pairs = cosine_near_dup_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        threshold=_DUP_T, n_planes=_N_PLANES, seed=11, dim=64,
    )
    cc = components.connected_components(pairs, src="id_a", dst="id_b")
    return cc.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("node").alias("canonical_id"),
    )


@register(
    "dedup_keep_best_report",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT vec_id AS id, embedding AS v,
             {lsh_bucket_sql('embedding', _PLANES)} AS bkt
      FROM embeddings
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM t a JOIN t b ON a.bkt = b.bkt AND a.id < b.id
      WHERE ROUND({cosine_sql('a.v', 'b.v')}, 6) >= {_DUP_T}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS n FROM edges),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u
    ),
    cc AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src),
    toks AS (
      SELECT doc_id, text, {_text_mod.tokens_sql('text')} AS tk
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             ROUND(0.4 * least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
                 + 0.3 * (1.0 - (CASE WHEN length(text) > 0 THEN
                     CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                     / length(text) ELSE 0.0 END))
                 + 0.3 * least((CASE WHEN len(tk) > 0 THEN
                     CAST(len(list_filter(tk, x -> list_contains({_SW_LIST_EXT}, x))) AS DOUBLE)
                     / len(tk) ELSE 0.0 END) * 4, 1.0), 6) AS quality
      FROM toks
    ),
    ranked AS (
      SELECT cc.component, cc.node, q.quality,
             ROW_NUMBER() OVER (
               PARTITION BY cc.component
               ORDER BY q.quality DESC, cc.node ASC) AS rn
      FROM cc JOIN q ON q.doc_id = cc.node
    )
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed,
           CAST(MAX(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS kept_id,
           MAX(CASE WHEN rn = 1 THEN quality END) AS kept_quality
    FROM ranked GROUP BY component
    """,
    doc="Canonical-representative selection — the step a curation pipeline "
    "runs AFTER near-dup clustering: inside every near-dup component keep "
    "the highest-QUALITY document (ties broken by lowest id), scrub the "
    "rest.  Composes three existing operators without new shuffles beyond "
    "theirs: LSH-blocked cosine pairs -> iterative min-label connected "
    "components -> one broadcast-sized join to the quality scores -> one "
    "max_by per component (argmax by (quality, -id) struct ordering, a "
    "single partial-aggregating groupBy).  Quality is the graded "
    "length/punct/stopword composite (doc_quality_scores), rounded to 6 "
    "before comparison so the argmax is engine-deterministic.  At 100 TB "
    "the only state beyond the component labels is one (id, quality) row "
    "per clustered doc.",
)
def dedup_keep_best_q(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    pairs = cosine_near_dup_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        threshold=_DUP_T, n_planes=_N_PLANES, seed=11, dim=64,
    )
    cc = components.connected_components(pairs, src="id_a", dst="id_b")
    quality = docs.select(
        F.col("doc_id").alias("node"),
        _text_mod.quality_score(F.col("text")).alias("quality"),
    )
    scored = cc.join(quality, "node")
    best = F.max(F.struct(F.col("quality"), (-F.col("node")).alias("neg_id")))
    return scored.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size"),
        (F.count("*") - 1).cast("long").alias("n_removed"),
        (-best.getField("neg_id")).cast("long").alias("kept_id"),
        best.getField("quality").alias("kept_quality"),
    )


# ---------------------------------------------------------------------------
# Skew toolkit parity (operators/skew.py) — the salted forms must equal the
# plain aggregation/join, so the oracle IS the plain SQL (round-1 review:
# these were pytest-only; now driver-graded)
# ---------------------------------------------------------------------------


@register(
    "salted_agg_orders",
    oracle=f"""
    SELECT o_orderstatus AS status,
           {dec_sum_sql('o_totalprice')} AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Two-stage salted aggregation (operators/skew.py:26): o_orderstatus "
    "has 3 heavy-hitter keys — the degenerate hot-key GROUP BY.  Stage one "
    "spreads each key across 16 salts, stage two recombines; the oracle is "
    "the PLAIN aggregation, so the hash match proves the salted rewrite is "
    "exact (decimal sums recombine order-independently).",
)
def salted_agg_q(spark, sf_dir):
    from us_equity_datalake_spark.operators import skew

    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(30,6)").alias("price"),
        "o_orderkey",
    )
    out = skew.salted_agg(
        orders,
        keys=["status"],
        aggs={
            "total_price": ("sum", "price"),
            "n": ("count", "o_orderkey"),
            "min_key": ("min", "o_orderkey"),
            "max_key": ("max", "o_orderkey"),
        },
        n_salts=16,
    )
    return out.select(
        "status",
        F.col("total_price").cast("double"),
        F.col("n").cast("long"),
        F.col("min_key").cast("long"),
        F.col("max_key").cast("long"),
    )


@register(
    "salted_join_nation_rollup",
    oracle=f"""
    SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dec_sum_sql('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    doc="Skew-resistant salted join (operators/skew.py:66): big side salted "
    "deterministically (full-row hash + partition id, never rand()), small "
    "side replicated 8x, join key becomes (custkey, salt).  Oracle = the "
    "plain join+rollup, proving the rewrite changes the physical shape only.",
)
def salted_join_q(spark, sf_dir):
    from us_equity_datalake_spark.operators import skew

    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(30,6)").alias("price"),
    )
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nation")
    )
    joined = skew.salted_join(orders, cust, on="custkey", n_salts=8)
    return joined.groupBy(F.col("nation").cast("long").alias("nation")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("price").cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# J3 tolerance variant (operators/asof.py tolerance_days — Polars `tolerance`)
# ---------------------------------------------------------------------------


@register(
    "asof_tolerance_join",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    anchors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
           CASE WHEN date_diff('day', q.ts, a.ts) > 0 THEN NULL ELSE q.value END AS view_value
    FROM anchors a ASOF LEFT JOIN quotes q
      ON a.user_id = q.user_id AND q.ts <= a.ts
    """,
    doc="J3 with tolerance (Polars join_asof tolerance; operators/asof.py): "
    "backward match nulled out when the matched view crossed a calendar-day "
    "boundary (tolerance_days=0) — stale quotes don't leak into the anchor "
    "row.  Same union+last-value window plan as the plain backward join.",
)
def asof_tolerance_q(spark, sf_dir):
    from us_equity_datalake_spark.operators.asof import asof_join_backward
    from us_equity_datalake_spark.operators.dedup import dedup_keep_first

    events = load_table(spark, "events", sf_dir)
    quotes = dedup_keep_first(
        events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("value").alias("view_value"), "event_id"
        ),
        keys=["user_id", "ts"],
        order=[F.col("event_id").asc()],
    ).drop("event_id")
    anchors = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_backward(
        anchors, quotes, by=["user_id"], left_on="ts", right_on="ts",
        value_cols=["view_value"], tolerance_days=0,
    )
    return joined.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "view_value")


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------


@register(
    "histogram_quantile_sketch",
    oracle=__import__(
        "us_equity_datalake_spark.operators.stats", fromlist=["histogram_quantiles_sql"]
    ).histogram_quantiles_sql("lineitem", "l_extendedprice"),
    doc="Fixed-bin (1024) histogram quantile sketch of l_extendedprice at "
    "p50/p90/p99 alongside the exact rank quantile: the quantile member of "
    "the sketch family (KMV/HLL distinct, CMS frequency).  Two corpus "
    "passes; the shuffled state is <= 1024 counters per map task, the "
    "cumulative table is dimension-sized, and the bin/interpolation math is "
    "identical IEEE doubles in both engines so the approximation grades "
    "exactly (error bounded by one bin width).",
)
def histogram_quantile_sketch_q(spark, sf_dir):
    from us_equity_datalake_spark.operators.stats import histogram_quantiles

    li = load_table(spark, "lineitem", sf_dir)
    return histogram_quantiles(li, "l_extendedprice")


@register(
    "hll_merge_report",
    oracle=sketch.hll_merge_sql("orders", "o_custkey", ["o_orderpriority"]),
    doc="HLL mergeability — the property that makes register sketches the "
    "distinct-count state for an incremental lake: per-priority register "
    "tables (customers overlap across priorities, so this is a real merge, "
    "not a union) merged by per-bucket MAX must equal the direct sketch of "
    "all data value-for-value; both arms carry the exact count.  At 100 TB "
    "each day/partition keeps its 4 KiB registers and the global estimate "
    "never rescans history.",
)
def hll_merge_report(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    grp = sketch.hll_registers(orders, "o_custkey", by=["o_orderpriority"])
    merged = sketch.hll_estimate_from_registers(sketch.hll_merge(grp))
    direct = sketch.hll_estimate_from_registers(
        sketch.hll_registers(orders, "o_custkey", by=[])
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    out = merged.select(F.lit("merged").alias("arm"), "*").unionByName(
        direct.select(F.lit("direct").alias("arm"), "*")
    )
    return out.crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Degree-ordered triangle counting (Suri-Vassilvitskii / Cohen): the classic
# distributed-graph benchmark over the part co-purchase graph.
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH li AS (
      SELECT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % 10 = 0
    ),
    e AS (
      SELECT DISTINCT LEAST(x.p, y.p) AS a, GREATEST(x.p, y.p) AS b
      FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p
    ),
    sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
    de AS (
      SELECT e.a, e.b, da.deg AS deg_a, db.deg AS deg_b
      FROM e JOIN deg da ON e.a = da.a JOIN deg db ON e.b = db.a
    ),
    oriented AS (
      SELECT CASE WHEN (deg_a, a) < (deg_b, b) THEN a ELSE b END AS lo,
             CASE WHEN (deg_a, a) < (deg_b, b) THEN b ELSE a END AS hi
      FROM de
    ),
    w AS (
      SELECT a1.lo AS p, a1.hi AS x, a2.hi AS y
      FROM oriented a1 JOIN oriented a2 ON a1.lo = a2.lo AND a1.hi <> a2.hi
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w
      WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.lo = w.x AND o.hi = w.y)
    ),
    wopen AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS nw FROM deg)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT n FROM tri) AS n_triangles,
           CASE WHEN (SELECT nw FROM wopen) > 0
                THEN (3 * (SELECT n FROM tri) * 1000000) // (SELECT nw FROM wopen)
                ELSE 0 END AS clustering_ppm
    """,
    doc="Degree-ordered triangle counting (Suri-Vassilvitskii MapReduce "
    "triangles / Cohen orientation) over the part co-purchase graph "
    "(parts sharing an order, every-10th-part slice): orient each edge "
    "from the lower-(degree, id) endpoint so every triangle is "
    "enumerated EXACTLY ONCE and wedge fan-out is bounded by oriented "
    "out-degree — O(m^1.5) total regardless of hub parts, where the "
    "naive wedge join explodes on the hottest part (the skew killer in "
    "co-occurrence graphs).  Graded: vertex/edge/triangle counts plus "
    "the global clustering coefficient as integer ppm (the bit-exact "
    "ratio discipline).  Two shuffles (wedges, closure semi-join).",
)
def graph_triangle_count_q(spark, sf_dir):
    from us_equity_datalake_spark.operators.components import triangle_count

    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_partkey") % 10 == 0)
    li = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    pairs = (
        li.alias("x")
        .join(li.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.p") != F.col("y.p")))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
    )
    return triangle_count(pairs)
