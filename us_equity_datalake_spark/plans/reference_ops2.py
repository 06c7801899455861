"""Second tranche of reference-operator queries (SURVEY.md §2), closing the
inventory rows that had library code + unit tests but no oracle-gated query:

P1/P5 split-adjust projection, P6 rule-based name filter, J5 coalesce
enrichment, J6 substring-equi + interval-overlap join, A1 collect_set rollup,
F1 multi-tag merge w/ priority dedup, U1 schema-merging union, N3 fixed
chunking, A11/A12 LM-dictionary + readability columns, N4+A10 chunk scoring →
filing-level aggregation, F4 fiscal inference.

Shapes are built deterministically from the driver's synthetic tables so the
DuckDB oracle reproduces them exactly (see plans/base.py comparability rules).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.equity.sentiment import (
    LM_WORDS,
    aggregate_filing_sentiment,
    infer_fiscal,
    lm_ratio_columns,
    readability_columns,
    score_chunks,
)
from us_equity_datalake_spark.functions import hashing
from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

# ---------------------------------------------------------------------------
# P1/P5 — split adjustment projection (crsp_ticks.py:141-155: open/cfacpr,
# abs(prc)/cfacpr, vol*cfacshr, round 4) + null-row drop (P2)
# ---------------------------------------------------------------------------


@register(
    "split_adjust_projection",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS lineno,
           ROUND(ABS(l_extendedprice) / (1.0 + CAST(l_suppkey % 4 AS DOUBLE)), 4) AS adj_price,
           ROUND(l_quantity * (1.0 + CAST(l_suppkey % 2 AS DOUBLE)), 4) AS adj_vol
    FROM lineitem
    WHERE l_orderkey < 2000 AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    """,
    doc="P1/P2/P5 (crsp_ticks.py:141-155, update/app.py:386-393): adjustment "
    "factors as pure projections — abs / divide / multiply / round(4) — with a "
    "null-row drop; a plain codegen'd scan+project, filter pushed to parquet.",
)
def split_adjust_q(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
    li = li.na.drop(how="any", subset=["l_extendedprice", "l_quantity"])
    cfacpr = 1.0 + (F.col("l_suppkey") % 4).cast("double")
    cfacshr = 1.0 + (F.col("l_suppkey") % 2).cast("double")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("lineno"),
        F.round(F.abs(F.col("l_extendedprice")) / cfacpr, 4).alias("adj_price"),
        F.round(F.col("l_quantity") * cfacshr, 4).alias("adj_vol"),
    )


# ---------------------------------------------------------------------------
# P6 — common-stock predicate: keyword/word-boundary/flag exclusion rules
# (universe/current.py:20-88) re-shaped onto the part table
# ---------------------------------------------------------------------------


@register(
    "common_stock_name_filter",
    oracle=r"""
    SELECT p_partkey, p_brand
    FROM part
    WHERE NOT regexp_matches(p_name, '\b(chocolate|almond)\b')
      AND NOT starts_with(p_type, 'ECONOMY')
      AND p_size NOT IN (1, 49)
      AND NOT ends_with(p_brand, '#55')
    """,
    doc="P6 (universe/current.py:20-88): rule filter — word-boundary regex "
    "exclusions, prefix test, flag-list membership, suffix test — one boolean "
    "column expression, fully pushed into the scan.",
)
def common_stock_filter_q(spark, sf_dir):
    part = load_table(spark, "part", sf_dir)
    keep = (
        ~F.col("p_name").rlike(r"\b(chocolate|almond)\b")
        & ~F.col("p_type").startswith("ECONOMY")
        & ~F.col("p_size").isin(1, 49)
        & ~F.col("p_brand").endswith("#55")
    )
    return part.filter(keep).select("p_partkey", "p_brand")


# ---------------------------------------------------------------------------
# J5 — CIK fallback enrichment: left join primary + fallback maps, coalesce
# (security_master.py:459-477)
# ---------------------------------------------------------------------------


@register(
    "coalesce_enrichment_join",
    oracle=f"""
    WITH prim AS (
      SELECT c_custkey AS pk, CAST(c_nationkey AS BIGINT) AS p_nation
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    fb AS (
      SELECT c_custkey AS fk, CAST(c_nationkey % 5 AS BIGINT) AS f_nation FROM customer
    )
    SELECT COALESCE(p_nation, f_nation) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dec_sum_sql('o_totalprice')} AS total
    FROM orders
    LEFT JOIN prim ON o_custkey = pk
    LEFT JOIN fb ON o_custkey = fk
    WHERE o_orderkey < 30000
    GROUP BY COALESCE(p_nation, f_nation)
    """,
    doc="J5 (security_master.py:459-477): enrich facts from a primary mapping "
    "with a fallback snapshot via two broadcast left joins + coalesce.",
)
def coalesce_enrichment_q(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    prim = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("pk"), F.col("c_nationkey").cast("long").alias("p_nation")
    )
    fb = cust.select(
        F.col("c_custkey").alias("fk"), (F.col("c_nationkey") % 5).cast("long").alias("f_nation")
    )
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 30000)
    enriched = (
        orders.join(F.broadcast(prim), orders.o_custkey == prim.pk, "left")
        .join(F.broadcast(fb), orders.o_custkey == fb.fk, "left")
        .select(F.coalesce("p_nation", "f_nation").alias("nation"), "o_totalprice")
    )
    return enriched.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_orders"), dec_sum(F.col("o_totalprice")).alias("total")
    )


# ---------------------------------------------------------------------------
# J6 — substring-equi + interval-overlap join (CUSIP link join,
# security_master.py:370-393): equi on substr(key,1,8) keeps it a hash join,
# the overlap range predicate filters post-probe
# ---------------------------------------------------------------------------


@register(
    "cusip_substring_interval_join",
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey % 300 AS VARCHAR), 10, '0') AS key10,
             DATE '1995-01-01' + CAST(c_custkey % 365 AS INT) AS astart,
             DATE '1995-01-01' + CAST(c_custkey % 365 + 180 AS INT) AS aend
      FROM customer
    ),
    b AS (
      SELECT s_suppkey,
             lpad(CAST(s_suppkey % 300 AS VARCHAR), 10, '0') AS key10,
             DATE '1995-01-01' + CAST(s_suppkey % 365 + 90 AS INT) AS bstart,
             DATE '1995-01-01' + CAST(s_suppkey % 365 + 270 AS INT) AS bend
      FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           CAST(least(aend, bend) - greatest(astart, bstart) AS BIGINT) AS overlap_days
    FROM a JOIN b
      ON substr(a.key10, 1, 8) = substr(b.key10, 1, 8)
     AND astart <= bend AND bstart <= aend
    """,
    doc="J6 (security_master.py:370-393): SUBSTR(a,1,8)=SUBSTR(b,1,8) equi join "
    "on an expression + interval-overlap theta predicates; the equi component "
    "keeps Catalyst on a (broadcast) hash join, never a nested loop.",
)
def cusip_join_q(spark, sf_dir):
    base = F.lit("1995-01-01").cast("date")
    a = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        F.lpad((F.col("c_custkey") % 300).cast("string"), 10, "0").alias("akey"),
        F.date_add(base, (F.col("c_custkey") % 365).cast("int")).alias("astart"),
        F.date_add(base, ((F.col("c_custkey") % 365) + 180).cast("int")).alias("aend"),
    )
    b = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        F.lpad((F.col("s_suppkey") % 300).cast("string"), 10, "0").alias("bkey"),
        F.date_add(base, ((F.col("s_suppkey") % 365) + 90).cast("int")).alias("bstart"),
        F.date_add(base, ((F.col("s_suppkey") % 365) + 270).cast("int")).alias("bend"),
    )
    joined = a.join(
        F.broadcast(b),
        (F.substring(F.col("akey"), 1, 8) == F.substring(F.col("bkey"), 1, 8))
        & (F.col("astart") <= F.col("bend"))
        & (F.col("bstart") <= F.col("aend")),
    )
    return joined.select(
        "c_custkey",
        "s_suppkey",
        F.datediff(F.least("aend", "bend"), F.greatest("astart", "bstart"))
        .cast("long")
        .alias("overlap_days"),
    )


# ---------------------------------------------------------------------------
# A1/A2 — period-range rollup with set collection
# (security_master.py:543-555: unique cik list, min/max dates per key)
# ---------------------------------------------------------------------------


@register(
    "period_rollup_collect",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           CAST(MIN(c_custkey) AS BIGINT) AS first_key,
           CAST(MAX(c_custkey) AS BIGINT) AS last_key,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    doc="A1/A2 (security_master.py:543-555, 768-777): groupBy rollup carrying a "
    "sorted collect_set (the reference's unique-cik list) + min/max range "
    "bounds; map-side partial agg keeps the shuffle tiny.  Emitted as a "
    "comma-joined string so the graded frame is scalar-only.",
)
def period_rollup_q(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    return cust.groupBy(F.col("c_nationkey").cast("long").alias("nation")).agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments"),
        F.min("c_custkey").cast("long").alias("first_key"),
        F.max("c_custkey").cast("long").alias("last_key"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


# ---------------------------------------------------------------------------
# F1 + A7/A8 — multi-tag concept merge: union candidate tag streams, then
# deterministic priority dedup per (entity, frame) (fundamental.py:47-120)
# ---------------------------------------------------------------------------


@register(
    "multi_tag_merge_dedup",
    oracle="""
    WITH t1 AS (
      SELECT o_custkey AS cik, CAST(year(o_orderdate) AS BIGINT) AS frame_y,
             'Revenues' AS tag, 1 AS prio, CAST(o_orderdate AS DATE) AS filed,
             o_totalprice AS val, o_orderkey AS okey
      FROM orders WHERE o_orderkey < 20000
    ),
    t2 AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT),
             'SalesRevenueNet', 2, CAST(o_orderdate AS DATE),
             o_totalprice * 1.01, o_orderkey
      FROM orders WHERE o_orderkey < 20000 AND o_orderkey % 3 = 0
    ),
    merged AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2)
    SELECT cik, frame_y, tag, filed, ROUND(val, 4) AS val FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cik, frame_y ORDER BY filed DESC, prio, okey
      ) AS rn FROM merged
    ) WHERE rn = 1
    """,
    doc="F1/A7/A8 (fundamental.py:47-120, 240-287): merge candidate XBRL tag "
    "streams by union, then keep one datapoint per (entity, frame-year) — "
    "latest filed wins, tag priority then key as deterministic tiebreaks.",
)
def multi_tag_merge_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 20000)
    t1 = orders.select(
        F.col("o_custkey").alias("cik"),
        F.year("o_orderdate").cast("long").alias("frame_y"),
        F.lit("Revenues").alias("tag"),
        F.lit(1).alias("prio"),
        F.col("o_orderdate").cast("date").alias("filed"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderkey").alias("okey"),
    )
    t2 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_custkey").alias("cik"),
        F.year("o_orderdate").cast("long").alias("frame_y"),
        F.lit("SalesRevenueNet").alias("tag"),
        F.lit(2).alias("prio"),
        F.col("o_orderdate").cast("date").alias("filed"),
        (F.col("o_totalprice") * 1.01).alias("val"),
        F.col("o_orderkey").alias("okey"),
    )
    merged = t1.unionByName(t2)
    w = Window.partitionBy("cik", "frame_y").orderBy(F.desc("filed"), "prio", "okey")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cik", "frame_y", "tag", "filed", F.round("val", 4).alias("val"))
    )


# ---------------------------------------------------------------------------
# U1 — schema-merging union (pl.concat how='diagonal' ≈
# unionByName(allowMissingColumns=True), security_master.py:970)
# ---------------------------------------------------------------------------


@register(
    "schema_merge_union",
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE year(o_orderdate) < 1995
      UNION ALL BY NAME
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
      FROM orders WHERE year(o_orderdate) >= 1995
    )
    SELECT COALESCE(status, 'NONE') AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dec_sum_sql('price')} AS total
    FROM u GROUP BY COALESCE(status, 'NONE')
    """,
    doc="U1 (security_master.py:970, pl.concat how='diagonal'): schema-merging "
    "append — columns absent on one side become nulls; "
    "unionByName(allowMissingColumns=True) = DuckDB UNION ALL BY NAME.",
)
def schema_merge_union_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    old = orders.filter(F.year("o_orderdate") < 1995).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price")
    )
    new = orders.filter(F.year("o_orderdate") >= 1995).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy(F.coalesce("status", F.lit("NONE")).alias("status")).agg(
        F.count("*").cast("long").alias("n"), dec_sum(F.col("price")).alias("total")
    )


# ---------------------------------------------------------------------------
# N3 — chunking as a one→many JVM op (fixed stride 1300 = size 1500 − overlap
# 200; the sentence-boundary-snapping variant is equity.sentiment.chunk_text,
# covered by golden tests — this is its scale-path twin, no Python in the loop)
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 1500, 1300


@register(
    "doc_fixed_chunks",
    oracle=f"""
    WITH ks AS (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(floor((length(text) - 1) / {_STRIDE}.0) AS BIGINT))) AS k
      FROM documents WHERE length(text) > 0
    ),
    ch AS (
      SELECT doc_id, k, substr(text, CAST(k * {_STRIDE} + 1 AS BIGINT), {_CHUNK}) AS chunk FROM ks
    )
    SELECT doc_id, k, CAST(length(chunk) AS BIGINT) AS chunk_len,
           {hashing.md5_long32_sql('chunk')} AS chunk_hash
    FROM ch WHERE chunk <> ''
    """,
    doc="N3 (derived/sentiment.py:70-117): document → overlapping chunks as a "
    "generate-positions + substring explode (UDTF shape, one→many) entirely "
    "JVM-side; row count multiplies, so it stays partition-local (no shuffle).",
)
def fixed_chunks_q(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).filter(F.length("text") > 0)
    starts = F.sequence(F.lit(0).cast("long"), F.floor((F.length("text") - 1) / F.lit(float(_STRIDE))))
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda k: F.col("text").substr(k.cast("int") * _STRIDE + 1, F.lit(_CHUNK)))
        ).alias("k", "chunk"),
    ).filter(F.col("chunk") != "")
    return chunks.select(
        "doc_id",
        F.col("k").cast("long").alias("k"),
        F.length("chunk").cast("long").alias("chunk_len"),
        hashing.md5_long32(F.col("chunk")).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# A11/A12 — Loughran-McDonald category ratios + readability, as pure column
# expressions over the documents table (word_lists.py:283-341,
# derived/sentiment.py:120-172)
# ---------------------------------------------------------------------------

_STRIP_RE = r"""^[.,!?;:"'()\[\]{}]+|[.,!?;:"'()\[\]{}]+$"""
_STRIP_SQL = _STRIP_RE.replace("'", "''")


def _lm_cat_sql(cat: str) -> str:
    lst = "['" + "','".join(sorted(set(LM_WORDS[cat]))) + "']"
    return (
        f"CASE WHEN total > 0 THEN ROUND(len(list_filter(cw, w -> list_contains({lst}, w))) * 1.0 / total, 6) "
        f"ELSE 0.0 END AS {cat}_ratio"
    )


_SYLL = "len(list_filter(regexp_split_to_array(w, '[^aeiouy]+'), v -> v <> ''))"
_ADJ_SYLL = (
    f"{_SYLL}"
    f" - (CASE WHEN {_SYLL} > 1 AND regexp_matches(w, 'e$') THEN 1 ELSE 0 END)"
    f" - (CASE WHEN {_SYLL} > 1 AND regexp_matches(w, '(ed|es)$') THEN 1 ELSE 0 END)"
)


@register(
    "doc_lm_readability",
    oracle=rf"""
    WITH raw AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS rw
      FROM documents
    ),
    clean AS (
      SELECT doc_id, text, len(rw) AS total,
             list_filter(list_transform(rw, w -> regexp_replace(w, '{_STRIP_SQL}', '', 'g')), w -> w <> '') AS cw
      FROM raw
    ),
    rd AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '') AS words,
             len(list_filter(regexp_split_to_array(text, '[.!?]+(\s|$)'), s -> trim(s) <> '')) AS sents
      FROM documents
    ),
    rd2 AS (
      SELECT doc_id, len(words) AS wc, sents,
             len(list_filter(words, w -> ({_ADJ_SYLL}) >= 3)) AS cplx
      FROM rd
    )
    SELECT c.doc_id,
           CAST(total AS DOUBLE) AS word_count,
           {', '.join(_lm_cat_sql(cat) for cat in LM_WORDS)},
           CASE WHEN wc > 0 AND sents > 0 THEN ROUND(wc * 1.0 / sents, 2) ELSE 0.0 END AS avg_sentence_length,
           CASE WHEN wc > 0 AND sents > 0
                THEN ROUND(0.4 * (wc * 1.0 / sents + 100.0 * cplx / wc), 2) ELSE 0.0 END AS fog_index
    FROM clean c JOIN rd2 USING (doc_id)
    """,
    doc="A11/A12 (word_lists.py:283-341, derived/sentiment.py:120-172): 5 LM "
    "dictionary ratios + avg sentence length + Gunning Fog, all as JVM array/"
    "regex expressions — no Python UDF, embarrassingly parallel per row.",
)
def lm_readability_q(spark, sf_dir):
    from us_equity_datalake_spark.sources.registry import parallelize_small_input

    # the regex/array projections are the cost; a small documents file is ONE
    # input split, serializing them on one core (guide §2.5 input skew) —
    # spread first (guarded no-op at production split counts): 3.8 s -> 0.8 s
    docs = parallelize_small_input(load_table(spark, "documents", sf_dir), "doc_id")
    return docs.select(
        "doc_id",
        *[v.alias(k) for k, v in lm_ratio_columns(F.col("text")).items()],
        *[v.alias(k) for k, v in readability_columns(F.col("text")).items()],
    )


# ---------------------------------------------------------------------------
# N4 + A10 — chunk scoring via mapInPandas (per-executor model singleton) and
# filing-level aggregation (derived/sentiment.py:175-299). The deterministic
# HashSentimentModel (md5-derived label/score) makes the Arrow-batched model
# path oracle-checkable end to end.
# ---------------------------------------------------------------------------

_SENT_COLS = [
    "chunk_count", "sentiment_score", "positive_ratio", "negative_ratio",
    "neutral_ratio", "avg_positive_confidence", "avg_negative_confidence",
    "sentiment_std", "sentiment_range", "sentiment_skew",
    "extreme_negative_ratio", "confidence_std",
]


@register(
    "filing_sentiment_agg",
    oracle=f"""
    WITH ks AS (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(floor((length(text) - 1) / {_STRIDE}.0) AS BIGINT))) AS k
      FROM documents WHERE length(text) > 0
    ),
    ch AS (
      SELECT doc_id, substr(text, CAST(k * {_STRIDE} + 1 AS BIGINT), {_CHUNK}) AS chunk FROM ks
    ),
    hashed AS (
      SELECT doc_id, {hashing.md5_long32_sql('chunk')} AS h FROM ch WHERE chunk <> ''
    ),
    labeled AS (
      SELECT doc_id,
             CASE h % 3 WHEN 0 THEN 'positive' WHEN 1 THEN 'negative' ELSE 'neutral' END AS label,
             ROUND(0.5 + (h % 5000) / 10000.0, 4) AS score
      FROM hashed
    ),
    signed AS (
      SELECT doc_id, label, score,
             CASE WHEN label = 'positive' THEN score
                  WHEN label = 'negative' THEN -score ELSE 0.0 END AS signed
      FROM labeled
    ),
    agg AS (
      SELECT doc_id AS cik,
             CAST(COUNT(*) AS BIGINT) AS chunk_count,
             ROUND(AVG(signed), 4) AS sentiment_score,
             ROUND(AVG(CASE WHEN label = 'positive' THEN 1.0 ELSE 0.0 END), 4) AS positive_ratio,
             ROUND(AVG(CASE WHEN label = 'negative' THEN 1.0 ELSE 0.0 END), 4) AS negative_ratio,
             ROUND(AVG(CASE WHEN label = 'neutral' THEN 1.0 ELSE 0.0 END), 4) AS neutral_ratio,
             ROUND(COALESCE(AVG(CASE WHEN label = 'positive' THEN score END), 0.0), 4) AS avg_positive_confidence,
             ROUND(COALESCE(AVG(CASE WHEN label = 'negative' THEN score END), 0.0), 4) AS avg_negative_confidence,
             ROUND(CASE WHEN COUNT(*) > 1 THEN stddev_samp(signed) ELSE 0.0 END, 4) AS sentiment_std,
             ROUND(COALESCE(MAX(signed) - MIN(signed), 0.0), 4) AS sentiment_range,
             AVG(signed) AS mean_raw,
             MEDIAN(signed) AS median_raw,
             stddev_samp(signed) AS std_raw,
             ROUND(AVG(CASE WHEN signed < -0.5 THEN 1.0 ELSE 0.0 END), 4) AS extreme_negative_ratio,
             ROUND(CASE WHEN COUNT(*) > 1 THEN stddev_samp(score) ELSE 0.0 END, 4) AS confidence_std
      FROM signed GROUP BY doc_id
    )
    SELECT cik, chunk_count, sentiment_score, positive_ratio, negative_ratio,
           neutral_ratio, avg_positive_confidence, avg_negative_confidence,
           sentiment_std, sentiment_range,
           CASE WHEN chunk_count > 1 AND std_raw > 0
                THEN ROUND((mean_raw - median_raw) / std_raw, 4) ELSE 0.0 END AS sentiment_skew,
           extreme_negative_ratio, confidence_std
    FROM agg
    """,
    doc="N4+A10 (models/finbert.py:87-188, derived/sentiment.py:175-299): chunk "
    "→ Arrow-batched model inference (mapInPandas, lazy per-executor "
    "singleton — the GPU-ready harness) → 13 filing-level score aggregates "
    "(mean/ratios/std/skew/range/extreme-negative) in one map-side-combined "
    "groupBy. Deterministic hash model makes it cross-engine checkable.",
)
def filing_sentiment_q(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).filter(F.length("text") > 0)
    starts = F.sequence(F.lit(0).cast("long"), F.floor((F.length("text") - 1) / F.lit(float(_STRIDE))))
    chunks = (
        docs.select(
            F.col("doc_id").alias("cik"),
            F.col("doc_id").alias("accession_number"),
            F.explode(
                F.transform(starts, lambda k: F.col("text").substr(k.cast("int") * _STRIDE + 1, F.lit(_CHUNK)))
            ).alias("chunk"),
        )
        .filter(F.col("chunk") != "")
        .repartition(spark.sparkContext.defaultParallelism, "cik")
    )
    scored = score_chunks(chunks)
    filing_texts = docs.select(
        F.col("doc_id").alias("cik"),
        F.col("doc_id").alias("accession_number"),
        F.lit("2024-03-31").cast("date").alias("filing_date"),
        F.lit("10-K").alias("filing_type"),
        "text",
    )
    wide = aggregate_filing_sentiment(scored, filing_texts)
    return wide.select("cik", *_SENT_COLS)


# ---------------------------------------------------------------------------
# F4 — fiscal year/quarter inference: explicit fy/fp → period-end month →
# frame regex CY(\d{4})Q(\d) (collection/sentiment.py:405-443)
# ---------------------------------------------------------------------------


@register(
    "fiscal_inference",
    oracle=r"""
    WITH base AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 3 = 0 THEN CAST(year(o_orderdate) AS INT) END AS fy,
             CASE WHEN o_orderkey % 3 = 0 THEN
               (CASE WHEN o_orderkey % 12 = 0 THEN 'FY' ELSE 'Q' || CAST(o_orderkey % 4 + 1 AS VARCHAR) END)
             END AS fp,
             CASE WHEN o_orderkey % 3 = 1 THEN CAST(o_orderdate AS DATE) END AS period_end,
             'CY' || CAST(year(o_orderdate) AS VARCHAR) || 'Q' || CAST(o_orderkey % 4 + 1 AS VARCHAR) AS frame
      FROM orders WHERE o_orderkey < 5000
    )
    SELECT k,
           CAST(COALESCE(fy, year(period_end),
                TRY_CAST(regexp_extract(frame, 'CY(\d{4})', 1) AS INT)) AS BIGINT) AS fiscal_year,
           CAST(COALESCE(
                CASE WHEN fp = 'FY' THEN 4 ELSE TRY_CAST(regexp_extract(fp, 'Q([1-4])', 1) AS INT) END,
                CAST(ceil(month(period_end) / 3.0) AS INT),
                TRY_CAST(regexp_extract(frame, 'Q([1-4])', 1) AS INT)) AS BIGINT) AS fiscal_quarter
    FROM base
    """,
    doc="F4 (collection/sentiment.py:405-443): three-stage coalesce — explicit "
    "fy/fp fields, then fiscal-period-end month, then CY####Q# frame regex.",
)
def fiscal_inference_q(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 5000)
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, F.year("o_orderdate")).alias("fy"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.when(F.col("o_orderkey") % 12 == 0, F.lit("FY")).otherwise(
                F.concat(F.lit("Q"), (F.col("o_orderkey") % 4 + 1).cast("string"))
            ),
        ).alias("fp"),
        F.when(F.col("o_orderkey") % 3 == 1, F.col("o_orderdate").cast("date")).alias("period_end"),
        F.concat(
            F.lit("CY"),
            F.year("o_orderdate").cast("string"),
            F.lit("Q"),
            (F.col("o_orderkey") % 4 + 1).cast("string"),
        ).alias("frame"),
    )
    out = infer_fiscal(base, end="period_end")
    return out.select(
        "k",
        F.col("fiscal_year").cast("long").alias("fiscal_year"),
        F.col("fiscal_quarter").cast("long").alias("fiscal_quarter"),
    )


# ---------------------------------------------------------------------------
# Flagship composition — the derived-metrics pipeline (SURVEY §3.1 step 7,
# build-plan phase 3): EAV long table → R1 pivot → J3 as-of join of instant
# concepts → W2/W3 lag windows + safe arithmetic → R2 melt.  One query
# exercising the reference's whole derived path end to end.
# ---------------------------------------------------------------------------


@register(
    "derived_metrics_pipeline",
    oracle=f"""
    WITH qagg AS (
      SELECT o_custkey AS custkey, CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS q,
             {dec_sum_sql('o_totalprice')} AS rev, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM orders WHERE o_custkey < 200 GROUP BY 1, 2
    ),
    bal AS (
      SELECT c_custkey AS custkey,
             DATE '1994-01-01' + CAST(c_custkey % 365 + off AS INT) AS bal_date,
             c_acctbal + off AS bal
      FROM customer, (VALUES (0), (400), (800)) v(off)
      WHERE c_custkey < 200
    ),
    j AS (
      SELECT q.custkey, q.q, q.rev, q.cnt, b.bal
      FROM qagg q ASOF LEFT JOIN bal b ON q.custkey = b.custkey AND b.bal_date <= q.q
    ),
    lagd AS (
      SELECT custkey, q, rev, cnt, bal,
             LAG(rev, 1) OVER w AS rev_l1,
             LAG(bal, 4) OVER w AS bal_l4
      FROM j WINDOW w AS (PARTITION BY custkey ORDER BY q)
    ),
    m AS (
      SELECT custkey, q, rev,
             CASE WHEN cnt IS NOT NULL AND cnt <> 0 AND rev IS NOT NULL THEN rev / cnt END AS rev_per_order,
             CASE WHEN rev IS NOT NULL AND rev_l1 IS NOT NULL THEN rev - rev_l1 END AS rev_grw,
             CASE WHEN bal IS NOT NULL AND bal_l4 IS NOT NULL THEN (bal + bal_l4) / 2 END AS avg_bal4
      FROM lagd
    ),
    m2 AS (
      SELECT custkey, q,
             ROUND(rev_per_order, 6) AS rev_per_order,
             ROUND(rev_grw, 6) AS rev_grw,
             ROUND(avg_bal4, 6) AS avg_bal4,
             ROUND(CASE WHEN avg_bal4 IS NOT NULL AND avg_bal4 <> 0 AND rev IS NOT NULL
                        THEN rev / avg_bal4 END, 6) AS bal_turn
      FROM m
    )
    SELECT custkey, q, 'rev_per_order' AS metric, rev_per_order AS value FROM m2 WHERE rev_per_order IS NOT NULL
    UNION ALL
    SELECT custkey, q, 'rev_grw', rev_grw FROM m2 WHERE rev_grw IS NOT NULL
    UNION ALL
    SELECT custkey, q, 'avg_bal4', avg_bal4 FROM m2 WHERE avg_bal4 IS NOT NULL
    UNION ALL
    SELECT custkey, q, 'bal_turn', bal_turn FROM m2 WHERE bal_turn IS NOT NULL
    """,
    doc="Composed derived pipeline (collectors.py:640-833, metrics.py:76-237): "
    "quarterly EAV rows → pivot(known concepts) → backward as-of join of the "
    "instant concept → lag-1 growth, lag-4 average, safe ratios → melt with "
    "null drop. One shuffle per stage boundary: agg, pivot agg, as-of union "
    "window, lag window (same key → reused partitioning), final melt is "
    "narrow. The whole plan stays in Tungsten; no Python anywhere.",
)
def derived_metrics_pipeline_q(spark, sf_dir):
    from us_equity_datalake_spark.functions.safe_math import safe_add, safe_div, safe_sub
    from us_equity_datalake_spark.operators.asof import asof_join_backward
    from us_equity_datalake_spark.operators.reshape import pivot_long_to_wide, unpivot_wide_to_long

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 200)
    qagg = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("quarter", F.col("o_orderdate").cast("date")).cast("date").alias("q"),
    ).agg(dec_sum(F.col("o_totalprice")).alias("rev"), F.count("*").cast("double").alias("cnt"))
    # store-shaped long EAV rows, then pivot back for compute (the lake's
    # fundamental tables are long at rest, SURVEY §1.1)
    long = unpivot_wide_to_long(
        qagg, index=["custkey", "q"], value_cols=["rev", "cnt"], key_name="concept", value_name="value"
    )
    wide = pivot_long_to_wide(long, index=["custkey", "q"], key="concept", value="value", known_keys=["rev", "cnt"])

    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") < 200)
    bal = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal"),
        F.explode(F.array(*[F.lit(o) for o in (0, 400, 800)])).alias("off"),
    ).select(
        "custkey",
        F.date_add(F.lit("1994-01-01").cast("date"), (F.col("custkey") % 365 + F.col("off")).cast("int")).alias("bal_date"),
        (F.col("c_acctbal") + F.col("off")).alias("bal"),
    )
    joined = asof_join_backward(wide, bal, by=["custkey"], left_on="q", right_on="bal_date", value_cols=["bal"])

    w = Window.partitionBy("custkey").orderBy("q")
    avg_bal4 = safe_div(safe_add(F.col("bal"), F.lag("bal", 4).over(w)), F.lit(2.0))
    m = joined.select(
        "custkey",
        "q",
        F.round(safe_div(F.col("rev"), F.col("cnt")), 6).alias("rev_per_order"),
        F.round(safe_sub(F.col("rev"), F.lag("rev", 1).over(w)), 6).alias("rev_grw"),
        F.round(avg_bal4, 6).alias("avg_bal4"),
        F.round(safe_div(F.col("rev"), avg_bal4), 6).alias("bal_turn"),
    )
    return unpivot_wide_to_long(
        m, index=["custkey", "q"], value_cols=["rev_per_order", "rev_grw", "avg_bal4", "bal_turn"],
        key_name="metric", value_name="value", drop_null=True,
    )


# ---------------------------------------------------------------------------
# §2.9 date/time — UTC → ET wall-clock + market-hours session rollup
# (alpaca_ticks.py:807-842, collectors.py:346-363; hard-problem #9)
# ---------------------------------------------------------------------------


@register(
    "market_hours_et_rollup",
    oracle=f"""
    WITH et AS (
      SELECT timezone('America/New_York', timezone('UTC', ts)) AS ets, value
      FROM events
    ),
    mh AS (
      SELECT * FROM et
      WHERE (hour(ets) * 60 + minute(ets)) >= 570 AND (hour(ets) * 60 + minute(ets)) < 960
    )
    SELECT CAST(ets AS DATE) AS et_date,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dec_sum_sql('value')} AS total,
           strftime(MIN(ets), '%H:%M:%S') AS first_t,
           strftime(MAX(ets), '%H:%M:%S') AS last_t
    FROM mh GROUP BY CAST(ets AS DATE)
    """,
    doc="§2.9 date/time (alpaca_ticks.py:807-842): UTC instants → ET "
    "wall-clock via the tz database (DST-correct), 9:30–16:00 session filter "
    "on wall minutes, rollup by ET trading date. All JVM-side; the conversion "
    "is one codegen'd expression, no shuffle added.",
)
def market_hours_q(spark, sf_dir):
    from us_equity_datalake_spark.functions import timeops

    events = load_table(spark, "events", sf_dir)
    et = events.select(timeops.to_eastern_wallclock(F.col("ts")).alias("ets"), "value")
    mh = et.filter(timeops.in_market_hours(F.col("ets")))
    return mh.groupBy(timeops.et_trading_date(F.col("ets")).alias("et_date")).agg(
        F.count("*").cast("long").alias("n"),
        dec_sum(F.col("value")).alias("total"),
        F.date_format(F.min("ets"), "HH:mm:ss").alias("first_t"),
        F.date_format(F.max("ets"), "HH:mm:ss").alias("last_t"),
    )


# ---------------------------------------------------------------------------
# Minute → daily resample (collectors.py:296-388): the intraday rollup that
# builds the daily lake from minute bars
# ---------------------------------------------------------------------------


@register(
    "minute_to_daily_ohlcv",
    oracle="""
    SELECT user_id AS security_id, CAST(ts AS DATE) AS d,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_bars
    FROM events GROUP BY user_id, CAST(ts AS DATE)
    """,
    doc="Minute→daily OHLCV resample (collectors.py:296-388): single "
    "map-side-combined groupBy per (key, day); open/close are min_by/max_by "
    "on the timestamp — no sort or window over raw bars, one shuffle total.",
)
def minute_to_daily_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.ticks import minute_to_daily_ohlcv

    events = load_table(spark, "events", sf_dir)
    bars = events.select(F.col("user_id").alias("security_id"), "ts", F.col("value").alias("price"))
    return minute_to_daily_ohlcv(bars, key="security_id", ts_col="ts", price_col="price")


# ---------------------------------------------------------------------------
# Window-frame extensions beyond the reference (SURVEY §2.5 notes the
# reference uses no range frames and no ntile): the trailing-90-day liquidity
# window (A3 done as a proper sliding frame instead of a snapshot groupBy)
# and decile bucketing (factor-portfolio construction).
# ---------------------------------------------------------------------------


@register(
    "trailing_range_liquidity",
    oracle="""
    SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ), 6) AS adv90,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n90
    FROM orders WHERE o_custkey < 100
    """,
    doc="A3 as a true RANGE frame (universe/manager.py:216-223 computes "
    "trailing-90-day dollar volume as a snapshot groupBy; the sliding form "
    "gives it per-day): value-based frame over the date axis — gaps count, "
    "rows don't. One shuffle on the partition key.",
)
def trailing_range_liquidity_q(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 100)
    d = F.col("o_orderdate").cast("date")
    # RANGE frame over days: order by epoch-days, bounds in days
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.datediff(d, F.lit("1970-01-01").cast("date")))
        .rangeBetween(-90, 0)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        d.alias("d"),
        F.round(F.avg("o_totalprice").over(w), 6).alias("adv90"),
        F.count("*").over(w).cast("long").alias("n90"),
    )


@register(
    "decile_buckets",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
    FROM customer
    """,
    doc="Factor-portfolio bucketing (beyond-reference): ntile(10) + "
    "percent_rank with a total order (acctbal, custkey) so ties are "
    "deterministic. Global-order window — fine at dimension scale; at fact "
    "scale use approx quantile cutpoints + a broadcast range join instead.",
)
def decile_buckets_q(spark, sf_dir):
    from pyspark.sql import Window as W

    cust = load_table(spark, "customer", sf_dir)
    w = W.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return cust.select(
        "c_custkey",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# S6 / §1.3 — semi-structured companyfacts ingest, oracle-gated end to end:
# Spark builds the nested EDGAR-shaped JSON document per entity (to_json over
# maps of maps of datapoint arrays), then runs the REAL normalize_companyfacts
# (from_json + 3 explodes + unit-priority min_by).  The oracle computes the
# expected normalized rows directly — USD must win over EUR, shares kept where
# USD absent.
# ---------------------------------------------------------------------------


@register(
    "companyfacts_normalize",
    oracle="""
    SELECT o_custkey AS cik, 'Revenues' AS tag, 'USD' AS unit,
           CAST(o_orderdate AS DATE) AS end_date, o_totalprice AS val,
           CAST(o_orderkey AS VARCHAR) AS accn
    FROM orders WHERE o_custkey < 50
    UNION ALL
    SELECT o_custkey, 'SharesOutstanding', 'shares',
           CAST(o_orderdate AS DATE), CAST(o_orderkey % 100 AS DOUBLE),
           CAST(o_orderkey AS VARCHAR)
    FROM orders WHERE o_custkey < 50
    """,
    doc="S6 (fundamental.py:81-187, §1.3): EDGAR companyfacts JSON → long "
    "rows, fully JVM-side — permissive from_json, explode over "
    "taxonomy/tag/unit maps, unit priority USD > shares > alphabetical via "
    "one min_by aggregation. JSON built deterministically from orders so the "
    "oracle can state the expected output directly.",
)
def companyfacts_normalize_q(spark, sf_dir):
    from us_equity_datalake_spark.sources.ingest import normalize_companyfacts

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 50)

    def dp(val_col):
        return F.struct(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("end"),
            F.lit(None).cast("string").alias("start"),
            val_col.alias("val"),
            F.col("o_orderkey").cast("string").alias("accn"),
            F.year("o_orderdate").cast("long").alias("fy"),
            F.lit("Q1").alias("fp"),
            F.lit("10-K").alias("form"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("filed"),
            F.concat(F.lit("CY"), F.year("o_orderdate").cast("string")).alias("frame"),
        )

    per_cik = orders.groupBy(F.col("o_custkey").alias("cik")).agg(
        F.collect_list(dp(F.col("o_totalprice"))).alias("rev_usd"),
        F.collect_list(dp(F.col("o_totalprice") * 0.9)).alias("rev_eur"),
        F.collect_list(dp((F.col("o_orderkey") % 100).cast("double"))).alias("sh"),
    )
    facts = F.create_map(
        F.lit("us-gaap"),
        F.create_map(
            F.lit("Revenues"),
            F.struct(
                F.lit("Revenues").alias("label"),
                F.create_map(F.lit("USD"), F.col("rev_usd"), F.lit("EUR"), F.col("rev_eur")).alias("units"),
            ),
            F.lit("SharesOutstanding"),
            F.struct(
                F.lit("Shares").alias("label"),
                F.create_map(F.lit("shares"), F.col("sh")).alias("units"),
            ),
        ),
    )
    docs = per_cik.select(F.to_json(F.struct(F.col("cik"), facts.alias("facts"))).alias("json"))
    out = normalize_companyfacts(docs)
    return out.select(
        "cik", "tag", "unit", F.col("end").alias("end_date"), "val", "accn"
    )


_FW_TARGET = "1995-06-30"
_FW_LOOKBACK = 30


@register(
    "filing_window_filter",
    oracle=f"""
    WITH filings AS (
      SELECT o_orderkey AS filing_id,
             CAST(o_orderdate AS DATE) AS filing_date,
             CASE o_orderpriority
               WHEN '1-URGENT' THEN '10-K' WHEN '2-HIGH' THEN '10-Q'
               WHEN '3-MEDIUM' THEN '8-K' WHEN '4-NOT SPECIFIED' THEN 'S-1'
               ELSE '10-K/A' END AS filing_type
      FROM orders
    )
    SELECT filing_id, filing_date, filing_type
    FROM filings
    WHERE filing_date >= DATE '{_FW_TARGET}' - {_FW_LOOKBACK}
      AND filing_date <= DATE '{_FW_TARGET}'
      AND filing_type IN ('10-K', '10-Q', '10-K/A', '10-Q/A', '8-K')
    """,
    doc=f"P8+P9+I2 (reference update/app.py:154-206 get_recent_edgar_filings): "
    f"the trailing {_FW_LOOKBACK}-day filing re-check window — relevant form "
    "types only (P8), future-dated filings excluded (P9: filing_date must "
    "not exceed the target date), lookback lower bound (I2).  Fixture maps "
    "order priority to form type; rows after the target date exercise the "
    "future-date guard.  All three predicates push to the scan.",
)
def filing_window_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.daily_job import recent_filings_window

    filings = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("filing_id"),
        F.col("o_orderdate").cast("date").alias("filing_date"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "10-K")
        .when(F.col("o_orderpriority") == "2-HIGH", "10-Q")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "8-K")
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", "S-1")
        .otherwise("10-K/A").alias("filing_type"),
    )
    return recent_filings_window(
        filings, target_date=_FW_TARGET, lookback_days=_FW_LOOKBACK
    ).select("filing_id", "filing_date", "filing_type")


# ---------------------------------------------------------------------------
# P2 as a first-class graded operator: both null-row arms on INJECTED nulls
# (split_adjust_projection's inline drop sees no real nulls in the fixture
# tables, so the discipline itself was effectively ungraded until round 4).
# ---------------------------------------------------------------------------


@register(
    "null_bar_discipline",
    oracle=f"""
    WITH bars AS (
      SELECT l_orderkey * 10 + l_linenumber AS k,
             CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE ROUND(l_extendedprice / 100, 4) END AS open,
             CASE WHEN l_orderkey % 11 = 0 OR l_orderkey % 7 = 0 THEN NULL ELSE ROUND(l_extendedprice / 99, 4) END AS high,
             CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE ROUND(l_extendedprice / 101, 4) END AS low,
             CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE ROUND(l_extendedprice / 100.5, 4) END AS close
      FROM lineitem WHERE l_orderkey < 6000
    ),
    kept_all AS (
      SELECT * FROM bars WHERE NOT (open IS NULL AND high IS NULL AND low IS NULL AND close IS NULL)
    ),
    kept_any AS (
      SELECT * FROM bars WHERE open IS NOT NULL AND high IS NOT NULL AND low IS NOT NULL AND close IS NOT NULL
    )
    SELECT 'all' AS arm, COUNT(*) AS n_rows, {dec_sum_sql('close')} AS sum_close FROM kept_all
    UNION ALL
    SELECT 'any' AS arm, COUNT(*) AS n_rows, {dec_sum_sql('close')} AS sum_close FROM kept_any
    """,
    doc="P2 both arms on injected nulls: all-null placeholder rows (k%11) are "
    "dropped by how='all' AND how='any'; partial-null bars (k%7: high only) "
    "survive 'all' but are skipped by 'any' (update/app.py:386-393 vs "
    "crsp_ticks.py:281-295).  The counts and decimal close-sums of both arms "
    "are graded, so keeping a placeholder row or dropping a partial row "
    "breaks the hash.",
)
def null_bar_discipline_q(spark, sf_dir):
    from us_equity_datalake_spark.equity.ticks import drop_null_bar_rows

    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 6000)
    all_null = F.col("l_orderkey") % 11 == 0
    part_null = F.col("l_orderkey") % 7 == 0
    bars = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        F.when(all_null, F.lit(None)).otherwise(F.round(F.col("l_extendedprice") / 100, 4)).alias("open"),
        F.when(all_null | part_null, F.lit(None)).otherwise(F.round(F.col("l_extendedprice") / 99, 4)).alias("high"),
        F.when(all_null, F.lit(None)).otherwise(F.round(F.col("l_extendedprice") / 101, 4)).alias("low"),
        F.when(all_null, F.lit(None)).otherwise(F.round(F.col("l_extendedprice") / 100.5, 4)).alias("close"),
    )
    cols = ("open", "high", "low", "close")
    kept_all = drop_null_bar_rows(bars, cols=cols, how="all")
    kept_any = drop_null_bar_rows(bars, cols=cols, how="any")

    def report(df, arm):
        return df.agg(
            F.count("*").alias("n_rows"), dec_sum(F.col("close")).alias("sum_close")
        ).select(F.lit(arm).alias("arm"), "n_rows", "sum_close")

    return report(kept_all, "all").unionByName(report(kept_any, "any"))
