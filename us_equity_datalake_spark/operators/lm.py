"""N-gram language-model quality scoring (CCNet-style perplexity filter).

Wenzek et al., *CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data* (2020) rank web documents by the perplexity of a language model
trained on a trusted reference corpus — low perplexity ~ "wikipedia-like",
the head/middle/tail split that seeded most modern pretraining mixes.  This
module implements that filter Spark-first:

- **Train**: bigram + unigram counts are two ``groupBy`` aggregations over the
  exploded token stream — output is vocabulary-sized (distinct unigrams /
  distinct bigrams), a tiny fraction of the 100 TB token stream, and the
  aggregation is map-side-combined by Catalyst.
- **Score**: every (doc, bigram) row joins the count tables on their natural
  keys.  The unigram/context tables are vocabulary-sized and AQE promotes
  them to broadcast; the bigram-count join shuffles on (p, w) — the one
  unavoidable shuffle, linear in corpus size.  Per-document reduction is a
  single ``groupBy(doc_id)``.
- In production the LM would be trained ONCE on the reference corpus, pruned
  to top-V, and broadcast; training here runs on the scored corpus itself so
  the whole pipeline is graded end-to-end by one oracle.

Smoothing is interpolated add-alpha over the unigram distribution:

    P(w | p) = (c(p,w) + alpha * P_uni(w)) / (c(p,.) + alpha)
    P_uni(w) = (c(w) + 1) / (N + V)

Every per-bigram log term is ``round(ln(...), 6)`` cast to DECIMAL(30,6) so
the per-document sum is exact and order-independent (base.py discipline);
``F.log`` / DuckDB ``ln`` parity is already pinned by the tfidf/bm25 oracles.

Reference parity: the reference's text surface scores documents with static
word lists (collection/sentiment.py LM counts); a trainable corpus-level LM
filter is part of the north-star LLM-pipeline tier, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from us_equity_datalake_spark.functions import text
from us_equity_datalake_spark.functions.hashing import md5_long32, md5_long32_sql

DEFAULT_ALPHA = 0.4


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, p, w) — one row per in-document bigram occurrence (not distinct)."""
    toks = docs.select(id_col, text.tokens(F.col(text_col)).alias("t"))
    pairs = F.expr(
        "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS p, element_at(t, i + 1) AS w))"
    )
    return (
        toks.where(F.size("t") >= 2)
        .select(id_col, F.explode(pairs).alias("bg"))
        .select(id_col, F.col("bg.p").alias("p"), F.col("bg.w").alias("w"))
    )


def bigram_lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood over ``docs``.

    Returns (id_col, n_bigrams, total_nll DECIMAL(30,6), avg_nll double):
    ``avg_nll`` is the CCNet ranking statistic (monotone in perplexity =
    exp(avg_nll)); documents with < 2 tokens carry no bigram evidence and are
    excluded.  Plan shape: 2 count aggregations (vocab-sized output), one
    (p, w) shuffle join, vocab-sized joins AQE-broadcast, one groupBy(id).
    """
    toks = docs.select(id_col, text.tokens(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    totals = uni.agg(
        F.sum("c_w").alias("n_tok"), F.count("*").alias("v_size")
    )  # 1 row — broadcast, never collected
    doc_bg = _doc_bigrams(docs, text_col, id_col)
    big = doc_bg.groupBy("p", "w").agg(F.count("*").alias("c_pw"))
    ctx = big.groupBy("p").agg(F.sum("c_pw").alias("c_p"))

    term = _nll_term(alpha)
    scored = (
        doc_bg.join(big, ["p", "w"])
        .join(ctx, "p")
        .join(uni, "w")
        .crossJoin(F.broadcast(totals))
        .select(id_col, term.alias("nll"))
    )
    # avg_nll rounding is INTEGER half-up in micro-units: total_nll is an
    # exact DECIMAL(.,6) sum, and the double quotient total/count can land
    # exactly on a 6th-decimal half (e.g. 271.59884/80 = 3.3949855), where
    # Spark's BigDecimal-of-binary rounds down and DuckDB rounds up — a
    # divergence the sf0.1 gate caught.  (2*micro + n) div (2*n) is the
    # same half-up rule computed tie-free in exact arithmetic.
    avg_micro = F.expr(
        "(2 * cast(total_nll * 1000000 as bigint) + n_bigrams) div (2 * n_bigrams)"
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("nll").alias("total_nll"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.col("total_nll").cast("double").alias("total_nll"),
            (avg_micro.cast("double") / F.lit(1000000.0)).alias("avg_nll"),
        )
    )


def _nll_term(alpha: float) -> Column:
    """-round(ln(P(w|p)), 6) as DECIMAL(30,6) — exact, order-independent sum.

    The float expression tree mirrors :func:`nll_term_sql` operation for
    operation so both engines evaluate identical IEEE doubles before the
    round.
    """
    p_uni = (F.col("c_w") + F.lit(1.0)) / (F.col("n_tok") + F.col("v_size"))
    prob = (F.col("c_pw") + F.lit(alpha) * p_uni) / (F.col("c_p") + F.lit(alpha))
    return (-F.round(F.log(prob), 6)).cast("decimal(30,6)")


def nll_term_sql(alpha: float = DEFAULT_ALPHA) -> str:
    """DuckDB twin of :func:`_nll_term` (same operand order / associativity)."""
    p_uni = "(c_w + 1.0) / (n_tok + v_size)"
    prob = f"(c_pw + {alpha} * {p_uni}) / (c_p + {alpha})"
    return f"(-ROUND(ln({prob}), 6))::DECIMAL(30,6)"


# --- DSIR: data selection via importance resampling (Xie et al. 2023) ------
#
# Xie et al., *Data Selection for Language Models via Importance Resampling*
# (NeurIPS 2023): fit two hashed-n-gram bag-of-words models — p on a trusted
# TARGET corpus, q on the RAW pool — then resample raw documents with
# probability proportional to the importance weight p(x)/q(x), via the
# Gumbel-top-k trick on log weights.  Spark-first plan:
#
# - ONE feature-extraction pass builds per-doc hashed (unigram + bigram)
#   bucket counts, carrying the row's is-target flag (JVM explode + md5,
#   whole-stage codegen, no Python).
# - BOTH models come out of a single groupBy(bucket) with a conditional sum —
#   output is n_buckets rows, broadcastable at any corpus size.
# - Scoring re-derives the feature pass (2 corpus scans total, both pure
#   scan-bound JVM codegen — cheaper than persisting an exploded feature
#   table larger than the corpus) and joins the bucket-level log-ratio table
#   (AQE-broadcast), then one groupBy(doc) sum.
# - Selection is orderBy(key desc).limit(k) -> TakeOrderedAndProject:
#   per-partition heaps, no global sort shuffle.
#
# Determinism/parity: buckets use md5 (functions.hashing); every log term is
# round(ln(...), 6) scaled to BIGINT MICRO-UNITS (x 1e6), so per-doc weight
# sums and the top-k ordering are exact integer arithmetic in both engines
# (no decimal-precision-cap or float-sum divergence possible); the Gumbel
# noise derives from an md5-seeded uniform, so the "random" resample is
# bit-identical across engines and runs.

DSIR_BUCKETS = 1024
_GUMBEL_SALT = ":dsir"
_U32_DENOM = 4_294_967_297.0  # 2^32 + 1: u = (h + 1) / denom is in (0, 1)
_MICRO = 1_000_000.0


def _micro(x: Column) -> Column:
    """round(x, 6) in exact integer micro-units (bigint).

    The double round lands within ~1e-10 of an integer multiple of 1e-6, so
    the second round-to-integer is never near a .5 boundary — both engines
    produce the identical bigint from the identical input double.
    """
    return F.round(F.round(x, 6) * F.lit(_MICRO), 0).cast("long")


def _micro_sql(expr: str) -> str:
    return f"CAST(ROUND(ROUND({expr}, 6) * {_MICRO}, 0) AS BIGINT)"


def _doc_features(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, is_tgt, feat) — one row per unigram AND bigram occurrence.

    Unigrams and bigrams come out of a SINGLE explode over the concatenated
    feature array (not a unionAll of two branches), so each logical feature
    pass is exactly one corpus scan.
    """
    toks = docs.select(id_col, "is_tgt", text.tokens(F.col(text_col)).alias("t"))
    # CASE guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]) and
    # element_at(t, 0) throws, so docs with < 2 tokens contribute unigrams only.
    feats = F.expr(
        "CASE WHEN size(t) >= 2 THEN concat(t, transform(sequence(1, size(t) - 1), "
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) ELSE t END"
    )
    return toks.select(id_col, "is_tgt", F.explode(feats).alias("feat"))


def _bucket_counts(feats: DataFrame, id_col: str, n_buckets: int) -> DataFrame:
    return (
        feats.withColumn("bucket", md5_long32(F.col("feat")) % F.lit(n_buckets))
        .groupBy(id_col, "is_tgt", "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight over ``docs``.

    ``is_target`` marks the trusted-target subset (p); the raw pool (q) is
    the whole frame.  Returns (id_col, n_feats, logw_u bigint micro-units):
    logw = sum_f c_f(x) * round(ln(p_f) - ln(q_f), 6) with add-1 smoothing
    over ``n_buckets`` hashed unigram+bigram buckets.
    """
    flagged = docs.withColumn("is_tgt", is_target)
    fb = _bucket_counts(_doc_features(flagged, text_col, id_col), id_col, n_buckets)
    model = fb.groupBy("bucket").agg(
        F.sum("c").alias("c_q"),
        F.sum(F.when(F.col("is_tgt"), F.col("c")).otherwise(F.lit(0))).alias("c_p"),
    )
    totals = model.agg(
        F.sum("c_q").alias("n_q"), F.sum("c_p").alias("n_p")
    )  # 1 row — broadcast, never collected
    b = float(n_buckets)
    lnr = F.log((F.col("c_p") + F.lit(1.0)) / (F.col("n_p") + F.lit(b))) - F.log(
        (F.col("c_q") + F.lit(1.0)) / (F.col("n_q") + F.lit(b))
    )
    lr = model.crossJoin(F.broadcast(totals)).select(
        "bucket", _micro(lnr).alias("lr_u")
    )
    return (
        fb.join(lr, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_u")).alias("logw_u"),
        )
    )


def gumbel_key_u(id_col: Column) -> Column:
    """Deterministic Gumbel noise in micro-units: add to logw_u for top-k.

    u = (md5_32(id || salt) + 1) / (2^32 + 1) in (0, 1); g = -ln(-ln(u)).
    """
    h = md5_long32(F.concat(id_col.cast("string"), F.lit(_GUMBEL_SALT)))
    u = (h + F.lit(1.0)) / F.lit(_U32_DENOM)
    return _micro(-F.log(-F.log(u)))


def dsir_resample(
    docs: DataFrame,
    is_target: Column,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel-top-k DSIR resample: the k raw docs with largest logw + Gumbel.

    Returns (id_col, n_feats, logw double, sample_key double), deterministic
    for a fixed corpus.  Selection is orderBy(key desc).limit(k) ->
    TakeOrderedAndProject: per-partition heaps, no global sort shuffle.
    """
    scored = dsir_importance_weights(docs, is_target, text_col, id_col, n_buckets)
    keyed = scored.withColumn("key_u", F.col("logw_u") + gumbel_key_u(F.col(id_col)))
    return (
        keyed.orderBy(F.col("key_u").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "n_feats",
            F.round(F.col("logw_u") / F.lit(_MICRO), 6).alias("logw"),
            F.round(F.col("key_u") / F.lit(_MICRO), 6).alias("sample_key"),
        )
    )


def dsir_bucket_sql(feat_expr: str, n_buckets: int = DSIR_BUCKETS) -> str:
    """DuckDB twin of the feature-bucket hash."""
    return f"({md5_long32_sql(feat_expr)} % {n_buckets})"


def dsir_lr_u_sql(n_buckets: int = DSIR_BUCKETS) -> str:
    """DuckDB twin of the bucket log-ratio micro-units (c_p/c_q/n_p/n_q)."""
    b = float(n_buckets)
    return _micro_sql(f"ln((c_p + 1.0) / (n_p + {b})) - ln((c_q + 1.0) / (n_q + {b}))")


def gumbel_key_u_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`gumbel_key_u`."""
    h = md5_long32_sql(f"CAST({id_expr} AS VARCHAR) || '{_GUMBEL_SALT}'")
    return _micro_sql(f"-ln(-ln(({h} + 1.0) / {_U32_DENOM}))")
