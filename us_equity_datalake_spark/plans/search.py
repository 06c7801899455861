"""Retrieval-tier queries over the ``documents`` table: TF-IDF top terms,
BM25 ranking, and conjunctive boolean search — the search/ranking counterpart
of the dedup/fingerprint family in plans/textops.py.

Query terms deliberately mix selectivities: ``dup`` appears in ~5% of
documents (the discriminative term), the others in nearly all — so IDF/BM25
weighting, not raw term frequency, decides the ranking.  All scores follow the
repo float discipline (``round(x, 6)``) and every query has a full DuckDB
oracle built from the same tokenizer fragment (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions import text
from us_equity_datalake_spark.functions.vector import cosine_sql
from us_equity_datalake_spark.operators import retrieval
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

_TOKS_SQL = f"""
  toks AS (
    SELECT doc_id, {text.tokens_sql('text')} AS t FROM documents
  ),
  tok AS (
    SELECT doc_id, unnest(t) AS term FROM toks
  ),
  tc AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
  ),
  dft AS (
    SELECT term, COUNT(*) AS df_t FROM tc GROUP BY 1
  ),
  n AS (
    SELECT COUNT(*) AS n_docs FROM documents
  )
"""

_TOP_TERMS = 3
_QUERY_TERMS = ["dup", "spark", "window"]
_CONJ_TERMS = ["dup", "spark", "join"]
_terms_in = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
_conj_in = ", ".join(f"'{t}'" for t in _CONJ_TERMS)


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH {_TOKS_SQL},
    scored AS (
      SELECT tc.doc_id, tc.term, tc.tf,
             ROUND(tc.tf * ln(CAST(n_docs AS DOUBLE) / df_t), 6) AS tfidf
      FROM tc JOIN dft ON tc.term = dft.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= {_TOP_TERMS}
    """,
    doc="Top-3 TF-IDF terms per document: one explode+groupBy shuffle for term "
    "counts, a vocabulary-sized DF join for IDF (hash join — a 100 TB corpus "
    "vocabulary is NOT broadcastable), scalar N via broadcast cross join.",
)
def tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    scored = retrieval.tfidf(docs)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TOP_TERMS)


@register(
    "bm25_search",
    oracle=f"""
    WITH {_TOKS_SQL},
    dl AS (
      SELECT doc_id, len(t) AS dl FROM toks
    ),
    scalars AS (
      SELECT (SELECT AVG(dl) FROM dl) AS avgdl, (SELECT n_docs FROM n) AS n_docs
    ),
    contrib AS (
      SELECT tc.doc_id,
             ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * (tc.tf * ({retrieval.BM25_K1} + 1))
               / (tc.tf + {retrieval.BM25_K1} * (1 - {retrieval.BM25_B} + {retrieval.BM25_B} * dl.dl / avgdl)) AS c
      FROM tc
      JOIN dft ON tc.term = dft.term
      JOIN dl ON tc.doc_id = dl.doc_id
      CROSS JOIN scalars
      WHERE tc.term IN ({_terms_in})
    )
    SELECT doc_id, COUNT(*) AS n_terms_matched, ROUND(SUM(c), 6) AS score
    FROM contrib GROUP BY doc_id
    """,
    doc="Okapi BM25 (k1=1.2, b=0.75) for query ['dup','spark','window']: the "
    "corpus is filtered to query terms BEFORE any join (inverted-index access "
    "path), so join input is |matches|, not |corpus|; 'dup' is rare (~5% of "
    "docs) and dominates via IDF.",
)
def bm25_search(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return retrieval.bm25(docs, _QUERY_TERMS)


@register(
    "conjunctive_term_search",
    oracle=f"""
    WITH {_TOKS_SQL},
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hit FROM tc
      WHERE term IN ({_conj_in}) GROUP BY doc_id
    )
    SELECT h.doc_id, d.lang, d.n_chars
    FROM hits h JOIN documents d ON h.doc_id = d.doc_id
    WHERE n_hit = {len(_CONJ_TERMS)}
    """,
    doc="Conjunctive boolean search (docs containing ALL of dup∧spark∧join): "
    "posting-list intersection as filter → narrow per-doc count == |terms|; "
    "metadata joined back only for the matching ids.",
)
def conjunctive_term_search(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    ids = retrieval.containing_all(docs, _CONJ_TERMS)
    return ids.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")


_RRF_K = 60  # Cormack et al. reciprocal-rank-fusion constant
_RRF_L = 50  # per-list truncation (the retrieved candidate set)


@register(
    "hybrid_rank_fusion",
    oracle=f"""
    WITH {_TOKS_SQL},
    dl AS (
      SELECT doc_id, len(t) AS dl FROM toks
    ),
    scalars AS (
      SELECT (SELECT AVG(dl) FROM dl) AS avgdl, (SELECT n_docs FROM n) AS n_docs
    ),
    contrib AS (
      SELECT tc.doc_id,
             ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * (tc.tf * ({retrieval.BM25_K1} + 1))
               / (tc.tf + {retrieval.BM25_K1} * (1 - {retrieval.BM25_B} + {retrieval.BM25_B} * dl.dl / avgdl)) AS c
      FROM tc
      JOIN dft ON tc.term = dft.term
      JOIN dl ON tc.doc_id = dl.doc_id
      CROSS JOIN scalars
      WHERE tc.term IN ({_terms_in})
    ),
    lex AS (
      SELECT doc_id, ROUND(SUM(c), 6) AS s FROM contrib GROUP BY doc_id
    ),
    lex_top AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS lex_rank
      FROM lex QUALIFY lex_rank <= {_RRF_L}
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id, ROUND({cosine_sql('embedding', 'q')}, 6) AS c
      FROM embeddings, qv
    ),
    sem_top AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS sem_rank
      FROM sem QUALIFY sem_rank <= {_RRF_L}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
             ROUND(COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0)
                   + COALESCE(1.0 / ({_RRF_K} + s.sem_rank), 0), 6) AS rrf_score
      FROM lex_top l FULL OUTER JOIN sem_top s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, lex_rank, sem_rank, rrf_score,
           ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
    FROM fused
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009): "
    "BM25 lexical ranking for ['dup','spark','window'] fused with "
    "exact-cosine semantic ranking against the vec_id-0 query embedding, "
    "score = sum of 1/(60+rank) over the lists containing the doc.  Fusing "
    "on integer RANKS (each list deterministically tie-broken on its "
    "6-decimal rounded score, then doc_id) keeps the fusion exactly "
    "reproducible cross-engine where raw-score interpolation would not be.  "
    "Scale shape: each list is top-L truncated with orderBy().limit() "
    "(TakeOrderedAndProject — per-task heaps, no global sort), and only the "
    "<= 2L fused candidates ever enter a window.",
)
def hybrid_rank_fusion(spark, sf_dir):
    from us_equity_datalake_spark.functions import vector
    from us_equity_datalake_spark.operators.topk import top_k

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    lex = retrieval.bm25(docs, _QUERY_TERMS).select("doc_id", F.col("score").alias("s"))
    lex_top = top_k(lex, order=[F.desc("s"), F.col("doc_id").asc()], k=_RRF_L)
    lex_r = lex_top.withColumn(
        "lex_rank", F.row_number().over(Window.orderBy(F.desc("s"), "doc_id"))
    ).select("doc_id", "lex_rank")

    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sem = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(vector.cosine(F.col("embedding"), F.col("qv")), 6).alias("c"),
    )
    sem_top = top_k(sem, order=[F.desc("c"), F.col("doc_id").asc()], k=_RRF_L)
    sem_r = sem_top.withColumn(
        "sem_rank", F.row_number().over(Window.orderBy(F.desc("c"), "doc_id"))
    ).select("doc_id", "sem_rank")

    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    fused = (
        lex_r.join(sem_r, "doc_id", "full_outer")
        .select("doc_id", "lex_rank", "sem_rank", rrf.alias("rrf_score"))
    )
    return fused.withColumn(
        "fused_rank", F.row_number().over(Window.orderBy(F.desc("rrf_score"), "doc_id"))
    )
