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
