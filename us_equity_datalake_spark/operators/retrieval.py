"""Retrieval scoring over the ``documents`` table: inverted term statistics,
TF-IDF, and BM25 — the search/ranking tier of a training-data pipeline
(nearest text analog of the reference's word-category counting surface,
derived/word_lists.py:283-341, generalized from fixed dictionaries to a
corpus-derived vocabulary).

Plan shape (and why it scales):

- ``term_counts`` is explode → groupBy(doc, term): ONE shuffle keyed on
  (doc_id, term) with map-side partial aggregation; the exploded token stream
  never materializes unaggregated.
- Document frequency / IDF is a second, much smaller aggregation over the
  (doc, term) table — vocabulary-sized output (Zipf: ≪ corpus), joined back
  as a plain hash join on ``term``.  Do NOT broadcast it blindly: a 100 TB
  corpus has a vocabulary in the hundreds of millions.
- Corpus scalars (N, avgdl) are 1-row aggregates cross-joined (broadcast by
  construction) — the standard scalar-subquery shape.

Every function has a DuckDB twin inside plans/search.py oracles; float
discipline is the repo standard (scores ``round(x, 6)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from us_equity_datalake_spark.functions import text

BM25_K1 = 1.2
BM25_B = 0.75


def term_counts(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf): term frequency per document."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(text.tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def doc_frequency(tc: DataFrame) -> DataFrame:
    """(term, df_t): number of documents containing each term.

    ``tc`` is already one row per (doc, term), so a plain count suffices —
    never countDistinct over the raw token stream.
    """
    return tc.groupBy("term").agg(F.count("*").alias("df_t"))


def tfidf(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, tfidf) with tfidf = round(tf * ln(N / df_t), 6)."""
    tc = term_counts(docs, id_col=id_col, text_col=text_col)
    dft = doc_frequency(tc)
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tc.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df_t")), 6
            ).alias("tfidf"),
        )
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, n_terms_matched, score): Okapi BM25 against a fixed term list.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
    per-term contribution = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Only documents matching ≥1 query term are returned (the inverted-index
    access path: the corpus is filtered to query terms BEFORE any join).
    """
    tc = term_counts(docs, id_col=id_col, text_col=text_col)
    dl = docs.select(
        F.col(id_col).alias("doc_id"), text.token_count(F.col(text_col)).alias("dl")
    )
    scalars = dl.agg(F.avg("dl").alias("avgdl")).crossJoin(
        docs.agg(F.count("*").alias("n_docs"))
    )
    matched = tc.filter(F.col("term").isin(query_terms))
    dft = doc_frequency(tc).filter(F.col("term").isin(query_terms))
    contrib = (
        matched.join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("c"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"), F.round(F.sum("c"), 6).alias("score")
    )


def containing_all(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL query terms (conjunctive boolean search):
    filter the (doc, term) table to the query terms, then count per doc —
    the posting-list intersection expressed as a narrow aggregation."""
    tc = term_counts(docs, id_col=id_col, text_col=text_col)
    hits = tc.filter(F.col("term").isin(query_terms)).groupBy("doc_id").agg(
        F.count("*").alias("n_hit")
    )
    return hits.filter(F.col("n_hit") == len(query_terms)).select("doc_id")
