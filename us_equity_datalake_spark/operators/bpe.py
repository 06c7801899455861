"""Distributed BPE tokenizer-vocabulary training (Sennrich, Haddow, Birch
2016, "Neural Machine Translation of Rare Words with Subword Units" — the
byte-pair-encoding merge-learning loop every modern tokenizer descends from).

Spark-first shape: the CORPUS is touched exactly once (explode tokens →
word-count table); every merge iteration runs on the VOCABULARY (distinct
words with counts), which is bounded by language, not data — at 100 TB the
word table is still ~10^6 rows, so the loop is dimension-sized.  Each step:

1. explode each word's current segmentation into adjacent symbol pairs,
   weighted by the word count — one vocab-sized shuffle;
2. argmax pair by (count desc, pair lexicographic) — deterministic across
   engines (ASCII symbols);
3. apply the merge to every segmentation with the DOUBLE-SPACE trick:
   padding every separator to two spaces makes non-overlapping left-to-right
   ``replace`` exactly BPE's greedy within-word merge ('a a a' merges once,
   'a b a b' merges twice) without regex lookarounds, so DuckDB replays the
   identical string op.

Segmentations are single-space-joined symbol strings ('h e l l o </w>');
``</w>`` is the end-of-word sentinel, merged symbols concatenate bare.
The learned merge table (step, left, right, pair count) IS the tokenizer
artifact — applying it greedily to new text is the standard encode step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from us_equity_datalake_spark.functions import text
from us_equity_datalake_spark.sources.registry import local_frame

END = "</w>"


def _initial_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(seg, n): one row per distinct word — the ONLY corpus-sized pass."""
    toks = docs.select(F.explode(text.tokens(F.col(text_col))).alias("w"))
    words = toks.groupBy("w").agg(F.count("*").alias("n"))
    # 'hello' -> 'h e l l o </w>' (the char regexp leaves a trailing space,
    # so the sentinel concatenates flush)
    seg = F.concat(F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit(END))
    return words.select(seg.alias("seg"), "n")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "CASE WHEN size(split(seg, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(seg, ' ')) - 1), "
        "i -> struct(element_at(split(seg, ' '), i) AS a, "
        "element_at(split(seg, ' '), i + 1) AS b)) "
        "ELSE array() END"
    )
    return (
        vocab.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    # symbols are [a-z0-9] runs or </w> (no quotes/regex metachars), so they
    # inline into the plain-replace expression safely
    merged = F.expr(
        f"replace(concat(' ', replace(seg, ' ', '  '), ' '), "
        f"' {a}  {b} ', ' {a}{b} ')"
    )
    return vocab.select(
        F.trim(F.regexp_replace(merged, " +", " ")).alias("seg"), "n"
    )


def _train(docs: DataFrame, text_col: str, n_merges: int):
    """(merge list, final vocab frame) — the loop both surfaces share."""
    vocab = _initial_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((step, a, b, cnt))
        # checkpoint per step: keeps the plan one string-op deep instead of
        # n_merges nested replaces (vocab is dimension-sized, the job is tiny)
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges, vocab


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 12,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (step, merge_left, merge_right,
    pair_count) — the ordered merge table.  Each step costs one vocab-sized
    aggregation plus a 1-row collect; the corpus is scanned once."""
    merges, _ = _train(docs, text_col, n_merges)
    return local_frame(
        docs.sparkSession, merges, "step long, merge_left string, merge_right string, pair_count long"
    )


def bpe_train_sql(table: str, text_col: str, *, n_merges: int = 12) -> str:
    """DuckDB twin of :func:`bpe_train`: the merge loop unrolls to one CTE
    trio per step (pairs -> argmax -> re-segmented vocab), the same
    discipline as the unrolled PageRank oracle.  Every per-round CTE is
    MATERIALIZED: the scalar subqueries in w{r} reference b{r} three times,
    and without materialization DuckDB re-evaluates the whole chain per
    reference — exponential in rounds (measured: 8 rounds never finish)."""
    parts = [
        f"""
    WITH toks AS (
      SELECT unnest({text.tokens_sql(text_col)}) AS w FROM {table}
    ),
    w0 AS (
      SELECT regexp_replace(w, '(.)', '\\1 ', 'g') || '{END}' AS seg,
             COUNT(*) AS n
      FROM toks GROUP BY w
    )"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        parts.append(f""",
    p{r} AS MATERIALIZED (
      SELECT parts[i] AS a, parts[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (
        SELECT n, string_split(seg, ' ') AS parts,
               unnest(generate_series(1, len(string_split(seg, ' ')) - 1)) AS i
        FROM {prev}
      )
      GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    w{r} AS MATERIALIZED (
      -- if merges exhausted before round {r} (b{r} empty), carry the vocab
      -- forward UNCHANGED: the scalar subqueries would be NULL and null out
      -- every seg, diverging from Spark's loop break on tiny corpora
      SELECT CASE WHEN EXISTS (SELECT 1 FROM b{r}) THEN
               trim(regexp_replace(
                 replace(' ' || replace(seg, ' ', '  ') || ' ',
                         ' ' || (SELECT a FROM b{r}) || '  ' || (SELECT b FROM b{r}) || ' ',
                         ' ' || (SELECT a FROM b{r}) || (SELECT b FROM b{r}) || ' '),
                 ' +', ' ', 'g'))
             ELSE seg END AS seg, n
      FROM {prev}
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT {r} AS step, a AS merge_left, b AS merge_right, cnt AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(f"\n    {finals}")
    return "".join(parts)


def subword_counts(vocab: DataFrame, *, top_k: int = 20) -> DataFrame:
    """Corpus subword distribution under the CURRENT segmentation: explode
    symbols weighted by word counts, rank by (count desc, token) — the
    fertility/coverage report a tokenizer run ends with."""
    from pyspark.sql import Window

    toks = vocab.select("n", F.explode(F.split("seg", " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.sum("n").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("rank", "token", "cnt")
        .withColumn("rank", F.col("rank").cast("long"))
    )


def bpe_encode_report_sql(table: str, text_col: str, *, n_merges: int = 12,
                          top_k: int = 20) -> str:
    """DuckDB twin of train + :func:`subword_counts` on the final vocab."""
    chain = bpe_train_sql(table, text_col, n_merges=n_merges)
    # drop the merge-table final SELECT, keep the CTE chain
    chain = chain[: chain.rindex("\n    SELECT 1 AS step")]
    return f"""{chain}
    SELECT CAST(rank AS BIGINT) AS rank, token, cnt FROM (
      SELECT token, CAST(SUM(n) AS BIGINT) AS cnt,
             ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, token) AS rank
      FROM (SELECT n, unnest(string_split(seg, ' ')) AS token FROM w{n_merges})
      GROUP BY token
    ) WHERE rank <= {top_k}
    """
