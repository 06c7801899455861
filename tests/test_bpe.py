"""BPE merge learning (operators/bpe.py) vs an independent pure-Python
reference implementation of the Sennrich et al. algorithm."""

import re
from collections import Counter

from pyspark.sql import functions as F

from us_equity_datalake_spark.operators import bpe


def _reference_bpe(texts, n_merges):
    """Straight-from-the-paper reference: word counts, per-step pair argmax
    (count desc, pair lexicographic), greedy left-to-right within-word merge."""
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w] += 1
    vocab = {tuple(w) + (bpe.END,): n for w, n in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        out = {}
        for sym, n in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + n
        vocab = out
    return merges


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that hat is the best hat that a cat has",
    "low lower lowest newer newest new news",
    "aaa aa aaa a aaaa",          # overlapping-run stress: 'a a a' merges greedily
]


def test_bpe_matches_reference_merges(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    got = [
        (r["step"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=10).orderBy("step").collect()
    ]
    want = _reference_bpe(TEXTS, 10)
    assert got == want


def test_bpe_sql_twin_matches_spark(spark):
    import duckdb

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    got = sorted(
        (r["step"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=8).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
    con.execute(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    want = sorted(con.execute(bpe.bpe_train_sql("documents", "text", n_merges=8)).fetchall())
    assert [tuple(g) for g in got] == [tuple(w) for w in want]


def test_bpe_greedy_overlap_semantics(spark):
    """'a a a a' must merge to 'aa aa' in the (a,a) step — greedy
    left-to-right, never the overlapping middle pair."""
    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    out = bpe.bpe_train(docs, n_merges=2).orderBy("step").collect()
    # step 1: (a, a) with count 6 (three adjacent pairs x 2 occurrences)
    assert (out[0]["merge_left"], out[0]["merge_right"], out[0]["pair_count"]) == ("a", "a", 6)
    # greedy application yields 'aa aa </w>' exactly — step 2 then ties
    # (aa, aa) vs (aa, </w>) at count 2 and ASCII '<' < 'a' breaks to the
    # sentinel pair.  Any non-greedy step-1 merge (e.g. 'aa a a </w>')
    # would surface (a, a) or different counts here instead.
    assert (out[1]["merge_left"], out[1]["merge_right"], out[1]["pair_count"]) == ("aa", "</w>", 2)


def test_bpe_sql_twin_exhausted_merges_parity(spark):
    """A corpus whose merges exhaust before n_merges rounds: Spark's loop
    breaks holding the last real vocab; the unrolled oracle must carry the
    vocab forward UNCHANGED through the empty rounds — an unguarded scalar
    subquery on the empty b{r} would null every seg and return an empty
    encode report while Spark returns real rows (engine divergence on tiny
    corpora)."""
    import duckdb

    docs = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    merges = bpe.bpe_train(docs, n_merges=6).collect()
    assert len(merges) == 2  # (a,b) then (ab,</w>), then exhausted

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 0 AS doc_id, 'ab ab ab' AS text")
    want_merges = con.execute(
        bpe.bpe_train_sql("documents", "text", n_merges=6)
    ).fetchall()
    assert sorted(tuple(r) for r in want_merges) == sorted(
        (r["step"], r["merge_left"], r["merge_right"], r["pair_count"]) for r in merges
    )

    # the encode report must agree too (the all-NULL w{n} failure mode)
    _, vocab = bpe._train(docs, "text", 6)
    got = sorted(tuple(r) for r in bpe.subword_counts(vocab).collect())
    want = sorted(tuple(r) for r in con.execute(
        bpe.bpe_encode_report_sql("documents", "text", n_merges=6)
    ).fetchall())
    assert got == want
    assert got == [(1, "ab</w>", 3)]  # one fully-merged token, count 3
