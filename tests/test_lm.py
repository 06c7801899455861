"""Bigram-LM perplexity filter (operators/lm.py) unit tests.

Covers: hand-computed NLL on a tiny corpus, repetition ranking lower than
novel word salad (the CCNet head/tail intuition), and the <2-token exclusion
rule.
"""

import math

from pyspark.sql import functions as F

from us_equity_datalake_spark.operators import lm


def _score(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in lm.bigram_lm_perplexity(df, "text", "doc_id").collect()
    }


def test_hand_computed_single_bigram(spark):
    # Corpus = one doc "a b": vocab {a, b}, N=2, V=2, c(a,b)=1, c(a,.)=1.
    out = _score(spark, [("d1", "a b")])
    p_uni_b = (1 + 1.0) / (2 + 2)  # 0.5
    prob = (1 + lm.DEFAULT_ALPHA * p_uni_b) / (1 + lm.DEFAULT_ALPHA)
    expect = -round(math.log(prob), 6)
    got = out["d1"]
    assert got["n_bigrams"] == 1
    assert abs(got["avg_nll"] - expect) < 1e-9
    assert abs(got["total_nll"] - expect) < 1e-9


def test_repetition_scores_below_novelty(spark):
    # "the cat sat" x many is high-probability under a corpus dominated by
    # it; a doc of singleton words gets smoothed-floor probabilities only.
    rows = [(f"rep{i}", "the cat sat on the mat " * 5) for i in range(5)]
    rows.append(("odd", "zyx wvu tsr qpo nml kji"))
    out = _score(spark, rows)
    assert out["rep0"]["avg_nll"] < out["odd"]["avg_nll"]
    # avg_nll is an average: identical docs score identically.
    assert out["rep0"]["avg_nll"] == out["rep1"]["avg_nll"]


def test_short_docs_excluded_and_counts(spark):
    out = _score(spark, [("a", "solo"), ("b", ""), ("c", "two words here")])
    assert set(out) == {"c"}
    assert out["c"]["n_bigrams"] == 2


def test_nll_term_sql_matches_python_formula():
    # The SQL twin must encode the same operand order as _nll_term.
    s = lm.nll_term_sql(0.4)
    assert "(c_pw + 0.4 * (c_w + 1.0) / (n_tok + v_size)) / (c_p + 0.4)" in s
    assert s.startswith("(-ROUND(ln(")


# --- DSIR ------------------------------------------------------------------


def _dsir_docs(spark):
    rows = []
    # Target-like docs share a vocabulary; junk docs use disjoint words.
    for i in range(8):
        rows.append((f"t{i}", "en", "the market closed higher on strong earnings"))
    for i in range(4):
        rows.append((f"r{i}", "xx", "the market closed higher on strong earnings"))
    for i in range(4):
        rows.append((f"j{i}", "xx", f"zz{i}a qq{i}b vv{i}c kk{i}d ww{i}e yy{i}f gg{i}g"))
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


def test_dsir_weights_favor_target_like_docs(spark):
    from us_equity_datalake_spark.operators.lm import dsir_importance_weights

    df = _dsir_docs(spark)
    out = {
        r["doc_id"]: r["logw_u"]
        for r in dsir_importance_weights(df, F.col("lang") == "en").collect()
    }
    # Raw docs identical to the target text must outweigh junk docs.
    assert all(out[f"r{i}"] > out[f"j{i}"] for i in range(4))
    # Identical text => identical weight regardless of target membership.
    assert out["t0"] == out["r0"]


def test_dsir_resample_deterministic_topk(spark):
    from us_equity_datalake_spark.operators.lm import dsir_resample

    df = _dsir_docs(spark)
    a = dsir_resample(df, F.col("lang") == "en", k=6).collect()
    b = dsir_resample(df, F.col("lang") == "en", k=6).collect()
    assert a == b and len(a) == 6
    # sample_key = logw + gumbel >= logw for every selected row is NOT
    # guaranteed (gumbel can be negative), but key ordering must be desc.
    keys = [r["sample_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # Selection should be dominated by target-like docs over junk.
    picked = {r["doc_id"] for r in a}
    assert len([d for d in picked if d.startswith("j")]) <= 2
