"""N4 architecture closure (VERDICT r5 #3): a pure-numpy BERT-shaped encoder
executing real .npz weights through the same per-executor-singleton +
mapInPandas path as every other model.  Pins

1. a GOLDEN forward pass: the vectorized batch implementation vs an
   independent loop-based reference (per example, per head, per position),
   exact to 1e-12 — attention, masking, layernorm, GELU, pooler, head;
2. label-direction arms with hand-constructed interpretable weights
   (uniform attention = mean-pool of value-projected tokens);
3. padding invariance: a text's logits are identical whether it is padded
   alongside a longer batchmate or scored alone (mask correctness);
4. WordPiece tokenizer behavior (greedy longest-match, ## continuations,
   [UNK], truncation);
5. the Spark integration through sentiment.score_chunks.
"""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from us_equity_datalake_spark.equity.encoder import (
    NumpyTransformerClassifier,
    export_transformer_weights,
    tiny_bert_weights,
    transformer_model,
)


@pytest.fixture(scope="module")
def tiny_path(tmp_path_factory):
    vocab = ["gain", "loss", "profit", "growth", "risk", "play", "##ing",
             "the", "market", "a", "quarter", "strong", "terrible", "."]
    w = tiny_bert_weights(vocab=vocab, classes=["positive", "negative", "neutral"], seed=11)
    path = str(tmp_path_factory.mktemp("enc") / "tiny_bert.npz")
    export_transformer_weights(path, w)
    return path


# ---------------------------------------------------------------------------
# 1. golden forward: vectorized vs independent loop-based reference
# ---------------------------------------------------------------------------

def _ref_forward(m: NumpyTransformerClassifier, text: str) -> np.ndarray:
    """Loop-based single-example reference: no batching, no reshape tricks —
    per-position lists, per-head python loops, math.* scalars."""

    def ln(vec, g, b):
        mu = sum(vec) / len(vec)
        var = sum((x - mu) ** 2 for x in vec) / len(vec)
        return [(x - mu) / math.sqrt(var + 1e-12) * gi + bi
                for x, gi, bi in zip(vec, g, b)]

    def gelu(x):
        return 0.5 * x * (1.0 + math.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))

    ids = m.tokenize(text)
    s = len(ids)
    hdim = m.word_emb.shape[1]
    h = [ln([m.word_emb[t, j] + m.pos_emb[p, j] for j in range(hdim)],
            m.emb_ln[0], m.emb_ln[1]) for p, t in enumerate(ids)]
    nh, dh = m.n_heads, hdim // m.n_heads
    for ly in m.layers:
        def proj(w, b, vec):
            return [sum(vec[i] * w[i, j] for i in range(hdim)) + b[j] for j in range(hdim)]

        q = [proj(ly["q_w"], ly["q_b"], v) for v in h]
        k = [proj(ly["k_w"], ly["k_b"], v) for v in h]
        v = [proj(ly["v_w"], ly["v_b"], v) for v in h]
        ctx = [[0.0] * hdim for _ in range(s)]
        for head in range(nh):
            lo = head * dh
            for i in range(s):
                scores = [sum(q[i][lo + d] * k[j][lo + d] for d in range(dh)) / math.sqrt(dh)
                          for j in range(s)]
                mx = max(scores)
                es = [math.exp(x - mx) for x in scores]
                tot = sum(es)
                for j in range(s):
                    for d in range(dh):
                        ctx[i][lo + d] += es[j] / tot * v[j][lo + d]
        h = [ln([h[i][j] + sum(ctx[i][x] * ly["attn_out_w"][x, j] for x in range(hdim))
                 + ly["attn_out_b"][j] for j in range(hdim)],
                ly["attn_ln_g"], ly["attn_ln_b"]) for i in range(s)]
        idim = ly["ffn_in_w"].shape[1]
        for i in range(s):
            mid = [gelu(sum(h[i][x] * ly["ffn_in_w"][x, j] for x in range(hdim))
                        + ly["ffn_in_b"][j]) for j in range(idim)]
            out = [sum(mid[x] * ly["ffn_out_w"][x, j] for x in range(idim))
                   + ly["ffn_out_b"][j] for j in range(hdim)]
            h[i] = ln([h[i][j] + out[j] for j in range(hdim)],
                      ly["ffn_ln_g"], ly["ffn_ln_b"])
    pooled = [math.tanh(sum(h[0][x] * m.pooler[0][x, j] for x in range(hdim)) + m.pooler[1][j])
              for j in range(hdim)]
    return np.array([sum(pooled[x] * m.cls[0][x, c] for x in range(hdim)) + m.cls[1][c]
                     for c in range(len(m.classes))])


def test_golden_logits_vs_loop_reference(tiny_path):
    m = NumpyTransformerClassifier(tiny_path)
    texts = ["strong gain growth this quarter .",
             "terrible loss and risk",
             "playing the market"]
    batch = m.logits(texts)
    assert batch.shape == (3, 3)
    for i, t in enumerate(texts):
        ref = _ref_forward(m, t)
        np.testing.assert_allclose(batch[i], ref, rtol=0, atol=1e-12)
    # determinism: bit-identical across calls
    assert (m.logits(texts) == batch).all()


# ---------------------------------------------------------------------------
# 2. label direction with interpretable hand-built weights
# ---------------------------------------------------------------------------

def _directional_weights(tmp_path) -> str:
    """1-layer, 1-head encoder whose forward pass is fully interpretable:
    q=k=0 -> uniform attention (mean over unpadded tokens of v-projected
    states); v/attn_out identity; FFN zero; pooler identity.  Word
    embeddings put 'gain' at +e1 and 'loss' at -e1, the head reads +-e1."""
    h = 8
    eye = np.eye(h)
    zero = np.zeros((h, h))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "gain", "loss", "the", "a"]
    word_emb = np.zeros((len(vocab), h))
    word_emb[4, 0] = 4.0   # gain  -> +e1
    word_emb[5, 0] = -4.0  # loss  -> -e1
    word_emb[6, 1] = 1.0   # filler tokens off-axis
    word_emb[7, 2] = 1.0
    w = {
        "vocab": np.array(vocab), "classes": np.array(["positive", "negative"]),
        "n_heads": np.int64(1),
        "word_emb": word_emb, "pos_emb": np.zeros((32, h)),
        "emb_ln_g": np.ones(h), "emb_ln_b": np.zeros(h),
        "l0_q_w": zero, "l0_q_b": np.zeros(h),
        "l0_k_w": zero, "l0_k_b": np.zeros(h),
        "l0_v_w": eye, "l0_v_b": np.zeros(h),
        "l0_attn_out_w": eye, "l0_attn_out_b": np.zeros(h),
        "l0_attn_ln_g": np.ones(h), "l0_attn_ln_b": np.zeros(h),
        "l0_ffn_in_w": np.zeros((h, 4)), "l0_ffn_in_b": np.zeros(4),
        "l0_ffn_out_w": np.zeros((4, h)), "l0_ffn_out_b": np.zeros(h),
        "l0_ffn_ln_g": np.ones(h), "l0_ffn_ln_b": np.zeros(h),
        "pooler_w": eye, "pooler_b": np.zeros(h),
        "cls_w": np.stack([np.eye(h)[0], -np.eye(h)[0]], axis=1), "cls_b": np.zeros(2),
    }
    path = str(tmp_path / "directional.npz")
    export_transformer_weights(path, w)
    return path


def test_label_direction_arms(tmp_path):
    m = NumpyTransformerClassifier(_directional_weights(tmp_path))
    out = m.predict(["gain gain gain", "loss loss", "gain", "the a"])
    assert out[0][0] == "positive"
    assert out[1][0] == "negative"
    assert out[2][0] == "positive"
    # evidence strength: more gain tokens -> CLS mean-pool more +e1 -> higher
    # confidence than a single gain diluted by filler
    weak = m.predict(["gain the a the a"])[0]
    assert weak[0] == "positive" and out[0][1] >= weak[1]
    assert m.predict([]) == []


# ---------------------------------------------------------------------------
# 3. padding invariance (attention-mask correctness)
# ---------------------------------------------------------------------------

def test_padding_invariance(tiny_path):
    m = NumpyTransformerClassifier(tiny_path)
    short = "profit growth"
    long = "the market risk loss gain profit growth quarter strong terrible . playing"
    alone = m.logits([short])[0]
    padded = m.logits([short, long])[0]
    np.testing.assert_allclose(alone, padded, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# 4. tokenizer behavior
# ---------------------------------------------------------------------------

def test_wordpiece_tokenizer(tiny_path):
    m = NumpyTransformerClassifier(tiny_path)
    inv = {i: w for w, i in m.vocab.items()}

    def pieces(text):
        return [inv[i] for i in m.tokenize(text)]

    assert pieces("playing") == ["[CLS]", "play", "##ing", "[SEP]"]
    assert pieces("the market.") == ["[CLS]", "the", "market", ".", "[SEP]"]
    assert pieces("zzz") == ["[CLS]", "[UNK]", "[SEP]"]          # no piece cover
    assert pieces("") == ["[CLS]", "[SEP]"]
    toks = m.tokenize("gain " * 500)
    assert len(toks) == m.MAX_TOKENS and inv[toks[-1]] == "[SEP]"


def test_artifact_guards(tiny_path, tmp_path):
    z = dict(np.load(tiny_path, allow_pickle=False))
    z["n_heads"] = np.int64(3)  # 8 % 3 != 0
    bad = str(tmp_path / "badheads.npz")
    np.savez(bad, **z)
    with pytest.raises(ValueError):
        NumpyTransformerClassifier(bad)
    z2 = dict(np.load(tiny_path, allow_pickle=False))
    z2["vocab"] = np.array([w for w in z2["vocab"].tolist() if w != "[CLS]"])
    z2["word_emb"] = z2["word_emb"][1:]
    bad2 = str(tmp_path / "nocls.npz")
    np.savez(bad2, **z2)
    with pytest.raises(ValueError):
        NumpyTransformerClassifier(bad2)


# ---------------------------------------------------------------------------
# 5. Spark integration: the score_chunks singleton path
# ---------------------------------------------------------------------------

def test_score_chunks_with_transformer(spark, tmp_path):
    from us_equity_datalake_spark.equity.sentiment import score_chunks

    path = _directional_weights(tmp_path)
    chunks = spark.createDataFrame([
        Row(accn="a1", chunk="gain gain gain"),
        Row(accn="a2", chunk="loss loss the a"),
        Row(accn="a3", chunk="the a"),
    ])
    out = {r.accn: (r.label, r.score) for r in
           score_chunks(chunks, model_factory=transformer_model(path)).collect()}
    assert out["a1"][0] == "positive" and out["a2"][0] == "negative"
    assert all(0.0 < s <= 1.0 for _, s in out.values())
    # batch scoring through Spark matches direct model calls exactly
    m = NumpyTransformerClassifier(path)
    direct = dict(zip(["a1", "a2", "a3"],
                      m.predict(["gain gain gain", "loss loss the a", "the a"])))
    assert out == {k: (v[0], v[1]) for k, v in direct.items()}
