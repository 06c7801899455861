"""Arrow-kernel promotion (round 5): the Arrow/BLAS scoring path is the
DEFAULT for the whole vector family; these tests pin

1. bit-exact parity between the Arrow kernels and their pure-JVM
   higher-order-function twins (the r1-r4 graded forms) on real fixture data;
2. that the DEFAULT plans actually execute the Arrow kernel (MapInPandas in
   the executed plan) — the promotion is physical, not cosmetic;
3. the ADVICE-r4 hardening: empty query sets return well-typed empty frames
   instead of raising, and id dtypes derive from the input schema.

Exactness design under test: BLAS matmuls only SELECT candidates; every
graded cosine is recomputed with the left-to-right cumsum fold
(similarity._exact_dot), which is the same double fold Spark's F.aggregate
and DuckDB's list_sum perform — so parity is bitwise, not round-to-6.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from us_equity_datalake_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from us_equity_datalake_spark.sources.registry import load_table

    return load_table(spark, "embeddings", SF)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def centroids(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_arrow_plan(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, f"Arrow kernel not in executed plan:\n{plan[:2000]}"


def test_exact_dot_is_left_to_right_fold():
    # adversarial vector where blocked summation differs from sequential:
    # alternating large/small magnitudes accumulate differently
    rng = np.random.RandomState(3)
    a = (rng.rand(4, 257) * np.logspace(-8, 8, 257)).astype(np.float64)
    b = rng.rand(4, 257).astype(np.float64)
    got = S._exact_dot(a, b)
    for i in range(4):
        acc = 0.0
        for x, y in zip(a[i], b[i]):
            acc = acc + x * y
        assert got[i] == acc  # bitwise, not approx

    # -0.0 canonicalization: engines start from a +0.0 accumulator
    z = np.array([[-0.0, -0.0]])
    assert str(S._exact_dot(z, np.array([[1.0, 1.0]]))[0]) == "0.0"


def test_cosine_topk_parity_and_plan(emb, queries):
    arrow = S.cosine_topk(emb, queries, k=5)  # default kernel
    hof = S.cosine_topk(emb, queries, k=5, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_assign_to_centroids_parity_and_plan(emb, centroids):
    arrow = S.assign_to_centroids(emb, centroids).select("vec_id", "centroid_id")
    hof = S.assign_to_centroids(emb, centroids, kernel="hof").select("vec_id", "centroid_id")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_ivf_topk_parity_and_plan(emb, queries, centroids):
    arrow = S.ivf_topk(emb, queries, centroids, k=5, nprobe=2)
    hof = S.ivf_topk(emb, queries, centroids, k=5, nprobe=2, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_lsh_topk_parity_and_plan(emb, queries):
    arrow = S.lsh_topk(emb, queries, k=5, dim=64)
    hof = S.lsh_topk(emb, queries, k=5, dim=64, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_near_dup_pairs_parity_and_plan(emb):
    arrow = S.cosine_near_dup_pairs(emb, threshold=0.35, dim=64)
    hof = S.cosine_near_dup_pairs(emb, threshold=0.35, dim=64, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_near_dup_pairs_multi_table_parity(emb):
    arrow = S.cosine_near_dup_pairs(emb, threshold=0.35, dim=64, n_tables=2)
    hof = S.cosine_near_dup_pairs(emb, threshold=0.35, dim=64, n_tables=2, kernel="hof")
    assert _rows(arrow) == _rows(hof)


def test_empty_query_set_returns_typed_empty(emb, queries):
    none = queries.filter(F.col("query_id") < 0)
    for out in (S.cosine_topk(emb, none, k=5), S.lsh_topk(emb, none, k=5, dim=64)):
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_null_and_ragged_vectors_skip_not_crash(spark, emb, queries, centroids):
    # ADVICE r5: the HOF twins propagate NULL cosines for null/ragged vectors
    # (which never rank or pass thresholds); the Arrow defaults must skip such
    # rows, not abort the job in np.stack
    import pyspark.sql.types as T

    dim = len(emb.select("embedding").first()[0])
    extra = spark.createDataFrame(
        [(900001, None), (900002, [0.5] * (dim - 1))],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    dirty = emb.select("vec_id", "embedding").unionByName(extra)
    clean = emb.select("vec_id", "embedding")

    got = _rows(S.cosine_topk(dirty, queries))
    assert got == _rows(S.cosine_topk(clean, queries))
    got = _rows(S.assign_to_centroids(dirty, centroids).select("vec_id", "centroid_id"))
    want = _rows(S.assign_to_centroids(clean, centroids).select("vec_id", "centroid_id"))
    assert got == want
    assert _rows(S.lsh_topk(dirty, queries)) == _rows(S.lsh_topk(clean, queries))
    assert _rows(S.cosine_near_dup_pairs(dirty, threshold=0.9)) == _rows(
        S.cosine_near_dup_pairs(clean, threshold=0.9)
    )


def test_id_dtype_derives_from_input(spark):
    # int32 ids must survive the kernel round-trip (ADVICE r4: no hardcoded int64)
    rows = [(i, [float(i), 1.0, 0.5]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.cosine_topk(df, q, k=2)
    assert dict(out.dtypes)["neighbor_id"] == "int"
    assert out.count() == 4


# ---------------------------------------------------------------------------
# MinHash / shingle-set Arrow kernels (round 5 — BENCH_TRIAGE's largest
# interpreted-HOF cost moved to hashlib+numpy; parity must be bitwise)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    from us_equity_datalake_spark.sources.registry import load_table

    return load_table(spark, "documents", SF)


def test_minhash_signatures_parity_and_plan(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = D.minhash_signatures(docs)  # default kernel
    hof = D.minhash_signatures(docs, kernel="hof")
    a = sorted((r[0], tuple(r[1])) for r in arrow.collect())
    h = sorted((r[0], tuple(r[1])) for r in hof.collect())
    assert a == h
    _assert_arrow_plan(arrow)


def test_shingle_sets_parity_and_plan(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = D.shingle_sets(docs)
    hof = D.shingle_sets(docs, kernel="hof")
    a = sorted((r[0], tuple(r[1])) for r in arrow.collect())
    h = sorted((r[0], tuple(r[1])) for r in hof.collect())
    assert a == h
    _assert_arrow_plan(arrow)


def test_minhash_short_and_null_docs_drop_like_hof(spark):
    # docs with < n tokens or null text produce NO signature row in the HOF
    # groupBy; the kernel must mirror that, not emit empty signatures
    from us_equity_datalake_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "only two"), (2, None), (3, "three tokens here now for shingles")],
        "doc_id long, text string",
    )
    for kern in ("arrow", "hof"):
        ids = sorted(r[0] for r in D.minhash_signatures(df, kernel=kern).collect())
        assert ids == [3], kern


def test_lsh_band_join_cross_corpus(spark):
    """Cross-corpus band join (incremental dedup shape): a new doc identical
    to a stored one is found with est 1.0; a new doc unlike anything stored
    produces no pair; self-join + id filter finds intra-batch dups."""
    from us_equity_datalake_spark.operators import dedup as D
    from pyspark.sql import functions as F

    base_txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven twelve"
    lake = spark.createDataFrame(
        [(100, base_txt), (101, "completely different words entirely here okay")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(1, base_txt), (2, other), (3, other)], "doc_id long, text string"
    )
    lake_sig = D.minhash_signatures(lake)
    delta_sig = D.minhash_signatures(delta)
    cross = {(r.id_a, r.id_b): r.est_jaccard
             for r in D.lsh_band_join(delta_sig, lake_sig).collect()}
    assert cross[(1, 100)] == 1.0  # identical text -> identical signature
    assert all(a != 2 and a != 3 for a, _ in cross)  # nothing like `other` stored
    intra = {(r.id_a, r.id_b): r.est_jaccard
             for r in (D.lsh_band_join(delta_sig, delta_sig)
                       .where(F.col("id_b") < F.col("id_a"))).collect()}
    assert intra == {(3, 2): 1.0}  # the intra-batch duplicate, keep-lowest


def test_lsh_verified_jaccard_parity(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = sorted(map(tuple, D.lsh_verified_jaccard_pairs(docs).collect()))
    hof = sorted(map(tuple, D.lsh_verified_jaccard_pairs(docs, kernel="hof").collect()))
    assert arrow == hof


def test_simhash_parity_and_plan(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = D.simhash(docs)  # default kernel
    hof = D.simhash(docs, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_simhash_pairs_parity(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = sorted(map(tuple, D.simhash_pairs(docs).collect()))
    hof = sorted(map(tuple, D.simhash_pairs(docs, kernel="hof").collect()))
    assert arrow == hof


def test_winnow_fingerprints_parity_and_plan(docs):
    from us_equity_datalake_spark.operators import dedup as D

    arrow = D.winnow_fingerprints(docs)  # default kernel
    hof = D.winnow_fingerprints(docs, kernel="hof")
    assert _rows(arrow) == _rows(hof)
    _assert_arrow_plan(arrow)


def test_winnow_short_and_null_docs_drop_like_hof(spark):
    from us_equity_datalake_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "only two"), (2, None), (3, "three tokens here now")],
        "doc_id long, text string",
    )
    for kern in ("arrow", "hof"):
        ids = sorted(r[0] for r in D.winnow_fingerprints(df, kernel=kern).collect())
        assert ids == [3], kern


def test_kernel_parity_on_adversarial_unicode(spark):
    # the Arrow kernels tokenize with Python `re` + str.lower while the HOF
    # twins use JVM regexp_split + String.toLowerCase — pin that both agree
    # on the nasty cases (fullwidth forms, Turkish dotted İ, combining marks,
    # emoji, mixed whitespace), not just the ASCII fixture corpus
    from us_equity_datalake_spark.operators import dedup as D

    cases = [
        (1, "Hello WORLD foo bar baz qux one two three four"),
        (2, "ÉCOLE élève naïve café ÜBER straße İstanbul ĳ ǅungla Σίσυφος"),
        (3, "ＡＢＣ ｆｕｌｌｗｉｄｔｈ １２３ tokens here now"),
        (4, "tab\tand\nnewline\r\nand  spaces 0x00 end here ok"),
        (5, "emoji 😀 mixed 🎉 with words alpha beta gamma delta"),
        (6, "ǰ ǰ ǰ combining ǰ hacek a b c d e f g h"),
        (7, "TURKISH İI ıI dotted undotted alpha beta gamma delta eps"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for fn in (D.minhash_signatures, D.shingle_sets, D.simhash, D.winnow_fingerprints):
        a = sorted(
            (r[0],) + tuple(tuple(v) if isinstance(v, list) else v for v in tuple(r)[1:])
            for r in fn(df).collect()
        )
        h = sorted(
            (r[0],) + tuple(tuple(v) if isinstance(v, list) else v for v in tuple(r)[1:])
            for r in fn(df, kernel="hof").collect()
        )
        assert a == h, fn.__name__


def test_duplicate_spans_golden(spark):
    # seed-and-extend semantics on a constructed corpus: a 12-token shared
    # span is reported maximally once with exact 1-based starts; an 8-token
    # overlap (a single seed, span 8 < 12) is excluded; a doc sharing the
    # span at TWO offsets yields two diagonal rows
    from us_equity_datalake_spark.operators import dedup as D

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    df = spark.createDataFrame(
        [
            (1, span + " one two"),
            (2, "pre " + span + " three"),          # span at pa=1, pb=2
            (3, "alpha beta gamma delta epsilon zeta eta theta x y z"),  # 8 shared
            (4, "totally different words with no overlap at all here ok"),
            (5, span + " mid filler tokens q r s t u v w " + span),  # two diagonals
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        tuple(r) for r in D.duplicate_spans(df, n=8, min_span_tokens=12).collect()
    )
    assert (1, 2, 1, 2, 12) in rows
    assert not any(r[0] == 1 and r[1] == 3 for r in rows)  # below threshold
    assert not any(4 in (r[0], r[1]) for r in rows)
    pair15 = [r for r in rows if (r[0], r[1]) == (1, 5)]
    assert len(pair15) == 2 and {(r[2], r[3]) for r in pair15} == {(1, 1), (1, 23)}
    assert all(r[4] >= 12 for r in rows)

    # scrub: keep-lowest — doc1 untouched; doc2 keeps its non-span tokens;
    # doc5 loses BOTH copies (overlapping intervals compose without merging)
    scrub = {r["id"]: r for r in D.scrub_duplicate_spans(df, n=8, min_span_tokens=12).collect()}
    assert scrub[1]["n_tokens_kept"] == scrub[1]["n_tokens"] == 14
    assert scrub[1]["n_spans_removed"] == 0
    assert scrub[2]["scrubbed_text"] == "pre three"
    assert scrub[4]["n_tokens_kept"] == scrub[4]["n_tokens"]
    assert scrub[5]["scrubbed_text"] == "mid filler tokens q r s t u v w"
    assert scrub[5]["n_spans_removed"] >= 2


def test_simhash_empty_and_null_docs_drop_like_hof(spark):
    # docs with no tokens or null text produce NO fingerprint row in the HOF
    # groupBy; the kernel must mirror that
    from us_equity_datalake_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "..!!.."), (2, None), (3, "real tokens here")],
        "doc_id long, text string",
    )
    for kern in ("arrow", "hof"):
        ids = sorted(r[0] for r in D.simhash(df, kernel=kern).collect())
        assert ids == [3], kern


def test_release_caches_unpersists_tracked_frames(spark, emb, queries):
    # r5 ADVICE: operator-internal persist() frames must have a caller-visible
    # release path — release_caches() unpersists exactly the tracked frames
    from us_equity_datalake_spark import operators
    from us_equity_datalake_spark.operators import _cache, dedup as D
    from us_equity_datalake_spark.sources.registry import load_table

    _cache.release_caches()  # clean slate
    docs = load_table(spark, "documents", SF).limit(50)
    D.minhash_lsh_pairs(docs).count()          # persists the signature frame
    S.cosine_near_dup_pairs(
        emb.limit(200), threshold=0.5
    ).count()                                  # persists the bucket frame
    live = list(_cache._TRACKED)
    assert len(live) >= 2
    assert all(df.storageLevel.useMemory for df in live)
    released = operators.release_caches()
    assert released >= 2
    assert all(not df.storageLevel.useMemory for df in live)
    assert _cache._TRACKED == []


def test_arrow_topk_tie_cluster_guard_matches_hof(spark):
    # r5 ADVICE: >2k near-tied non-identical vectors — the selection-margin
    # guard must fall back to a full exact rescore so the Arrow path stays
    # bit-identical to the HOF twin even when BLAS ordering is unreliable.
    # 25 candidates all within ~1e-16 of each other for k=3 (local_k=6).
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.rand(64).astype(np.float64)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(25):
        v = base.copy()
        v[i % 64] += 1e-16 * (i + 1)  # sub-ulp nudges: near-ties, not dups
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(1000, rows[0][1])], "query_id long, embedding array<float>"
    )
    arrow = _rows(S.cosine_topk(corpus, qdf, k=3, kernel="arrow"))
    hof = _rows(S.cosine_topk(corpus, qdf, k=3, kernel="hof"))
    assert arrow == hof


def test_hof_topk_null_vector_parity_with_arrow(spark):
    # r5 ADVICE: corpus with fewer than k valid candidates — HOF used to emit
    # null-cosine filler rows where the Arrow kernel emitted none
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, None),
        (4, [0.0, 0.0, 0.0]),  # zero norm -> null cosine
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    arrow = _rows(S.cosine_topk(corpus, qdf, k=5, kernel="arrow"))
    hof = _rows(S.cosine_topk(corpus, qdf, k=5, kernel="hof"))
    assert arrow == hof
    assert len(hof) == 2  # only the two valid candidates, no null filler


def test_semdedup_keep_lowest_within_cluster(spark):
    """SemDeDup survivor rule: identical (and near-identical) vectors in the
    same cluster collapse to the lowest id; cross-cluster near-dups are NOT
    candidates (cluster-bounded by design); every vector appears exactly
    once in the report."""
    import numpy as np

    rng_a = [1.0] + [0.0] * 63          # cluster around e1
    rng_b = [0.0, 1.0] + [0.0] * 62     # cluster around e2
    rows = [
        (0, rng_a),                      # centroid seed a
        (1, rng_b),                      # centroid seed b
        (10, rng_a),                     # exact dup of 0
        (11, [0.999] + [0.001] * 63),    # near-dup of 0
        (20, rng_b),                     # exact dup of 1
        (30, [0.0] * 62 + [1.0, 0.0]),   # orthogonal loner
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["dup_of"], r["is_kept"])
        for r in S.semdedup(emb, k=2, iters=2, threshold=0.9).collect()
    }
    assert len(out) == len(rows)                 # one row per vector
    assert out[0] == (None, True)                # lowest id survives
    assert out[10] == (0, False)                 # exact dup -> dup_of lowest
    assert out[11] == (0, False)                 # near-dup above threshold
    assert out[20][0] == 1 and out[20][1] is False
    assert out[30] == (None, True)               # loner kept
    kept = {i for i, (_, k) in out.items() if k}
    assert 1 in kept                             # one survivor per dup set
    from us_equity_datalake_spark.operators import _cache

    assert _cache.release_caches() >= 1          # operator registered its persist


def test_pq_topk_recovers_exact_duplicates(spark):
    """PQ/ADC sanity: a vector identical to the query encodes to the query's
    own codes, so its ADC distance is exactly the sum of the query's own
    table entries at those codes — the minimum — and the exact-cosine refine
    puts it at rank 1 with cosine 1.0."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.rand(30, 64).astype("float32")
    base[17] = base[0]  # exact duplicate of the query vector
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    out = S.pq_topk(
        emb, queries, dim=64, m=8, k_codes=4, iters=1, n_candidates=10, k=3
    ).collect()
    by_rank = {r["rank"]: r for r in out}
    assert len(out) == 3
    top = by_rank[1]
    # self (vec_id 0) wins the id tiebreak over its duplicate at 17
    assert top["neighbor_id"] == 0 and top["cosine"] == 1.0
    assert by_rank[2]["neighbor_id"] == 17 and by_rank[2]["cosine"] == 1.0
    assert by_rank[2]["adc_d2"] == top["adc_d2"]  # identical codes
    from us_equity_datalake_spark.operators import _cache

    _cache.release_caches()


def test_pq_topk_survives_empty_codeword(spark):
    """Lloyd's can empty a codeword (here: v1 duplicates v0, so seed cid 1
    ties every point against cid 0 and the min-cid rule starves it in round
    1).  The book must RETAIN the starved codeword's previous centroid —
    dropping it shifts the positional ADC lookup (element_at(row, code+1))
    onto the wrong codeword and indexes past the row array for the max cid,
    yielding null adc_d2 that sorts first under asc candidate ranking."""
    rows = [
        (0, [1.0, 0.0, 1.0, 0.0]),
        (1, [1.0, 0.0, 1.0, 0.0]),   # exact dup of seed 0 -> cid 1 starves
        (2, [0.0, 5.0, 0.0, 5.0]),
        (3, [0.0, 5.1, 0.0, 5.1]),
        (4, [1.2, 0.1, 1.2, 0.1]),
        (5, [0.1, 4.9, 0.1, 4.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    out = S.pq_topk(
        emb, queries, dim=4, m=2, k_codes=3, iters=2, n_candidates=6, k=6
    ).collect()
    assert len(out) == 6
    # the dropped-codeword bug manifests as null adc_d2 on every vector
    # whose code exceeds the surviving-cid count
    assert all(r["adc_d2"] is not None for r in out)
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 0 and by_rank[1]["cosine"] == 1.0
    assert by_rank[2]["neighbor_id"] == 1 and by_rank[2]["cosine"] == 1.0
    from us_equity_datalake_spark.operators import _cache

    _cache.release_caches()


def test_kmeans_arrow_hof_assignment_parity(spark):
    """The Arrow euclidean-assign kernel must produce bit-identical cluster
    assignments to the interpreted HOF form — including sub-ulp near-tie
    clusters that force the exact-rescore path."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.rand(60, 16).astype("float32")
    # plant near-ties: rows equidistant (to ~1e-16) from two seed centroids
    base[40] = (base[0] + base[1]) / 2.0
    base[41] = base[40] + 1e-7
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    a = {(r["vec_id"], r["cluster_id"])
         for r in S.kmeans_assign(emb, k=6, iters=2, kernel="arrow").collect()}
    h = {(r["vec_id"], r["cluster_id"])
         for r in S.kmeans_assign(emb, k=6, iters=2, kernel="hof").collect()}
    assert a == h and len(a) == 60


def test_pq_topk_empty_query_frame_degrades_gracefully(spark):
    """ADVICE r10 (low): an empty query frame must yield an empty result
    with the contract schema (the old 1-D np.array([]) crashed the 2-D
    subspace slice with IndexError)."""
    import numpy as np

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rng.rand(12, 8))],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter("vec_id < 0").selectExpr("vec_id AS query_id", "embedding")
    out = S.pq_topk(emb, queries, dim=8, m=2, k_codes=3, iters=1,
                    n_candidates=4, k=2)
    assert out.columns == ["query_id", "neighbor_id", "adc_d2", "cosine", "rank"]
    assert out.count() == 0
    from us_equity_datalake_spark.operators import _cache

    _cache.release_caches()
