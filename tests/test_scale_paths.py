"""Round-4 scale-path operators born from the sf1 smoke findings:

- lsh_verified_jaccard_pairs: TRUE Jaccard on LSH candidates — every returned
  pair must carry the exact Jaccard the quadratic form computes, and candidate
  recall on a clear near-dup fixture must be total.
- cosine_near_dup_pairs n_tables / target_occupancy: OR-construction must
  never LOSE pairs vs a single table with the same grid, and the adaptive
  grid must match the explicit plane-count result it resolves to.
"""

import pytest
from pyspark.sql import Row

from us_equity_datalake_spark.operators import dedup
from us_equity_datalake_spark.operators.similarity import cosine_near_dup_pairs


@pytest.fixture(scope="module")
def docs(spark):
    base = " ".join(f"tok{j}" for j in range(60))
    rows = []
    for i in range(30):
        if i % 3 == 0:
            text = base + f" tail{i // 3}"        # j ~ 0.97 near-dups of each other
        else:
            text = " ".join(f"w{i}x{j}" for j in range(12))  # unique content
        rows.append(Row(doc_id=i, text=text))
    return spark.createDataFrame(rows)


def test_lsh_verified_matches_exact_on_candidates(spark, docs):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    verified = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.lsh_verified_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    # verification is exact: every returned pair's jaccard equals the
    # quadratic form's value, and no pair outside the exact result appears
    for pair, j in verified.items():
        assert pair in exact and abs(j - exact[pair]) < 1e-9
    # the shared-prefix docs differ only in the final shingles (j ~ 0.97), so
    # banding recall is ~1 - (1 - j^4)^4 per pair; the fixture is fully
    # deterministic (md5 hashing, fixed seeds) — assert high recall without
    # demanding the banding guarantee something it cannot
    assert exact and len(verified) >= 0.9 * len(exact)


def test_prefix_filter_path_is_exact(spark, docs):
    plain = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, prefix_filter=False).collect()
    )
    pref = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, prefix_filter=True).collect()
    )
    assert plain == pref


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(40):
        ang = (i % 8) * math.pi / 16  # 8 direction groups in a 2-d subspace
        v = [math.cos(ang), math.sin(ang)] + [0.0] * 14
        if i >= 8:
            v[2] = 0.01 * (i % 5)  # slight perturbation, same neighborhood
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    return spark.createDataFrame(rows)


def test_multi_table_never_loses_pairs(spark, vectors):
    one = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            vectors, threshold=0.95, n_planes=4, n_tables=1, seed=11, dim=16
        ).collect()
    }
    two = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            vectors, threshold=0.95, n_planes=4, n_tables=2, seed=11, dim=16
        ).collect()
    }
    # table 0 of the OR-construction IS the single-table grid (same seed), so
    # the union can only add pairs
    assert one <= two


def test_adaptive_occupancy_matches_explicit_planes(spark, vectors):
    import math

    n = vectors.count()
    occupancy = 4
    expected_planes = max(2, math.ceil(math.log2(n / occupancy)))
    adaptive = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            vectors, threshold=0.95, n_planes=2, seed=11, dim=16,
            target_occupancy=occupancy,
        ).collect()
    }
    explicit = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            vectors, threshold=0.95, n_planes=expected_planes, seed=11, dim=16
        ).collect()
    }
    assert adaptive == explicit


def test_arrow_cosine_topk_matches_hof(spark, vectors):
    from us_equity_datalake_spark.operators.similarity import cosine_topk, cosine_topk_arrow

    queries = vectors.filter("vec_id < 4").selectExpr("vec_id as query_id", "embedding")
    hof = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in cosine_topk(
            vectors, queries, id_col="vec_id", vec_col="embedding", query_id="query_id", k=3
        ).collect()
    }
    arrow = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in cosine_topk_arrow(
            vectors, queries, id_col="vec_id", vec_col="embedding", query_id="query_id", k=3
        ).collect()
    }
    assert set(hof) == set(arrow)
    for key, c in hof.items():
        assert abs(c - arrow[key]) < 1e-9
