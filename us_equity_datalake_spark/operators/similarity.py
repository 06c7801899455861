"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.  The
  query set is broadcast; each executor scans its shard of the corpus and
  keeps a k-heap per query (TakeOrdered per group via window rank).
- ``ivf_topk``: the scale path — IVF-style partition pruning.  Vectors are
  assigned to their nearest centroid once (one broadcast join against the
  centroid table); a query probes only ``nprobe`` nearest centroid buckets, so
  the scan touches corpus/|C|·nprobe instead of everything.  Centroid choice
  is pluggable (deterministic seed rows here; k-means in production).

Kernel discipline (round 5 — the Arrow/BLAS kernel is the DEFAULT scoring
path for the whole family; the higher-order-function forms remain as parity
twins exercised by tests):

- Candidate SELECTION may use BLAS (one matmul per Arrow batch — blocked
  summation, ~1e-15 from the SQL fold) because selection only needs ranks
  to within a generous margin;
- every GRADED number (the cosine that is thresholded, rounded and ranked)
  is recomputed with :func:`_exact_dot` — ``np.cumsum`` along the feature
  axis, whose accumulate semantics are the same left-to-right double fold
  Spark's ``F.aggregate`` and DuckDB's ``list_sum`` perform — so the Arrow
  path is BIT-IDENTICAL to the HOF path and the oracle, not merely
  close-after-round(6).  This is what lets the family share exact oracles
  with no near-tie flakiness (ADVICE r4).
"""

from __future__ import annotations

from . import _cache  # noqa: E402
from pyspark.sql import DataFrame, Window, functions as F

from us_equity_datalake_spark.functions import vector
from us_equity_datalake_spark.sources.registry import local_frame, parallelize_small_input


def _exact_dot(a, b):
    """Left-to-right double fold of per-row dot products over (n, d) float64
    matrices — bit-identical to Spark ``aggregate(zip_with(a, b, *), 0.0, +)``
    and DuckDB ``list_sum(list_transform(list_zip(a, b), ...))``.

    ``np.cumsum`` is ``add.accumulate``: out[i] = out[i-1] + x[i] applied
    sequentially, i.e. exactly the engines' fold order (numpy's pairwise
    summation applies to ``np.sum``, not to accumulate).  The final ``+ 0.0``
    mirrors the engines' 0.0 initial accumulator, which canonicalizes a
    -0.0 result to +0.0 (exact identity for every other value)."""
    import numpy as np

    return np.cumsum(a * b, axis=1)[:, -1] + 0.0


def _exact_norm(a):
    import numpy as np

    return np.sqrt(_exact_dot(a, a))


def _stack_f64(series):
    """(n, d) float64 from a pandas Series of float32 arrays (exact widening)."""
    import numpy as np

    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _valid_vec_rows(pdf, cols, dim=None):
    """Drop batch rows whose vector is null or (when ``dim`` is known)
    wrong-length before stacking.  The HOF twins fold such rows to a NULL
    cosine and filter it out pre-rank (since r6), so both arms emit the same
    rows even when fewer than k valid candidates exist — the kernels skip the
    row instead of letting ``np.stack`` raise on the ragged batch
    (ADVICE r5 null-robustness + degenerate-input parity)."""
    if len(pdf) == 0:
        return pdf
    mask = None
    for c in cols:
        ok = pdf[c].map(
            lambda v: v is not None and (dim is None or len(v) == dim)
        )
        mask = ok if mask is None else (mask & ok)
    return pdf if bool(mask.all()) else pdf[mask]


def _valid_vec_items(rows, dim=None):
    """Same null/length discipline for driver-collected (id, vec) rows
    (query/centroid sets): null or wrong-length vectors are dropped."""
    out = [r for r in rows if r[1] is not None and (dim is None or len(r[1]) == dim)]
    return out


def paired_exact_cosine(
    df: DataFrame,
    *,
    left_vec: str,
    right_vec: str,
    keep: list[str],
    out_col: str = "cosine",
) -> DataFrame:
    """Exact cosine over already-paired candidate rows, computed in one
    vectorized Arrow/numpy kernel instead of Spark's interpreted higher-order
    lambdas — the scoring half of the IVF/LSH/near-dup operators.

    Bit-identical to ``vector.cosine(left, right)``: products widen float32 →
    float64 (exact), the fold is :func:`_exact_dot`'s cumsum (left-to-right),
    zero-norm sides yield null.  Output: ``keep`` columns (original types) +
    ``out_col`` double.  Arrow batches are bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so kernel memory is
    O(batch × dim), never the candidate count."""
    import numpy as np
    from pyspark.sql import types as T

    in_schema = df.schema
    out_schema = T.StructType(
        [in_schema[c] for c in keep] + [T.StructField(out_col, T.DoubleType())]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            pdf = _valid_vec_rows(pdf, [left_vec, right_vec])
            # paired rows must also agree on length (HOF zip_with -> null)
            if len(pdf):
                same = pdf[left_vec].map(len).values == pdf[right_vec].map(len).values
                if not same.all():
                    pdf = pdf[same]
            if len(pdf) == 0:
                continue
            a = _stack_f64(pdf[left_vec])
            b = _stack_f64(pdf[right_vec])
            d = _exact_dot(a, b)
            na, nb = _exact_norm(a), _exact_norm(b)
            ok = (na > 0) & (nb > 0)
            cos = np.where(ok, d / np.where(ok, na * nb, 1.0), np.nan)
            out = pdf[keep].copy()
            out[out_col] = pd.Series(cos, index=pdf.index).where(pd.Series(ok, index=pdf.index))
            yield out

    return df.select(*keep, left_vec, right_vec).mapInPandas(kernel, out_schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
    kernel: str = "arrow",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excluding self-matches).
    Returns (query_id, neighbor_id, cosine, rank).

    ``kernel="arrow"`` (default) routes scoring through
    :func:`cosine_topk_arrow` — one BLAS matmul per batch for selection, exact
    cumsum rescore for the graded values (bit-identical results, measured
    2.2x end-to-end / ~4x kernel at sf1).  ``kernel="hof"`` is the pure
    JVM higher-order-function twin kept for parity tests."""
    if kernel == "arrow":
        return cosine_topk_arrow(
            corpus, queries, id_col=id_col, vec_col=vec_col, query_id=query_id, k=k
        )
    # norms once per row (pre-join), not once per (query, corpus) pair
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        vector.norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vector.norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id))
        .withColumn(
            "cosine",
            vector.cosine_from(
                vector.dot(F.col("__qv"), F.col("__cv")), F.col("__qn"), F.col("__cn")
            ),
        )
        .drop("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        # null cosines (null/ragged/zero-norm vectors) are dropped BEFORE
        # ranking so the HOF twin's top-k row count matches the Arrow kernel
        # (which skips such rows) even when < k valid candidates exist
        # (ADVICE r5 degenerate-input parity)
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Arrow/numpy twin of :func:`cosine_topk` — the kernel the BENCH triage
    names as the 100 TB scoring path, and since round 5 the DEFAULT.  Same
    result bit-for-bit; the physical inner loop is one BLAS matmul per Arrow
    batch instead of Spark's interpreted per-element higher-order lambdas.
    Measured on the sf1 smoke corpus (20k x 64f, 10 queries): 1.89 s HOF vs
    0.85 s Arrow end-to-end — 2.2x total, ~4x on the kernel fraction once the
    fixed per-query floor is subtracted; the gap widens with corpus size and
    query count because the matmul amortizes the Arrow transfer while the
    interpreted fold cannot.

    Shape: the query set (dimension-scale by the ANN contract) is collected
    once into a (nq x d) matrix shipped with the kernel closure; each corpus
    batch computes its (nb x nq) cosine block with BLAS and selects its
    per-query LOCAL top-2k candidates, then recomputes the EXACT left-to-right
    fold (:func:`_exact_dot`) for just those candidates; a final window takes
    the global top-k over exact values — candidates shuffled are
    O(batches · nq · 2k), never the corpus.

    Exactness: every emitted cosine is the cumsum fold, so results are
    bit-identical to the HOF twin and the SQL oracle (no blocked-summation
    near-tie flakiness — ADVICE r4).  The SELECTION boundary is guarded, not
    assumed (ADVICE r5): when a batch actually truncates (≥ 2k candidates)
    AND the 2k-th selected BLAS cosine is within the blocked-vs-fold error
    bound of the k-th, the kernel falls back to an exact rescore of EVERY
    candidate in that (batch, query) cell — a dropped candidate's exact value
    can exceed its BLAS value by at most ``tol``, so outside that margin no
    dropped candidate can reach the local top-k, and inside it nothing is
    dropped.  Bit-identity to the HOF twin is therefore unconditional, even
    for >2k near-tied non-identical vectors.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = _valid_vec_items(queries.select(query_id, vec_col).collect())
    out_schema = T.StructType([
        queries.schema[query_id],
        T.StructField("neighbor_id", corpus.schema[id_col].dataType),
        T.StructField("cosine", T.DoubleType()),
    ])
    if not q_rows:  # empty query set: no work, a well-typed empty result
        empty = local_frame(corpus.sparkSession, [], out_schema)
        return empty.withColumn("rank", F.lit(1)).limit(0).select(
            query_id, "neighbor_id", "cosine", "rank"
        )
    qids = np.array([r[0] for r in q_rows])
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn_exact = _exact_norm(qmat)
    local_k = 2 * k  # selection margin; see docstring
    # blocked-sum vs left-to-right-fold divergence on a normalized cosine is
    # O(d·eps); 16x headroom keeps the guard conservative while never firing
    # on real separations (1e-12 at d=64 vs any meaningful cosine gap)
    sel_tol = 16.0 * qmat.shape[1] * np.finfo(np.float64).eps

    def kernel(batches):
        for pdf in batches:
            pdf = _valid_vec_rows(pdf, [vec_col], dim=qmat.shape[1])
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            c = _stack_f64(pdf[vec_col])
            cn = _exact_norm(c)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (c @ qmat.T) / np.outer(cn, qn_exact)  # BLAS, selection only
            out_q, out_n, out_cos = [], [], []
            for j in range(len(qids)):
                col = sims[:, j]
                mask = ids != qids[j]  # exclude self-matches
                cand_idx = np.nonzero(mask & ~np.isnan(col))[0]
                if cand_idx.size == 0:
                    continue
                take = min(local_k, cand_idx.size)
                # local selection with the GLOBAL tie-break (cosine desc, id
                # asc) so local and global orders agree on ties
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))
                sel = cand_idx[order[:take]]
                if take == local_k and col[sel[-1]] > col[sel[k - 1]] - 2.0 * sel_tol:
                    # truncation happened AND the cut is inside the BLAS error
                    # margin of the local k-th: a dropped candidate could in
                    # principle out-rank under the exact fold — rescore every
                    # candidate in this cell instead (see docstring guard)
                    sel = cand_idx[order]
                # exact rescore of the survivors: the graded value is the
                # left-to-right fold, not the BLAS block sum
                exact = _exact_dot(c[sel], np.broadcast_to(qmat[j], (len(sel), qmat.shape[1]))) / (
                    cn[sel] * qn_exact[j]
                )
                out_q.extend([qids[j]] * len(sel))
                out_n.extend(ids[sel])
                out_cos.extend(exact)
            if out_q:
                yield pd.DataFrame({query_id: out_q, "neighbor_id": out_n, "cosine": out_cos})

    local = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _lsh_bucket_rows(C, planes_mat):
    """Sign-bit bucket ids for (n, d) float64 rows against (p, d) planes.

    BLAS matmul computes the plane dots; any dot within 1e-9 of zero is
    re-derived with the exact left-to-right fold so the SIGN (the only thing
    the bucket consumes) matches the HOF/SQL twin bit-for-bit even when
    blocked summation would land on the other side of zero."""
    import numpy as np

    dots = C @ planes_mat.T
    sus_r, sus_j = np.nonzero(np.abs(dots) < 1e-9)
    for r, j in zip(sus_r, sus_j):
        dots[r, j] = _exact_dot(C[r : r + 1], planes_mat[j : j + 1])[0]
    weights = (1 << np.arange(planes_mat.shape[0], dtype=np.int64)).astype(np.int64)
    return (dots > 0).astype(np.int64) @ weights


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    kernel: str = "arrow",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table, argmax by
    cosine.  Output: corpus columns + centroid_id.

    The argmax is a ``max_by`` groupBy, NOT a row_number window: partial
    aggregation collapses the |corpus|×|C| similarity rows to |corpus| rows
    map-side, and only the narrow (id, centroid_id) table ever shuffles — a
    window here would shuffle every scored row with its embedding array.
    Tiebreak (equal sim → lowest centroid_id) via the (sim, -centroid_id)
    ordering struct, matching the oracle's ORDER BY sim DESC, id ASC.

    ``kernel="arrow"`` (default): centroids (a dimension by contract) are
    collected into a (nC, d) matrix SORTED BY cid; each corpus batch computes
    its (nb, nC) similarity block with one BLAS matmul and takes the argmax —
    first occurrence under cid-ascending layout IS the HOF tiebreak, so exact
    ties (duplicate centroids) resolve identically for free.  Any row whose
    BLAS runner-up lands within 1e-9 of its winner gets every near-tied
    centroid exact-rescored with the left-to-right fold before the argmax, so
    blocked-summation 1e-15 drift can never flip a graded assignment.
    ``kernel="hof"`` is the pure-JVM parity twin."""
    if kernel == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        cent_rows = sorted(
            _valid_vec_items(centroids.select(centroid_id, centroid_vec).collect()),
            key=lambda r: r[0],
        )
        out_schema = T.StructType([corpus.schema[id_col], centroids.schema[centroid_id]])
        if not cent_rows:
            return corpus.join(local_frame(corpus.sparkSession, [], out_schema), id_col)
        cids = np.array([r[0] for r in cent_rows])
        cmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in cent_rows])
        cn_exact = _exact_norm(cmat)

        def akernel(batches):
            for pdf in batches:
                pdf = _valid_vec_rows(pdf, [vec_col], dim=cmat.shape[1])
                if len(pdf) == 0:
                    continue
                ids = pdf[id_col].to_numpy()
                v = _stack_f64(pdf[vec_col])
                vn = _exact_norm(v)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (v @ cmat.T) / np.outer(vn, cn_exact)
                sims = np.where(np.isnan(sims), -np.inf, sims)
                best_idx = np.argmax(sims, axis=1)  # first occurrence = lowest cid
                bmax = sims[np.arange(len(ids)), best_idx]
                # exact-rescore every centroid within 1e-9 of the winner for
                # rows where more than one is that close (the rare path)
                near = sims >= (bmax - 1e-9)[:, None]
                for i in np.nonzero(near.sum(axis=1) > 1)[0]:
                    cand = np.nonzero(near[i])[0]
                    e = _exact_dot(
                        np.broadcast_to(v[i], (len(cand), v.shape[1])), cmat[cand]
                    ) / (vn[i] * cn_exact[cand])
                    best_idx[i] = cand[np.argmax(e)]  # cid-sorted: argmax tiebreak = lowest cid
                yield pd.DataFrame({id_col: ids, centroid_id: cids[best_idx]})

        # NOT spread before the kernel: a single-split corpus serializes the
        # BLAS matmul on one core, but the A/B (r13) measured the spread
        # WORSE (0.29 -> 0.38 s per assignment: 32 Python-worker fan-out +
        # Arrow round-trips cost more than the one-core matmul saves) — the
        # same verdict r12 recorded for the kmeans/textops spreads.  At
        # scale the corpus arrives with many splits and parallelizes anyway.
        assigned = corpus.select(id_col, vec_col).mapInPandas(akernel, out_schema)
        return corpus.join(assigned, id_col)
    if corpus.rdd.getNumPartitions() < 16:
        corpus = corpus.repartition(8, id_col)  # parallelize the fold-heavy cosines
    cent = centroids.withColumn("__cn", vector.norm(F.col(centroid_vec)))
    sims = (
        corpus.select(
            F.col(id_col), F.col(vec_col), vector.norm(F.col(vec_col)).alias("__vn")
        )
        .join(F.broadcast(cent))
        .select(
            F.col(id_col),
            F.col(centroid_id),
            vector.cosine_from(
                vector.dot(F.col(vec_col), F.col(centroid_vec)),
                F.col("__vn"),
                F.col("__cn"),
            ).alias("__sim"),
        )
    )
    best = sims.groupBy(id_col).agg(
        F.max_by(centroid_id, F.struct(F.col("__sim"), (-F.col(centroid_id)).alias("__t"))).alias(centroid_id)
    )
    return corpus.join(best, id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
    nprobe: int = 2,
    kernel: str = "arrow",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` centroid buckets nearest to
    each query.  Recall < 1 by construction; at 100 TB the bucket pruning is
    what makes the scan feasible.

    ``kernel="arrow"`` (default) runs BOTH heavy stages through the Arrow
    kernels — corpus→centroid assignment via the matmul-with-exact-tie-rescore
    path of :func:`assign_to_centroids`, and candidate scoring via
    :func:`paired_exact_cosine` (exact left-to-right folds: bit-identical to
    the HOF twin and the SQL oracle).  The probe selection (queries ×
    centroids — dimension × dimension) stays JVM-side either way."""
    assigned = assign_to_centroids(
        corpus, centroids, id_col=id_col, vec_col=vec_col, kernel=kernel
    )
    return ivf_probe(
        assigned, centroids, queries,
        id_col=id_col, vec_col=vec_col, query_id=query_id,
        k=k, nprobe=nprobe, kernel=kernel,
    )


def ivf_probe(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
    nprobe: int = 2,
    kernel: str = "arrow",
) -> DataFrame:
    """The query-time half of IVF, split out so a PERSISTED index (the
    ``assigned`` table written to the lake partitioned by ``centroid_id``,
    plus its centroid dimension) can be probed without re-running the build:
    select each query's ``nprobe`` nearest centroids, scan only those
    buckets, exact-rescore candidates.  Against a centroid-partitioned index
    the bucket join prunes to nprobe/|C| of the data — the partition-pruned
    scan that makes 100 TB ANN feasible."""
    if kernel != "arrow":
        assigned = assigned.withColumn("__vn", vector.norm(F.col(vec_col)))
    q = queries.select(
        query_id, F.col(vec_col).alias("__qv"), vector.norm(F.col(vec_col)).alias("__qn")
    )
    qc = q.join(F.broadcast(centroids)).withColumn(
        "__sim", vector.cosine(F.col("__qv"), F.col("centroid_vec"))
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("__sim").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, "__qv", "__qn", "centroid_id")
    )
    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(F.col(id_col) != F.col(query_id))
    if kernel == "arrow":
        scored = paired_exact_cosine(
            cand, left_vec="__qv", right_vec=vec_col, keep=[query_id, id_col]
        )
    else:
        scored = cand.withColumn(
            "cosine",
            vector.cosine_from(
                vector.dot(F.col("__qv"), F.col(vec_col)), F.col("__qn"), F.col("__vn")
            ),
        )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        # drop null cosines pre-rank: both arms then agree on degenerate
        # inputs (Arrow skips null/ragged rows; HOF folds them to null)
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, F.col(id_col).alias("neighbor_id"), F.round("cosine", 6).alias("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
    n_planes: int = 6,
    seed: int = 11,
    dim: int | None = None,
    kernel: str = "arrow",
) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket = sign bits against ``n_planes``
    deterministic hyperplanes; a query scans ONLY its own bucket (corpus/2^n
    of the data), then exact-cosine ranks the candidates.  Recall < 1 by
    construction — the bucket is a coarse partition-pruning key; at 100 TB the
    bucket column is a partition/cluster key and the probe is a pruned scan.

    Pass ``dim`` explicitly to keep construction fully lazy; otherwise the
    first corpus row is peeked (one small Spark job at plan-build time).

    ``kernel="arrow"`` (default) is ONE corpus pass with no join at all: the
    collected query set's buckets are computed driver-side, each corpus batch
    computes its rows' buckets with one BLAS matmul (signs exact-guarded by
    :func:`_lsh_bucket_rows`), keeps only rows landing in a probed bucket,
    exact-rescores their cosines against the bucket's queries and emits local
    top-2k candidates — the global window then ranks exact values.  The HOF
    twin (``kernel="hof"``) computes the bucket column with 6 interpreted
    dot-product folds per row and equi-joins; BENCH_TRIAGE measured it 24x
    the mt-oracle, kernel-bound.
    """
    if dim is None:
        row = corpus.select(vec_col).first()
        if row is None or row[0] is None:
            dim = 1  # empty corpus / null vector: plan still builds, result is empty
        else:
            dim = len(row[0])
    planes = vector.hyperplanes(n_planes, dim, seed)
    if kernel == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        pmat = np.array(planes, dtype=np.float64)
        q_rows = _valid_vec_items(queries.select(query_id, vec_col).collect(), dim=dim)
        out_schema = T.StructType([
            queries.schema[query_id],
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ])
        if not q_rows:
            return (
                local_frame(corpus.sparkSession, [], out_schema)
                .withColumn("rank", F.lit(1)).limit(0)
                .select(query_id, "neighbor_id", "cosine", "rank")
            )
        qids = np.array([r[0] for r in q_rows])
        qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
        qn_exact = _exact_norm(qmat)
        qbkt = _lsh_bucket_rows(qmat, pmat)
        probed = set(qbkt.tolist())
        local_k = 2 * k

        def kern(batches):
            for pdf in batches:
                pdf = _valid_vec_rows(pdf, [vec_col], dim=pmat.shape[1])
                if len(pdf) == 0:
                    continue
                ids = pdf[id_col].to_numpy()
                c = _stack_f64(pdf[vec_col])
                cbkt = _lsh_bucket_rows(c, pmat)
                hit = np.isin(cbkt, list(probed))
                if not hit.any():
                    continue
                ids, c, cbkt = ids[hit], c[hit], cbkt[hit]
                cn = _exact_norm(c)
                out_q, out_n, out_cos = [], [], []
                for j in range(len(qids)):
                    sel = np.nonzero((cbkt == qbkt[j]) & (ids != qids[j]))[0]
                    if sel.size == 0:
                        continue
                    exact = _exact_dot(
                        c[sel], np.broadcast_to(qmat[j], (len(sel), qmat.shape[1]))
                    )
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = exact / (cn[sel] * qn_exact[j])
                    ok = ~np.isnan(cos)
                    sel, cos = sel[ok], cos[ok]
                    if sel.size == 0:
                        continue
                    order = np.lexsort((ids[sel], -cos))
                    take = order[: min(local_k, sel.size)]
                    out_q.extend([qids[j]] * len(take))
                    out_n.extend(ids[sel[take]])
                    out_cos.extend(cos[take])
                if out_q:
                    yield pd.DataFrame({query_id: out_q, "neighbor_id": out_n, "cosine": out_cos})

        local = corpus.select(id_col, vec_col).mapInPandas(kern, out_schema)
        w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (
            local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vector.lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
        vector.norm(F.col(vec_col)).alias("__cn"),
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        vector.lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
        vector.norm(F.col(vec_col)).alias("__qn"),
    )
    cand = c.join(F.broadcast(q), on="__bkt").filter(F.col("neighbor_id") != F.col(query_id))
    scored = cand.withColumn(
        "cosine",
        vector.cosine_from(
            vector.dot(F.col("__qv"), F.col("__cv")), F.col("__qn"), F.col("__cn")
        ),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        # null-cosine drop for Arrow-twin parity on degenerate inputs
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 1,
    seed: int = 11,
    dim: int | None = None,
    target_occupancy: int | None = None,
    kernel: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-family member over
    vectors): LSH sign-buckets block the candidate space — only same-bucket
    pairs are scored — then exact cosine filters at ``threshold``.
    Returns (id_a, id_b, cosine) with id_a < id_b.

    Scale controls (the sf1 smoke's finding — candidates = Σ bucket² ≈
    N²/2^planes, QUADRATIC in corpus size when the plane count is fixed):

    - ``target_occupancy``: size the bucket grid to the corpus — planes =
      max(n_planes, ceil(log2(N / occupancy))), one count() job at plan time.
      Constant occupancy ⇒ candidate volume ∝ N·occupancy, linear.  At 100 TB
      this is mandatory; the fixture queries keep the fixed 6-plane grid only
      because their DuckDB oracle mirrors those exact buckets.
    - ``n_tables``: OR-construction — each table hashes against an
      independent set of planes (seed + table index) and a pair is a
      candidate if ANY table buckets it together.  Recall for a pair at
      angle θ rises from p^planes to 1 − (1 − p^planes)^tables
      (p = 1 − θ/π), which is how narrow grids (many planes) keep recall at
      production thresholds.  Within-table dedup happens at the pair level
      (distinct) before output.

    ``kernel="arrow"`` (default) swaps both interpreted-HOF stages for Arrow
    kernels with identical results: bucket ids come from one BLAS matmul per
    batch with exact-guarded signs (:func:`_lsh_bucket_rows`), and candidate
    cosines come from :func:`paired_exact_cosine` (exact left-to-right folds,
    so the round(6)-then-threshold grading cannot drift).  The candidate
    self-join itself stays a Spark equi-join either way — that is the part
    that must scale past one machine.

    Storage contract (``kernel="arrow"``): the bucket-kernel output is lazily
    persist()ed for exactly-once execution under the self-join; after the
    terminal action release it with ``operators.release_caches()`` or
    ``spark.catalog.clearCache()`` (r5 ADVICE).
    """
    if dim is None:
        row = corpus.select(vec_col).first()
        dim = 1 if row is None or row[0] is None else len(row[0])
    if target_occupancy is not None:
        import math

        n = corpus.count()
        if n > target_occupancy:
            n_planes = max(n_planes, math.ceil(math.log2(n / target_occupancy)))
        n_planes = min(n_planes, 30)
    tables = [
        vector.hyperplanes(n_planes, dim, seed + 7919 * ti) for ti in range(n_tables)
    ]
    if kernel == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        pmats = [np.array(p, dtype=np.float64) for p in tables]
        bkt_schema = T.StructType([
            T.StructField("id", corpus.schema[id_col].dataType),
            T.StructField("v", corpus.schema[vec_col].dataType),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bkt", T.LongType()),
        ])

        def bkern(batches):
            for pdf in batches:
                pdf = _valid_vec_rows(pdf, [vec_col], dim=pmats[0].shape[1])
                if len(pdf) == 0:
                    continue
                c = _stack_f64(pdf[vec_col])
                frames = []
                for ti, pm in enumerate(pmats):
                    frames.append(pd.DataFrame({
                        "id": pdf[id_col].to_numpy(),
                        "v": pdf[vec_col].to_numpy(),
                        "tbl": np.int32(ti),
                        "bkt": _lsh_bucket_rows(c, pm),
                    }))
                yield pd.concat(frames, ignore_index=True)

        # A packed embeddings file reads as a handful of input splits (sf1:
        # 2), and the broadcast self-join below PRESERVES the stream side's
        # partitioning — so the bucket kernel, the candidate explosion, AND
        # the exact-cosine kernel would all run on those few cores while the
        # rest idle (measured: the cosine pass over 3.3M sf1 candidates took
        # 25 s on 2 partitions, 1.6 s join).  One corpus-sized repartition up
        # front spreads every downstream stage; same fix as pq_topk's.
        src = corpus.select(id_col, vec_col).repartition(
            corpus.sparkSession.sparkContext.defaultParallelism
        )
        t = src.mapInPandas(bkern, bkt_schema)
        # both self-join sides consume the bucket kernel; AQE broadcasts one
        # side and a BroadcastExchange is never reused against a shuffle, so
        # without materialization the matmul-over-corpus runs ONCE PER SIDE
        # (measured via accumulator on the dedup family, same shape).  A lazy
        # persist() = exactly-once kernel with the lineage kept (executor
        # loss recomputes; clearCache releases), both sides read the cache.
        t = _cache.track(t.persist())
        a, b = t.alias("a"), t.alias("b")
        cand = a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("__va"),
            F.col("b.v").alias("__vb"),
        )
        pairs = (
            paired_exact_cosine(cand, left_vec="__va", right_vec="__vb", keep=["id_a", "id_b"])
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )
        return pairs.distinct() if n_tables > 1 else pairs
    t = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(ti).alias("tbl"),
                    vector.lsh_bucket(F.col(vec_col), planes).alias("bkt"),
                )
                for ti, planes in enumerate(tables)
            ])
        ).alias("tb"),
        vector.norm(F.col(vec_col)).alias("nrm"),
    ).select("id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"), "nrm")
    a, b = t.alias("a"), t.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                vector.cosine_from(
                    vector.dot(F.col("a.v"), F.col("b.v")), F.col("a.nrm"), F.col("b.nrm")
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    # multi-table: the same pair can collide in several tables — dedup on the
    # narrow (id_a, id_b, cosine) rows, a no-op shuffle when n_tables == 1
    return pairs.distinct() if n_tables > 1 else pairs


def _euclid_assign(pts: DataFrame, cent_rows, *, id_col: str = "vec_id",
                   vec_col: str = "e", out_col: str = "cid") -> DataFrame:
    """Nearest-centroid by squared euclidean distance, Arrow/BLAS kernel:
    ``d2 = |v|^2 - 2 v.C + |c|^2`` selects per batch in one matmul; every
    row whose BLAS runner-up lands within 1e-9 of its winner has all
    near-tied centroids exact-rescored with the left-to-right cumsum fold
    (bit-identical to the HOF ``aggregate`` / DuckDB ``list_sum``), and the
    cid-ascending centroid layout makes first-argmin the lowest-cid tiebreak
    — the same guarantees discipline as :func:`assign_to_centroids`.  BLAS
    blocked-summation drift is ~1e-11 at these magnitudes, far inside the
    rescue band, so a graded assignment can never flip."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent_rows = sorted(cent_rows, key=lambda r: r[0])
    cids = np.array([r[0] for r in cent_rows])
    C = np.stack([np.asarray(r[1], dtype=np.float64) for r in cent_rows])
    c2 = (C * C).sum(axis=1)
    out_schema = T.StructType(
        [pts.schema[id_col], T.StructField(out_col, T.LongType())]
    )

    def kern(batches):
        for pdf in batches:
            pdf = _valid_vec_rows(pdf, [vec_col], dim=C.shape[1])
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            v = _stack_f64(pdf[vec_col])
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ C.T) + c2[None, :]
            best = np.argmin(d2, axis=1)  # first occurrence = lowest cid
            bmin = d2[np.arange(len(ids)), best]
            near = d2 <= (bmin + 1e-9)[:, None]
            for i in np.nonzero(near.sum(axis=1) > 1)[0]:
                cand = np.nonzero(near[i])[0]
                diff = v[i][None, :] - C[cand]
                e = np.cumsum(diff * diff, axis=1)[:, -1]  # exact HOF fold
                best[i] = cand[np.argmin(e)]
            yield pd.DataFrame({id_col: ids, out_col: cids[best]})

    return pts.select(id_col, vec_col).mapInPandas(kern, out_schema)


def kmeans_assign(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    kernel: str = "arrow",
) -> DataFrame:
    """Deterministic mini k-means (Lloyd's, fixed iterations) over an
    embedding column — the semantic-clustering step of a training-data
    pipeline (diversity sampling, near-dup cluster seeding, corpus maps).

    Engine-portable by construction, so a SQL oracle can replay it exactly:
    initial centroids are the first ``k`` ids (no RNG), distances fold
    left-to-right in double, ties break on centroid id, and centroid updates
    are per-component DECIMAL(30,12) means (order-independent across
    partitions — a plain double sum would drift between engines).

    Scale shape per iteration: one broadcast cross join of the corpus against
    k centroids (k rows — always a dimension), one groupBy vec_id (min-struct
    assignment), one posexplode + groupBy (cid, pos) for the update whose
    output is k x dim rows (tiny).  The corpus is CACHED once and each
    iteration's centroids (k x dim doubles — driver-trivial) are collected
    and re-landed as a literal frame, so the returned plan is a single
    cached-corpus scan against broadcast literal centroids instead of an
    unrolled lineage that re-scans the corpus 2*iters+1 times.  MLlib's
    KMeans is the right tool when k or iters are large; this form exists for
    exact cross-engine verifiability.

    ``kernel="arrow"`` (default since r6) runs the O(n x k x d) assignment
    step in :func:`_euclid_assign` (one BLAS matmul per batch, near-ties
    exact-rescored with the left-to-right fold) — bit-identical to the
    ``kernel="hof"`` pure-JVM twin and to the SQL oracle, but linear-cost
    in practice even when k grows with the corpus (SemDeDup's regime: the
    interpreted HOF form measured 27x per 10x on the sf1 ladder at
    k=n/64 before this kernel, 139 s -> see BENCH_DETAIL sf1).  The update
    step stays JVM-side: per-component DECIMAL(30,12) means are the
    cross-engine portability anchor.
    """
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    ).cache()
    cent_rows = [
        (r["vec_id"], list(r["e"]))
        for r in pts.filter(F.col("vec_id") < k).collect()
    ]

    def assign(rows) -> DataFrame:
        if kernel == "arrow":
            # O(n x k x d) distance work in BLAS instead of interpreted
            # per-element lambdas — the difference between linear and
            # unusable when k grows with the corpus (SemDeDup's regime);
            # near-ties exact-rescored, so results are bit-identical to hof
            return _euclid_assign(pts, rows, id_col="vec_id", vec_col="e")
        centroids = local_frame(
            pts.sparkSession, rows, "cid long, c array<double>"
        )
        pairs = pts.crossJoin(F.broadcast(centroids))
        d2 = F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return (
            pairs.select("vec_id", F.struct(d2.alias("d2"), F.col("cid")).alias("s"))
            .groupBy("vec_id")
            .agg(F.min("s").alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"))
        )

    for _ in range(iters):
        a = assign(cent_rows)
        comp = (
            a.join(pts, "vec_id")
            .select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (F.sum(F.col("x").cast("decimal(30,12)")).cast("double") / F.count("*")).alias("comp")
            )
        )
        updated = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "comp"))), lambda s: s.comp
            ).alias("c")
        )
        # k rows of dim doubles: materialize to sever the iteration lineage —
        # the next iteration (and the final assignment) reads collected
        # centroids instead of replaying every previous Lloyd step
        cent_rows = [(r["cid"], list(r["c"])) for r in updated.collect()]
    return assign(cent_rows).select(
        "vec_id", F.col("cid").cast("long").alias("cluster_id")
    )


def semdedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    by clustering embeddings with k-means, then searching for near-duplicate
    pairs ONLY within each cluster — the trick that turns all-pairs cosine
    from O(n²) into Σ|cluster|², bounded by choosing k proportional to the
    corpus so cluster sizes stay roughly constant at any scale.

    Pipeline: :func:`kmeans_assign` (deterministic, oracle-replayable) →
    within-cluster candidate self-join on ``cluster_id`` → exact cosine via
    the Arrow kernel (:func:`paired_exact_cosine`) → keep-lowest-id scrub
    (the same deterministic survivor rule as the MinHash/SimHash family in
    operators/dedup.py).  ``dup_of`` is the smallest same-cluster id whose
    cosine (rounded to the repo's 6-decimal float discipline) reaches
    ``threshold``; rows with ``dup_of`` null are the kept corpus.

    Exactly-once: the (id, cluster, vector) frame feeds BOTH sides of the
    candidate self-join plus the final join-back, so it is persisted (lazy,
    lineage kept) and registered with operators._cache — kernel-discipline
    note in operators/dedup.py applies.

    Output: (``id_col``, cluster_id, dup_of nullable, is_kept boolean) — one
    row per input vector.
    """
    from us_equity_datalake_spark.operators import _cache

    assign = kmeans_assign(emb, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    t = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(assign.withColumnRenamed("vec_id", "id"), "id")
    )
    # spread before persist: the within-cluster candidate join broadcasts the
    # small side and so inherits THIS side's partitioning — off a single
    # input split the exact-cosine kernel would run on one core
    t = _cache.track(parallelize_small_input(t, "id").persist())
    left = t.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "cluster_id")
    right = t.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "cluster_id")
    cand = left.join(right, ["cluster_id"]).filter(F.col("id_a") < F.col("id_b"))
    scored = paired_exact_cosine(
        cand, left_vec="va", right_vec="vb", keep=["id_a", "id_b"]
    )
    dup = (
        scored.filter(F.round("cosine", 6) >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        t.select("id", "cluster_id")
        .join(dup.withColumnRenamed("id_b", "id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            "dup_of",
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    dim: int = 64,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    n_candidates: int = 50,
    k: int = 10,
) -> DataFrame:
    """Product-quantization ANN (Jégou, Douze, Schmid 2011 — the PQ/ADC half
    of IVF-PQ, the canonical memory-compressed 100 TB vector index): split
    ``dim`` into ``m`` subspaces, train a ``k_codes``-codeword codebook per
    subspace (deterministic Lloyd's — first-k init, left-to-right double
    folds, DECIMAL(30,12) centroid means, ties on codeword id — the same
    oracle-replayable discipline as :func:`kmeans_assign`), encode every
    vector as ``m`` small codes, then answer queries with an Asymmetric
    Distance Computation scan: per query, an m x k_codes table of exact
    subspace distances; a vector's approximate distance is a LEFT-TO-RIGHT
    fold of table lookups over its codes (no float-order ambiguity — the
    fold replaces a groupBy SUM whose order neither engine guarantees).
    Top-``n_candidates`` by ADC are rescored with EXACT cosine and the final
    top-``k`` ranks on the rescored value — the standard refine step, so PQ
    approximation error affects recall, never the reported similarity.

    Scale shape (round 10 — the Arrow kernel treatment, VERDICT r9 #7): the
    corpus is exploded ONCE into (vec_id, m, subvector) rows and persisted;
    each Lloyd iteration's ASSIGNMENT is a numpy kernel per Arrow batch
    (one (b, k, sub) squared-difference tensor + left-to-right fold +
    argmin — bit-identical to the zip_with/aggregate HOF form, first-index
    argmin == min-struct tie-on-cid), while the centroid UPDATE stays in
    Spark SQL so the DECIMAL(30,12) exact means are engine-portable;
    encoding reuses the same kernel; the ADC scan gathers each query's
    m x k_codes distance table (driver-computed with the same fold — the
    book is already a driver statistic) over the codes matrix with numpy
    indexing, keeping per-batch local top-2n candidates so the global exact
    cut sees O(batches * 2n) rows, not the corpus.  The 8-byte codes
    replace 256-byte vectors (32x memory); no corpus self-join anywhere;
    the candidate rescore reads only ``n_candidates`` full vectors per
    query.

    Output: (query_id, neighbor_id, adc_d2, cosine, rank), rank 1..k per
    query by rounded exact cosine desc, neighbor id asc.
    """
    import numpy as np

    from us_equity_datalake_spark.functions import vector
    from us_equity_datalake_spark.operators import _cache

    sub = dim // m
    assert sub * m == dim, "m must divide dim"
    spark = emb.sparkSession

    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    )
    # A packed embeddings file often arrives as a handful of input splits
    # (sf1 reads as 2), which would serialize every kernel pass onto as many
    # cores; spread the cached frame across the cluster once, up front.
    pts = pts.repartition(spark.sparkContext.defaultParallelism)
    pts = _cache.track(pts.persist())

    # --- train: ALL subspaces in one exploded frame — each Lloyd iteration
    # is ONE corpus pass (kernel assign + SQL decimal update keyed by m keep
    # the m codebooks independent), and the k_codes x m x sub doubles
    # collected per iteration are driver-trivial.  Per-subspace math is
    # identical to running kmeans on each slice separately (the oracle
    # replays it that way).
    # the book lives as a DRIVER dict across iterations (k_codes x m rows):
    # re-collecting it from Spark each round would cost an extra job for
    # data that never left the driver.  Initial codewords: the first k_codes
    # vectors, sliced per subspace driver-side.
    book_rows = {
        (mi, r["vec_id"]): list(r["e"][mi * sub:(mi + 1) * sub])
        for r in pts.filter(F.col("vec_id") < k_codes).collect()
        for mi in range(m)
    }

    def _book_arr():
        # (m, k_codes, sub) float64; dense cids 0..k_codes-1 by invariant
        a = np.empty((m, k_codes, sub), dtype=np.float64)
        for (mi, cid), c in book_rows.items():
            a[mi, cid] = c
        return a

    def _d2_to_book(X, C):
        """(len(X), len(C)) squared distances as the LEFT-TO-RIGHT fold over
        feature positions — bit-identical to aggregate(zip_with(...))."""
        diff = X[:, None, :] - C[None, :, :]
        sq = diff * diff
        acc = sq[:, :, 0].copy()
        for d in range(1, sq.shape[2]):
            acc = acc + sq[:, :, d]
        return acc

    def _codes_mat(pdf, book_arr):
        """(B, m) argmin codes for a batch of WHOLE vectors — each subspace
        sliced and assigned in numpy; np.argmin returns the FIRST minimum,
        i.e. the lowest cid, matching F.min(struct(d2, cid)) tie-breaking."""
        E = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["e"]])
        cm = np.empty((len(E), m), dtype=np.int64)
        for mi in range(m):
            cm[:, mi] = np.argmin(
                _d2_to_book(E[:, mi * sub:(mi + 1) * sub], book_arr[mi]), axis=1
            )
        return E, cm

    def _assign_exploded_fn(book_arr):
        # train-side: emit (m, cid, es) rows so the DECIMAL(30,12) centroid
        # update stays in Spark SQL (the cross-engine portability anchor)
        def fn(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                E, cm = _codes_mat(pdf, book_arr)
                # row order (vector-major, subspace-minor) for all three
                # columns; reshape slices the contiguous m*sub layout in C
                yield pd.DataFrame({
                    "m": np.tile(np.arange(m, dtype=np.int64), len(E)),
                    "cid": cm.reshape(-1),
                    "es": list(E.reshape(-1, sub)),
                })

        return fn

    for _ in range(iters):
        assigned = pts.mapInPandas(
            _assign_exploded_fn(_book_arr()),
            "m long, cid long, es array<double>",
        )
        comp = (
            assigned.select("m", "cid", F.posexplode("es").alias("pos", "x"))
            .groupBy("m", "cid", "pos")
            .agg((F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
                  / F.count("*")).alias("comp"))
        )
        updated = comp.groupBy("m", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                lambda s: s.comp,
            ).alias("c")
        )
        # A codeword that loses every member in this round would vanish from
        # the groupBy output; keep its PREVIOUS centroid instead, so the book
        # always holds exactly m x k_codes entries with dense cids
        # 0..k_codes-1 — the positional ADC gather below is only correct
        # under that density invariant.
        book_rows.update(
            {(r["m"], r["cid"]): list(r["c"]) for r in updated.collect()}
        )

    # --- encode: one kernel pass over WHOLE vectors -> (vec_id, codes) with
    # NO shuffle at all (the old form exploded to 4.8M subvector rows at sf1
    # and re-grouped them; the codes matrix falls out of the same argmin) ---
    book_arr = _book_arr()

    def encode_fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            _, cm = _codes_mat(pdf, book_arr)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(cm)}
            )

    codes = pts.mapInPandas(encode_fn, "vec_id long, codes array<long>")

    # --- ADC tables: per query, m x k_codes exact subspace distances,
    # computed DRIVER-side with the same fold (the book is already a driver
    # statistic; nq x m x k_codes doubles is report-sized) ---
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qe"),
    )
    q_rows = q.collect()
    qids = [r["query_id"] for r in q_rows]
    nq = len(qids)
    if nq == 0:
        # degrade gracefully (the HOF form's behavior): an empty query frame
        # yields an empty result with the contract schema — the 1-D
        # np.array([]) below would otherwise IndexError on the 2-D slice
        return local_frame(
            spark,
            [],
            "query_id long, neighbor_id long, adc_d2 double, "
            "cosine double, rank long",
        )
    qmat = np.array([r["qe"] for r in q_rows], dtype=np.float64).reshape(nq, dim)
    qt_arr = np.empty((nq, m, k_codes), dtype=np.float64)
    for mi in range(m):
        qt_arr[:, mi, :] = _d2_to_book(
            qmat[:, mi * sub:(mi + 1) * sub], book_arr[mi]
        )
    # ship the nq x m x k_codes distance tables ONCE per executor as a Spark
    # broadcast — captured in the task closure they would re-serialize with
    # EVERY task of the ADC scan
    bq = spark.sparkContext.broadcast(qt_arr)
    import pandas as pd

    qmap = spark.createDataFrame(  # pandas-backed: executes JVM-side
        pd.DataFrame({"qidx": list(range(nq)), "query_id": qids})
    )

    # --- ADC scan: numpy gather over the distance tables per Arrow batch;
    # local top-2n per (query, batch) so the exact global cut never sees the
    # corpus.  adc_d2 is the same left-to-right fold over m as the HOF form;
    # the local cut key mirrors the global (round(d2, 6), vec_id) order with
    # HALF-UP integer rounding (d2 >= 0), kept at 2x width so a boundary tie
    # cluster cannot change the global result. ---
    keep_local = 2 * n_candidates

    def adc_fn(batches):
        import pandas as pd

        qt = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            vid = pdf["vec_id"].to_numpy()
            acc = qt[:, 0, :][:, cm[:, 0]]
            for mi in range(1, m):
                acc = acc + qt[:, mi, :][:, cm[:, mi]]
            r6 = np.floor(acc * 1e6 + 0.5).astype(np.int64)
            keep = min(keep_local, len(vid))
            out = []
            for qi in range(nq):
                order = np.lexsort((vid, r6[qi]))[:keep]
                out.append(
                    pd.DataFrame(
                        {"qidx": qi, "vec_id": vid[order], "adc_d2": acc[qi][order]}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    adc = codes.mapInPandas(
        adc_fn, "qidx int, vec_id long, adc_d2 double"
    ).join(F.broadcast(qmap), "qidx").drop("qidx")

    from us_equity_datalake_spark.operators.topk import top_k_by_group

    cand = top_k_by_group(
        adc,
        partition=["query_id"],
        order=[F.round("adc_d2", 6).asc(), F.col("vec_id").asc()],
        k=n_candidates,
        rank_col="adc_rank",
    )

    # --- refine: exact cosine on the candidate set only ---
    scored = (
        cand.join(pts, "vec_id")
        .join(q, "query_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round("adc_d2", 6).alias("adc_d2"),
                F.round(vector.cosine(F.col("qe"), F.col("e")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "cosine", F.col("rank").cast("long"))
    )


def binary_sign_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
    n_candidates: int = 64,
    dim: int = 64,
) -> DataFrame:
    """1-bit (sign) binary-quantization ANN: select-then-verify with the
    cheapest possible representation.

    Pack each vector's signs into ``dim/32`` BIGINT words (16 bytes per
    64-dim vector vs 256 as float32 — the billion-vector memory trick),
    pre-rank candidates per query by HAMMING distance on the packed words
    (xor + popcount: integer-exact, SIMD-cheap, whole-stage-codegen'd —
    no floats touched until the short rescore list exists), then
    exact-rescore only the ``n_candidates`` survivors with the
    full-precision cosine fold.  Same select-then-verify discipline as the
    PQ-ADC and LSH paths; recall < 1 by construction (the honest ANN
    trade), but the graded result is deterministic because packing is
    integer and every rank breaks ties on the neighbor id.

    At 100 TB: the packed words are a 16x-smaller scan (often memory-
    resident when the floats are not) and the broadcast query side carries
    two longs per query; only survivors' float vectors are ever read —
    with the packed words stored as their own columns, column pruning
    keeps the float array out of the pre-rank scan entirely.
    """
    assert dim % 32 == 0, "dim must pack into 32-bit words"
    words = dim // 32
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        *[vector.sign_bits(vec_col, 32 * w).alias(f"c_w{w}") for w in range(words)],
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("qv"),
        *[vector.sign_bits(vec_col, 32 * w).alias(f"q_w{w}") for w in range(words)],
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id))
    ham = F.lit(0).cast("long")
    for w in range(words):
        ham = ham + F.bit_count(F.col(f"c_w{w}").bitwiseXOR(F.col(f"q_w{w}")))
    w1 = Window.partitionBy(query_id).orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    cand = (
        pairs.select(query_id, "neighbor_id", "qv", "cv", ham.alias("hamming"))
        .withColumn("crank", F.row_number().over(w1))
        .where(F.col("crank") <= n_candidates)
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select(
            query_id, "neighbor_id", "hamming",
            vector.cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            query_id, "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("hamming").cast("long").alias("hamming"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
