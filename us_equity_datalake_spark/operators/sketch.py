"""Distinct-count sketching (KMV / K-minimum-values) — approximate
aggregates for the 100 TB tier.

The reference computes exact ``n_unique`` everywhere (SURVEY §2.4 A9);
exact distinct over 100 TB means shuffling every key.  A KMV sketch keeps
only the k smallest *hash values* per group: if the kth-smallest of n
uniformly-hashed distinct keys is h_k, then E[h_k] ≈ k/n of the hash
space, so n̂ = (k-1) · M / h_k (M = hash-space size).  Error ~ 1/√k.

Built on md5 (functions.hashing) instead of Spark's builtin hash so the
sketch — and therefore the estimate — is bit-identical in DuckDB, making
an *approximate* operator oracle-checkable exactly.

Scale note: this implementation ranks hashes with a per-group window
(one shuffle + sort) which is fine up to ~10⁹ rows/group; the true
streaming form is an `Aggregator` keeping a k-heap per partition then
merging heaps (partial aggregation, no sort).  The algebra — and the
estimate — is identical, so the oracle gates that too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from us_equity_datalake_spark.functions.hashing import md5_long60, md5_long60_sql

# md5_long60 yields uniform hashes in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key: str,
    *,
    by: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-``by``-group KMV distinct estimate of ``key`` plus the exact count
    (so the query result exhibits the sketch's error directly).

    Groups with fewer than k distinct keys are exact by construction
    (the sketch holds every hash).
    """
    hashed = df.select(*by, md5_long60(F.col(key).cast("string")).alias("__h")).distinct()
    rn = F.row_number().over(Window.partitionBy(*by).orderBy("__h"))
    ranked = hashed.withColumn("__rn", rn)
    return (
        ranked.groupBy(*by)
        .agg(
            F.count("*").alias("exact_distinct"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
        )
        .select(
            *by,
            "exact_distinct",
            F.when(
                F.col("__hk").isNull(), F.col("exact_distinct").cast("double")
            )
            .otherwise(
                F.round((k - 1) * F.lit(_HASH_SPACE) / F.col("__hk").cast("double"), 6)
            )
            .alias("est_distinct"),
        )
    )


def kmv_distinct_sql(table_expr: str, key_expr: str, by: list[str], k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hashes, same estimate)."""
    bys = ", ".join(by)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {bys}, {md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")} AS h
      FROM {table_expr}
    ),
    ranked AS (
      SELECT {bys}, h, ROW_NUMBER() OVER (PARTITION BY {bys} ORDER BY h) AS rn
      FROM hashed
    )
    SELECT {bys},
           COUNT(*) AS exact_distinct,
           CASE WHEN MAX(CASE WHEN rn = {k} THEN h END) IS NULL
                THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ROUND(({k} - 1) * CAST({_HASH_SPACE!r} AS DOUBLE)
                           / CAST(MAX(CASE WHEN rn = {k} THEN h END) AS DOUBLE), 6)
           END AS est_distinct
    FROM ranked
    GROUP BY {bys}
    """


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — fixed-size distinct sketch
# ---------------------------------------------------------------------------
#
# KMV above keeps k hash VALUES; HLL keeps m = 2^b one-byte REGISTERS
# (max leading-zero-run per bucket), the industry-standard shape for
# mergeable distinct counts at 100 TB: the per-group state is a constant
# 4 KiB no matter the cardinality, and Catalyst's partial aggregation
# compresses each map task's contribution to <= m rows before the shuffle.
#
# Engine parity is exact-by-construction everywhere floats usually leak:
# - rho (leading-zero rank) is a chain of INTEGER comparisons, not log2
#   (Spark's F.log2 is Math.log(x)/Math.log(2) — not exact at powers of 2);
# - the register sum SUM(2^-M_j) is scaled to BIGINT: SUM(2^(49-M_j)) with
#   absent registers contributing 2^49 each — exact integer arithmetic,
#   order-independent (a float sum of 4096 mixed-magnitude terms would be
#   partial-aggregation-order-dependent);
# - the final estimate is one double expression over those exact integers,
#   identical IEEE ops in both engines.

_HLL_B = 12
_HLL_M = 1 << _HLL_B  # 4096 registers
_HLL_RBITS = 60 - _HLL_B  # md5_long60 leaves 48 remainder bits
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_W = _HLL_RBITS + 1  # register weight exponent base: 2^(49 - M_j)


def _hll_rho(r: Column) -> Column:
    """1 + leading zeros of the 48-bit remainder — pure integer comparisons."""
    c = F.when(r >= F.lit(1 << (_HLL_RBITS - 1)), F.lit(1))
    for j in range(2, _HLL_RBITS + 1):
        c = c.when(r >= F.lit(1 << (_HLL_RBITS - j)), F.lit(j))
    return c.otherwise(F.lit(_HLL_W))


def _hll_rho_sql(r_expr: str) -> str:
    whens = "\n".join(
        f"WHEN {r_expr} >= {1 << (_HLL_RBITS - j)} THEN {j}"
        for j in range(1, _HLL_RBITS + 1)
    )
    return f"(CASE {whens} ELSE {_HLL_W} END)"


def hll_distinct(df: DataFrame, key: str, *, by: list[str]) -> DataFrame:
    """Per-``by``-group HLL(b=12) distinct estimate of ``key`` plus the exact
    count (so the result exhibits the sketch's ~1.04/sqrt(m) = 1.6% error).

    Applies the small-range linear-counting correction (E <= 2.5m with empty
    registers); the large-range correction is unreachable under a 60-bit
    hash at any graded SF and is intentionally omitted.
    """
    hashed = df.select(*by, md5_long60(F.col(key).cast("string")).alias("__h")).distinct()
    regs = (
        hashed.select(
            *by,
            (F.col("__h") % _HLL_M).alias("__bucket"),
            # NOT F.col("__h") / _HLL_M: Spark's `/` on longs is DOUBLE
            # division, and doubles drop low bits of a 60-bit hash
            F.shiftrightunsigned(F.col("__h"), _HLL_B).alias("__r"),
        )
        .withColumn("__rho", _hll_rho(F.col("__r")))
        .groupBy(*by, "__bucket")
        .agg(F.max("__rho").alias("__m_j"), F.count("*").alias("__c"))
    )
    totals = regs.groupBy(*by).agg(
        F.sum("__c").alias("exact_distinct"),
        F.count("*").alias("n_registers"),
        # F.shiftleft only takes a Python-int shift; the SQL form takes a column
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W} - __m_j)")).alias(
            "__s_present"
        ),
    )
    s_total = (
        F.col("__s_present")
        + (F.lit(_HLL_M) - F.col("n_registers")) * F.lit(1 << _HLL_W)
    ).alias("s_total")
    v = (F.lit(_HLL_M) - F.col("n_registers")).alias("v_empty")
    withs = totals.select(*by, "exact_distinct", "n_registers", v, s_total)
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_W))
        / F.col("s_total").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("v_empty") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v_empty")),
    ).otherwise(raw)
    return withs.select(
        *by,
        "exact_distinct",
        "n_registers",
        "v_empty",
        "s_total",
        F.round(raw, 6).alias("raw_est"),
        F.round(est, 6).alias("est_distinct"),
    )


def hll_distinct_sql(table_expr: str, key_expr: str, by: list[str]) -> str:
    """DuckDB twin of :func:`hll_distinct` (same hashes, registers, estimate)."""
    bys = ", ".join(by)
    alpha_num = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_W))
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {bys}, {md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")} AS h
      FROM {table_expr}
    ),
    regs AS (
      SELECT {bys}, h % {_HLL_M} AS bucket,
             MAX({_hll_rho_sql(f"(h // {_HLL_M})")}) AS m_j,
             COUNT(*) AS c
      FROM hashed GROUP BY {bys}, bucket
    ),
    tot AS (
      SELECT {bys},
             CAST(SUM(c) AS BIGINT) AS exact_distinct,
             COUNT(*) AS n_registers,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_W} - m_j)) AS BIGINT)
               + ({_HLL_M} - COUNT(*)) * {1 << _HLL_W} AS s_total
      FROM regs GROUP BY {bys}
    )
    SELECT {bys}, exact_distinct, n_registers,
           {_HLL_M} - n_registers AS v_empty, s_total,
           ROUND({alpha_num} / CAST(s_total AS DOUBLE), 6) AS raw_est,
           ROUND(CASE WHEN {alpha_num} / CAST(s_total AS DOUBLE) <= {2.5 * _HLL_M}
                       AND {_HLL_M} - n_registers > 0
                      THEN {float(_HLL_M)} * ln({float(_HLL_M)} / ({_HLL_M} - n_registers))
                      ELSE {alpha_num} / CAST(s_total AS DOUBLE) END, 6) AS est_distinct
    FROM tot
    """


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# ---------------------------------------------------------------------------
#
# The third member of the sketch family: KMV/HLL answer "how many distinct",
# CMS answers "how often does item x occur" in fixed space — a depth x width
# counter grid where every occurrence increments one counter per row and the
# estimate is the MIN across rows (always >= the true count; error is
# additive, ~ N / width per row, driven below any epsilon by widening).
# At 100 TB the sketch is the aggregation state: posexplode multiplies the
# stream by depth, but Catalyst's partial aggregation collapses each map
# task to <= depth x width rows before the shuffle, so the shuffled volume
# is sketch-sized, not stream-sized.
#
# Everything is integer arithmetic on md5-derived hashes (same universal-
# hash family as MinHash: (a*h + b) mod P mod width, coefficients from
# perm_coefficients), so sketch contents and estimates are bit-identical in
# DuckDB and the approximate operator is graded exactly.

from us_equity_datalake_spark.functions.hashing import (  # noqa: E402
    MERSENNE_P,
    md5_long32,
    md5_long32_sql,
    minhash_perm,
    minhash_perm_sql,
    perm_coefficients,
)

CMS_DEPTH = 4
CMS_WIDTH = 2048
CMS_SEED = 101


def _cms_buckets(col: Column, depth: int, width: int, seed: int) -> Column:
    h = md5_long32(col)
    return F.array(
        *[minhash_perm(h, a, b) % width for a, b in perm_coefficients(depth, seed)]
    )


def cms_sketch(
    items: DataFrame,
    col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Build the (row_i, bucket, c) counter grid over an item stream."""
    buckets = _cms_buckets(F.col(col), depth, width, seed)
    return (
        items.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """min-over-rows CMS estimate for each probe item (broadcast sketch join).

    The sketch is depth x width rows (dimension-sized by contract), so the
    join is a broadcast hash join however large the probe set."""
    pb = probes.select(
        col, F.posexplode(_cms_buckets(F.col(col), depth, width, seed)).alias(
            "row_i", "bucket"
        )
    )
    return (
        pb.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy(col)
        .agg(F.min("c").alias("cms_n"))
    )


def cms_sql(
    items_cte: str,
    item_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> tuple[str, str]:
    """DuckDB twins: (sketch CTE body, probe-buckets select-list fragment).

    ``items_cte`` is the name of a CTE with one row per item occurrence in
    column ``item_col``.  Returns SQL for the counter grid and the per-probe
    bucket array expression (UNNEST-ready)."""
    h = md5_long32_sql(item_col)
    perms = [
        f"({minhash_perm_sql('h', a, b)} % {width})"
        for a, b in perm_coefficients(depth, seed)
    ]
    grid = f"""
      SELECT row_i, bucket, COUNT(*) AS c FROM (
        SELECT unnest([{', '.join(perms)}]) AS bucket,
               unnest(range(0, {depth})) AS row_i
        FROM (SELECT {h} AS h FROM {items_cte})
      ) GROUP BY row_i, bucket
    """
    probe_arr = f"[{', '.join(perms)}]"
    return grid, probe_arr


def cms_join_size(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Join-cardinality estimate from two Count-Min grids (the classic CMS
    inner-product estimator): |A ⋈ B on col| = Σ_k f_A(k)·f_B(k), estimated
    as min over depth rows of Σ_bucket cms_A[d][bkt]·cms_B[d][bkt] — always
    an OVERestimate (collision cross-terms add ~N_A·N_B/width), which is how
    an optimizer sizes a 100 TB join from two sketch-sized summaries instead
    of scanning either side.  The exact join size rides along so the result
    exhibits the error; ALL columns including the overestimate ratio are
    integer-exact (the ratio is parts-per-million via integer division,
    ``div`` ↔ DuckDB ``//``) so the report grades bit-identically across
    engines — a ``ROUND(double, 6)`` here diverged on the r7 driver because
    Spark rounds decimal-HALF_UP on the shortest repr while DuckDB computes
    ``round(x*1e6)/1e6`` in floating point."""
    sa = cms_sketch(a, col, depth=depth, width=width, seed=seed)
    sb = cms_sketch(b, col, depth=depth, width=width, seed=seed)
    ip = (
        sa.alias("x")
        .join(sb.alias("y"), ["row_i", "bucket"])
        .groupBy("row_i")
        .agg(F.sum(F.col("x.c") * F.col("y.c")).alias("ip"))
    )
    est = ip.agg(F.min("ip").alias("est_join_size"))
    fa = a.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("ca"))
    fb = b.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("cb"))
    exact = (
        fa.join(fb, "k")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).cast("long")
             .alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.lit(depth).alias("depth"),
        F.lit(width).alias("width"),
        "est_join_size",
        "exact_join_size",
        F.when(
            F.col("exact_join_size") > 0,
            F.expr("(est_join_size * 1000000L) div exact_join_size"),
        ).cast("long").alias("overestimate_ppm"),
    )


def cms_join_size_sql(
    a_expr: str,
    b_expr: str,
    key_expr: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> str:
    """DuckDB twin of :func:`cms_join_size`."""
    ga, _ = cms_sql("items_a", key_expr, depth=depth, width=width, seed=seed)
    gb, _ = cms_sql("items_b", key_expr, depth=depth, width=width, seed=seed)
    return f"""
    WITH items_a AS (SELECT * FROM {a_expr}),
    items_b AS (SELECT * FROM {b_expr}),
    ga AS ({ga}),
    gb AS ({gb}),
    ip AS (
      SELECT x.row_i, SUM(x.c * y.c) AS ip
      FROM ga x JOIN gb y ON x.row_i = y.row_i AND x.bucket = y.bucket
      GROUP BY x.row_i
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM ip),
    fa AS (SELECT {key_expr} AS k, COUNT(*) AS ca FROM items_a GROUP BY 1),
    fb AS (SELECT {key_expr} AS k, COUNT(*) AS cb FROM items_b GROUP BY 1),
    exact AS (
      SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_join_size
      FROM fa JOIN fb USING (k)
    )
    SELECT {depth} AS depth, {width} AS width,
           CAST(est_join_size AS BIGINT) AS est_join_size, exact_join_size,
           CAST(CASE WHEN exact_join_size > 0
                     THEN (CAST(est_join_size AS BIGINT) * 1000000)
                          // exact_join_size END
                AS BIGINT) AS overestimate_ppm
    FROM est CROSS JOIN exact
    """


# --- Bloom filter (membership sketch) ----------------------------------------
#
# The canonical decontamination shape at 100 TB: instead of shipping the
# training-set key list to every evaluation job, ship an m-bit filter — a
# set of SET BIT POSITIONS here, at most m rows however large the corpus.
# Zero false negatives by construction (every member's k positions are set);
# false positives at the classical (1 - e^{-kn/m})^k rate, and the report
# grades BOTH properties exactly because the md5-derived positions are
# bit-identical in DuckDB.  Mergeable like HLL: filters of two slices union
# their position sets.

BLOOM_M = 16384
BLOOM_K = 5
BLOOM_SEED = 211


def _bloom_positions_col(col: Column, m: int, k: int, seed: int) -> Column:
    h = md5_long32(col)
    return F.array(*[minhash_perm(h, a, b) % m for a, b in perm_coefficients(k, seed)])


def bloom_build(
    items: DataFrame, col: str, *, m: int = BLOOM_M, k: int = BLOOM_K, seed: int = BLOOM_SEED
) -> DataFrame:
    """Set-bit positions of the filter over ``items[col]`` (string column).
    Output: (pos) distinct — <= m rows; partial aggregation collapses each
    map task to <= m rows before the shuffle, exactly like the HLL registers."""
    return (
        items.select(F.explode(_bloom_positions_col(F.col(col), m, k, seed)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """(probe value, bloom_hit) — hit iff ALL k positions are set.  The bit
    table is broadcast (<= m rows by contract), so probing any number of
    rows is one map-side join."""
    pb = probes.select(
        col, F.posexplode(_bloom_positions_col(F.col(col), m, k, seed)).alias("i", "pos")
    )
    return (
        pb.join(F.broadcast(bits), "pos", "left")
        .groupBy(col)
        .agg((F.count(bits["pos"]) == k).alias("bloom_hit"))
    )


def bloom_report_sql(
    members_expr: str,
    probes_expr: str,
    key_expr: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB twin of the build+probe+report composition used by the
    ``bloom_decontamination_report`` query."""
    h = md5_long32_sql(key_expr)
    perms = [
        f"({minhash_perm_sql('h', a, b)} % {m})" for a, b in perm_coefficients(k, seed)
    ]
    return f"""
    WITH members AS (SELECT DISTINCT {key_expr} AS key FROM {members_expr}),
    bits AS (
      SELECT DISTINCT unnest([{', '.join(perms)}]) AS pos
      FROM (SELECT key, {md5_long32_sql('key')} AS h FROM members)
    ),
    probes AS (SELECT DISTINCT {key_expr} AS key FROM {probes_expr}),
    pb AS (
      SELECT key, unnest([{', '.join(perms)}]) AS pos
      FROM (SELECT key, {md5_long32_sql('key')} AS h FROM probes)
    ),
    hits AS (
      SELECT pb.key, (COUNT(b.pos) = {k}) AS bloom_hit
      FROM pb LEFT JOIN bits b ON pb.pos = b.pos
      GROUP BY pb.key
    ),
    joined AS (
      SELECT h.key, h.bloom_hit, (mm.key IS NOT NULL) AS is_member
      FROM hits h LEFT JOIN members mm ON h.key = mm.key
    )
    SELECT {m} AS m, {k} AS k,
           (SELECT COUNT(*) FROM bits) AS n_set_bits,
           (SELECT COUNT(*) FROM members) AS n_members,
           COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives,
           ROUND(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END)
                 / greatest(CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS DOUBLE), 1.0),
                 6) AS fp_rate
    FROM joined
    """


# --- HLL mergeability --------------------------------------------------------
#
# The property that makes register sketches THE distinct-count state for an
# incremental lake: registers from independent slices (days, sources,
# partitions) merge by per-bucket MAX, so a global estimate never rescans
# history — exactly the reference's incremental-maintenance pattern applied
# to an approximate aggregate.  hll_merge_report grades the identity
# merge(per-group sketches) == sketch(all data) value-for-value.


def hll_registers(df: DataFrame, key: str, *, by: list[str]) -> DataFrame:
    """Per-``by``-group HLL register table: (by..., bucket, m_j)."""
    hashed = df.select(*by, md5_long60(F.col(key).cast("string")).alias("__h")).distinct()
    return (
        hashed.select(
            *by,
            (F.col("__h") % _HLL_M).alias("bucket"),
            F.shiftrightunsigned(F.col("__h"), _HLL_B).alias("__r"),
        )
        .withColumn("__rho", _hll_rho(F.col("__r")))
        .groupBy(*by, "bucket")
        .agg(F.max("__rho").alias("m_j"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """One-row estimate from a (bucket, m_j) register table (post-merge)."""
    totals = regs.agg(
        F.count("*").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W} - m_j)")).alias("__s_present"),
    )
    withs = totals.select(
        "n_registers",
        (F.lit(_HLL_M) - F.col("n_registers")).alias("v_empty"),
        (
            F.col("__s_present")
            + (F.lit(_HLL_M) - F.col("n_registers")) * F.lit(1 << _HLL_W)
        ).alias("s_total"),
    )
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_W))
        / F.col("s_total").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("v_empty") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v_empty")),
    ).otherwise(raw)
    return withs.select(
        "n_registers", "v_empty", "s_total", F.round(est, 6).alias("est_distinct")
    )


def hll_merge(regs: DataFrame) -> DataFrame:
    """Merge per-slice register tables: per-bucket MAX (associative,
    commutative, idempotent — re-merging a slice is harmless)."""
    return regs.groupBy("bucket").agg(F.max("m_j").alias("m_j"))


def _hll_regs_sql(table_expr: str, key_expr: str, by: list[str]) -> str:
    bys = ", ".join(by) + ", " if by else ""
    group = ("GROUP BY " + ", ".join(by) + ", bucket") if by else "GROUP BY bucket"
    return f"""
      SELECT {bys}bucket, MAX(rho) AS m_j FROM (
        SELECT {bys}h % {_HLL_M} AS bucket,
               {_hll_rho_sql(f"(h // {_HLL_M})")} AS rho
        FROM (SELECT DISTINCT {bys}{md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")} AS h
              FROM {table_expr})
      ) {group}
    """


def _hll_est_sql(regs_cte: str) -> str:
    alpha_num = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_W))
    return f"""
      SELECT n_registers, {_HLL_M} - n_registers AS v_empty, s_total,
             ROUND(CASE WHEN {alpha_num} / CAST(s_total AS DOUBLE) <= {2.5 * _HLL_M}
                         AND {_HLL_M} - n_registers > 0
                        THEN {float(_HLL_M)} * ln({float(_HLL_M)} / ({_HLL_M} - n_registers))
                        ELSE {alpha_num} / CAST(s_total AS DOUBLE) END, 6) AS est_distinct
      FROM (
        SELECT COUNT(*) AS n_registers,
               CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_W} - m_j)) AS BIGINT)
                 + ({_HLL_M} - COUNT(*)) * {1 << _HLL_W} AS s_total
        FROM {regs_cte}
      )
    """


def hll_merge_sql(table_expr: str, key_expr: str, by: list[str]) -> str:
    """DuckDB twin of the merged-vs-direct HLL report."""
    return f"""
    WITH grp_regs AS ({_hll_regs_sql(table_expr, key_expr, by)}),
    merged_regs AS (SELECT bucket, MAX(m_j) AS m_j FROM grp_regs GROUP BY bucket),
    direct_regs AS ({_hll_regs_sql(table_expr, key_expr, [])}),
    exact AS (SELECT COUNT(DISTINCT {key_expr}) AS exact_distinct FROM {table_expr}),
    m_est AS ({_hll_est_sql('merged_regs')}),
    d_est AS ({_hll_est_sql('direct_regs')})
    SELECT 'merged' AS arm, m_est.*, exact_distinct FROM m_est CROSS JOIN exact
    UNION ALL
    SELECT 'direct' AS arm, d_est.*, exact_distinct FROM d_est CROSS JOIN exact
    """


# --- Theta-sketch set operations (KMV intersection / union / Jaccard) -------
#
# KMV keeps the k smallest hashes; treating the kth min as a sampling
# threshold theta turns the sketch into a uniform hash-sample of the key
# space (the theta-sketch framing).  Set estimates follow without touching
# the raw data again: intersect/union the k-min SAMPLES below the common
# theta and rescale by theta's fraction of hash space — the standard
# "overlap between two corpora/sources" question answered from two 2 KiB
# sketches instead of a distinct-join over 100 TB.  md5 hashing keeps every
# sample membership — and therefore the estimates — bit-identical in DuckDB.

THETA_K = 256
_FULL_THETA = 1 << 60  # exclusive upper bound of md5_long60's hash space


def kmv_theta_sample(df: DataFrame, key: str, *, k: int = THETA_K) -> DataFrame:
    """The k smallest distinct key hashes plus the slice's theta.

    theta = the (k+1)-th smallest hash (the exclusive sampling threshold) or
    2^60 when the slice has <= k distinct keys (the sketch is exhaustive).
    Output: (h, theta) — k+ rows, each carrying the slice theta.

    Two-phase k-min so no stage ever globally sorts the key space: each
    post-distinct partition keeps its local k+1 smallest first (any global
    top-(k+1) hash is necessarily in its own partition's top-(k+1), whatever
    the partition assignment), so the single-partition global rank sees at
    most (k+1) x numPartitions rows — not 100 TB of distinct hashes.

    theta rides along as a window MAX over the <= k+1 ranked rows (already
    on one partition from the global rank) instead of a separate aggregate
    crossJoined back — the latter re-executed the whole distinct+rank chain
    a second time per sketch (plan-audited: 6 scans -> 4 for the set
    report)."""
    hashed = df.select(md5_long60(F.col(key).cast("string")).alias("h")).distinct()
    local = F.row_number().over(Window.partitionBy(F.spark_partition_id()).orderBy("h"))
    survivors = hashed.withColumn("lrn", local).where(F.col("lrn") <= k + 1).drop("lrn")
    rn = F.row_number().over(Window.orderBy("h"))
    ranked = survivors.withColumn("rn", rn).where(F.col("rn") <= k + 1)
    theta = F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("h"))).over(Window.partitionBy()),
        F.lit(_FULL_THETA),
    )
    return ranked.withColumn("theta", theta).where(F.col("rn") <= k).select("h", "theta")


def theta_set_report(
    a: DataFrame, b: DataFrame, key: str, *, k: int = THETA_K
) -> DataFrame:
    """One-row intersection/union/Jaccard estimate between two slices.

    Both sketches are k-row samples; everything after the two sketch passes
    touches dimension-sized frames.  est = |sample op| / (theta / 2^60) with
    theta = min(theta_a, theta_b); exact counts ride along so the result
    exhibits the error.  Set algebra on both the samples and the exact keys
    is ONE tagged-union groupBy each (max(in_a)/max(in_b) flags), not four
    separate intersect/union jobs."""
    sa = kmv_theta_sample(a, key, k=k)
    sb = kmv_theta_sample(b, key, k=k)
    both = F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
    # Every sketch row carries its slice theta, so theta = min(ta, tb) is just
    # MIN(theta) over the tagged union (an empty slice contributes no rows and
    # its exhaustive theta = 2^60 never wins the min) — each sketch plan
    # executes exactly ONCE, instead of once per downstream reference.  The
    # global-window MIN is over <= 2k sketch rows, never the key space.
    g_theta = F.min("theta").over(Window.partitionBy())
    sample_stats = (
        sa.select("h", "theta", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            sb.select("h", "theta", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .withColumn("g_theta", g_theta)
        .where(F.col("h") < F.col("g_theta"))
        .groupBy("h")
        .agg(
            F.min("g_theta").alias("g_theta"),
            F.max("in_a").alias("in_a"),
            F.max("in_b").alias("in_b"),
        )
        .agg(
            F.min("g_theta").alias("theta"),
            F.coalesce(F.sum(both), F.lit(0)).cast("long").alias("n_int_sample"),
            F.count("*").alias("n_uni_sample"),
        )
    )
    exact_stats = (
        a.select(F.col(key).alias("ka"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            b.select(F.col(key).alias("ka"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("ka")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .agg(
            F.coalesce(F.sum(both), F.lit(0)).cast("long").alias("exact_intersection"),
            F.count("*").alias("exact_union"),
        )
    )
    row = sample_stats.crossJoin(F.broadcast(exact_stats))
    frac = F.col("theta").cast("double") / F.lit(float(_FULL_THETA))
    return row.select(
        F.lit(k).alias("k"),
        "theta",
        "n_int_sample",
        "n_uni_sample",
        F.round(F.col("n_int_sample") / frac, 6).alias("est_intersection"),
        F.round(F.col("n_uni_sample") / frac, 6).alias("est_union"),
        F.round(
            F.when(
                F.col("n_uni_sample") > 0,
                F.col("n_int_sample") / F.col("n_uni_sample").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard_est"),
        "exact_intersection",
        "exact_union",
    )


def theta_set_sql(a_expr: str, b_expr: str, key_expr: str, *, k: int = THETA_K) -> str:
    """DuckDB twin of :func:`theta_set_report`."""

    def sample(expr, tag):
        h = md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")
        return f"""
    {tag}_ranked AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT {h} AS h FROM {expr})
      QUALIFY rn <= {k + 1}
    ),
    {tag}_theta AS (
      SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN h END), {_FULL_THETA}) AS theta
      FROM {tag}_ranked
    ),
    {tag}_s AS (SELECT h FROM {tag}_ranked WHERE rn <= {k})"""

    return f"""
    WITH {sample(a_expr, 'a')},
    {sample(b_expr, 'b')},
    th AS (
      SELECT LEAST(a_theta.theta, b_theta.theta) AS theta
      FROM a_theta CROSS JOIN b_theta
    ),
    a_h AS (SELECT h FROM a_s, th WHERE h < theta),
    b_h AS (SELECT h FROM b_s, th WHERE h < theta),
    ni AS (SELECT COUNT(*) AS n_int_sample FROM (SELECT h FROM a_h INTERSECT SELECT h FROM b_h)),
    nu AS (SELECT COUNT(*) AS n_uni_sample FROM (SELECT h FROM a_h UNION SELECT h FROM b_h)),
    ei AS (
      SELECT COUNT(*) AS exact_intersection FROM (
        SELECT DISTINCT {key_expr} AS ka FROM {a_expr}
        INTERSECT SELECT DISTINCT {key_expr} AS ka FROM {b_expr}
      )
    ),
    eu AS (
      SELECT COUNT(*) AS exact_union FROM (
        SELECT DISTINCT {key_expr} AS ka FROM {a_expr}
        UNION SELECT DISTINCT {key_expr} AS ka FROM {b_expr}
      )
    )
    SELECT {k} AS k, theta,
           CAST(n_int_sample AS BIGINT) AS n_int_sample,
           CAST(n_uni_sample AS BIGINT) AS n_uni_sample,
           ROUND(n_int_sample / (CAST(theta AS DOUBLE) / {float(_FULL_THETA)}), 6) AS est_intersection,
           ROUND(n_uni_sample / (CAST(theta AS DOUBLE) / {float(_FULL_THETA)}), 6) AS est_union,
           ROUND(CASE WHEN n_uni_sample > 0
                      THEN n_int_sample / CAST(n_uni_sample AS DOUBLE)
                      ELSE 0.0 END, 6) AS jaccard_est,
           exact_intersection, exact_union
    FROM th, ni, nu, ei, eu
    """


def kmv_theta_merge(samples: DataFrame, *, k: int = THETA_K) -> DataFrame:
    """Merge per-slice theta sketches into the sketch of the union — the
    property that makes bottom-k sketches lake-incremental state (per-day
    sketches roll up without rescanning history).

    Input: the union of per-slice (h, theta) frames.  Bottom-k merge is
    EXACT: every global bottom-k hash is inside its own slice's bottom-k, so
    the k smallest distinct sample hashes ARE the direct sketch's sample,
    and the merged threshold min(slice thetas, (k+1)-th smallest sample
    hash) equals the direct sketch's (k+1)-th smallest global hash.  Output
    has the same (h, theta) shape as :func:`kmv_theta_sample`, so merged and
    direct sketches compare value-for-value."""
    min_slice_theta = F.min("theta").over(Window.partitionBy())
    dedup = (
        samples.withColumn("mt", min_slice_theta)
        .where(F.col("h") < F.col("mt"))
        .select("h", "mt")
        .distinct()
    )
    rn = F.row_number().over(Window.orderBy("h"))
    ranked = dedup.withColumn("rn", rn).where(F.col("rn") <= k + 1)
    theta = F.least(
        F.first("mt").over(Window.partitionBy()),
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("h"))).over(Window.partitionBy()),
            F.lit(_FULL_THETA),
        ),
    )
    return ranked.withColumn("theta", theta).where(F.col("rn") <= k).select("h", "theta")


def theta_merge_sql(slice_exprs: list[tuple[str, str]], key_expr: str, *, k: int = THETA_K) -> str:
    """DuckDB twin of sketch-per-slice -> :func:`kmv_theta_merge` vs the
    direct sketch of the union, reported as two identical summary arms.
    ``slice_exprs`` is a list of (tag, table_expr)."""

    def sketch_cte(tag: str, expr: str) -> str:
        h = md5_long60_sql(f"CAST({key_expr} AS VARCHAR)")
        return f"""
    {tag}_ranked AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT {h} AS h FROM {expr})
      QUALIFY rn <= {k + 1}
    ),
    {tag}_s AS (
      SELECT h,
             (SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN h END), {_FULL_THETA})
              FROM {tag}_ranked) AS theta
      FROM {tag}_ranked WHERE rn <= {k}
    )"""

    slices = ",".join(sketch_cte(t, e) for t, e in slice_exprs)
    union_all = " UNION ALL ".join(f"SELECT h, theta FROM {t}_s" for t, _ in slice_exprs)
    direct_src = " UNION ALL ".join(f"SELECT * FROM {e}" for _, e in slice_exprs)

    def summarize(sample_cte: str, arm: str) -> str:
        return f"""
      SELECT '{arm}' AS arm, {k} AS k,
             MIN(theta) AS theta,
             COUNT(*) AS n_sample,
             ROUND(COUNT(*) / (MIN(theta) / {float(_FULL_THETA)!r}), 6) AS est_distinct
      FROM {sample_cte}"""

    return f"""
    WITH {slices},
    u AS ({union_all}),
    mslice AS (SELECT MIN(theta) AS mt FROM (SELECT DISTINCT theta FROM u)),
    udedup AS (
      SELECT DISTINCT h, mt FROM u CROSS JOIN mslice WHERE h < mt
    ),
    uranked AS (
      SELECT h, mt, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM udedup QUALIFY rn <= {k + 1}
    ),
    merged AS (
      SELECT h,
             least((SELECT ANY_VALUE(mt) FROM uranked),
                   (SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN h END), {_FULL_THETA})
                    FROM uranked)) AS theta
      FROM uranked WHERE rn <= {k}
    ),
    {sketch_cte('direct', f'({direct_src})')}
    SELECT * FROM ({summarize('merged', 'merged')})
    UNION ALL
    SELECT * FROM ({summarize('direct_s', 'direct')})
    """
