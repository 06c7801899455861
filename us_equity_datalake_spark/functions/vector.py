"""Vector (embedding) column functions over ``array<float>`` columns.

All JVM-side via higher-order functions (``zip_with``/``aggregate``) — no
Python in the hot path.  Inputs are float32; arithmetic is carried out in
double (exact products for 24-bit mantissas; rounded results are presented at
fixed precision so they hash-match the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either norm is zero."""
    return cosine_from(dot(a, b), norm(a), norm(b))


def cosine_from(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot product and per-side norms.

    Bit-identical to :func:`cosine` (same double ops in the same order), but
    lets join-heavy operators compute each vector's norm ONCE per row instead
    of once per candidate pair — the O(dim) fold moves out of the join."""
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin — explicit, order-preserving fold like Spark ``aggregate``."""
    d = f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"(CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) ELSE NULL END)"


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (Charikar): deterministic planes via the same LCG
# discipline as hashing.perm_coefficients, so oracle SQL can inline the exact
# constants and both engines compute bit-identical signs.
# ---------------------------------------------------------------------------


def hyperplanes(n_planes: int, dim: int, seed: int = 11) -> list[list[float]]:
    """n_planes × dim components in [-1, 1), LCG-derived (no RNG library)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        comps = []
        for _ in range(dim):
            state = (state * 1_103_515_245 + 12_345) % 2_147_483_647
            comps.append((state % 2001 - 1000) / 1000.0)
        planes.append(comps)
    return planes


def dot_const(vec: Column, consts: list[float]) -> Column:
    """Left-to-right fold of vec · constant-vector (oracle twin:
    ``list_sum(list_transform(list_zip(v, [c...]), p -> ...))``)."""
    carr = F.array(*[F.lit(c) for c in consts])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit j set iff vec · plane_j > 0."""
    bucket = F.lit(0).cast("long")
    for j, comps in enumerate(planes):
        bucket = bucket + F.when(dot_const(vec, comps) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB twin of :func:`lsh_bucket` with the constants inlined."""
    arms = []
    for j, comps in enumerate(planes):
        lst = "[" + ", ".join(repr(c) for c in comps) + "]"
        d = f"list_sum(list_transform(list_zip({vec_expr}, {lst}), p -> CAST(p[1] AS DOUBLE) * p[2]))"
        arms.append(f"(CASE WHEN {d} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return "(" + " + ".join(arms) + ")"


# ---------------------------------------------------------------------------
# 1-bit (sign) quantization: pack each 32-dim slice's signs into a BIGINT.
# 16 bytes per 64-dim vector instead of 256 — the billion-vector memory
# trick; Hamming distance on the packed words (xor + popcount) is the
# SIMD-cheap pre-rank, full-precision cosine rescores the survivors.
# Integer-exact packing, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------


def sign_bits(vec_expr: str, lo_bit: int, n_bits: int = 32) -> Column:
    """Pack sign bits [lo_bit, lo_bit + n_bits) of an array column into a
    long: bit i set when ``vec[lo_bit + i] > 0`` (zero packs as 0)."""
    return F.expr(
        f"aggregate(sequence(0, {n_bits - 1}), 0L, (acc, i) -> acc + "
        f"CASE WHEN CAST(element_at({vec_expr}, i + {lo_bit} + 1) AS DOUBLE) > 0 "
        f"THEN shiftleft(1L, i) ELSE 0L END)"
    )


def sign_bits_sql(vec_expr: str, lo_bit: int, n_bits: int = 32) -> str:
    """DuckDB twin of :func:`sign_bits` (same integer sum of powers)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(0, {n_bits - 1}), "
        f"i -> CASE WHEN CAST({vec_expr}[i + {lo_bit} + 1] AS DOUBLE) > 0 "
        f"THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )
