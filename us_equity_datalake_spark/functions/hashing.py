"""Deterministic, engine-portable hashing.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so every operator whose output must hash-match the DuckDB oracle
(exact dedup, MinHash, SimHash, fingerprinting) builds on **md5**, which both
engines implement identically.  Each helper has a Spark Column form and a SQL
template form (``*_SQL``) that produces the bit-identical value in DuckDB.

md5 is computed JVM-side (codegen'd) in Spark — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Mersenne prime 2^31-1: universal-hash modulus. With 32-bit base hashes and
# multipliers < P, a*h+b stays below 2^63 — no 64-bit overflow in either engine.
MERSENNE_P = 2_147_483_647


def md5_long60(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative int64 in [0, 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_long32(col: Column) -> Column:
    """First 8 hex chars of md5 as an int64 in [0, 2^32) — safe for (a*h+b) % p."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_long32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation (a*h + b) mod P over a 32-bit base hash."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr} * {a} + {b}) % {MERSENNE_P})"


def perm_coefficients(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k permutations, identical across engines.

    A tiny LCG keeps this free of any RNG-library dependence so the same
    coefficients can be inlined into oracle SQL.
    """
    coeffs = []
    state = seed
    for _ in range(k):
        state = (state * 1_103_515_245 + 12_345) % MERSENNE_P
        a = state % (MERSENNE_P - 1) + 1
        state = (state * 1_103_515_245 + 12_345) % MERSENNE_P
        b = state % MERSENNE_P
        coeffs.append((a, b))
    return coeffs
