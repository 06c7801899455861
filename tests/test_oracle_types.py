"""Oracle output-type guard.

The driver canonicalizes oracle results through pandas/Arrow before hashing.
DuckDB types with no faithful int64/float64 representation diverge there even
when the values are numerically identical to Spark's output:

- HUGEINT / UHUGEINT (e.g. any bare ``SUM(BIGINT)``) → float64 under pandas,
  ``Decimal`` under Arrow — the exact rows-match/schema-match/hash-mismatch
  signature that kept ``cms_join_size_report`` red for three rounds.
- DECIMAL → ``Decimal`` objects, stringifying with a scale suffix.
- unsigned ints → uint64 in pandas, overflowing the int64 comparison lane.

This test DESCRIBEs every registered oracle against the sf0.001 views and
bans those types in the *output* schema, so the class of bug can never
reappear with a future uncast aggregate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Type names (substring match, upper-cased) that the driver's pandas/Arrow
# canonicalization cannot round-trip against Spark's int64/float64 output.
BANNED = ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_driver_ambiguous_types(con):
    oracles = entrymod.oracle_sql()
    assert len(oracles) >= 195
    offenders: list[str] = []
    for name, sql in oracles.items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            t = typ.upper()
            if any(b in t for b in BANNED):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle output columns with pandas/Arrow-ambiguous DuckDB types "
        f"(cast them to BIGINT/DOUBLE in the outer SELECT): {offenders}"
    )


def test_cms_join_size_est_is_bigint(con):
    """Regression pin for the 3-round driver hash mismatch: est_join_size
    came from MIN(SUM(BIGINT*BIGINT)) and was HUGEINT until round 10."""
    sql = entrymod.oracle_sql()["cms_join_size_report"]
    types = {c: t for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall()}
    assert types["est_join_size"].upper() == "BIGINT", types
