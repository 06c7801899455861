"""Query registry plumbing + oracle-comparability helpers.

Comparability rules (the driver hashes values order-insensitively, so numeric
results must be bit-identical across engines):

- Sums over doubles are computed as DECIMAL(30,4) (exact, order-independent)
  and cast back to double — identical in Spark and DuckDB.
- Ratios/averages are ``round(x, 6)`` on deterministically-derived doubles.
- Timestamps are output as epoch seconds (bigint) or ISO strings, dates as
  DateType — avoiding µs/ns representation skew.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
