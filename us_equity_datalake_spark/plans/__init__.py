"""Named query definitions: each entry pairs a Spark DataFrame callable with
the equivalent DuckDB oracle SQL (driver contract in __spark_entry__.py).

Submodules register into ``REGISTRY`` at import time.
"""

from __future__ import annotations

from .base import REGISTRY, QuerySpec, register  # noqa: F401

from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import reference_ops  # noqa: E402,F401
from . import reference_ops2  # noqa: E402,F401
from . import equity  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import lakeops  # noqa: E402,F401
from . import lifecycle  # noqa: E402,F401
from . import search  # noqa: E402,F401


def all_queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
