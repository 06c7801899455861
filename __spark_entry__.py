"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps every
implemented operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives
the DuckDB-equivalent SQL per query.  Definitions live in
``us_equity_datalake_spark.plans``; this module just re-exports them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_equity_datalake_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the composed derived-metrics pipeline (EAV long → pivot →
    as-of join → lag-window safe-arithmetic metrics → melt) on sf0.001 — the
    reference's signature derived path end to end."""
    return plans.REGISTRY["derived_metrics_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    return plans.all_oracles()
