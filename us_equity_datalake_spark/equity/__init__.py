"""Equity-lake domain pipelines: the reference system's derived-data
semantics (security master, fundamentals normalization, TTM, ratio metrics,
universe selection, sentiment aggregation) re-expressed as Spark DataFrame
transformations over the long/EAV lake tables (SURVEY.md §2.11, §2.4, §2.5).
"""

from . import fundamentals, metrics, security_master, sentiment, ttm, universe  # noqa: F401
