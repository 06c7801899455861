"""Calendar alignment (J4): trading-calendar LEFT JOIN facts so non-traded
days come back as null rows — never interpolated (reference
utils/mapping.py:24-88; CLAUDE.md:271-273 "trading-halt days left null").

The calendar is a tiny dimension (~5k rows for 20 years) — always broadcast.
``date_spine`` builds a continuous spine when no external calendar exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def date_spine(spark, start: Column | str, end: Column | str, step_days: int = 1) -> DataFrame:
    """One row per date in [start, end] — F.sequence + explode, no driver loop."""
    df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start) if isinstance(start, str) else start),
                F.to_date(F.lit(end) if isinstance(end, str) else end),
                F.expr(f"interval {step_days} days"),
            )
        ).alias("date")
    )
    return df


def align_to_calendar(
    calendar: DataFrame,
    facts: DataFrame,
    *,
    cal_date: str = "date",
    fact_date: str = "date",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """LEFT join facts onto the calendar; one output row per calendar row (per
    extra key).  When ``extra_keys`` is given, the spine is the cross product
    calendar × distinct(extra_keys) so every entity gets every calendar slot.
    """
    cal = calendar.withColumnRenamed(cal_date, fact_date) if cal_date != fact_date else calendar
    if extra_keys:
        entities = facts.select(*extra_keys).distinct()
        spine = cal.crossJoin(entities)
        return spine.join(facts, on=[fact_date, *extra_keys], how="left")
    return F.broadcast(cal).join(facts, on=fact_date, how="left")
