"""Fundamental-datapoint normalization (SURVEY.md §2.11 F1–F3, A7/A8).

Reference semantics (collection/fundamental.py):
- F1 multi-tag merge: candidate XBRL tags per concept are unioned, then
  deduped by (accn, frame, filed)  (fundamental.py:108-118).
- A7 latest-filed-wins: keep the datapoint with max ``filed`` per frame
  (fundamental.py:240-244).
- F2 Q4 derivation (fundamental.py:193-287): within a frame-year, quarterly
  frames pass through; an annual frame with Q1–Q3 present derives
  Q4 = FY − Q1 − Q2 − Q3 with start = Q3.end + 1 day.  Frame matching uses
  the ``_pick_frame`` fallback: exact ``CYyyyyQn`` → ``CYyyyyQnI`` → any
  prefix match; we implement exact + instant which covers the stored frames.
- F3 point-in-time columns (fundamental.py:354-382): ``as_of_date`` = filed
  (reveal) date — never period end — to avoid look-ahead bias; ``is_instant``
  iff frame contains ``I``.

All set-based: conditional aggregation per (concept, frame_year) replaces the
reference's per-year Python dict passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from us_equity_datalake_spark.operators.dedup import dedup_keep_first, latest_wins


def merge_tags(raw: DataFrame) -> DataFrame:
    """F1+A8: union of per-tag datapoint rows deduped by (accn, frame, filed).

    ``raw`` columns: symbol, concept, tag, value, accn, form, filed(date),
    start(date), end(date), frame.  Deterministic keep: lowest tag priority
    first (the caller orders candidate tags), then tag name.
    """
    return dedup_keep_first(
        raw,
        keys=["symbol", "concept", "accn", "frame", "filed"],
        order=[F.col("tag_priority").asc(), F.col("tag").asc()],
    ).drop("tag", "tag_priority")


def latest_filed_per_frame(dp: DataFrame) -> DataFrame:
    """A7: one datapoint per (symbol, concept, frame): max filed wins."""
    return latest_wins(dp, keys=["symbol", "concept", "frame"], recency="filed", tiebreak=["accn"])


def derive_q4(dp: DataFrame) -> DataFrame:
    """F2: add derived-Q4 rows for duration concepts.

    Input must already be latest-filed-per-frame.  Output = quarterly rows
    passed through + derived Q4 rows (annual frame with Q1–Q3 standalone
    present), deduped by (symbol, concept, filed, frame) keeping the derived
    row's adjusted values.
    """
    # Instant datapoints (null start, I-suffixed frame) never enter duration
    # normalization in the reference (fundamental.py:349-350: the whole pass
    # is gated on normalize_duration, a per-concept flag) — they bypass
    # untouched.  DURATION rows lacking start/end/filed/frame are dropped at
    # entry exactly as the reference does (:212-217 ``continue``).
    bypass_cond = F.col("start").isNull() & F.coalesce(
        F.col("frame").contains("I"), F.lit(False)
    )
    instant_bypass = dp.filter(bypass_cond)
    dp = dp.filter(~F.coalesce(bypass_cond, F.lit(False))).filter(
        F.col("start").isNotNull()
        & F.col("end").isNotNull()
        & F.col("filed").isNotNull()
        & F.col("frame").isNotNull()
    )
    base = dp.withColumn("frame_year", F.regexp_extract("frame", r"^CY(\d{4})", 1).cast("int")).withColumn(
        "frame_q", F.regexp_extract("frame", r"Q([1-4])", 1)
    )
    quarterly = base.filter(F.col("frame_q") != "").drop("frame_year", "frame_q")

    annual = base.filter((F.col("frame_q") == "") & F.col("frame_year").isNotNull())
    qpiv = (
        base.filter(F.col("frame_q").isin("1", "2", "3"))
        .groupBy("symbol", "concept", "frame_year")
        .agg(
            # _pick_frame exact-first fallback: min over (instant_flag, value)
            # structs prefers the non-instant frame when both exist
            F.min(F.when(F.col("frame_q") == "1", F.struct(F.col("frame").contains("I").cast("int").alias("inst"), F.col("value")))).alias("q1s"),
            F.min(F.when(F.col("frame_q") == "2", F.struct(F.col("frame").contains("I").cast("int").alias("inst"), F.col("value")))).alias("q2s"),
            # Q3's end rides in the same struct so the derived start comes
            # from the SAME frame _pick_frame chose (fundamental.py:273:
            # q3["end_date"] of the picked item, instant variant included)
            F.min(F.when(F.col("frame_q") == "3", F.struct(F.col("frame").contains("I").cast("int").alias("inst"), F.col("value"), F.col("end")))).alias("q3s"),
        )
    )
    derived = (
        annual.join(qpiv, ["symbol", "concept", "frame_year"], "inner")
        .filter(F.col("q1s").isNotNull() & F.col("q2s").isNotNull() & F.col("q3s").isNotNull())
        .withColumn("value", F.col("value") - F.col("q1s.value") - F.col("q2s.value") - F.col("q3s.value"))
        .withColumn("start", F.date_add(F.col("q3s.end"), 1))
        .drop("q1s", "q2s", "q3s", "frame_year", "frame_q")
    )
    out = quarterly.unionByName(derived).unionByName(instant_bypass)
    # final (filed, frame) dedup (fundamental.py:278-287)
    return dedup_keep_first(
        out, keys=["symbol", "concept", "filed", "frame"], order=[F.col("accn").asc()]
    )


def add_pit_columns(dp: DataFrame) -> DataFrame:
    """F3: as_of_date = filed date (PIT reveal), is_instant from frame."""
    return dp.withColumn("as_of_date", F.col("filed")).withColumn(
        "is_instant", F.col("frame").contains("I")
    )


def normalize_fundamental(raw: DataFrame) -> DataFrame:
    """Full F1→A8→A7→F2→F3 pipeline: raw tagged datapoints -> fundamental_long."""
    merged = merge_tags(raw)
    latest = latest_filed_per_frame(merged)
    with_q4 = derive_q4(latest)
    return add_pit_columns(with_q4).select(
        "symbol", "as_of_date", "accn", "form", "concept", "value", "start", "end", "frame", "is_instant"
    )
