"""Core OLAP queries (TPC-H-shaped) over the synthetic star schema — exercise
scan+filter pushdown, multi-way joins with broadcast dims, grouped aggregation,
and top-k (SURVEY.md §2.1/2.2/2.3/2.4/2.6).

All money aggregates are decimal-summed then cast to double (see plans.base).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.sources.registry import load_table, parallelize_small_input
from .base import register

_D = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))"


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql('l_quantity')} AS sum_qty,
           {dec_sum_sql('l_extendedprice')} AS sum_base_price,
           CAST(SUM({_D}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           ROUND({dec_sum_sql('l_quantity')} / COUNT(*), 6) AS avg_qty,
           ROUND({dec_sum_sql('l_discount')} / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: 2-key groupBy, 8 aggregates, filter pushed to scan.",
)
def q1(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # the six DECIMAL(30,6) sums are the cost (~10x double arithmetic) and a
    # single-row-group input is ONE split — spread before the agg so the
    # decimal work parallelizes; no-op at production split counts
    return (
        parallelize_small_input(
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")), None
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            F.round(dec_sum(F.col("l_quantity")) / F.count("*"), 6).alias("avg_qty"),
            F.round(dec_sum(F.col("l_discount")) / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_D}) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3: fact-fact join + broadcast dim filter + grouped agg + top-k.",
)
def q3(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(disc_price).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_D}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way join; dims broadcast, facts shuffle once on orderkey.",
)
def q5(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(disc_price).alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan+filter aggregate — predicate pushdown showcase.",
)
def q6(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, n_name,
           CAST(SUM({_D}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY c_custkey, c_name, ROUND(c_acctbal, 2), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: 4-way join (two broadcast dims), filtered fact scan, "
    "grouped revenue, top-20 (TakeOrderedAndProject).",
)
def q10(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_by_month",
    oracle="""
    SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1996
    GROUP BY month(l_shipdate)
    """,
    doc="TPC-H Q12 shape (priority classification via conditional aggregation "
    "over a fact-fact join; shipmode column absent in the synthetic schema, "
    "bucketed by ship month instead).",
)
def q12(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(F.year("l_shipdate") == 1996)
    orders = load_table(spark, "orders", sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN starts_with(p_type, 'PROMO') THEN {_D} ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
                 / CAST(SUM({_D}) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 9
    """,
    doc="TPC-H Q14: promo revenue ratio — broadcast part dim, conditional "
    "decimal-sum ratio, single-row result.",
)
def q14(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.year("l_shipdate") == 1995) & (F.month("l_shipdate") == 9)
    )
    part = load_table(spark, "part", sf_dir)
    d = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    promo = F.when(F.col("p_type").startswith("PROMO"), d).otherwise(F.lit(0).cast("decimal(30,6)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(d).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
           ROUND(o_totalprice, 2) AS totalprice, {dec_sum_sql('l_quantity')} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), ROUND(o_totalprice, 2)
    """,
    doc="TPC-H Q18: HAVING-filtered aggregate as a semi-join back into the "
    "fact (left_semi against the big-order keys), then re-aggregate.",
)
def q18(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 150).select("l_orderkey")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(dec_sum(F.col("l_quantity")).alias("total_qty"))
    )


@register(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_D}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: OR-of-ANDs selection across the join — Catalyst extracts "
    "the common l_quantity/p_size bounds for pushdown, the residual "
    "disjunction evaluates post-join.",
)
def q19(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    d = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return j.filter(cond).agg(F.sum(d).cast("double").alias("revenue"))
