"""The rest of the TPC-H pattern family, adapted to the driver's schema.

The synthetic star schema has no ``partsupp`` table and ``lineitem`` lacks
commitdate/receiptdate/shipmode, so the queries that reference them are
re-parameterized on available columns *while keeping the canonical plan
shape* — correlated scalar subqueries (Q2/Q15/Q17), EXISTS/NOT-EXISTS
semi/anti joins (Q4/Q21/Q22), global-aggregate HAVING (Q11), two-level
aggregation (Q13), NOT-IN exclusion (Q16), nested semi-joins (Q20), and
conditional-share ratios (Q7/Q8/Q9).  Each docstring notes the adaptation.

Spark-first rewrites used throughout (the reference engine has no subquery
machinery either — SURVEY.md §4):

- correlated scalar subquery  -> groupBy on the correlation key + join back
  (Q2 uses a window-min over the already-filtered candidate set instead: one
  shuffle, no self-join);
- EXISTS / NOT EXISTS         -> left_semi / aggregation rewrite (Q21 folds
  the double EXISTS into one per-order aggregate: suppliers-per-order and
  late-suppliers-per-order counts replace two correlated scans);
- global scalar aggregate     -> 1-row DataFrame crossJoin(broadcast(...)),
  never a driver-side collect.

All sums go through ``dec_sum`` (exact decimal, order-independent) and all
ratios through ``round(x, 6)`` for cross-engine hash equality.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from us_equity_datalake_spark.functions.safe_math import dec_sum, dec_sum_sql
from us_equity_datalake_spark.sources.registry import load_table
from .base import register

_D = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))"


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, s_acctbal, s_name, n_name
      FROM part, ps, supplier, nation, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE' AND p_size = 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey
    FROM cand c
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (no partsupp: part-supplier pairs derived from "
    "lineitem, min s_acctbal stands in for min ps_supplycost). Correlated "
    "scalar-min subquery decorrelated as a window-min over the filtered "
    "candidate set — part filter is broadcast into the pair scan first, so "
    "the distinct and the window see only matching parts.",
)
def q2(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_size") == 15).select("p_partkey")
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    pairs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("p_partkey", "l_suppkey")
        .distinct()
    )
    cand = pairs.join(eu_supp, pairs.l_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (late-commit EXISTS re-expressed as ship-lag > 60 "
    "days — lineitem has no commit/receipt dates). EXISTS -> left_semi join "
    "with a non-equi residual on top of the orderkey equi key.",
)
def q4(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           CAST(SUM({_D}) AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: bilateral trade volume. Suppliers and customers are "
    "pre-filtered to the two nations *before* the fact join, so the "
    "orderkey shuffle moves only matching rows; the disjunctive pair "
    "predicate runs on the narrowed join output.",
)
def q7(spark, sf_dir):
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin(*nations))
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    orders = load_table(spark, "orders", sf_dir)
    pair_ok = (
        ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
        | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dec_sum(_disc_price()).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT YEAR(o_orderdate) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                           THEN {_D} ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM({_D}) AS DOUBLE), 6) AS mkt_share
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
      AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
    doc="TPC-H Q8: one nation's share of regional volume per year — the "
    "numerator is a conditional decimal sum over the same rows as the "
    "denominator, so one grouped aggregate computes both (no second pass).",
)
def q8(spark, sf_dir):
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    li = load_table(spark, "lineitem", sf_dir)
    vol = _disc_price().cast("decimal(30,6)")
    cond_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(30,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(cond_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity
                    AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (no partsupp: unit cost proxied as 10% of "
    "p_retailprice instead of ps_supplycost). Profit per supplier-nation "
    "per order-year over name-matched parts; part/supplier/nation broadcast, "
    "single fact-fact shuffle on orderkey.",
)
def q9(spark, sf_dir):
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(load_table(spark, "nation", sf_dir)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1).cast("double") * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dec_sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    SELECT l_partkey, {dec_sum_sql('l_extendedprice')} AS value
    FROM lineitem, supplier
    WHERE l_suppkey = s_suppkey AND s_nationkey = 7
    GROUP BY l_partkey
    HAVING {dec_sum_sql('l_extendedprice')} > CAST(0.001 AS DOUBLE) * (
      SELECT {dec_sum_sql('l_extendedprice')}
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND s_nationkey = 7
    )
    """,
    doc="TPC-H Q11 shape (no partsupp: per-part shipped value for one "
    "nation's suppliers stands in for stock value). Global scalar subquery "
    "-> 1-row aggregate crossJoin(broadcast) against the grouped result; "
    "both sides sum as exact decimal so the HAVING boundary is "
    "engine-independent.",
)
def q11(spark, sf_dir):
    supp = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_nationkey") == 7)
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    joined = li.join(supp, li.l_suppkey == supp.s_suppkey)
    grouped = joined.groupBy("l_partkey").agg(dec_sum(F.col("l_extendedprice")).alias("value"))
    total = joined.agg(dec_sum(F.col("l_extendedprice")).alias("total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.001).cast("double") * F.col("total"))
        .select("l_partkey", "value")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (orders has no o_comment: the NOT-LIKE comment "
    "exclusion becomes a priority exclusion in the join condition). "
    "Left-outer join keeps zero-order customers; two-level aggregation — "
    "per-customer order count, then the distribution of counts.",
)
def q13(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_D}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) with the maximum quarterly revenue. The "
    "scalar MAX subquery is a 1-row aggregate crossJoin(broadcast) over the "
    "grouped revenue view (computed once, reused for both sides); equality "
    "on exact-decimal-derived doubles is deterministic.",
)
def q15(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(dec_sum(_disc_price()).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#3' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (part-supplier pairs from lineitem; the complaint-"
    "supplier NOT IN becomes a negative-balance exclusion). NOT IN over a "
    "non-null key -> broadcast left_anti join; distinct-supplier counts per "
    "(brand, type, size). Part filter broadcast into the pair scan before "
    "the distinct.",
)
def q16(spark, sf_dir):
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(7.0 AS DOUBLE), 6) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT CAST(0.2 AS DOUBLE) * AVG(l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 (p_container filter dropped — column absent; brand-only "
    "selection). Correlated per-part AVG decorrelated as a groupBy over the "
    "brand-matched lineitems + broadcast join back; quantities are integer-"
    "valued doubles so the average is exact in both engines.",
)
def q17(spark, sf_dir):
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_quantity", "l_extendedprice")
    matched = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_partkey", "l_quantity", "l_extendedprice"
    )
    limits = matched.groupBy("p_partkey").agg(
        (F.lit(0.2).cast("double") * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        matched.join(limits.withColumnRenamed("p_partkey", "lim_partkey"),
                     F.col("p_partkey") == F.col("lim_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / F.lit(7.0).cast("double"),
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_excess_shipments",
    oracle="""
    WITH y AS (
      SELECT l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1997,
             SUM(l_quantity) AS qty_all
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s_name
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_4'
      AND s_suppkey IN (SELECT l_suppkey FROM y
                        WHERE qty_1997 > CAST(0.5 AS DOUBLE) * qty_all)
    """,
    doc="TPC-H Q20 shape (no ps_availqty: 'excess' = a supplier shipped more "
    "than half a part's all-time quantity in one year). Nested semi-joins: "
    "name-filtered parts broadcast into lineitem, conditional/total sums in "
    "one grouped pass, then supplier left_semi against the qualifying keys.",
)
def q20(spark, sf_dir):
    target = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir)
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    y = (
        li.join(target, li.l_partkey == target.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_1997"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(F.col("qty_1997") > F.lit(0.5).cast("double") * F.col("qty_all"))
        .select("l_suppkey")
    )
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_4")
    supp = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(y, supp.s_suppkey == y.l_suppkey, "left_semi").select("s_name").distinct()


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_6'
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (lateness = shipped >90 days after order date — no "
    "receipt/commit dates). The EXISTS + NOT-EXISTS pair is folded into ONE "
    "per-order aggregate: suppliers-on-order >= 2 and exactly one late "
    "supplier identifies the sole laggard without two correlated rescans of "
    "lineitem; count distinct waiting orders per supplier.",
)
def q21(spark, sf_dir):
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    per_order = (
        lo.groupBy("o_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_6")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.join(supp, per_order.late_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("o_orderkey").alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    SELECT n_name, COUNT(*) AS numcust, {dec_sum_sql('c_acctbal')} AS totacctbal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape (phone-prefix cohort -> nationkey cohort; 'no "
    "orders' -> 'no orders since 2000', every sf0.01 customer has some "
    "order). Scalar AVG via exact decimal sum / count (deterministic "
    "boundary), NOT EXISTS -> left_anti join on recent orders, broadcast "
    "1-row threshold crossJoin.",
)
def q22(spark, sf_dir):
    cohort = [10, 11, 12, 13, 14, 15, 16]
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_nationkey").isin(cohort))
    threshold = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    recent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"), dec_sum(F.col("c_acctbal")).alias("totacctbal"))
    )
