"""Remaining TPC-H query shapes (Q6-Q21), adapted to the harness schema.

The base registry (queries.py) already instantiates the reference's own
operator inventory plus Q1/Q2/Q3/Q4/Q5/Q22 shapes. This module completes
the classic analytic-join/aggregate space on the synthetic star schema —
engine completeness beyond the reference surface (SURVEY §2.7 notes Spark
provides these free; the reference has no query language at all).

Harness schema differences from real TPC-H (no partsupp; no commit/receipt
dates, ship modes, comments, phones, containers) — each query keeps the
*shape* (the plan-level challenge: correlated-subquery decorrelation,
disjunctive join predicates, scalar-subquery thresholds, multi-way joins)
and substitutes available columns, documented per query.

Determinism conventions follow queries.py: DECIMAL(18,2) money arithmetic,
identical aliases both sides, dates rendered as strings, total ordering via
key tie-breaks before any LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _dec, _t, register

_REV_DEC = ("sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* CAST(1 - l_discount AS DECIMAL(18,2)))")


def _rev(df_prefix: str = "") -> object:
    return F.sum(_dec(F.col(f"{df_prefix}l_extendedprice"))
                 * _dec(1 - F.col(f"{df_prefix}l_discount")))


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan→filter→global agg
# ---------------------------------------------------------------------------

@register("forecast_revenue_delta", """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate pushes to the parquet scan (range on
    shipdate/discount/quantity — all min/max-prunable per row group at
    scale), then a single global partial+final aggregate: the shuffle
    carries one row per map task."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & F.col("l_discount").between(0.03, 0.07)
                & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(_dec(F.col("l_extendedprice"))
                               * _dec(F.col("l_discount"))).cast("double"), 2)
                 .alias("revenue_delta"),
                 F.count(F.lit(1)).alias("n_lines")))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

@register("volume_shipping", f"""
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(vol) AS DOUBLE), 2) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: the nation-pair disjunction is applied AFTER broadcasting
    both tiny nation dims onto the fact rows, so the big sides still join
    on pure equi-keys (orderkey/custkey/suppkey) — one shuffle per fact
    join, never a theta join. The year extraction stays JVM-side."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("ns_key"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"),
                  F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
              .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
              .filter(pair))
    return (joined
            .withColumn("l_year", F.year("l_shipdate"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.round(_rev().cast("double"), 2).alias("revenue")))


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation within a region, by year
# ---------------------------------------------------------------------------

@register("market_share", """
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol
                           ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
""")
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: a conditional-aggregation ratio — numerator and
    denominator in ONE pass (no self-join of two aggregates). part/
    supplier/nation/region broadcast; the share division happens on the
    grouped (tiny) result. Exact decimal sums make the ratio
    cross-engine-stable before the 4dp round."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"),
                  F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"),
                  F.col("n_name").alias("supp_nation"))
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
              .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
              .join(F.broadcast(p), li.l_partkey == p.p_partkey))
    zero = F.lit("0.00").cast("decimal(18,2)")
    return (joined
            .withColumn("o_year", F.year("o_orderdate"))
            .withColumn("vol", vol)
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5",
                             F.col("vol")).otherwise(zero)).cast("double")
                / F.sum("vol").cast("double"), 4).alias("mkt_share")))


# ---------------------------------------------------------------------------
# Q9 — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

@register("product_profit", """
SELECT n_name, o_year, round(CAST(sum(amount) AS DOUBLE), 2) AS profit
FROM (
  SELECT ns.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l.l_discount AS DECIMAL(18,2))
         - CAST(0.8 AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2))
           * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY n_name, o_year
""")
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the harness schema: supply cost is
    substituted by 0.8 * p_retailprice — same plan, the cost column simply
    arrives from the part dim instead of partsupp). The LIKE filter prunes
    part before broadcast; profit arithmetic is exact DECIMAL."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%red%"))
         .select("p_partkey", "p_retailprice"))
    amount = (_dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
              - F.lit("0.8").cast("decimal(18,2)")
              * _dec(F.col("p_retailprice")) * _dec(F.col("l_quantity")))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
              .join(F.broadcast(p), li.l_partkey == p.p_partkey))
    return (joined
            .withColumn("o_year", F.year("o_orderdate"))
            .withColumn("amount", amount)
            .groupBy("n_name", "o_year")
            .agg(F.round(F.sum("amount").cast("double"), 2).alias("profit")))


# ---------------------------------------------------------------------------
# Q10 — returned-item customers (top 20 by lost revenue)
# ---------------------------------------------------------------------------

@register("returned_item_customers", f"""
SELECT c.c_custkey, c.c_name,
       round(CAST({_REV_DEC} AS DOUBLE), 2) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY {_REV_DEC} DESC, c.c_custkey
LIMIT 20
""")
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returnflag + orderdate filters push to the scans; the
    grouped revenue shuffles once on custkey; the top-20 is a
    TakeOrderedAndProject on the aggregated (small) side — never a global
    sort of the fact table. Ordering key is exact DECIMAL + custkey
    tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    agged = (joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
             .agg(_rev().alias("__rev")))
    return (agged.orderBy(F.desc("__rev"), "c_custkey").limit(20)
            .select("c_custkey", "c_name",
                    F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
                    F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"))


# ---------------------------------------------------------------------------
# Q11 — revenue concentration (scalar-subquery threshold)
# ---------------------------------------------------------------------------

@register("revenue_concentration", f"""
WITH part_rev AS (
  SELECT l.l_partkey, {_REV_DEC} AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, round(CAST(value AS DOUBLE), 2) AS value
FROM part_rev
WHERE CAST(value AS DOUBLE)
      > 0.001 * (SELECT CAST(sum(value) AS DOUBLE) FROM part_rev)
""")
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → lineitem revenue per part): a
    grouped aggregate filtered against a SCALAR subquery over itself.
    Decorrelated the scale-correct way: aggregate once, cross-join the
    one-row global total back (broadcast — no driver collect), filter.
    Spark computes part_rev once per branch; both branches are the same
    tiny aggregated frame."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = (_t(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_3").select("n_nationkey"))
    part_rev = (li.join(F.broadcast(
                    s.join(F.broadcast(n),
                           s.s_nationkey == n.n_nationkey).select("s_suppkey")),
                    li.l_suppkey == F.col("s_suppkey"))
                .groupBy("l_partkey").agg(_rev().alias("__value")))
    total = part_rev.agg(
        F.sum("__value").cast("double").alias("__total"))
    return (part_rev.crossJoin(F.broadcast(total))
            .filter(F.col("__value").cast("double") > 0.001 * F.col("__total"))
            .select("l_partkey",
                    F.round(F.col("__value").cast("double"), 2).alias("value")))


# ---------------------------------------------------------------------------
# Q12 — late shipments by priority class (conditional aggregation)
# ---------------------------------------------------------------------------

@register("late_shipment_priority", """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""")
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode/commitdate in harness schema:
    "late" = shipped >60 days after order date, grouped by returnflag).
    The lateness predicate compares two columns of the SAME joined row —
    evaluated post-join, JVM-side; the priority split is conditional
    aggregation in one pass."""
    o = _t(spark, sf_dir, "orders")
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count")))


# ---------------------------------------------------------------------------
# Q14 — promo revenue share by month
# ---------------------------------------------------------------------------

@register("promo_revenue_share", """
SELECT CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INTEGER) AS ship_month,
       round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
             4) AS promo_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_month
""")
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (by month instead of one fixed month — 12 groups instead
    of a single scalar): part broadcasts onto the date-pruned lineitem
    scan; promo/total are one conditional aggregation pass."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    zero = F.lit("0.00").cast("decimal(18,2)")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .withColumn("ship_month", F.month("l_shipdate"))
            .withColumn("__vol", vol)
            .groupBy("ship_month")
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO",
                                     F.col("__vol")).otherwise(zero))
                .cast("double") / F.sum("__vol").cast("double"),
                4).alias("promo_share")))


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarter revenue (max-scalar selection)
# ---------------------------------------------------------------------------

@register("top_revenue_suppliers", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_REV_DEC} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: select the argmax row(s) of an aggregate. The view
    aggregates once; the max-selection is an empty-partition window max
    over the aggregated frame (100 suppliers) — no second scan of
    lineitem, no driver round-trip. DECIMAL revenue makes the equality
    tie-exact across engines."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(_rev().alias("total_revenue")))
    w = Window.partitionBy()
    top = (revenue
           .withColumn("__max", F.max("total_revenue").over(w))
           .filter(F.col("total_revenue") == F.col("__max")))
    s = _t(spark, sf_dir, "supplier")
    return (s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.round(F.col("total_revenue").cast("double"), 2)
                    .alias("total_revenue")))


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part class, excluding flagged suppliers
# ---------------------------------------------------------------------------

@register("supplier_part_variety", """
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size BETWEEN 1 AND 15
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""")
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → lineitem as the part-supplier
    relation; the comment-based complaint filter → negative account
    balance). The NOT IN subquery is a broadcast LEFT ANTI join — the
    fact side never shuffles for the exclusion; the distinct count
    expands map-side."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & F.col("p_size").between(1, 15))
         .select("p_partkey", "p_brand", "p_size"))
    flagged = (_t(spark, sf_dir, "supplier")
               .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey,
                  "left_anti")
            .groupBy("p_brand", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery, decorrelated)
# ---------------------------------------------------------------------------

@register("small_quantity_revenue", """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""")
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated per-part AVG subquery decorrelated into a
    window average over the part key — ONE pass over lineitem (one
    shuffle on partkey) instead of a re-aggregating self-join.
    l_quantity is integer-valued, so sum/count — and hence the avg — are
    bit-exact doubles in both engines.

    Note: the window computes avg over ALL parts' lines before the brand
    filter prunes — matching the subquery's scope (it averages the whole
    lineitem table for that part, not the brand subset)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#3").select("p_partkey"))
    w = Window.partitionBy("l_partkey")
    flagged = (li
               .withColumn("__avg_qty", F.avg("l_quantity").over(w))
               .join(F.broadcast(p), li.l_partkey == p.p_partkey)
               .filter(F.col("l_quantity") < 0.5 * F.col("__avg_qty")))
    return flagged.agg(
        F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 2)
        .alias("avg_yearly"))


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING subquery join-back)
# ---------------------------------------------------------------------------

@register("large_volume_orders", """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(big.sum_qty, 2) AS sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""")
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the IN-subquery over a HAVING aggregate becomes an
    aggregate → join-back on the order key (same key as the aggregation —
    AQE reuses the partitioning, no extra shuffle for the join). Quantity
    sums are integer-valued doubles: exact. Top-20 via
    TakeOrderedAndProject with orderkey tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__sum_qty"))
           .filter(F.col("__sum_qty") > 250))
    return (big.join(o, big.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.round("__sum_qty", 2).alias("sum_qty")))


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate join revenue
# ---------------------------------------------------------------------------

@register("disjunctive_predicate_revenue", f"""
SELECT round(CAST({_REV_DEC} AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 26 AND 50
       AND l.l_quantity BETWEEN 20 AND 40)
""")
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-conjunctions across BOTH join sides. The join
    stays a pure broadcast equi-join on partkey; the disjunction evaluates
    post-join. Catalyst derives the single-side implications (brand/size
    union prunes part, quantity range prunes lineitem) for scan pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(11, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(26, 50)
           & F.col("l_quantity").between(20, 40)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(branch)
            .agg(F.round(_rev().cast("double"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant shipments of a part class (semi-join chain)
# ---------------------------------------------------------------------------

@register("significant_part_suppliers", """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 300
)
""")
def significant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty → shipped quantity): a chain of nested IN
    subqueries flattened to semi-joins. part prunes by LIKE and broadcasts
    into lineitem; the qualifying-supplier aggregate is tiny and
    broadcasts into the supplier scan as a LEFT SEMI join — supplier rows
    are never duplicated."""
    s = _t(spark, sf_dir, "supplier")
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    red_parts = (_t(spark, sf_dir, "part")
                 .filter(F.col("p_name").like("%red%")).select("p_partkey"))
    qualified = (li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
                 .groupBy("l_suppkey")
                 .agg(F.sum("l_quantity").alias("__qty"))
                 .filter(F.col("__qty") > 300)
                 .select("l_suppkey"))
    return (s.join(F.broadcast(qualified), s.s_suppkey == qualified.l_suppkey,
                   "left_semi")
            .select("s_suppkey", "s_name"))


# ---------------------------------------------------------------------------
# Q21 — suppliers solely responsible for returns on multi-supplier orders
# ---------------------------------------------------------------------------

@register("sole_return_suppliers", """
WITH per_supp AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey, l_suppkey, has_r,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supps,
         sum(has_r) OVER (PARTITION BY l_orderkey) AS n_r_supps
  FROM per_supp
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON s.s_suppkey = po.l_suppkey
WHERE po.has_r = 1 AND po.n_supps > 1 AND po.n_r_supps = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""")
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late delivery → returned lines): EXISTS (another
    supplier on the order) AND NOT EXISTS (another supplier with a
    returned line) decorrelated into ONE aggregation + ONE window pass
    over the order key — instead of two correlated self-joins of
    lineitem, the plan shuffles lineitem once on (orderkey, suppkey) and
    once on orderkey. The supplier dim broadcasts onto the survivors."""
    li = _t(spark, sf_dir, "lineitem")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F").select("o_orderkey"))
    s = _t(spark, sf_dir, "supplier")
    per_supp = (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                     .alias("has_r")))
    w = Window.partitionBy("l_orderkey")
    per_order = (per_supp
                 .withColumn("n_supps", F.count(F.lit(1)).over(w))
                 .withColumn("n_r_supps", F.sum("has_r").over(w)))
    return (per_order
            .filter((F.col("has_r") == 1) & (F.col("n_supps") > 1)
                    & (F.col("n_r_supps") == 1))
            .join(F.broadcast(s), per_order.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name").limit(20))


# ---------------------------------------------------------------------------
# Engine utilities beyond TPC-H: data profiling + referential-integrity audit
# ---------------------------------------------------------------------------

@register("column_profile", """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(c_acctbal) AS BIGINT) AS acctbal_nonnull,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nation_ndv,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS segment_ndv,
       round(min(c_acctbal), 2) AS acctbal_min,
       round(max(c_acctbal), 2) AS acctbal_max,
       CAST(min(length(c_name)) AS BIGINT) AS name_len_min,
       CAST(max(length(c_name)) AS BIGINT) AS name_len_max
FROM customer
""")
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling aggregate (pipeline data-quality
    surface): row/null/NDV/min/max stats for a table in ONE scan — the
    shape a 100 TB profiling job needs (swap countDistinct →
    approx_count_distinct at scale; noted like distinct_count_per_group)."""
    c = _t(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_acctbal").alias("acctbal_nonnull"),
        F.countDistinct("c_nationkey").alias("nation_ndv"),
        F.countDistinct("c_mktsegment").alias("segment_ndv"),
        F.round(F.min("c_acctbal"), 2).alias("acctbal_min"),
        F.round(F.max("c_acctbal"), 2).alias("acctbal_max"),
        F.min(F.length("c_name")).cast("long").alias("name_len_min"),
        F.max(F.length("c_name")).cast("long").alias("name_len_max"))


@register("referential_integrity_audit", """
SELECT 'lineitem->orders' AS fk_edge, CAST(count(*) AS BIGINT) AS orphan_rows
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer' AS fk_edge, CAST(count(*) AS BIGINT) AS orphan_rows
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem->part' AS fk_edge, CAST(count(*) AS BIGINT) AS orphan_rows
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
""")
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan audit across three edges (pipeline data-quality surface):
    each NOT EXISTS is a LEFT ANTI join against the parent's key column
    only (parent scans prune to one column); counts union into one
    report. At 100 TB each anti-join shuffles on the key or broadcasts
    the parent keys when the dim is small (customer/part here)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                edge: str, bcast: bool) -> DataFrame:
        pk = parent.select(pkey)
        if bcast:
            pk = F.broadcast(pk)
        return (child.join(pk, child[ckey] == F.col(pkey), "left_anti")
                .agg(F.count(F.lit(1)).alias("orphan_rows"))
                .select(F.lit(edge).alias("fk_edge"), "orphan_rows"))

    return (orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders", False)
            .unionByName(orphans(o, "o_custkey",
                                 _t(spark, sf_dir, "customer"), "c_custkey",
                                 "orders->customer", True))
            .unionByName(orphans(li, "l_partkey",
                                 _t(spark, sf_dir, "part"), "p_partkey",
                                 "lineitem->part", True)))


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (count-of-counts incl. zeros)
# ---------------------------------------------------------------------------

@register("customer_order_distribution", """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""")
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the count-of-counts OUTER-join distribution — how many
    customers placed exactly N (qualifying) orders, INCLUDING the
    zero-order customers the left join preserves (real Q13 excludes
    `special requests` comments; the harness has no comment column, so
    the filter substitutes `o_orderpriority NOT LIKE '%URGENT%'`,
    keeping the shape-critical property that the predicate sits on the
    JOIN SIDE — filtering o before a left join ≠ filtering after,
    because an all-URGENT customer must still count as c_count=0).

    Plan: filter pushes into the orders scan, one shuffle equi-join on
    custkey; the first aggregate groups on the SAME key the join
    shuffled on (no extra exchange under AQE coalescing), the second is
    answer-sized (|distinct counts| rows). count(o_orderkey) counts
    non-null rows only — the outer join's null-padding becomes 0 in
    both engines."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (_t(spark, sf_dir, "orders")
         .filter(~F.col("o_orderpriority").like("%URGENT%"))
         .select("o_custkey", "o_orderkey"))
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))
