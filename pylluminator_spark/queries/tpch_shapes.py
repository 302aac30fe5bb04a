"""TPC-H query-shape conformance suite (the shapes not already covered by
the core driver contract).

Together with the existing entries (Q1 ``pricing_summary``, Q2
``min_cost_match``, Q5 ``revenue_by_nation``, Q13 ``outer_join_counts``,
Q15 ``agg_equals_max``, Q17 ``scalar_subquery``, Q21 ``exists_shapes``)
this module completes coverage of all 22 TPC-H query shapes, adapted to the
driver's reduced star schema (no partsupp table, no comment/phone/shipmode
columns — surrogate predicates keep each plan shape intact).

Cross-engine determinism: money sums are integer-scaled to cents before
aggregation (``CAST(ROUND(x*100) AS BIGINT)``), ratios divide two exact
integers (bit-identical IEEE division in both engines), and quantities are
whole-numbered so their double sums are exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pylluminator_spark.datasets import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col: F.Column, scale: int = 100) -> F.Column:
    return F.round(col * scale).cast("long")


_REV_C = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# ---------------------------------------------------------------------------
# Q3 — shipping priority: sales-channel filter on both fact and dims, join,
# group, integer-keyed top-k
# ---------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev_cents()).alias("_rev_c"))
        .orderBy(F.col("_rev_c").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_rev_c") / 100.0, 2).alias("revenue"),
            "o_orderdate",
        )
    )


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       ROUND(SUM({_REV_C}) / 100.0, 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM({_REV_C}) DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS with a non-equi component
# (late-shipped lines), COUNT per priority class
# ---------------------------------------------------------------------------

def q_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_LATE_ORDERS = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure filter-scan scalar aggregate
# (the canonical predicate-pushdown probe)
# ---------------------------------------------------------------------------

def q_filter_scan_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_FILTER_SCAN_REVENUE = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
             / 100.0, 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) = 1997
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping: symmetric cross-region pair predicate over a
# 7-table join, grouped by both endpoints and shipment year
# ---------------------------------------------------------------------------

def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    s_geo = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    c_geo = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c_geo, orders.o_custkey == c_geo.c_custkey)
        .join(s_geo, li.l_suppkey == s_geo.s_suppkey)
        .filter(
            (
                (F.col("supp_region") == "ASIA")
                & (F.col("cust_region") == "EUROPE")
            )
            | (
                (F.col("supp_region") == "EUROPE")
                & (F.col("cust_region") == "ASIA")
            )
        )
        .groupBy(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev_cents()) / 100.0, 2).alias("volume"))
    )


ORACLE_VOLUME_SHIPPING = f"""
SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       ROUND(SUM({_REV_C}) / 100.0, 2) AS volume
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
   OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
GROUP BY r1.r_name, r2.r_name, EXTRACT(year FROM l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q8 — national market share: per-year ratio of a conditional sum over the
# group total (two exact integer sums divided)
# ---------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    euro_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("c_custkey")
    )
    s_nat = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    promo = F.broadcast(
        part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    vol = (
        li.join(promo, li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(euro_cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(s_nat, li.l_suppkey == s_nat.s_suppkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            _rev_cents().alias("_vol_c"),
            F.col("supp_nation"),
        )
    )
    return (
        vol.groupBy("order_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("_vol_c")
                    ).otherwise(F.lit(0))
                )
                / F.sum("_vol_c"),
                6,
            ).alias("mkt_share")
        )
    )


ORACLE_MARKET_SHARE = f"""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
         {_REV_C} AS vol_c,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part      ON l_partkey = p_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'PROMO'
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE r2.r_name = 'EUROPE'
    )
)
SELECT order_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
             / SUM(vol_c), 6) AS mkt_share
FROM vol GROUP BY order_year
"""


# ---------------------------------------------------------------------------
# Q9 — product type profit: LIKE-filtered dim join, arithmetic measure with
# a surrogate supply cost (no partsupp table), nation x year rollforward
# ---------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    red = F.broadcast(
        part.filter(F.col("p_name").like("%red%")).select(
            "p_partkey", "p_retailprice"
        )
    )
    s_nat = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    amount_c = _rev_cents() - _cents(
        F.col("l_quantity") * F.col("p_retailprice") * 0.5
    )
    return (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(s_nat, li.l_suppkey == s_nat.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(amount_c) / 100.0, 2).alias("sum_profit"))
    )


ORACLE_PRODUCT_PROFIT = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       ROUND(SUM({_REV_C}
                 - CAST(ROUND(l_quantity * p_retailprice * 0.5 * 100)
                        AS BIGINT)) / 100.0, 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q10 — returned item reporting: quarter window + returnflag filter,
# customer rollup, top 20 by lost revenue
# ---------------------------------------------------------------------------

def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    c_nat = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", F.col("n_name").alias("nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c_nat, orders.o_custkey == c_nat.c_custkey)
        .groupBy("c_custkey", "c_name", "nation")
        .agg(F.sum(_rev_cents()).alias("_rev_c"))
        .orderBy(F.col("_rev_c").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "nation",
            F.round(F.col("_rev_c") / 100.0, 2).alias("revenue"),
        )
    )


ORACLE_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, n_name AS nation,
       ROUND(SUM({_REV_C}) / 100.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM({_REV_C}) DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important stock: group total filtered against a fraction of the
# global total (scalar subquery over the same aggregate)
# ---------------------------------------------------------------------------

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("_val_c")
    )
    total = val.agg(F.sum("_val_c").alias("_total_c"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("_val_c") > 0.0005 * F.col("_total_c"))
        .select(
            "l_partkey",
            F.round(F.col("_val_c") / 100.0, 2).alias("part_value"),
        )
    )


ORACLE_IMPORTANT_PARTS = """
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS val_c
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, ROUND(val_c / 100.0, 2) AS part_value
FROM val
WHERE val_c > 0.0005 * (SELECT SUM(val_c) FROM val)
"""


# ---------------------------------------------------------------------------
# Q12 — shipping modes / priority classes: CASE-based two-way conditional
# counts per derived category (no shipmode column — surrogate from suppkey)
# ---------------------------------------------------------------------------

_SHIPMODE_SQL = (
    "CASE l_suppkey % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'"
    " ELSE 'TRUCK' END"
)


def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.expr(_SHIPMODE_SQL).alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_PRIORITY_SHIPMODE = f"""
SELECT {_SHIPMODE_SQL} AS shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM l_shipdate) = 1998
GROUP BY shipmode
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect: scalar ratio of a conditional sum over the total
# ---------------------------------------------------------------------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    part = _t(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum(_rev_cents()),
                6,
            ).alias("promo_pct")
        )
    )


ORACLE_PROMO_REVENUE = f"""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_C} ELSE 0 END)
             / SUM({_REV_C}), 6) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE EXTRACT(year FROM l_shipdate) = 1997
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: NOT IN (anti join) against a
# disqualified-supplier set + COUNT(DISTINCT) per part attribute group
# ---------------------------------------------------------------------------

def q_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sized = F.broadcast(
        part.filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(sized, li.l_partkey == sized.p_partkey)
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_PART_CNT = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18 — large volume customers: IN over a grouped-HAVING subquery
# ---------------------------------------------------------------------------

def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty")
    ).filter(F.col("sum_qty") > 150)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
    )


ORACLE_LARGE_ORDERS = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS total_price,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 150
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunctive ranges across the
# join (the OR-of-ANDs pushdown probe)
# ---------------------------------------------------------------------------

def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev_cents()) / 100.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_DISJUNCTIVE_PRED = f"""
SELECT ROUND(SUM({_REV_C}) / 100.0, 2) AS revenue, COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN whose inner query filters
# per-supplier totals against a scalar threshold over those same totals
# ---------------------------------------------------------------------------

def q_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    blue = F.broadcast(
        part.filter(F.col("p_name").like("%blue%")).select("p_partkey")
    )
    sq = (
        li.join(blue, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("_qty"))
    )
    thr = sq.agg((F.lit(1.2) * F.avg("_qty")).alias("_thr"))
    heavy = (
        sq.crossJoin(F.broadcast(thr))
        .filter(F.col("_qty") > F.col("_thr"))
        .select("l_suppkey", F.col("_qty").alias("blue_qty"))
    )
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey
    ).select("s_suppkey", "s_name", "blue_qty")


ORACLE_BULK_SUPPLIERS = """
WITH sq AS (
  SELECT l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS blue_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%blue%'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, blue_qty
FROM supplier
JOIN sq ON s_suppkey = l_suppkey
WHERE blue_qty > 1.2 * (SELECT AVG(blue_qty) FROM sq)
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: derived customer segment, scalar average
# over a filtered population, NOT EXISTS against recent orders
# ---------------------------------------------------------------------------

def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cust_code", (F.col("c_custkey") % 7).cast("int")
    )
    orders = _t(spark, sf_dir, "orders")
    coded = cust.filter(F.col("cust_code").isin(1, 3, 5))
    avg_bal = coded.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_cents(F.col("c_acctbal"))).alias("_avg_c")
    )
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01").select(
        "o_custkey"
    )
    return (
        coded.crossJoin(F.broadcast(avg_bal))
        .filter(_cents(F.col("c_acctbal")) > F.col("_avg_c"))
        .join(recent, coded.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cust_code")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(
                F.sum(_cents(F.col("c_acctbal"))) / 100.0, 2
            ).alias("total_acctbal"),
        )
    )


ORACLE_IDLE_CUSTOMERS = """
SELECT CAST(c_custkey % 7 AS INT) AS cust_code, COUNT(*) AS n_custs,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0, 2)
         AS total_acctbal
FROM customer
WHERE c_custkey % 7 IN (1, 3, 5)
  AND CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
    SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer
    WHERE c_acctbal > 0 AND c_custkey % 7 IN (1, 3, 5)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_custkey % 7
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "shipping_priority": q_shipping_priority,
    "late_orders": q_late_orders,
    "filter_scan_revenue": q_filter_scan_revenue,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "returned_items": q_returned_items,
    "important_parts": q_important_parts,
    "priority_shipmode": q_priority_shipmode,
    "promo_revenue": q_promo_revenue,
    "supplier_part_cnt": q_supplier_part_cnt,
    "large_orders": q_large_orders,
    "disjunctive_pred": q_disjunctive_pred,
    "bulk_suppliers": q_bulk_suppliers,
    "idle_customers": q_idle_customers,
}

ORACLES: dict[str, str] = {
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "late_orders": ORACLE_LATE_ORDERS,
    "filter_scan_revenue": ORACLE_FILTER_SCAN_REVENUE,
    "volume_shipping": ORACLE_VOLUME_SHIPPING,
    "market_share": ORACLE_MARKET_SHARE,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "returned_items": ORACLE_RETURNED_ITEMS,
    "important_parts": ORACLE_IMPORTANT_PARTS,
    "priority_shipmode": ORACLE_PRIORITY_SHIPMODE,
    "promo_revenue": ORACLE_PROMO_REVENUE,
    "supplier_part_cnt": ORACLE_SUPPLIER_PART_CNT,
    "large_orders": ORACLE_LARGE_ORDERS,
    "disjunctive_pred": ORACLE_DISJUNCTIVE_PRED,
    "bulk_suppliers": ORACLE_BULK_SUPPLIERS,
    "idle_customers": ORACLE_IDLE_CUSTOMERS,
}
