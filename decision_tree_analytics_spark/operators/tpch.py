"""Classic TPC-H query shapes adapted to the testdata star schema.

Q01 (the flagship) lives in relational.py as q11_hash_agg; this module
adds the canonical multi-way-join shapes — Q3 (join+agg+top-k), Q5
(5-way star with dim broadcast), Q10 (returned items), Q18 (having +
semi-join on an aggregate) — each column-adapted to the columns the
synthetic tables actually have (FIXTURES.md §B).

These are the queries where Catalyst's join reordering, broadcast
selection, and AQE earn their keep; the plans are left entirely to
the optimizer on purpose (only bounded dims get explicit broadcast
hints).  Date filters use ISO string comparison against timestamp_ntz
(timezone-free on both engines); date outputs render as ISO strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.sources.tables import load_table


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of undelivered orders for one market segment: 3-way
    join, aggregate, top-10 by revenue."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(rev)
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue where customer and supplier share a nation, per nation:
    5-way join; nation/region broadcast, customer–supplier co-location
    expressed as an equi-condition the optimizer can use."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(rev)
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned items, ranked by lost revenue (top-20)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev)
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (HAVING over a
    child aggregate, then join back to headers)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations per ship year (customer nation
    × supplier nation matrix through orders/lineitem)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(rev)
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — EXISTS as a left-semi join with a non-equi extra
    condition: orders in a six-month window that had at least one line
    shipped more than 60 days after the order date, counted per
    priority.  (The synthetic lineitem has no commit/receipt dates;
    ship-lag plays the lateness role.)

    Scale: the semi-join stops probing an order on its first late
    line — no fact×fact blow-up; the date window pushes to the
    orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape — pure scan-aggregate: one-year ship window, discount
    band, small quantities; the whole query is a pushed-filter scan
    plus a single global sum (zero joins, one partial-agg shuffle of
    one row per partition)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — distribution of orders per customer including the
    zero bucket: left join, per-customer count, then count-of-counts.
    Two aggregations, each with map-side partials; the second one's
    key space is tiny (distinct order counts)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — aggregate then take the top revenue supplier.

    The classic formulation equi-joins the aggregate against its own
    MAX; with floating-point totals computed by two independent
    subplans that join is brittle (a last-bit difference yields zero
    rows).  Deterministic-and-scale-safe instead: top-1 with a suppkey
    tie-break — plans as TakeOrderedAndProject over the per-supplier
    aggregate (per-partition heap, no global sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.orderBy(
        F.col("total_revenue").desc(), F.col("l_suppkey").asc()
    ).limit(1)
    return top.join(s, top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — correlated average as a self-agg join: lines of one
    brand whose quantity is below 20% of that part's average quantity;
    weekly-average revenue over them.  The per-part average table is
    keyed by partkey (partial agg, small output) and joins back to the
    fact co-partitioned on the same key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    avgq = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgq, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — OR-of-ANDs join predicates: three brand/size/
    quantity bands, revenue over the union.  The equi-key join stays a
    hash join; the disjunction evaluates post-probe in codegen (never
    a nested-loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — join + conditional aggregation: per return flag,
    how many shipped lines belong to high- vs low-priority orders in
    a two-year window.  (The synthetic schema has no l_shipmode; the
    return flag plays the grouping role.)

    Scale: the date filter pushes to the lineitem scan; the fact⋈fact
    join and the 3-group agg are left to Catalyst/AQE; both counts
    come from one pass (conditional sums, partial agg map-side)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — promo revenue ratio: share of revenue from PROMO
    parts in a six-month window (join + global conditional agg to one
    row).  No broadcast hint on part (scales with SF; AQE decides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q16_parts_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part brand/size (touches the part table):
    distinct suppliers offering each (p_brand, p_size) through the
    lineitem fact.

    No broadcast hint on ``part``: unlike nation/region it grows with
    scale factor, so forcing a broadcast would OOM the driver at
    100 TB.  AQE picks broadcast at small SF and sort-merge at large —
    the module policy (only bounded dims get explicit hints)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


QUERIES = {
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
    "tpch_q19_disjunctive_predicates": tpch_q19_disjunctive_predicates,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q12_priority_shipping": tpch_q12_priority_shipping,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q16_parts_promotion": tpch_q16_parts_promotion,
    "tpch_q18_large_volume_customers": tpch_q18_large_volume_customers,
}

_REV = "SUM(l_extendedprice * (1 - l_discount))"

ORACLES = {
    "tpch_q3_shipping_priority": (
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,"
        f" {_REV} AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " WHERE c_mktsegment = 'BUILDING'"
        "   AND o_orderdate < TIMESTAMP '1998-01-01'"
        "   AND l_shipdate > TIMESTAMP '1998-01-01'"
        " GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')"
        " ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
    ),
    "tpch_q5_local_supplier_volume": (
        f"SELECT n_name, {_REV} AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " GROUP BY n_name"
    ),
    "tpch_q10_returned_items": (
        f"SELECT c_custkey, c_name, n_name, {_REV} AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " WHERE l_returnflag = 'R'"
        " GROUP BY c_custkey, c_name, n_name"
        " ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
    ),
    "tpch_q7_volume_shipping": (
        "SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,"
        f" CAST(year(l_shipdate) AS BIGINT) AS ship_year, {_REV} AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation n1 ON c_nationkey = n1.n_nationkey"
        " JOIN nation n2 ON s_nationkey = n2.n_nationkey"
        " WHERE n1.n_name <> n2.n_name"
        " GROUP BY 1, 2, 3"
    ),
    "tpch_q4_order_priority": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count"
        " FROM orders"
        " WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
        "   AND o_orderdate < TIMESTAMP '1996-07-01'"
        "   AND EXISTS (SELECT 1 FROM lineitem"
        "     WHERE l_orderkey = o_orderkey"
        "       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)"
        " GROUP BY o_orderpriority"
    ),
    "tpch_q6_forecast_revenue": (
        "SELECT SUM(l_extendedprice * l_discount) AS revenue"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        "   AND l_shipdate < TIMESTAMP '1997-01-01'"
        "   AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    "tpch_q13_customer_distribution": (
        "WITH pc AS (SELECT c_custkey,"
        "   CAST(COUNT(o_orderkey) AS BIGINT) AS c_count"
        "   FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
        "   GROUP BY c_custkey)"
        " SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist"
        " FROM pc GROUP BY c_count"
    ),
    "tpch_q15_top_supplier": (
        "WITH rev AS (SELECT l_suppkey,"
        "   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue"
        "   FROM lineitem"
        "   WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        "     AND l_shipdate < TIMESTAMP '1996-04-01'"
        "   GROUP BY l_suppkey"
        "   ORDER BY total_revenue DESC, l_suppkey ASC LIMIT 1)"
        " SELECT s_suppkey, s_name, total_revenue"
        " FROM rev JOIN supplier ON l_suppkey = s_suppkey"
    ),
    "tpch_q17_small_quantity_revenue": (
        "WITH avgq AS (SELECT l_partkey AS ap_partkey,"
        "   AVG(l_quantity) * 0.2 AS qty_threshold"
        "   FROM lineitem GROUP BY l_partkey)"
        " SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " JOIN avgq ON l_partkey = ap_partkey"
        " WHERE p_brand = 'Brand#12' AND l_quantity < qty_threshold"
    ),
    "tpch_q19_disjunctive_predicates": (
        f"SELECT {_REV} AS revenue"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15"
        "        AND l_quantity BETWEEN 1 AND 11)"
        "    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25"
        "        AND l_quantity BETWEEN 10 AND 20)"
        "    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35"
        "        AND l_quantity BETWEEN 20 AND 30)"
    ),
    "tpch_q12_priority_shipping": (
        "SELECT l_returnflag,"
        " CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
        " CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        "   AND l_shipdate < TIMESTAMP '1998-01-01'"
        " GROUP BY l_returnflag"
    ),
    "tpch_q14_promo_revenue": (
        "SELECT 100.0"
        " * SUM(CASE WHEN p_type = 'PROMO'"
        "     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)"
        " / SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
        "   AND l_shipdate < TIMESTAMP '1997-07-01'"
    ),
    "tpch_q16_parts_promotion": (
        "SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " GROUP BY p_brand, p_size"
    ),
    "tpch_q18_large_volume_customers": (
        "WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS total_qty"
        "   FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)"
        " SELECT c_custkey, c_name, o_orderkey,"
        " strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,"
        " o_totalprice, total_qty"
        " FROM big JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
    ),
}
