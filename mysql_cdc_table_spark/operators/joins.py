"""Join surface: every join type the MySQL upper layer gives the
reference's users, plus the custom compositions Spark lacks natively
(as-of). Broadcast strategy: dimension tables (region/nation/supplier/
part/customer) are broadcast explicitly — at 100 TB the fact side never
shuffles for these joins; only fact-fact joins (orders x lineitem)
shuffle, on their join key, where AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t
from mysql_cdc_table_spark.operators.asof import asof_join


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: broadcast customer filter, fact-fact join on
    orderkey, agg, top-10."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style snowflake: 4 broadcast dims + 1 fact-fact shuffle."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their order counts, keeping orderless customers."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
                "spend"
            ),
        )
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(sum(coalesce(o_totalprice, 0.0)), 2) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right join: all suppliers kept against a filtered lineitem side."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    s = t(spark, sf_dir, "supplier")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey, "right")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("n_bulk_items"))
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT s_suppkey, s_name, count(l_orderkey) AS n_bulk_items
FROM (SELECT * FROM lineitem WHERE l_quantity > 45) li
RIGHT JOIN supplier ON li.l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: urgent-order customers vs high-balance customers."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    rich = c.filter(F.col("c_acctbal") > 7500).select("c_custkey", "c_acctbal")
    return urgent.join(rich, urgent.o_custkey == rich.c_custkey, "full").select(
        "o_custkey", "n_urgent", "c_custkey", "c_acctbal"
    )


JOIN_FULL_OUTER_SQL = """
WITH urgent AS (
  SELECT o_custkey, count(*) AS n_urgent FROM orders
  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
),
rich AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7500
)
SELECT o_custkey, n_urgent, c_custkey, c_acctbal
FROM urgent FULL JOIN rich ON o_custkey = c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: parts that have ever shipped."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_brand"
    )


JOIN_SEMI_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers who never ordered."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small dims (region x nation grid)."""
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return r.crossJoin(n)


JOIN_CROSS_SQL = """
SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
"""


def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + band predicate: lineitems whose quantity is within +-2 of
    their part's size (non-equi condition evaluated inside the join)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(p),
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2),
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_near_size"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
    )


JOIN_THETA_BAND_SQL = """
SELECT p_brand, count(*) AS n_near_size, round(avg(l_quantity), 6) AS avg_qty
FROM lineitem JOIN part
  ON l_partkey = p_partkey
 AND l_quantity >= p_size - 2 AND l_quantity <= p_size + 2
GROUP BY p_brand
"""


def join_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark lacks ASOF; DuckDB oracle uses
    its native ASOF JOIN): each event, remapped deterministically into the
    orders era, matched to the customer's newest order at-or-before that
    instant. Right side pre-deduped per (key, time) so ties are
    deterministic in both engines."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("custkey"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_interval(days=(F.col("event_id") % 2500).cast("int"))
        ).alias("ts_probe"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "custkey")
    )
    return asof_join(
        e, o, on="custkey", left_time="ts_probe", right_time="o_orderdate",
        right_payload=["o_orderkey"],
    )


JOIN_ASOF_ORDERS_SQL = """
WITH e AS (
  SELECT event_id, user_id AS custkey,
         TIMESTAMP '1995-01-01 00:00:00'
           + to_days(CAST(event_id % 2500 AS INTEGER)) AS ts_probe
  FROM events
),
o AS (
  SELECT o_custkey AS custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.custkey, e.ts_probe, o.o_orderkey
FROM e ASOF LEFT JOIN o
  ON e.custkey = o.custkey AND e.ts_probe >= o.o_orderdate
"""


QUERIES = {
    "q3_shipping_priority": q3_shipping_priority,
    "q5_regional_revenue": q5_regional_revenue,
    "join_left_outer": join_left_outer,
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross": join_cross,
    "join_theta_band": join_theta_band,
    "join_asof_orders": join_asof_orders,
}

ORACLES = {
    "q3_shipping_priority": Q3_SQL,
    "q5_regional_revenue": Q5_SQL,
    "join_left_outer": JOIN_LEFT_OUTER_SQL,
    "join_right_outer": JOIN_RIGHT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_cross": JOIN_CROSS_SQL,
    "join_theta_band": JOIN_THETA_BAND_SQL,
    "join_asof_orders": JOIN_ASOF_ORDERS_SQL,
}
