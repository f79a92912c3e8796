"""TPC-H-style query adaptations (beyond q1/q3/q5 in relational/joins):
the optimizer-shaped patterns — EXISTS/NOT EXISTS, correlated minimum,
disjunctive predicate trees, join-then-agg-then-filter — adapted to the
driver's star schema. These stress Catalyst's subquery decorrelation,
predicate normalization/pushdown through joins, and broadcast choices.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered orders, counted per priority
    (Catalyst: left-semi join after decorrelation)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated minimum — per part, the supplier(s) of
    its cheapest lineitem (decorrelated to join-on-grouped-min)."""
    li = t(spark, sf_dir, "lineitem").alias("li")
    s = t(spark, sf_dir, "supplier")
    min_price = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("mp_partkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    cheapest = li.join(
        min_price,
        (F.col("li.l_partkey") == F.col("mp_partkey"))
        & (F.col("li.l_extendedprice") == F.col("min_price")),
    ).select(F.col("li.l_partkey").alias("partkey"), "l_suppkey", "min_price")
    return (
        cheapest.join(F.broadcast(s), cheapest.l_suppkey == s.s_suppkey)
        .groupBy("partkey", "min_price")
        .agg(F.min("s_name").alias("cheapest_supplier"))
    )


Q2_SQL = """
WITH cheapest AS (
  SELECT l_partkey AS partkey, l_suppkey, l_extendedprice AS min_price
  FROM lineitem l
  WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem i
                           WHERE i.l_partkey = l.l_partkey)
)
SELECT partkey, min_price, min(s_name) AS cheapest_supplier
FROM cheapest JOIN supplier ON l_suppkey = s_suppkey
GROUP BY partkey, min_price
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio over a broadcast join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("STANDARD"), rev))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct")
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'STANDARD%'
                              THEN l_extendedprice * (1 - l_discount) END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
         AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive band predicates across the
    join (Catalyst pushes the common l_partkey=p_partkey through and
    evaluates the residual disjunction post-join)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("l_quantity").between(1, 15)
        & (F.col("p_size") <= 20)
    )
    band2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("l_quantity").between(10, 30)
        & (F.col("p_size") >= 10)
    )
    return j.filter(band1 | band2).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size <= 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 10 AND 30 AND p_size >= 10)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (agg -> filter -> join back to detail)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > 250) big
  ON o_orderkey = big.l_orderkey
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average balance with NO
    orders (NOT EXISTS -> left-anti join, scalar subquery broadcast)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .drop("ab")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive range filters + one
    global agg — the pushdown benchmark (every predicate reaches the
    parquet scan; no join, no shuffle beyond the 1-row final agg)."""
    li = t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> linestatus adaptation): join orders
    to date-windowed lineitems, conditional counts per group (the
    sum-of-CASE pattern on a fact-fact join)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar average — lineitems below 20%
    of their part's mean quantity, for one brand slice (decorrelated to
    a grouped-avg join; the per-part avg side broadcasts)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17")
    avg_q = li.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("q_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_q), F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("q_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey AND p_brand = 'Brand#17'
WHERE l.l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem
                      WHERE l_partkey = l.l_partkey)
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double correlation — suppliers who were the
    ONLY late shipper on a multi-supplier order (EXISTS another
    supplier's line + NOT EXISTS another supplier's late line).
    Decorrelated here to one per-order aggregate joined back (late flag
    by shipdate window stands in for the receipt/commit comparison the
    test schema lacks); the DuckDB oracle keeps the literal
    EXISTS/NOT EXISTS form, so both rewrites must agree."""
    li = t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") >= F.lit("1998-06-01")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        li.filter(late)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_suppkey", "l_orderkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("l_suppkey"))
        .limit(20)
    )


Q21_SQL = """
SELECT l1.l_suppkey, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM lineitem l1
WHERE l1.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
GROUP BY l1.l_suppkey
ORDER BY numwait DESC, l1.l_suppkey
LIMIT 20
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts — a
    LEFT OUTER join (customers with zero orders stay, c_count = 0)
    aggregated twice (count per key, then count-of-counts)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max equality — suppliers
    whose windowed revenue equals the global maximum. The tie is taken
    on EXACT integer ten-thousandths (price and discount are 2-dec, so
    each product is a multiple of 1e-4): float summation order can
    form/break an exact-equality tie across engines, an integer sum
    cannot. The displayed total_revenue is the one int64->double
    conversion, identical on both sides."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_e4).alias("rev_i")
    )
    mx = rev.agg(F.max("rev_i").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_i") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_i") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev_i
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_i / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev_i = (SELECT max(rev_i) FROM revenue)
ORDER BY s_suppkey
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: symmetric nation-pair shipping volume per year —
    supplier nation x customer nation (either direction), revenue
    grouped by (supp_nation, cust_nation, year). Exercises year
    extraction from the event timestamp in the GROUP BY and the
    disjunctive pair predicate; both small dims broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — one supplier nation's
    slice of a region's market revenue per year. Exercises the
    two-dimension snowflake (customer nation -> region on one side,
    supplier nation on the other) hanging off the lineitem-orders
    fact-fact join, with every dim broadcast. Revenue is summed in
    exact integer ten-thousandths; the share is one int64/int64 double
    division (bit-identical across engines, no rounding step)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("2000-01-01"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n_c = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_s = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev_e4).otherwise(F.lit(0))).alias(
                "nation_rev_e4"
            ),
            F.sum(rev_e4).alias("total_rev_e4"),
        )
        .select(
            "o_year",
            "nation_rev_e4",
            "total_rev_e4",
            (F.col("nation_rev_e4") / F.col("total_rev_e4")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
WITH flat AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_e4,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
            AS BIGINT) AS nation_rev_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
       sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
         / CAST(sum(rev_e4) AS DOUBLE) AS mkt_share
FROM flat GROUP BY o_year ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and year.
    The testdata has no partsupp, so supply cost is adapted to the
    part's retail price x quantity (same plan shape: part filter ->
    fact join -> two-level group). All terms are exact integers at
    ten-thousandths scale (prices 2-dec, quantities integral)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
        - F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(100).cast("long")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(profit_e4).alias("profit_e4"))
        .select(
            "nation",
            "o_year",
            "profit_e4",
            (F.col("profit_e4") / F.lit(10000.0)).alias("profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT)
                - CAST(round(p_retailprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT) * 100) AS BIGINT)
         AS profit_e4,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT)
                - CAST(round(p_retailprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT) * 100) AS BIGINT)
         / 10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value exceeds a fixed
    fraction of the grand total — group-agg + global-scalar comparison.
    Adapted from partsupp to lineitem value (price-cents x quantity)
    restricted to suppliers in one region; the fraction test is the
    integer cross-multiplication ``value * 2000 > total`` (no float
    division anywhere)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    value_e2 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
    )
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(value_e2).alias("value_e2"))
    )
    total = per_part.agg(F.sum("value_e2").alias("total_e2"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_e2") * 2000 > F.col("total_e2"))
        .select(
            "partkey",
            "value_e2",
            (F.col("value_e2") / F.lit(100.0)).alias("value"),
        )
        .orderBy(F.col("value_e2").desc(), "partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS value_e2
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT partkey, value_e2, value_e2 / 100.0 AS value
FROM per_part
WHERE value_e2 * 2000 > (SELECT sum(value_e2) FROM per_part)
ORDER BY value_e2 DESC, partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, with a negated attribute filter AND a NOT-IN supplier
    exclusion (suppliers in deficit stand in for the complaints
    subquery; Catalyst plans it as an anti join). Adapted from partsupp
    to the lineitem part-supplier relation."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 25, 35, 49)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 15, 25, 35, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose 1997 shipments of the target
    part family exceed half their all-time volume — the nested
    aggregate-in-predicate, decorrelated to one conditional-agg pass;
    the half test is the integer cross-multiplication ``2*q97 > qtot``
    (quantities are integral, so no 0.5 float factor). Ends in the Q20
    semi-join to supplier names."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = t(spark, sf_dir, "supplier")
    qty = F.round(F.col("l_quantity")).cast("long")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01")) & (
        F.col("l_shipdate") < F.lit("1998-01-01")
    )
    per_supp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in97, qty).otherwise(F.lit(0))).alias("qty_97"),
            F.sum(qty).alias("qty_all"),
        )
        .filter(F.col("qty_97") * 2 > F.col("qty_all"))
    )
    return (
        s.join(per_supp, s.s_suppkey == per_supp.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS qty_97,
         sum(CAST(round(l_quantity) AS BIGINT)) AS qty_all
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM per_supp WHERE qty_97 * 2 > qty_all)
ORDER BY s_suppkey
"""


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q21_sole_late_supplier": q21_sole_late_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_priority_by_status": q12_priority_by_status,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume": q18_large_volume,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "q14_promo_share": q14_promo_share,
    "q19_disjunctive_bands": q19_disjunctive_bands,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_promo_part_suppliers": q20_promo_part_suppliers,
}

ORACLES = {
    "q7_nation_volume": Q7_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q21_sole_late_supplier": Q21_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q12_priority_by_status": Q12_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume": Q18_SQL,
    "q22_idle_rich_customers": Q22_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority": Q4_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_share": Q14_SQL,
    "q19_disjunctive_bands": Q19_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_promo_part_suppliers": Q20_SQL,
}
