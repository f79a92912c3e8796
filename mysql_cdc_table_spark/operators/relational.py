"""Core relational surface: scan, projection, filter, sort/limit, set ops,
distinct, subqueries.

The reference delegates this whole surface to MySQL's SQL layer (its engine
contributes only a full scan — reference binlogdb.cc:477-551); here it is
Spark SQL/Catalyst. Every query aliases computed columns identically to its
DuckDB oracle so the driver's column-sorted value hash matches.

Float-aggregate convention (applies to every module): any aggregate over
DOUBLE is wrapped in round(..., 2) for sums and round(..., 6) for
avg/stddev in BOTH engines, so cross-engine summation-order ulp
differences cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

# --- flagship: TPC-H Q1-style pricing summary --------------------------------
# Scale: single scan + partial (map-side) agg into 6-group hash agg; no join,
# one shuffle of 6 rows. Filter + 7-column projection push into the parquet
# scan. This plan is shuffle-minimal at any scale factor.


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- projection / filter -----------------------------------------------------


def proj_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select + alias + computed columns; pushes a 4-column ReadSchema."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        (F.col("l_quantity") > 25).alias("bulk"),
    )


PROJ_COMPUTED_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price,
       l_quantity > 25 AS bulk
FROM lineitem
"""


def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + BETWEEN + LIKE predicates, all pushed to the parquet scan."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000.0, 200000.0)
        & F.col("o_orderpriority").like("%URGENT%")
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


FILTER_IN_BETWEEN_LIKE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'O')
  AND o_totalprice BETWEEN 1000.0 AND 200000.0
  AND o_orderpriority LIKE '%URGENT%'
"""


def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>) and coalesce/nullif on a derived nullable col."""
    e = t(spark, sf_dir, "events")
    withn = e.withColumn(
        "v_null", F.when(F.col("value") > 5.0, F.col("value"))
    )  # NULL when <= 5
    return (
        withn.filter(F.col("v_null").eqNullSafe(F.lit(None).cast("double")) | (F.col("v_null") > 15.0))
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("v_null"), F.lit(-1.0)).alias("v_filled"),
            F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        )
    )


FILTER_NULL_SAFE_SQL = """
WITH withn AS (
  SELECT *, CASE WHEN value > 5.0 THEN value END AS v_null FROM events
)
SELECT event_id, event_type,
       coalesce(v_null, -1.0) AS v_filled,
       nullif(event_type, 'error') AS type_or_null
FROM withn
WHERE v_null IS NOT DISTINCT FROM NULL OR v_null > 15.0
"""


# --- sort / limit / distinct -------------------------------------------------


def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — no full sort shuffle,
    each partition keeps N rows then the driver merges (scale-safe)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SORT_LIMIT_TOPN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_VALUES_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# --- set operations ----------------------------------------------------------


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of high-value vs urgent orders (overlap preserved)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_custkey")
    return a.unionByName(b)


SET_UNION_ALL_SQL = """
SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
UNION ALL
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — duplicates preserved by multiplicity)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_orderkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(b)


SET_EXCEPT_ALL_SQL = """
SELECT l_orderkey FROM lineitem WHERE l_quantity >= 10
EXCEPT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
"""


# --- subqueries --------------------------------------------------------------


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → Catalyst rewrites to left-semi join."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big_spenders = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        o.join(big_spenders, o.o_custkey == big_spenders.c_custkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SUBQUERY_IN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price."""
    o = t(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("a"))
    return (
        o.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


SUBQUERY_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


def subquery_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery, decorrelated to join-on-group-agg:
    lineitems whose quantity exceeds their order's average quantity."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.avg("l_quantity").alias("avg_q"))
    lj = li.alias("l").join(per_order.alias("p"), "l_orderkey")
    return lj.filter(F.col("l.l_quantity") > F.col("p.avg_q")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SUBQUERY_CORRELATED_AGG_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem l
WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem i
                    WHERE i.l_orderkey = l.l_orderkey)
"""


def having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING over a join-free agg."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("n_orders") >= 5)
    )


HAVING_GROUPS_SQL = """
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 5
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "proj_computed": proj_computed,
    "filter_in_between_like": filter_in_between_like,
    "filter_null_safe": filter_null_safe,
    "sort_limit_topn": sort_limit_topn,
    "distinct_values": distinct_values,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except_all": set_except_all,
    "subquery_in": subquery_in,
    "subquery_scalar": subquery_scalar,
    "subquery_correlated_agg": subquery_correlated_agg,
    "having_groups": having_groups,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "proj_computed": PROJ_COMPUTED_SQL,
    "filter_in_between_like": FILTER_IN_BETWEEN_LIKE_SQL,
    "filter_null_safe": FILTER_NULL_SAFE_SQL,
    "sort_limit_topn": SORT_LIMIT_TOPN_SQL,
    "distinct_values": DISTINCT_VALUES_SQL,
    "set_union_all": SET_UNION_ALL_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except_all": SET_EXCEPT_ALL_SQL,
    "subquery_in": SUBQUERY_IN_SQL,
    "subquery_scalar": SUBQUERY_SCALAR_SQL,
    "subquery_correlated_agg": SUBQUERY_CORRELATED_AGG_SQL,
    "having_groups": HAVING_GROUPS_SQL,
}
