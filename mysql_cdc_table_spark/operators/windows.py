"""Window-function surface: ranking, analytic (lag/lead/first/last),
aggregates over row and range frames, per-group top-k.

Scale posture: a window = one hash shuffle on the partition key + a
partition-local sort. Every query here partitions by a reasonably
high-cardinality key (custkey/orderkey), so no single partition becomes
the straggler; a window with NO partitionBy (global ordering) is the
anti-pattern at 100 TB — the one global-order query below is top-k,
which Spark plans as TakeOrderedAndProject (per-partition heap + driver
merge), not a single-partition sort.

Determinism: every orderBy carries a unique tiebreaker — ranking and
frame contents are otherwise engine-dependent under ties.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import spread_narrow_scan
from mysql_cdc_table_spark.operators._util import t


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-order deltas per customer (lag/lead with defaults)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, 0.0).over(w).alias("next_price_or_0"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 4
        ).alias("delta_prev"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date"), 1).over(w),
        ).alias("days_since_prev"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1, 0.0) OVER w AS next_price_or_0,
       round(o_totalprice - lag(o_totalprice, 1) OVER w, 4) AS delta_prev,
       date_diff('day', lag(CAST(o_orderdate AS DATE), 1) OVER w,
                 CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals per customer: ROWS UNBOUNDED PRECEDING frame."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_spend"),
        F.count("*").over(w).alias("run_n"),
        F.round(F.max("o_totalprice").over(w), 2).alias("run_max"),
    )


WINDOW_RUNNING_AGG_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w, 2) AS run_spend,
       count(*) OVER w AS run_n,
       round(max(o_totalprice) OVER w, 2) AS run_max
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def window_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 5-row moving average per customer (ROWS 2 PRECEDING..2
    FOLLOWING)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 2)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("ma5"),
        F.count("*").over(w).alias("win_n"),
    )


WINDOW_SLIDING_ROWS_SQL = """
SELECT o_custkey, o_orderkey,
       round(avg(o_totalprice) OVER w, 6) AS ma5,
       count(*) OVER w AS win_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: for each lineitem, how many
    items of the same order fall within +-5 quantity."""
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(F.col("l_quantity"))
        .rangeBetween(-5, 5)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count("*").over(w).alias("n_similar_qty"),
        F.round(F.sum("l_quantity").over(w), 2).alias("sum_near_qty"),
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       count(*) OVER w AS n_similar_qty,
       round(sum(l_quantity) OVER w, 2) AS sum_near_qty
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over the full partition frame + nth via lead-of-first."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.first("o_orderdate").over(w).alias("first_date"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price,
       first_value(o_orderdate) OVER w AS first_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the standard row_number()<=k idiom (one shuffle;
    the filter prunes before any downstream join).

    r15 (guide §2): when the parquet input offers fewer row groups than
    the scheduler has slots (the bench files are single-row-group), the
    whole decode+sort+partial-top-k pipeline below the window's
    exchange runs on ONE task; spreading the scan BY THE WINDOW KEY
    both parallelizes the sort and satisfies the window's distribution,
    so the plan still costs exactly one shuffle (0.77s -> 0.50s
    min-of-5). On many-row-group inputs the spread is a no-op and the
    plan keeps the map-side partial WindowGroupLimit, which prunes to
    k rows per group per partition BEFORE the exchange — the better
    shape whenever scan parallelism is natural. Exact-integer ordering
    (price, orderkey, linenumber), so results are layout-independent."""
    li = spread_narrow_scan(
        spark, sf_dir, "lineitem", t(spark, sf_dir, "lineitem"), "l_suppkey"
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


TOPK_PER_GROUP_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_suppkey
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem
)
WHERE rn <= 3
"""


def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank distribution functions."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
    )


WINDOW_CUME_DIST_SQL = """
SELECT o_orderstatus, o_orderkey,
       round(cume_dist() OVER w, 9) AS cd,
       round(percent_rank() OVER w, 9) AS pr
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


QUERIES = {
    "window_rank": window_rank,
    "window_lag_lead": window_lag_lead,
    "window_running_agg": window_running_agg,
    "window_sliding_rows": window_sliding_rows,
    "window_range_frame": window_range_frame,
    "window_first_last": window_first_last,
    "topk_per_group": topk_per_group,
    "window_cume_dist": window_cume_dist,
}

ORACLES = {
    "window_rank": WINDOW_RANK_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "window_running_agg": WINDOW_RUNNING_AGG_SQL,
    "window_sliding_rows": WINDOW_SLIDING_ROWS_SQL,
    "window_range_frame": WINDOW_RANGE_FRAME_SQL,
    "window_first_last": WINDOW_FIRST_LAST_SQL,
    "topk_per_group": TOPK_PER_GROUP_SQL,
    "window_cume_dist": WINDOW_CUME_DIST_SQL,
}
