"""Bucketing: the 100 TB fact-fact join strategy (SCALE.md) proven at
test scale — two tables bucketed on the join key join with ZERO shuffle
exchanges, and results equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import load_table
from mysql_cdc_table_spark.plans.audit import shuffle_count


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and cannot be pointed at tmp at runtime
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    orders_b, lineitem_b = bucketed
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem_b.join(
            orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey
        ).groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        # the join itself must not shuffle: both sides are co-bucketed.
        # (the groupBy after it is allowed its exchange)
        assert shuffle_count(joined) <= 1

        plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("rev"),
            )
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
