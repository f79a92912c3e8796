"""Optimizer-property regression tests: the plans SCALE.md promises are
asserted here — pushdown, pruning, broadcasts, bounded shuffles."""

from __future__ import annotations

from mysql_cdc_table_spark.cdc.queries import cdc_latest_state
from mysql_cdc_table_spark.operators.joins import (
    join_theta_band,
    q3_shipping_priority,
    q5_regional_revenue,
)
from mysql_cdc_table_spark.operators.relational import (
    proj_computed,
    q1_pricing_summary,
)
from mysql_cdc_table_spark.plans.audit import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_no_cartesian,
    shuffle_count,
)

LINEITEM_WIDTH = 11


def test_q1_scan_pushdown_and_pruning(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert_filter_pushed(df, "l_shipdate")
    assert_columns_pruned(df, LINEITEM_WIDTH)
    # partial agg -> final agg -> sort: at most 2 shuffle exchanges
    assert shuffle_count(df) <= 2


def test_proj_reads_only_needed_columns(spark, sf_dir):
    assert_columns_pruned(proj_computed(spark, sf_dir), LINEITEM_WIDTH)


def test_q3_broadcasts_dims(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert_filter_pushed(df, "c_mktsegment")
    assert_filter_pushed(df, "l_shipdate")
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_q5_snowflake_all_dims_broadcast(spark, sf_dir):
    df = q5_regional_revenue(spark, sf_dir)
    assert_filter_pushed(df, "r_name")
    assert_broadcast_join(df, 4)
    assert_no_cartesian(df)


def test_theta_band_is_broadcast_not_cartesian(spark, sf_dir):
    df = join_theta_band(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_latest_state_single_shuffle(spark, sf_dir):
    """The latest-state window must cost exactly one hash shuffle
    (6-branch union is scan-parallel; rank+filter is partition-local)."""
    df = cdc_latest_state(spark, sf_dir)
    assert shuffle_count(df) <= 1
