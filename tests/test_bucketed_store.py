"""Bucketed changelog store: the SCALE.md upgrade path for
latest_state / apply-merge, measured instead of claimed.

SCALE.md §"CDC engine" promises: "store the changelog bucketed by key →
the shuffle disappears". These tests write the synthetic changelog (and
a snapshot) bucketed on the key via ``bucketBy``/``saveAsTable``, run
the exact production operators over them, and assert ZERO Exchange in
the final plans — plus result equality with the plain (shuffling)
plans, so the zero-shuffle path is proven correct, not just fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_table_spark.cdc.ops import latest_state
from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
from mysql_cdc_table_spark.plans.audit import shuffle_count


@pytest.fixture(scope="module")
def bucketed_changelog(spark, sf_dir):
    cl = synthetic_changelog(spark, sf_dir)
    (
        cl.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .saveAsTable("changelog_b")
    )
    yield spark.table("changelog_b")
    spark.sql("DROP TABLE IF EXISTS changelog_b")


def test_bucketed_latest_state_zero_exchange(spark, sf_dir, bucketed_changelog):
    """groupBy(key) + max_by over a key-bucketed table: the hash
    aggregate's distribution requirement is satisfied by the bucket
    layout — no Exchange anywhere in the plan."""
    state = latest_state(bucketed_changelog, ["o_orderkey"])
    assert shuffle_count(state) == 0, state._jdf.queryExecution().toString()

    plain = latest_state(synthetic_changelog(spark, sf_dir), ["o_orderkey"])
    assert shuffle_count(plain) >= 1  # the shuffle the bucket removed
    a = {r["o_orderkey"]: r["o_orderstatus"] for r in state.collect()}
    b = {r["o_orderkey"]: r["o_orderstatus"] for r in plain.collect()}
    assert a == b


def test_bucketed_merge_zero_exchange(spark, sf_dir, bucketed_changelog):
    """The cdc_apply_merge shape (keyed max_by -> anti join -> union)
    over a key-bucketed changelog AND a key-bucketed snapshot: both the
    aggregate and the anti join run co-located, zero Exchange up to the
    final union output."""
    from mysql_cdc_table_spark.catalog import load_table

    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .saveAsTable("orders_snap_b")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        snap = spark.table("orders_snap_b")
        final = bucketed_changelog.groupBy("o_orderkey").agg(
            F.max_by(
                F.struct("__op", "o_orderstatus", "o_totalprice"),
                F.struct("__gtid", "__event_seq", "__image_seq"),
            ).alias("last")
        )
        fresh = final.filter(F.col("last.__op") != 0).select(
            "o_orderkey",
            F.col("last.o_orderstatus").alias("o_orderstatus"),
            F.col("last.o_totalprice").alias("o_totalprice"),
        )
        merged = snap.join(
            final.select("o_orderkey"), "o_orderkey", "left_anti"
        ).unionByName(fresh)
        assert shuffle_count(merged) == 0, (
            merged._jdf.queryExecution().toString()
        )
        # correctness: merged keys = snapshot keys ∪ changelog upserts
        # minus nothing (tombstoned keys drop only if deleted last)
        n_merged = merged.count()
        n_snap = snap.count()
        n_tombstoned = final.filter(F.col("last.__op") == 0).count()
        n_new = final.join(
            snap, "o_orderkey", "left_anti"
        ).filter(F.col("last.__op") != 0).count()
        assert n_merged == n_snap - n_tombstoned + n_new
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_snap_b")
