"""Round-12 operator tests: full-outer stream-stream join, streaming
IVM (foreachBatch, versioned exactly-once state, restart/replay), and
the persisted-IVF train-once/probe-many path."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from mysql_cdc_table_spark.plans.audit import formatted_plan


# --- full-outer stream-stream join -------------------------------------------


def _batch_full_outer(spark, sf_dir):
    from mysql_cdc_table_spark.catalog import load_table as t

    e = (
        t(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("vm", F.floor(F.col("value") * 1000).cast("long"))
        .select("event_id", "user_id", "ts", "event_type", "vm")
    )
    l = e.filter(F.col("event_id") % 4 == 0).alias("l")
    r = e.filter(F.col("event_id") % 4 == 1).alias("r")
    cutoff = F.lit("2024-01-28 00:00:00").cast("timestamp")
    j = l.join(
        r,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + INTERVAL 1 HOUR"
        ),
        "fullOuter",
    )
    return (
        j.filter(
            (F.col("l.ts").isNull() | (F.col("l.ts") < cutoff))
            & (F.col("r.ts").isNull() | (F.col("r.ts") < cutoff))
        )
        .groupBy(
            F.coalesce(F.col("l.event_type"), F.col("r.event_type")).alias(
                "etype"
            ),
            F.col("l.vm").isNull().alias("left_null"),
            F.col("r.vm").isNull().alias("right_null"),
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.coalesce("l.vm", F.lit(0)) + F.coalesce("r.vm", F.lit(0))
            )
            .cast("long")
            .alias("milli_sum"),
        )
        .orderBy("etype", "left_null", "right_null")
    )


def test_full_outer_matches_batch_full_join(spark, sf_dir):
    """Every settled row — matched, left-only, right-only — must agree
    with the batch FULL JOIN under the same cutoff: early nulls, a
    missing right-side eviction, or double emission all diverge."""
    from mysql_cdc_table_spark.operators.round12 import (
        stream_stream_full_outer,
    )

    got = [tuple(r) for r in stream_stream_full_outer(spark, sf_dir).collect()]
    want = [tuple(r) for r in _batch_full_outer(spark, sf_dir).collect()]
    assert got == want
    assert len(got) > 0


def test_full_outer_emits_all_three_statuses(spark, sf_dir):
    """The readout must contain matched rows AND unmatched rows from
    BOTH sides — a left-outer join in disguise would have no
    (left_null=true) rows; an inner join would have neither."""
    from mysql_cdc_table_spark.operators.round12 import (
        stream_stream_full_outer,
    )

    rows = stream_stream_full_outer(spark, sf_dir).collect()
    statuses = {(r["left_null"], r["right_null"]) for r in rows}
    assert (False, False) in statuses  # matched
    assert (False, True) in statuses  # left-only (right evicted null)
    assert (True, False) in statuses  # right-only (left evicted null)


# --- streaming IVM ------------------------------------------------------------


def test_ivm_streaming_equals_batch_bidi(spark, sf_dir):
    """The foreachBatch maintenance must converge to EXACTLY the view
    the batch bidi key computes — same algebra, two execution modes
    (the r11 verdict's 'same code batch and streaming' ask)."""
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_join_view_bidi
    from mysql_cdc_table_spark.operators.round12 import cdc_ivm_streaming_view

    got = [tuple(r) for r in cdc_ivm_streaming_view(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in cdc_ivm_join_view_bidi(spark, sf_dir).collect()
    ]
    assert got == want
    assert len(got) > 5


def test_ivm_streaming_restart_resumes_from_checkpoint(spark, sf_dir):
    """Kill-and-restart proof: drain HALF the feed files with stream
    #1, then reveal the rest and start stream #2 on the SAME
    checkpoint — it must resume (new batch ids, old versions retired),
    and the final view must equal the batch recompute. A restart that
    reprocesses batch 0 double-applies deltas and breaks equality."""
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_join_view_bidi
    from mysql_cdc_table_spark.operators.round12 import (
        _ivm_versions,
        ivm_view_stream,
        multiplexed_ivm_feed,
        read_ivm_view,
    )

    root = os.path.join(tempfile.gettempdir(), f"ivmrestart_{uuid.uuid4().hex[:12]}")
    full_dir, feed_dir = f"{root}/full", f"{root}/feed"
    state_dir, ckpt = f"{root}/state", f"{root}/ckpt"
    feed = multiplexed_ivm_feed(spark, sf_dir)
    feed.repartition(4).write.mode("overwrite").parquet(full_dir)
    parts = sorted(
        f for f in os.listdir(full_dir) if f.endswith(".parquet")
    )
    assert len(parts) == 4
    os.makedirs(feed_dir)

    def run(files):
        for f in files:
            shutil.copy(os.path.join(full_dir, f), os.path.join(feed_dir, f))
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = ivm_view_stream(stream, state_dir, ckpt).trigger(
            availableNow=True
        ).start()
        q.awaitTermination()

    run(parts[:2])  # stream #1 sees only half the feed, then terminates
    after_first = _ivm_versions(spark, state_dir)
    assert max(after_first) == 1  # batches 0,1 committed
    mid = [tuple(r) for r in read_ivm_view(spark, state_dir).collect()]

    run(parts[2:])  # stream #2: same checkpoint, resumes at batch 2
    after_second = _ivm_versions(spark, state_dir)
    assert max(after_second) == 3  # batches 2,3 ran — no reprocessing
    got = [tuple(r) for r in read_ivm_view(spark, state_dir).collect()]
    want = [
        tuple(r) for r in cdc_ivm_join_view_bidi(spark, sf_dir).collect()
    ]
    assert got == want
    assert mid != got  # the second half genuinely moved the view
    shutil.rmtree(root, ignore_errors=True)


def test_ivm_apply_batch_replay_is_idempotent(spark, sf_dir):
    """foreachBatch replays the last batch after a crash: applying the
    SAME (batch_df, batch_id) twice must leave state identical to one
    application — the version rename is the commit."""
    from mysql_cdc_table_spark.operators.round12 import (
        _ivm_read_state,
        ivm_apply_batch,
        multiplexed_ivm_feed,
        read_ivm_view,
    )

    state_dir = os.path.join(
        tempfile.gettempdir(), f"ivmreplay_{uuid.uuid4().hex[:12]}"
    )
    feed = multiplexed_ivm_feed(spark, sf_dir)
    half1 = feed.filter(F.col("o_custkey") % 2 == 0)
    half2 = feed.filter(F.col("o_custkey") % 2 == 1)
    ivm_apply_batch(spark, half1, state_dir, 0)
    once = [tuple(r) for r in read_ivm_view(spark, state_dir).collect()]
    ivm_apply_batch(spark, half1, state_dir, 0)  # crash-replay of batch 0
    twice = [tuple(r) for r in read_ivm_view(spark, state_dir).collect()]
    assert once == twice
    # and the L store did not double-accumulate either
    l_once = {
        tuple(r)
        for r in _ivm_read_state(spark, state_dir)["L"].collect()
    }
    ivm_apply_batch(spark, half1, state_dir, 0)
    assert {
        tuple(r)
        for r in _ivm_read_state(spark, state_dir)["L"].collect()
    } == l_once
    ivm_apply_batch(spark, half2, state_dir, 1)  # finish the feed
    shutil.rmtree(state_dir, ignore_errors=True)


def test_ivm_batch_partition_invariance(spark, sf_dir):
    """The bilinear rule must give the same final view for ANY chop of
    the feed into batches — 1 batch vs 3 skewed batches. This is the
    property that makes the staged file order irrelevant."""
    from mysql_cdc_table_spark.operators.round12 import (
        ivm_apply_batch,
        multiplexed_ivm_feed,
        read_ivm_view,
    )

    feed = multiplexed_ivm_feed(spark, sf_dir)
    views = []
    for splits in ([feed], [
        feed.filter(F.col("o_custkey") % 3 == 0),
        feed.filter(F.col("o_custkey") % 3 == 1),
        feed.filter(F.col("o_custkey") % 3 == 2),
    ]):
        state_dir = os.path.join(
            tempfile.gettempdir(), f"ivmsplit_{uuid.uuid4().hex[:12]}"
        )
        for i, b in enumerate(splits):
            ivm_apply_batch(spark, b, state_dir, i)
        views.append(
            [tuple(r) for r in read_ivm_view(spark, state_dir).collect()]
        )
        shutil.rmtree(state_dir, ignore_errors=True)
    assert views[0] == views[1]
    assert len(views[0]) > 5


# --- persisted IVF ------------------------------------------------------------


def test_persisted_ivf_equals_in_session(spark, sf_dir):
    """The index loaded from storage must answer EXACTLY like the
    in-session trained path — same vec_ids, same cells, same cosines.
    Runs twice so the second call exercises the pure-load path."""
    from mysql_cdc_table_spark.functions.similarity import (
        ann_ivf_persisted_topk,
        ann_ivf_trained_topk,
        ivf_index_dir,
    )

    shutil.rmtree(ivf_index_dir(sf_dir), ignore_errors=True)
    built = [tuple(r) for r in ann_ivf_persisted_topk(spark, sf_dir).collect()]
    want = [tuple(r) for r in ann_ivf_trained_topk(spark, sf_dir).collect()]
    assert built == want
    loaded = [
        tuple(r) for r in ann_ivf_persisted_topk(spark, sf_dir).collect()
    ]
    assert loaded == want


def test_persisted_ivf_prunes_partitions_at_scan(spark, sf_dir):
    """The probe's cell list must reach the postings scan as a
    PARTITION filter — the 100 TB economics (read ~n_probe/|cells| of
    the corpus) only hold if pruning happens at the file listing, not
    post-scan."""
    from mysql_cdc_table_spark.functions.similarity import (
        ann_ivf_persisted_topk,
    )

    plan = formatted_plan(ann_ivf_persisted_topk(spark, sf_dir))
    scan = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "cid" in line
    ]
    assert scan, plan  # the postings scan carries a cid partition filter


def test_persisted_ivf_index_layout(spark, sf_dir):
    """The on-disk index is the production layout: a broadcastable
    centroid grid and cid-partitioned postings directories."""
    from mysql_cdc_table_spark.functions.similarity import (
        ann_ivf_persisted_topk,
        ivf_index_dir,
    )

    ann_ivf_persisted_topk(spark, sf_dir)  # ensure built
    idx = ivf_index_dir(sf_dir)
    assert os.path.isdir(os.path.join(idx, "centroids"))
    cid_dirs = [
        d
        for d in os.listdir(os.path.join(idx, "postings"))
        if d.startswith("cid=")
    ]
    assert len(cid_dirs) > 1  # genuinely partitioned by cell
