"""Round-12 operators.

This round (round-11 verdict asks 2, 3, 7):
- FULL-OUTER watermarked stream-stream join
  (``stream_stream_full_outer``) — the last missing streaming join
  mode next to the r10 inner/left-outer pair;
- STREAMING IVM (``cdc_ivm_streaming_view``): the two-sided join-view
  of ``cdc_ivm_join_view_bidi`` maintained across micro-batches via
  ``foreachBatch`` over a multiplexed fact+dim CDC feed, with a
  versioned exactly-once state store (checkpointed; restart- and
  replay-tested in tests/test_round12.py);
- the persisted-IVF probe path lands in
  ``functions/similarity.py::ann_ivf_persisted_topk`` (train-once /
  probe-many, codebook + cid-partitioned postings round-trip storage).

Reference semantics compared against ``/root/reference`` (a read-only
MySQL-binlog storage engine, SURVEY.md §1): every capability here
EXCEEDS the reference — it has no query engine, no streaming, no IVM
(its query surface is delegated to MySQL's executor, binlogdb.cc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import load_table as t
from mysql_cdc_table_spark.sources import fs as _hfs

QUERIES: dict = {}
ORACLES: dict = {}


# --- full-outer watermarked stream-stream join --------------------------------


def stream_stream_full_outer(
    spark: SparkSession, sf_dir: str, _query_out: list | None = None
) -> DataFrame:
    """FULL-OUTER watermarked stream-stream join — both sides must
    emit their unmatched rows WITH NULLS exactly once, each only when
    the watermark proves no partner can still arrive (left state
    settles at l.ts + 1h, right state at r.ts). Same staged
    two-files-per-side feed as the inner/left-outer keys
    (maxFilesPerTrigger=1 forces multi-batch state), 1-minute
    watermark so the availableNow final flush resolves everything
    below the horizon. The readout keeps only rows whose EXISTING
    side(s) sit below 2024-01-28 — at least two days below the final
    watermark minus the join window at every sf — so matched,
    left-only, and right-only statuses are all deterministically
    settled; the oracle is the equivalent batch FULL JOIN under the
    same cutoff. Early nulls (phantom unmatched), missing right-side
    evictions, or a double emission on either side's eviction break
    the hash. Scale: BOTH sides' state is watermark-bounded — the
    two-sided eviction being tested is what caps state on two
    unbounded 100 TB/day feeds."""
    import hashlib
    import os
    import tempfile
    import uuid

    e = (
        t(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("vm", F.floor(F.col("value") * 1000).cast("long"))
        .select("event_id", "user_id", "ts", "event_type", "vm")
    )
    sides = {
        "l": e.filter(F.col("event_id") % 4 == 0),
        "r": e.filter(F.col("event_id") % 4 == 1),
    }
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{sf_dir}:ssfull".encode()
    ).hexdigest()[:12]
    stages = {}
    for side, df in sides.items():
        stage = os.path.join(
            tempfile.gettempdir(), f"stream_ssfull_{side}_{tag}"
        )
        df.repartition(2).write.mode("overwrite").parquet(stage)
        stages[side] = stage

    def feed(side: str):
        return (
            spark.readStream.schema(sides[side].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stages[side])
            .withWatermark("ts", "1 minute")
            .alias(side)
        )

    joined = feed("l").join(
        feed("r"),
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + INTERVAL 1 HOUR"
        ),
        "fullOuter",
    )
    mem = f"ssfull_{uuid.uuid4().hex[:12]}"
    q = (
        joined.select(
            F.col("l.ts").alias("lts"),
            F.col("r.ts").alias("rts"),
            F.coalesce(F.col("l.event_type"), F.col("r.event_type")).alias(
                "etype"
            ),
            F.col("l.vm").alias("lvm"),
            F.col("r.vm").alias("rvm"),
        )
        .writeStream.format("memory")
        .queryName(mem)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if _query_out is not None:
        _query_out.append(q)
    cutoff = F.lit("2024-01-28 00:00:00").cast("timestamp")
    settled = (F.col("lts").isNull() | (F.col("lts") < cutoff)) & (
        F.col("rts").isNull() | (F.col("rts") < cutoff)
    )
    return (
        spark.table(mem)
        .filter(settled)
        .groupBy(
            "etype",
            F.col("lvm").isNull().alias("left_null"),
            F.col("rvm").isNull().alias("right_null"),
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.coalesce("lvm", F.lit(0)) + F.coalesce("rvm", F.lit(0)))
            .cast("long")
            .alias("milli_sum"),
        )
        .orderBy("etype", "left_null", "right_null")
    )


STREAM_STREAM_FULL_OUTER_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events
), l AS (SELECT * FROM e WHERE event_id % 4 = 0),
   r AS (SELECT * FROM e WHERE event_id % 4 = 1)
SELECT coalesce(l.event_type, r.event_type) AS etype,
       (l.vm IS NULL) AS left_null,
       (r.vm IS NULL) AS right_null,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(coalesce(l.vm, 0) + coalesce(r.vm, 0)) AS BIGINT)
         AS milli_sum
FROM l FULL JOIN r ON l.user_id = r.user_id
  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
WHERE (l.ts IS NULL OR l.ts < TIMESTAMP '2024-01-28 00:00:00')
  AND (r.ts IS NULL OR r.ts < TIMESTAMP '2024-01-28 00:00:00')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["stream_stream_full_outer"] = stream_stream_full_outer
ORACLES["stream_stream_full_outer"] = STREAM_STREAM_FULL_OUTER_SQL


# --- streaming IVM: the bidi join view maintained by foreachBatch -------------
#
# cdc_ivm_join_view_bidi (round 11) proves the bilinear delta rule in a
# two-epoch batch decomposition. This key runs the SAME algebra as a
# live pipeline: one multiplexed CDC feed (fact deltas and dim deltas
# interleaved, the Debezium one-topic-per-server shape), consumed in
# micro-batches by foreachBatch; per batch
#
#     ΔV = ΔL ⋈ R_new + L_old ⋈ ΔR      (R_new = R_old + ΔR)
#
# and the three stores advance L += ΔL, R += ΔR, V += ΔV. Summed over
# any batch partition of the feed, every (ΔL_i, ΔR_j) pair contributes
# exactly once (i<=j through ΔL⋈R_new, i>j through L_old⋈ΔR), so the
# final V equals the one-shot bilinear form REGARDLESS of how the feed
# is chopped into batches — which is what makes the staging here safe:
# batch composition is whatever file order the source picks.
#
# Exactly-once: each batch writes a complete new state version to a
# staging dir and RENAMES it to state/v<batch_id> (atomic on HDFS) —
# a replayed batch finds its version already present and skips. One
# rename commits all three stores together, so there is no torn state.


_IVM_STATE_SCHEMAS = {
    "L": "o_custkey bigint, dn bigint, dcents bigint",
    "R": "o_custkey bigint, c_nationkey bigint, rn bigint",
    "V": "c_nationkey bigint, n_rows bigint, cents_sum bigint",
}


def multiplexed_ivm_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two CDC changelogs of the bidi view multiplexed into ONE
    feed (feed='L' fact deltas / feed='R' dim deltas), each row already
    reduced to its signed contribution — the shape a single CDC topic
    carries. Exact integer arithmetic only (cents = floor(price*100))
    so the accumulated view hashes identically to the batch oracle."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round11 import _dim_changelog

    cl = synthetic_changelog(spark, sf_dir)
    sgn = F.when(F.col("__op").isin(1, 3), F.lit(1)).otherwise(F.lit(-1))
    fact = cl.select(
        F.lit("L").alias("feed"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.lit(None).cast("long").alias("c_nationkey"),
        sgn.cast("long").alias("sgn"),
        (sgn * F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "dcents"
        ),
    )
    dim = _dim_changelog(spark, sf_dir)
    rsgn = F.when(F.col("__op").isin(1, 3), F.lit(1)).otherwise(F.lit(-1))
    dimf = dim.select(
        F.lit("R").alias("feed"),
        F.col("c_custkey").cast("long").alias("o_custkey"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        rsgn.cast("long").alias("sgn"),
        F.lit(0).cast("long").alias("dcents"),
    )
    return fact.unionByName(dimf)


def _ivm_versions(spark: SparkSession, state_dir: str) -> list[int]:
    if not _hfs.exists(spark, state_dir):
        return []
    return sorted(
        int(n[1:])
        for n in _hfs.list_names(spark, state_dir)
        if n.startswith("v") and n[1:].isdigit()
    )


def _ivm_read_state(spark: SparkSession, state_dir: str):
    """(L, R, V) DataFrames of the newest committed version — empty
    relations before the first batch."""
    vs = _ivm_versions(spark, state_dir)
    if not vs:
        return {
            name: spark.createDataFrame([], schema)
            for name, schema in _IVM_STATE_SCHEMAS.items()
        }
    base = f"{state_dir}/v{vs[-1]}"
    return {
        name: spark.read.schema(schema).parquet(f"{base}/{name}")
        for name, schema in _IVM_STATE_SCHEMAS.items()
    }


def ivm_apply_batch(
    spark: SparkSession, batch_df: DataFrame, state_dir: str, batch_id: int
) -> None:
    """One micro-batch of the bilinear maintenance — the foreachBatch
    body. Idempotent: if v<batch_id> is already committed the replay
    returns without touching state (Structured Streaming replays the
    last batch after a crash; the version rename is the commit)."""
    import uuid

    if _hfs.exists(spark, f"{state_dir}/v{batch_id}"):
        return  # replayed batch: already committed
    state = _ivm_read_state(spark, state_dir)

    def fold_l(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.sum("dn").cast("long").alias("dn"),
            F.sum("dcents").cast("long").alias("dcents"),
        )

    dl = fold_l(
        batch_df.filter(F.col("feed") == "L").select(
            "o_custkey",
            F.col("sgn").alias("dn"),
            F.col("dcents"),
        )
    ).localCheckpoint(eager=True)  # ΔL feeds two terms + the L update
    dr = (
        batch_df.filter(F.col("feed") == "R")
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum("sgn").cast("long").alias("rn"))
        .localCheckpoint(eager=True)  # ΔR feeds one term + two updates
    )
    r_new = (
        state["R"].unionByName(dr)
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum("rn").cast("long").alias("rn"))
        .localCheckpoint(eager=True)  # the new R is also a delta input
    )

    def term(lf: DataFrame, rf: DataFrame) -> DataFrame:
        return lf.join(F.broadcast(rf), "o_custkey").select(
            "c_nationkey",
            (F.col("rn") * F.col("dn")).alias("wn"),
            (F.col("rn") * F.col("dcents")).alias("wc"),
        )

    dv = (
        term(dl, r_new)
        .unionByName(term(state["L"], dr))
        .groupBy("c_nationkey")
        .agg(
            F.sum("wn").cast("long").alias("n_rows"),
            F.sum("wc").cast("long").alias("cents_sum"),
        )
    )
    new = {
        "L": fold_l(state["L"].unionByName(dl)),
        "R": r_new,
        "V": state["V"]
        .unionByName(dv)
        .groupBy("c_nationkey")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("cents_sum").cast("long").alias("cents_sum"),
        ),
    }
    staging = f"{state_dir}/.staging-{uuid.uuid4().hex[:12]}"
    for name, df in new.items():
        df.write.mode("overwrite").parquet(f"{staging}/{name}")
    try:
        _hfs.rename(spark, staging, f"{state_dir}/v{batch_id}")
    except Exception:
        _hfs.delete(spark, staging)
        if not _hfs.exists(spark, f"{state_dir}/v{batch_id}"):
            raise
    # retire versions older than the previous one: replay only ever
    # re-asks for the LAST batch, so two live versions bound storage
    for v in _ivm_versions(spark, state_dir)[:-2]:
        _hfs.delete(spark, f"{state_dir}/v{v}")


def ivm_view_stream(
    feed_stream: DataFrame, state_dir: str, checkpoint_path: str,
    query_name: str = "cdc_ivm_stream",
):
    """writeStream wiring of the maintenance — the streaming twin of
    cdc_ivm_join_view_bidi's batch decomposition, same algebra."""
    spark = feed_stream.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ivm_apply_batch(spark, batch_df, state_dir, batch_id)

    return (
        feed_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .queryName(query_name)
    )


def read_ivm_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained view, read from the newest committed version —
    live pairs only (n_rows > 0), nations order, the
    cdc_ivm_join_view_bidi readout shape."""
    v = _ivm_read_state(spark, state_dir)["V"]
    return (
        v.filter(F.col("n_rows") > 0)
        .select("c_nationkey", "n_rows", "cents_sum")
        .orderBy("c_nationkey")
    )


def cdc_ivm_streaming_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bidi join view maintained by a REAL stream: the multiplexed
    feed staged as 4 parquet files, consumed with maxFilesPerTrigger=1
    (so the bilinear rule must hold across >=4 micro-batch seams with
    arbitrary batch composition), foreachBatch advancing the versioned
    L/R/V stores, availableNow to completion — then the view is READ
    BACK from storage. The oracle recomputes the full view from both
    ranked latest states (the cdc_ivm_join_view_bidi oracle verbatim):
    a delta double-applied on replay, a torn multi-store commit, or an
    (i,j) pair counted twice across the batch partition all break the
    per-nation hash. Re-invocation in the same session is a no-op
    resume (checkpoint already drained; state already final) — the
    idempotence is part of what's tested. Restart-after-kill and
    replayed-batch idempotence are additionally pytest-proven
    (tests/test_round12.py). Scale: per batch, ΔL folds map-side to
    its custkey spread, ΔR stays broadcast-sized, V is nations-sized;
    state version commit is one rename regardless of store size."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{sf_dir}:ivmstream".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ivm_stream_{tag}")
    feed_dir, state_dir, ckpt = (
        f"{root}/feed", f"{root}/state", f"{root}/ckpt",
    )
    feed = multiplexed_ivm_feed(spark, sf_dir)
    if not _hfs.exists(spark, feed_dir):
        feed.repartition(4).write.mode("overwrite").parquet(feed_dir)
    stream = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = (
        ivm_view_stream(stream, state_dir, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_ivm_view(spark, state_dir)


def _cdc_ivm_streaming_view_sql() -> str:
    from mysql_cdc_table_spark.operators.round11 import (
        _cdc_ivm_join_view_bidi_sql,
    )

    # the streaming maintenance converges to the SAME view the batch
    # bidi key computes — one oracle, two mechanisms
    return _cdc_ivm_join_view_bidi_sql()


QUERIES["cdc_ivm_streaming_view"] = cdc_ivm_streaming_view
ORACLES["cdc_ivm_streaming_view"] = _cdc_ivm_streaming_view_sql()
