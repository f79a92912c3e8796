"""Derived CDC operators: the state-deriving idioms the reference's users
write in MySQL SQL over the changelog, shipped here as library functions.

The reference materializes nothing (append-only replay from file 0 on
every scan, reference binlogdb.cc:487); "current state" is always a
query. These operators are that query surface, built shuffle-consciously:

- latest_state / snapshot_at: one hash-partition shuffle on the key, then
  a partition-local window — the minimum possible for a global
  per-key reduction. At 100 TB the changelog would be bucketed or
  range-partitioned by key so this shuffle disappears entirely.
- update_pairs: a self-join on (__gtid, __event_seq) — both sides share
  the partitioning, so AQE plans a single shuffle each; at scale this is
  the co-partitioned case (no broadcast needed, keys are unique per pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.cdc.schema import (
    CDC_DELETE,
    CDC_UPDATE_AFTER,
    CDC_UPDATE_BEFORE,
)


def _latest_window(key_cols: list[str]):
    # Total order of images per key: transaction order (__gtid), then
    # within-event image order (after-image wins over before-image).
    return Window.partitionBy(*key_cols).orderBy(
        F.col("__gtid").desc(), F.col("__event_seq").desc(), F.col("__image_seq").desc()
    )


def latest_state(
    changelog: DataFrame, key_cols: list[str], strategy: str = "window"
) -> DataFrame:
    """Current-state snapshot: the newest image per key, minus deleted keys.

    Equivalent to the reference idiom ``latest __gtid per key`` run
    through MySQL; deletes tombstone the whole key.

    strategy='window' (default since r15): the row_number()==1 plan —
    one hash shuffle, ONE post-shuffle sort, rank+filter.
    strategy='agg': max_by(row, (gtid, event_seq, image_seq)). The row
    struct keeps the buffer out of HashAggregate, so this plans as
    SortAggregate — a partial map-side sort of EVERY input partition
    plus a final post-shuffle sort. r15 measurement at sf0.1 (noop
    sink, min-of-5): window 0.78s vs agg 1.46s — the double sort costs
    ~2x and the map-side pre-reduction only pays it back when keys
    cluster within input partitions (time-ordered changelogs see
    ~2-3 adjacent images per key; callers with key-clustered or
    bucketed input should pass 'agg', e.g. cdc_fk_orphan_audit keeps
    it for its windowless plan contract). Both strategies cost exactly
    one exchange; results are identical (parity-tested).
    """
    if strategy == "window":
        ranked = changelog.withColumn(
            "__rn", F.row_number().over(_latest_window(key_cols))
        )
        return ranked.filter(
            (F.col("__rn") == 1) & (F.col("__op") != CDC_DELETE)
        ).drop("__rn")

    cols = changelog.columns
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("__gtid"), F.col("__event_seq"), F.col("__image_seq"))
    latest = (
        changelog.groupBy(*key_cols)
        .agg(F.max_by(row, order).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols if c not in key_cols],
                *key_cols)
        .select(*cols)  # restore original column order
    )
    return latest.filter(F.col("__op") != CDC_DELETE)


def snapshot_at(changelog: DataFrame, key_cols: list[str], gtid: int | None = None,
                gtid_col=None) -> DataFrame:
    """Point-in-time snapshot: state as of transaction ``gtid`` (inclusive)."""
    bound = F.lit(gtid) if gtid_col is None else gtid_col
    return latest_state(changelog.filter(F.col("__gtid") <= bound), key_cols)


def update_pairs(changelog: DataFrame, key_cols: list[str]) -> DataFrame:
    """Re-pair UPDATE before/after images onto one row.

    The reference guarantees adjacency by emission order (stash after-image,
    emit on next call — binlog_table_reader.cc:385-388, :103-161); under a
    shuffle that ordering is gone, so we join on the carried keys
    (__gtid, __event_seq) instead.
    """
    val_cols = [c for c in changelog.columns if not c.startswith("__")]
    before = changelog.filter(F.col("__op") == CDC_UPDATE_BEFORE).select(
        *key_cols,
        "__gtid",
        "__event_seq",
        *[F.col(c).alias(f"before_{c}") for c in val_cols if c not in key_cols],
    )
    after = changelog.filter(F.col("__op") == CDC_UPDATE_AFTER).select(
        *key_cols,
        "__gtid",
        "__event_seq",
        "__tm",
        *[F.col(c).alias(f"after_{c}") for c in val_cols if c not in key_cols],
    )
    return before.join(after, [*key_cols, "__gtid", "__event_seq"], "inner")


def snapshot_at_time(changelog: DataFrame, key_cols: list[str], ts) -> DataFrame:
    """Time-travel snapshot: state as of wall-clock ``ts`` (inclusive),
    using the reference's second-resolution __tm commit timestamps."""
    return latest_state(changelog.filter(F.col("__tm") <= F.lit(ts)), key_cols)


def scd2(changelog: DataFrame, key_cols: list[str]) -> DataFrame:
    """Build a type-2 slowly-changing dimension from the changelog: one
    validity interval per surviving image (inserts + update after-images);
    an interval closes at the next change's __tm (NULL = current), and a
    delete closes the last interval without opening one.

    One shuffle (window by key); interval construction is lead() over the
    same partitioning — no extra exchange.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__gtid").asc(), F.col("__event_seq").asc(), F.col("__image_seq").asc()
    )
    # versions = images that establish state; deletes participate only to
    # close the previous interval.
    versions = changelog.filter(F.col("__op") != CDC_UPDATE_BEFORE)
    nxt_tm = F.lead("__tm").over(w)
    nxt_op = F.lead("__op").over(w)
    out = versions.select(
        *key_cols,
        *[c for c in changelog.columns if not c.startswith("__") and c not in key_cols],
        "__op",
        "__gtid",
        F.col("__tm").alias("valid_from"),
        nxt_tm.alias("valid_to"),
        (nxt_op.isNull()).alias("is_current"),
    )
    return out.filter(F.col("__op") != CDC_DELETE).drop("__op")


def changes_between(
    changelog: DataFrame, key_cols: list[str], gtid_from, gtid_to
) -> DataFrame:
    """Net effect per key over the half-open transaction window
    (gtid_from, gtid_to]: the newest image inside the window plus a
    ``net_op`` classifying the transition — the diff feed a downstream
    consumer applies to move from snapshot(gtid_from) to
    snapshot(gtid_to). net_op: 'delete' (key removed), 'upsert' (created
    or changed)."""
    window_rows = changelog.filter(
        (F.col("__gtid") > gtid_from) & (F.col("__gtid") <= gtid_to)
    )
    cols = changelog.columns
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("__gtid"), F.col("__event_seq"), F.col("__image_seq"))
    last = (
        window_rows.groupBy(*key_cols)
        .agg(F.max_by(row, order).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols if c not in key_cols],
                *key_cols)
        .select(*cols)
    )
    return last.withColumn(
        "net_op",
        F.when(F.col("__op") == CDC_DELETE, "delete").otherwise("upsert"),
    )


def snapshot_diff(
    changelog: DataFrame, key_cols: list[str], gtid_a, gtid_b
) -> DataFrame:
    """State-based diff (the dual of changes_between's log-based diff):
    full-outer join of snapshot(gtid_a) vs snapshot(gtid_b), classifying
    each key as added / removed / changed (unchanged keys drop out).
    Returns key cols + diff_op + the b-side image columns (NULL for
    removed keys)."""
    from pyspark.sql import Column

    as_col = lambda g: g if isinstance(g, Column) else F.lit(g)
    a = snapshot_at(changelog, key_cols, gtid_col=as_col(gtid_a))
    b = snapshot_at(changelog, key_cols, gtid_col=as_col(gtid_b))
    val_cols = [c for c in changelog.columns if c not in key_cols]
    a_sel = a.select(*key_cols, *[F.col(c).alias(f"a_{c}") for c in val_cols])
    b_sel = b.select(*key_cols, *[F.col(c).alias(f"b_{c}") for c in val_cols])
    j = a_sel.join(b_sel, key_cols, "full")
    in_a = F.col("a___gtid").isNotNull()
    in_b = F.col("b___gtid").isNotNull()
    diff_op = (
        F.when(~in_a & in_b, "added")
        .when(in_a & ~in_b, "removed")
        .when(F.col("a___gtid") != F.col("b___gtid"), "changed")
    )
    out = j.withColumn("diff_op", diff_op).filter(F.col("diff_op").isNotNull())
    return out.select(
        *key_cols,
        "diff_op",
        *[F.col(f"b_{c}").alias(c) for c in val_cols if not c.startswith("__")],
        F.col("b___gtid").alias("__gtid_b"),
        F.col("a___gtid").alias("__gtid_a"),
    )


def op_counts(changelog: DataFrame) -> DataFrame:
    """Audit: row count per CDC op code (map-side combinable)."""
    return changelog.groupBy("__op").agg(F.count("*").alias("n")).orderBy("__op")


def changes_per_key(changelog: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key change history summary."""
    return changelog.groupBy(*key_cols).agg(
        F.count("*").alias("n_images"),
        F.sum(F.when(F.col("__op") == CDC_UPDATE_AFTER, 1).otherwise(0)).alias(
            "n_updates"
        ),
        F.max(F.when(F.col("__op") == CDC_DELETE, 1).otherwise(0)).alias("deleted"),
        F.min("__gtid").alias("first_gtid"),
        F.max("__gtid").alias("last_gtid"),
    )
