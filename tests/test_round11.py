"""Round-11 operator tests: two-sided join-view IVM, distinct-count IVM
support table, FK-orphan audit across two CDC feeds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_table_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    count_nodes,
    formatted_plan,
)


def _latest(df, key):
    from mysql_cdc_table_spark.cdc import ops

    return ops.latest_state(df, key)


def _recomputed_bidi_view(spark, sf_dir):
    """Ground truth for the bidi IVM: full recompute from BOTH latest
    states (the maintained view's definition, not its delta plan)."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round11 import _dim_changelog

    lo = _latest(synthetic_changelog(spark, sf_dir), ["o_orderkey"])
    rd = (
        _dim_changelog(spark, sf_dir)
        .groupBy("c_custkey")
        .agg(
            F.expr(
                "max_by(struct(__op, c_nationkey), struct(__gtid, __image_seq))"
            ).alias("last")
        )
        .filter(F.col("last.__op") != 0)
        .select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("last.c_nationkey").alias("c_nationkey"),
        )
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        lo.join(rd, "o_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(cents).cast("long").alias("cents_sum"),
        )
        .orderBy("c_nationkey")
    )


def test_bidi_ivm_equals_full_recompute(spark, sf_dir):
    """The two-epoch delta maintenance must reproduce the view's full
    recompute exactly — every nation, count AND cents."""
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_join_view_bidi

    got = cdc_ivm_join_view_bidi(spark, sf_dir).collect()
    want = _recomputed_bidi_view(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 5  # nations actually present


def test_bidi_ivm_epoch_split_equals_single_shot_bilinear(spark, sf_dir):
    """The 3-term epoch decomposition (V1 + ΔL⋈R_new + L_old⋈ΔR) must
    telescope to the single-shot bilinear form γ(ΔL_all ⋈ ΔR_all) —
    the algebraic identity the maintenance relies on. A dropped
    cross-term or a term joined against the wrong dim snapshot breaks
    this, even when the full recompute above happens to agree."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round11 import (
        _dim_changelog,
        cdc_ivm_join_view_bidi,
    )

    cl = synthetic_changelog(spark, sf_dir)
    sgn = F.when(F.col("__op").isin(1, 3), F.lit(1)).otherwise(F.lit(-1))
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    l_all = (
        cl.select("o_custkey", sgn.alias("sgn"), (sgn * cents).alias("dc"))
        .groupBy("o_custkey")
        .agg(F.sum("sgn").alias("dn"), F.sum("dc").alias("dcents"))
    )
    dim = _dim_changelog(spark, sf_dir)
    rsgn = F.when(F.col("__op").isin(1, 3), F.lit(1)).otherwise(F.lit(-1))
    r_all = dim.select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey", rsgn.alias("rsgn")
    )
    single = (
        l_all.join(F.broadcast(r_all), "o_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("rsgn") * F.col("dn")).cast("long").alias("n_rows"),
            F.sum(F.col("rsgn") * F.col("dcents")).cast("long").alias("cents_sum"),
        )
        .filter(F.col("n_rows") > 0)
        .orderBy("c_nationkey")
    ).collect()
    got = cdc_ivm_join_view_bidi(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in single]


def test_bidi_ivm_dim_churn_is_visible(spark, sf_dir):
    """The dim feed must actually move rows: nations gain the c%4==0
    customers' orders at (nation+7)%25 and lose deleted (c%11==0)
    customers' orders — a stable-dim plan (the r10 one-sided key)
    produces a DIFFERENT view. Guard that the two keys genuinely
    disagree, so the bidi key can't silently degrade to one-sided."""
    from mysql_cdc_table_spark.operators.round10 import cdc_ivm_join_view
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_join_view_bidi

    one_sided = {
        r["c_nationkey"]: (r["n_rows"], r["cents_sum"])
        for r in cdc_ivm_join_view(spark, sf_dir).collect()
    }
    bidi = {
        r["c_nationkey"]: (r["n_rows"], r["cents_sum"])
        for r in cdc_ivm_join_view_bidi(spark, sf_dir).collect()
    }
    assert one_sided != bidi
    # deletions shrink the total row count
    assert sum(v[0] for v in bidi.values()) < sum(
        v[0] for v in one_sided.values()
    )


def test_bidi_ivm_plan_no_window_no_smj(spark, sf_dir):
    """Neither delta path may rank or sort: zero Window nodes, every
    dim join a broadcast, no sort-merge join, no cartesian — the
    100 TB contract (deltas fold map-side, dim broadcasts)."""
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_join_view_bidi

    df = cdc_ivm_join_view_bidi(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0, plan
    assert count_nodes(df, "SortMergeJoin") == 0, plan
    assert_broadcast_join(df, 3)  # one per delta term
    assert "partial" in plan.lower()  # map-side combine on the folds


def test_distinct_view_equals_latest_state_distinct(spark, sf_dir):
    """Support-table maintenance must equal COUNT(DISTINCT) over the
    ranked latest state."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_distinct_view

    got = cdc_ivm_distinct_view(spark, sf_dir).collect()
    want = (
        _latest(synthetic_changelog(spark, sf_dir), ["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").cast("long").alias("n_customers"))
        .orderBy("o_orderstatus")
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) >= 2  # original + 'U'/'U2' statuses


def test_distinct_view_plan_two_hash_aggs_no_window(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round11 import cdc_ivm_distinct_view

    df = cdc_ivm_distinct_view(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(df, "Window") == 0, plan
    assert count_nodes(df, "Join") == 0, plan
    assert "partial" in plan.lower()


def test_fk_orphan_audit_orphans_are_exactly_deleted_customers(spark, sf_dir):
    """Every orphan's customer must be one the dim feed deleted
    (c%11==0), and every deleted customer with a surviving order must
    appear — the audit can neither over- nor under-report."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round11 import cdc_fk_orphan_audit

    audit = cdc_fk_orphan_audit(spark, sf_dir).collect()
    assert audit, "sf0.001 must produce orphans (customers % 11 deleted)"

    latest = _latest(synthetic_changelog(spark, sf_dir), ["o_orderkey"])
    expected = (
        latest.filter(F.col("o_custkey") % 11 == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orphans"),
            F.countDistinct("o_custkey").cast("long").alias("n_dead_custs"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
        )
        .orderBy("o_orderstatus")
    ).collect()
    assert [tuple(r) for r in audit] == [tuple(r) for r in expected]


def test_fk_orphan_audit_plan_broadcast_anti_no_window(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round11 import cdc_fk_orphan_audit

    df = cdc_fk_orphan_audit(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0, plan
    assert count_nodes(df, "SortMergeJoin") == 0, plan
    assert "LeftAnti" in plan, plan
    assert_broadcast_join(df, 1)
