"""Round-15 optimization parity tests: the one-shot spark.sql builds
must be value- and schema-identical to the original per-branch
DataFrame builders they replaced (guide §7.3 — plan-construction cost —
is the only thing the rewrites were allowed to change)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _assert_same(a, b):
    assert [(f.name, f.dataType) for f in a.schema] == [
        (f.name, f.dataType) for f in b.schema
    ]
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_sql_changelog_matches_dataframe_build(spark):
    from mysql_cdc_table_spark.cdc.synthetic import (
        synthetic_changelog,
        synthetic_changelog_df,
    )

    _assert_same(synthetic_changelog(spark, SF), synthetic_changelog_df(spark, SF))


def test_sql_dim_changelog_matches_dataframe_build(spark):
    from mysql_cdc_table_spark.operators.round11 import (
        _dim_changelog,
        _dim_changelog_df,
    )

    _assert_same(_dim_changelog(spark, SF), _dim_changelog_df(spark, SF))


def test_require_shingles_filter_matches_posthoc_size_filter(spark):
    """The r15 pre-exchange token-count predicate (require_shingles=True)
    must keep exactly the documents the old post-hoc size(sh) > 0 filter
    kept: shingles exist iff the document has >= 3 tokens."""
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.functions.text import _doc_shingles

    _assert_same(
        _doc_shingles(spark, SF, require_shingles=True),
        _doc_shingles(spark, SF).filter(F.size("sh") > 0),
    )


def test_grid_prefix_prev2_matches_naive_window(spark):
    """_grid_prefix_prev2 (two-column bucketed prefix sum, r15 in-plan
    percentile bounds) must equal the naive unpartitioned running sums
    for both sides on a synthetic grid with ties and gaps."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.operators.round10 import _grid_prefix_prev2

    rows = [
        (vm, (vm * 7) % 5, (vm * 3) % 4)
        for vm in [-50, -3, 0, 1, 2, 8, 9, 100, 101, 5000]
    ]
    grid = spark.createDataFrame(rows, "vm long, c1 long, c2 long")
    got = {
        r["vm"]: (r["prev1"], r["prev2"])
        for r in _grid_prefix_prev2(grid).collect()
    }
    w = Window.orderBy("vm").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["vm"]: (r["p1"], r["p2"])
        for r in grid.select(
            "vm",
            F.coalesce(F.sum("c1").over(w), F.lit(0)).alias("p1"),
            F.coalesce(F.sum("c2").over(w), F.lit(0)).alias("p2"),
        ).collect()
    }
    assert got == want


def test_spread_narrow_scan_gate_and_parity(spark):
    """spread_narrow_scan must (a) report the single-row-group bench
    inputs as narrow and spread them to the scheduler's parallelism,
    (b) keep exactly the same rows, and (c) no-op when the input
    already offers enough chunks."""
    from mysql_cdc_table_spark.catalog import scan_chunks, spread_narrow_scan
    from mysql_cdc_table_spark.operators._util import t

    dp = spark.sparkContext.defaultParallelism
    assert scan_chunks(spark, SF, "lineitem") == 1
    base = t(spark, SF, "lineitem")
    spread = spread_narrow_scan(spark, SF, "lineitem", base, "l_suppkey")
    assert spread.rdd.getNumPartitions() == dp
    assert spread.exceptAll(base).count() == 0
    assert base.exceptAll(spread).count() == 0
    # chunk-rich input (simulated by monkeypatching the cached count)
    from mysql_cdc_table_spark import catalog as cat

    key = None
    for k in list(cat._SCHEMA_CACHE):
        if k[0] == "rg" and k[2].endswith("lineitem.parquet"):
            key = k
    assert key is not None
    old = cat._SCHEMA_CACHE[key]
    try:
        cat._SCHEMA_CACHE[key] = 10_000
        assert spread_narrow_scan(spark, SF, "lineitem", base, "l_suppkey") is base
    finally:
        cat._SCHEMA_CACHE[key] = old
