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
