"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01). Queries without
an oracle get a rows-run smoke check instead, mirroring the driver."""

from __future__ import annotations

import pytest

from mysql_cdc_table_spark.operators import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    from tests._parity import compare

    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, ORACLES[name], sf_dir, name=name)
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
