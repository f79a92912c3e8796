"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check (flagship query at sf0.001).
``queries()`` / ``oracle_sql()`` serve the full operator registry from
``mysql_cdc_table_spark.operators`` — one pair per implemented operator
from SURVEY.md §2; the driver compares each against DuckDB at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mysql_cdc_table_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mysql_cdc_table_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() key (keys without
    an oracle get the driver's weaker rows-only check)."""
    from mysql_cdc_table_spark.operators import all_oracles

    return all_oracles()
