"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_cdc_table_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame (parquet scan; Catalyst prunes)."""
    return load_table(spark, sf_dir, name)
