"""Batch sources/sinks beyond the core parquet scan: partitioned parquet
writes (the layout that makes 100 TB queryable), CSV and JSON ingest
with explicit schemas (never inference — an extra full pass at scale),
and ordered multi-file ingestion mirroring the reference's index-file
contract (reference binlog_table_reader.cc:12-19, :39-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout: queries filtering on the partition
    columns prune directories at planning time (PartitionFilters in the
    scan node) — the difference between scanning 100 TB and one
    partition's worth."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_ordered_files(
    spark: SparkSession, index: list[str], schema: T.StructType, fmt: str = "json"
) -> DataFrame:
    """The reference's binlog.index contract: an explicit ordered list of
    files. Order inside the engine comes from carried sequence columns,
    never from file-listing order (which no distributed engine preserves);
    this reader just scopes the scan to exactly the indexed files."""
    reader = spark.read.schema(schema)
    return reader.format(fmt).load(index)
