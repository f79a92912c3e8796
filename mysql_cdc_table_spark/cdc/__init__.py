"""CDC changelog data model and operators.

The reference exposes a MySQL binlog as a scan-only changelog relation
with metadata columns ``__op`` (0=DELETE, 1=INSERT, 2=UPDATE-before,
3=UPDATE-after — reference binlog_table_reader.cc:277-280, :211-214,
:351-354, :126-130), ``__gtid`` (GNO of the governing GTID event,
:410-416) and ``__tm`` (event-header commit timestamp, second
resolution, :221-225). This package re-expresses that model as Spark
DataFrames: schema builders, a Debezium-envelope decode source, a
deterministic synthetic changelog for differential testing, and the
derived-state operators CDC makes necessary.
"""

from mysql_cdc_table_spark.cdc.ops import (
    latest_state,
    op_counts,
    snapshot_at,
    update_pairs,
)
from mysql_cdc_table_spark.cdc.schema import (
    CDC_DELETE,
    CDC_INSERT,
    CDC_UPDATE_AFTER,
    CDC_UPDATE_BEFORE,
    METADATA_FIELDS,
    changelog_schema,
)
from mysql_cdc_table_spark.cdc.source import cdc_read, decode_envelope

__all__ = [
    "CDC_DELETE",
    "CDC_INSERT",
    "CDC_UPDATE_AFTER",
    "CDC_UPDATE_BEFORE",
    "METADATA_FIELDS",
    "changelog_schema",
    "cdc_read",
    "decode_envelope",
    "latest_state",
    "snapshot_at",
    "update_pairs",
    "op_counts",
]
