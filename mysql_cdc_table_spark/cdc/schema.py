"""Changelog schema builder.

Mirrors the reference's output relation: the target table's DDL columns
positionally, plus metadata columns intercepted by name during decode
(reference binlog_table_reader.cc:126-142 — ``__op``/``__gtid``/``__tm``
are matched on field name and synthesized, not decoded from the row
image). We additionally carry three ordering columns the reference gets
implicitly from single-threaded emission order (file order x within-file
offset; SURVEY §7 "hard parts"): ``__file_seq``, ``__event_seq``,
``__image_seq``. Any operator that relies on "the next row" (update
before/after adjacency, reference binlog_table_reader.cc:385-388) must
key on these instead — emission order does not survive a shuffle.
"""

from __future__ import annotations

from pyspark.sql import types as T

# __op codes, byte-compatible with the reference:
CDC_DELETE = 0  # binlog_table_reader.cc:277-280
CDC_INSERT = 1  # binlog_table_reader.cc:211-214
CDC_UPDATE_BEFORE = 2  # binlog_table_reader.cc:351-354
CDC_UPDATE_AFTER = 3  # binlog_table_reader.cc:126-130

METADATA_FIELDS = [
    T.StructField("__op", T.IntegerType(), False),
    T.StructField("__gtid", T.LongType(), True),  # GNO only — single-source
    T.StructField("__tm", T.TimestampType(), True),  # second resolution
]

ORDERING_FIELDS = [
    T.StructField("__file_seq", T.IntegerType(), True),
    T.StructField("__event_seq", T.LongType(), True),
    T.StructField("__image_seq", T.IntegerType(), False),
]

METADATA_COLS = [f.name for f in METADATA_FIELDS]
ORDERING_COLS = [f.name for f in ORDERING_FIELDS]


def changelog_schema(target: T.StructType, ordering: bool = True) -> T.StructType:
    """Target DDL schema + CDC metadata (+ ordering) columns."""
    clash = {f.name for f in target.fields} & set(METADATA_COLS + ORDERING_COLS)
    if clash:
        raise ValueError(f"target schema may not contain reserved columns {clash}")
    fields = list(target.fields) + list(METADATA_FIELDS)
    if ordering:
        fields += list(ORDERING_FIELDS)
    return T.StructType(fields)


def target_columns(changelog: T.StructType) -> list[str]:
    """The non-metadata columns of a changelog schema, in declared order."""
    reserved = set(METADATA_COLS + ORDERING_COLS)
    return [f.name for f in changelog.fields if f.name not in reserved]
