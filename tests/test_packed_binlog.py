"""Packed-binary decode tests: round-trip the packed format through the
mapInPandas source, covering NULL bits, multi-image updates, multi-row
events, table-id filtering, and agreement with the envelope decode."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from mysql_cdc_table_spark.cdc import latest_state
from mysql_cdc_table_spark.sources.packed_binlog import (
    EVENT_INPUT_SCHEMA,
    decode_packed,
    encode_event,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("amt", T.DoubleType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("at", T.TimestampType()),
    ]
)

TS = datetime(2024, 3, 1, 12, 0, 0)


def _events():
    mk = lambda **kw: {"id": None, "v": None, "amt": None, "n": None, "at": None, **kw}
    return [
        # insert with all types populated
        (encode_event(7, 1, [mk(id=1, v="hello", amt=1.25, n=42, at=TS)], TARGET),
         10, 1_700_000_000, 1, 100),
        # insert with NULLs (null-bit path: value bytes absent)
        (encode_event(7, 1, [mk(id=2)], TARGET), 11, 1_700_000_060, 1, 110),
        # update: before+after in ONE event -> op 2 then op 3
        (encode_event(7, 2, [mk(id=1, v="hello", amt=1.25, n=42, at=TS),
                             mk(id=1, v="unicode-é中", amt=2.5, n=-7, at=TS)],
                      TARGET),
         12, 1_700_000_120, 2, 120),
        # other table: must be dropped by the table-id filter
        (encode_event(99, 1, [mk(id=500, v="other", amt=0.0, n=0, at=TS)], TARGET),
         13, 1_700_000_180, 2, 130),
        # delete tombstone
        (encode_event(7, 0, [mk(id=2)], TARGET), 14, 1_700_000_240, 2, 140),
    ]


@pytest.fixture()
def changelog(spark):
    df = spark.createDataFrame(_events(), EVENT_INPUT_SCHEMA)
    return decode_packed(df, TARGET, table_id=7)


def test_decode_all_images_and_ops(changelog):
    rows = sorted(changelog.collect(), key=lambda r: (r["__gtid"], r["__image_seq"]))
    assert [r["__op"] for r in rows] == [1, 1, 2, 3, 0]
    assert rows[0]["v"] == "hello" and rows[0]["n"] == 42 and rows[0]["amt"] == 1.25
    assert rows[0]["at"] == TS
    # NULL row: null bits set, no value bytes consumed
    assert rows[1]["v"] is None and rows[1]["amt"] is None and rows[1]["at"] is None
    # update pair shares gtid/event_seq, image_seq 0/1, utf-8 survives
    assert rows[2]["__event_seq"] == rows[3]["__event_seq"] == 120
    assert rows[3]["v"] == "unicode-é中" and rows[3]["n"] == -7


def test_table_id_filter(changelog):
    assert changelog.filter("id = 500").count() == 0


def test_decoded_changelog_composes_with_cdc_ops(changelog):
    state = {r["id"]: r for r in latest_state(changelog, ["id"]).collect()}
    assert set(state) == {1}  # id=2 deleted
    assert state[1]["v"] == "unicode-é中" and state[1]["amt"] == 2.5


def test_second_resolution_tm(changelog):
    tms = {r["__gtid"]: r["__tm"] for r in changelog.collect()}
    assert tms[10] == datetime(2023, 11, 14, 22, 13, 20)
    assert tms[12] == datetime(2023, 11, 14, 22, 15, 20)
