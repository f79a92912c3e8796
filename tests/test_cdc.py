"""CDC-semantics unit tests (SURVEY §5.2): known op sequences per key,
update pairing invariants, latest-state vs hand-fold, point-in-time
replay, file-based cdc_read, and a hypothesis property test."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_cdc_table_spark.cdc import (
    CDC_DELETE,
    CDC_INSERT,
    CDC_UPDATE_AFTER,
    CDC_UPDATE_BEFORE,
    cdc_read,
    decode_envelope,
    latest_state,
    op_counts,
    snapshot_at,
    update_pairs,
)
from mysql_cdc_table_spark.cdc.schema import changelog_schema, target_columns

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)

CL_SCHEMA = changelog_schema(TARGET)


def _row(id, v, amt, op, gtid, image_seq=0, event_seq=None, file_seq=0):
    from datetime import datetime, timedelta

    return (
        id,
        v,
        amt,
        op,
        gtid,
        datetime(2024, 1, 1) + timedelta(seconds=gtid),
        file_seq,
        event_seq if event_seq is not None else gtid,
        image_seq,
    )


@pytest.fixture(scope="module")
def changelog(spark):
    """insert -> update -> update -> delete for key 1; insert+update for 2
    (with NULL transitions); bare insert for 3; interleaved gtids."""
    rows = [
        _row(1, "a", 1.0, CDC_INSERT, 10),
        _row(2, None, None, CDC_INSERT, 11),  # NULL start
        _row(1, "a", 1.0, CDC_UPDATE_BEFORE, 12, image_seq=0),
        _row(1, "b", 2.0, CDC_UPDATE_AFTER, 12, image_seq=1),
        _row(3, "z", 9.0, CDC_INSERT, 13),
        _row(2, None, None, CDC_UPDATE_BEFORE, 14, image_seq=0),
        _row(2, "filled", 5.0, CDC_UPDATE_AFTER, 14, image_seq=1),  # NULL->value
        _row(1, "b", 2.0, CDC_UPDATE_BEFORE, 15, image_seq=0),
        _row(1, None, 3.0, CDC_UPDATE_AFTER, 15, image_seq=1),  # value->NULL
        _row(1, None, 3.0, CDC_DELETE, 16),
    ]
    return spark.createDataFrame(rows, CL_SCHEMA)


def test_target_columns():
    assert target_columns(CL_SCHEMA) == ["id", "v", "amt"]


def test_latest_state_folds_ops(changelog):
    state = {r["id"]: r for r in latest_state(changelog, ["id"]).collect()}
    assert set(state) == {2, 3}  # key 1 deleted
    assert state[2]["v"] == "filled" and state[2]["amt"] == 5.0
    assert state[3]["v"] == "z"


def test_snapshot_at_replays_prefix(changelog):
    # at gtid 13: key1 = post-first-update, key2 = NULL insert, key3 present
    snap = {r["id"]: r for r in snapshot_at(changelog, ["id"], 13).collect()}
    assert set(snap) == {1, 2, 3}
    assert snap[1]["v"] == "b" and snap[1]["amt"] == 2.0
    assert snap[2]["v"] is None
    # at gtid 10 only key1's insert exists
    snap10 = {r["id"]: r for r in snapshot_at(changelog, ["id"], 10).collect()}
    assert set(snap10) == {1} and snap10[1]["v"] == "a"


def test_update_pairs_adjacency(changelog):
    pairs = update_pairs(changelog, ["id"]).collect()
    assert len(pairs) == 3  # two for key 1, one for key 2
    by_gtid = {p["__gtid"]: p for p in pairs}
    assert by_gtid[12]["before_v"] == "a" and by_gtid[12]["after_v"] == "b"
    assert by_gtid[14]["before_v"] is None and by_gtid[14]["after_v"] == "filled"
    assert by_gtid[15]["after_v"] is None  # value->NULL transition


def test_op_counts_conservation(changelog):
    counts = {r["__op"]: r["n"] for r in op_counts(changelog).collect()}
    assert counts == {CDC_DELETE: 1, CDC_INSERT: 3, CDC_UPDATE_BEFORE: 3, CDC_UPDATE_AFTER: 3}
    # each update contributes exactly one before and one after image
    assert counts[CDC_UPDATE_BEFORE] == counts[CDC_UPDATE_AFTER]
    # live keys == inserts - deletes
    live = latest_state(changelog, ["id"]).count()
    assert live == counts[CDC_INSERT] - counts[CDC_DELETE]


def test_cdc_read_from_files(spark, tmp_path):
    """File-based ingest: JSONL envelopes -> changelog rows, with db/table
    filtering (reference A4) and file-name sequence extraction."""
    lines = [
        {"op": "c", "before": None, "after": {"id": 1, "v": "x", "amt": 1.5},
         "source": {"db": "d", "table": "t", "gtid": 7, "file": "binlog.000001",
                    "pos": 100, "ts_ms": 1700000000123}},
        {"op": "u", "before": {"id": 1, "v": "x", "amt": 1.5},
         "after": {"id": 1, "v": "y", "amt": 2.5},
         "source": {"db": "d", "table": "t", "gtid": 8, "file": "binlog.000002",
                    "pos": 50, "ts_ms": 1700000001999}},
        {"op": "d", "before": {"id": 1, "v": "y", "amt": 2.5}, "after": None,
         "source": {"db": "d", "table": "t", "gtid": 9, "file": "binlog.000002",
                    "pos": 80, "ts_ms": 1700000002000}},
        # different table: must be filtered out (reference table-id filter)
        {"op": "c", "before": None, "after": {"id": 99, "v": "no", "amt": 0.0},
         "source": {"db": "d", "table": "other", "gtid": 9, "file": "binlog.000002",
                    "pos": 90, "ts_ms": 1700000002000}},
    ]
    p = tmp_path / "env.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))

    cl = cdc_read(spark, str(p), TARGET, database="d", table="t")
    rows = sorted(cl.collect(), key=lambda r: (r["__gtid"], r["__image_seq"]))
    assert [r["__op"] for r in rows] == [1, 2, 3, 0]
    assert [r["__file_seq"] for r in rows] == [1, 2, 2, 2]
    assert rows[0]["__tm"].isoformat().startswith("2023-11-14")  # ms truncated to s
    assert rows[1]["v"] == "x" and rows[2]["v"] == "y"
    assert rows[1]["__event_seq"] == rows[2]["__event_seq"] == 50
    assert all(r["id"] == 1 for r in rows)


def test_decode_envelope_malformed_json(spark):
    """Unparseable envelope lines decode to all-NULL (from_json PERMISSIVE);
    the db filter drops them rather than crashing the scan."""
    df = spark.createDataFrame([("not json",), ("{}",)], ["value"])
    out = decode_envelope(df, TARGET, database="d", table="t")
    assert out.count() == 0


OPS = st.lists(
    st.sampled_from(["insert", "update", "delete"]), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops_per_key=st.dictionaries(st.integers(1, 5), OPS, min_size=1, max_size=4))
def test_latest_state_equals_fold(spark, ops_per_key):
    """Property: latest_state(changelog) == python fold of the op sequence."""
    rows, gtid = [], 0
    state: dict[int, tuple] = {}
    for key in sorted(ops_per_key):
        alive = False
        for i, op in enumerate(ops_per_key[key]):
            gtid += 1
            val = (key, f"v{gtid}", float(gtid))
            if op == "insert" and not alive:
                rows.append(_row(*val, CDC_INSERT, gtid))
                state[key], alive = val, True
            elif op == "update" and alive:
                rows.append(_row(*state[key], CDC_UPDATE_BEFORE, gtid, image_seq=0))
                rows.append(_row(*val, CDC_UPDATE_AFTER, gtid, image_seq=1))
                state[key] = val
            elif op == "delete" and alive:
                rows.append(_row(*state[key], CDC_DELETE, gtid))
                del state[key]
                alive = False
    if not rows:
        return
    cl = spark.createDataFrame(rows, CL_SCHEMA)
    got = {
        r["id"]: (r["id"], r["v"], r["amt"])
        for r in latest_state(cl, ["id"]).collect()
    }
    assert got == state


def test_compact_changelog_preserves_state(changelog):
    """Compaction at any boundary preserves the final state, including
    keys deleted in the prefix (absent) and re-tagged snapshot rows."""
    from mysql_cdc_table_spark.operators.analytics import compact_changelog

    direct = {
        (r["id"], r["v"], r["amt"])
        for r in latest_state(changelog, ["id"]).collect()
    }
    for bound in (10, 12, 13, 14, 16):
        compacted = compact_changelog(changelog, ["id"], bound)
        got = {
            (r["id"], r["v"], r["amt"])
            for r in latest_state(compacted, ["id"]).collect()
        }
        assert got == direct, f"state diverged at compaction bound {bound}"
        # compacted log must never be longer than the original
        assert compacted.count() <= changelog.count()


def test_cdc_read_multi_interleaved_tables(spark, tmp_path):
    """Interleaved multi-table stream: each table decodes with ITS schema
    (the reference's missing-braces bug decodes with whichever TABLE_MAP
    came last — binlog_table_reader.cc:402-403; we must not reproduce it)."""
    from mysql_cdc_table_spark.cdc.source import cdc_read_multi

    t_users = T.StructType(
        [T.StructField("uid", T.LongType()), T.StructField("name", T.StringType())]
    )
    t_items = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("sku", T.StringType()),
        ]
    )
    lines = [
        {"op": "c", "before": None, "after": {"uid": 1, "name": "ann"},
         "source": {"db": "d", "table": "users", "gtid": 1,
                    "file": "binlog.000001", "pos": 10, "ts_ms": 1700000000000}},
        # items event BETWEEN two users events (the interleaving that
        # corrupts the reference's decode metadata)
        {"op": "c", "before": None,
         "after": {"item_id": 77, "price": 9.5, "sku": "X-1"},
         "source": {"db": "d", "table": "items", "gtid": 2,
                    "file": "binlog.000001", "pos": 20, "ts_ms": 1700000001000}},
        {"op": "u", "before": {"uid": 1, "name": "ann"},
         "after": {"uid": 1, "name": "ann2"},
         "source": {"db": "d", "table": "users", "gtid": 3,
                    "file": "binlog.000001", "pos": 30, "ts_ms": 1700000002000}},
    ]
    p = tmp_path / "multi.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))

    cls = cdc_read_multi(
        spark, str(p), {"users": t_users, "items": t_items}, database="d"
    )
    users = sorted(cls["users"].collect(), key=lambda r: (r["__gtid"], r["__image_seq"]))
    items = cls["items"].collect()
    assert [r["__op"] for r in users] == [1, 2, 3]
    assert users[-1]["name"] == "ann2" and users[0]["uid"] == 1
    assert len(items) == 1 and items[0]["sku"] == "X-1" and items[0]["price"] == 9.5
    # schemas stayed per-table: no cross-contamination of columns
    assert set(cls["users"].columns) >= {"uid", "name"}
    assert "price" not in cls["users"].columns
    assert "name" not in cls["items"].columns


def test_uuid_gno_gtid_decode_and_per_source_state(spark):
    """Multi-source GTIDs ("server_uuid:gno"): the decoder splits them
    into (__gtid_src, __gtid); ordering is total within a source, so
    per-source latest_state is exact (cross-source order is partial —
    MySQL's own guarantee; the reference's multi-source block is
    commented out, binlog_table_reader.cc:418-425)."""
    import json as _json

    from pyspark.sql import types as T

    from mysql_cdc_table_spark.cdc import latest_state
    from mysql_cdc_table_spark.cdc.source import decode_envelope

    target = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )

    def env(op, before, after, gtid, pos):
        return _json.dumps(
            {"op": op, "before": before, "after": after,
             "source": {"db": "d", "table": "t", "gtid": gtid,
                        "file": "binlog.000001", "pos": pos,
                        "ts_ms": 1_700_000_000_000}}
        )

    rows = [
        env("c", None, {"id": 1, "v": "a"}, "aaaa-bbbb:5", 100),
        env("u", {"id": 1, "v": "a"}, {"id": 1, "v": "a2"}, "aaaa-bbbb:9", 110),
        env("c", None, {"id": 2, "v": "b"}, "cccc-dddd:7", 120),
    ]
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    cl = decode_envelope(df, target, database="d", table="t",
                         gtid_format="uuid_gno")
    got = {(r["__gtid_src"], r["__gtid"]) for r in cl.collect()}
    assert ("aaaa-bbbb", 5) in got and ("cccc-dddd", 7) in got

    # per-source current state: group the changelog by source first
    one_src = cl.filter(F.col("__gtid_src") == "aaaa-bbbb").drop("__gtid_src")
    state = {r["id"]: r["v"] for r in latest_state(one_src, ["id"]).collect()}
    assert state == {1: "a2"}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops_per_key=st.dictionaries(st.integers(1, 5), OPS, min_size=1, max_size=4))
def test_scd2_interval_invariants(spark, ops_per_key):
    """Property: for ANY generated op history, scd2 emits one interval
    per surviving image; per key (ordered by valid_from) every non-last
    interval is closed with valid_to <= the next valid_from (equality
    unless a delete+reinsert gap intervenes), the chain ends open
    exactly when the key is alive, and the last image equals
    latest_state."""
    from mysql_cdc_table_spark.cdc.ops import scd2

    rows, gtid = [], 0
    alive_keys: set[int] = set()
    versions_per_key: dict[int, int] = {}
    state: dict[int, tuple] = {}
    for key in sorted(ops_per_key):
        alive = False
        for op in ops_per_key[key]:
            gtid += 1
            val = (key, f"v{gtid}", float(gtid))
            if op == "insert" and not alive:
                rows.append(_row(*val, CDC_INSERT, gtid))
                state[key], alive = val, True
                versions_per_key[key] = versions_per_key.get(key, 0) + 1
            elif op == "update" and alive:
                rows.append(_row(*state[key], CDC_UPDATE_BEFORE, gtid, image_seq=0))
                rows.append(_row(*val, CDC_UPDATE_AFTER, gtid, image_seq=1))
                state[key] = val
                versions_per_key[key] = versions_per_key.get(key, 0) + 1
            elif op == "delete" and alive:
                rows.append(_row(*state[key], CDC_DELETE, gtid))
                del state[key]
                alive = False
        if alive:
            alive_keys.add(key)
    if not rows:
        return
    cl = spark.createDataFrame(rows, CL_SCHEMA)
    out = scd2(cl, ["id"]).collect()

    per_key: dict[int, list] = {}
    for r in out:
        per_key.setdefault(r["id"], []).append(r)
    assert {k: len(v) for k, v in per_key.items()} == versions_per_key
    for key, ivs in per_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        for a, b in zip(ivs, ivs[1:]):
            # closed, non-overlapping; a gap means a delete+reinsert
            assert a["valid_to"] is not None
            assert a["valid_to"] <= b["valid_from"], (key, a, b)
            assert not a["is_current"]
        last = ivs[-1]
        if key in alive_keys:
            assert last["is_current"] and last["valid_to"] is None
            assert (last["id"], last["v"], last["amt"]) == state[key]
        else:
            # closed by a delete: valid_to set, nothing current
            assert not last["is_current"] and last["valid_to"] is not None
