"""Round-14: charset-aware TEXT/CHAR/VARCHAR decode (latin1), the
TIMESTAMP->TIMESTAMP2 wire-code fix, and the DDL schema-history
parser's MODIFY/CHANGE/RENAME replay.

The latin1 transcode is checked three ways: the scalar walk, the
columnar Arrow kernel (whose vectorized latin1->utf-8 buffer expansion
is also unit-tested against Python's codec on random byte strings),
and the DDL-learned-schema path end to end.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from mysql_cdc_table_spark.sources.mysql_binlog import (
    TY_TIMESTAMP2,
    _cols_from_schema,
    build_binlog_file,
    decode_binlog_bytes,
)
from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
    decode_binlog_pandas,
)
from mysql_cdc_table_spark.sources.mysql_ddl import (
    apply_mysql_alter,
    parse_mysql_create,
    schema_from_ddl_history,
)

# every latin1 codepoint in these values is >= 0x80 somewhere — the
# raw wire bytes are NOT valid utf-8, so a utf-8-assuming decode
# cannot pass these tests by accident
_L1_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "note",
            T.StringType(),
            metadata={"mysql_type": "text", "charset": "latin1"},
        ),
        T.StructField(
            "code",
            T.StringType(),
            metadata={
                "mysql_type": "char", "char_len": 4, "char_bytes": 4,
                "charset": "latin1",
            },
        ),
        T.StructField(
            "city",
            T.StringType(),
            metadata={"varchar_len": 40, "charset": "latin1"},
        ),
    ]
)

_L1_ROWS = [
    {"id": 1, "note": "café £9 ±2", "code": "Ñoño", "city": "Zürich"},
    {"id": 2, "note": "÷×§¶", "code": "A B", "city": "São Paulo"},
    {"id": 3, "note": "", "code": "ÿ", "city": "Århus"},
    {"id": 4, "note": None, "code": None, "city": None},
]


def _l1_blob():
    return build_binlog_file(
        "d", "t", _L1_SCHEMA,
        [
            {"gno": 10 + r["id"], "op": "w", "rows": [r]}
            for r in _L1_ROWS
        ],
        checksum=True,
    )


def test_latin1_roundtrip_scalar():
    rows = {
        r["id"]: r
        for r in decode_binlog_bytes(_l1_blob(), _L1_SCHEMA, "d", "t")
    }
    for want in _L1_ROWS:
        got = rows[want["id"]]
        for k in ("note", "code", "city"):
            assert got.get(k) == want[k], (want["id"], k, got.get(k))


def test_latin1_roundtrip_columnar():
    pdf = decode_binlog_pandas(_l1_blob(), _L1_SCHEMA, "d", "t")
    got = {int(r["id"]): r for _, r in pdf.iterrows()}
    for want in _L1_ROWS:
        for k in ("note", "code", "city"):
            v = got[want["id"]][k]
            v = None if v is None or (isinstance(v, float)) else v
            assert v == want[k], (want["id"], k, v)


def test_latin1_to_utf8_transcode_matches_python_codec():
    """The vectorized buffer transcode equals bytes.decode('latin-1')
    .encode('utf-8') row by row — random strings, empty rows, all-high
    rows, and the offsets remap."""
    import random

    import numpy as np

    from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
        _latin1_to_utf8,
    )

    rng = random.Random(14)
    rows = [b""]
    for _ in range(200):
        n = rng.randrange(0, 30)
        rows.append(bytes(rng.randrange(0, 256) for _ in range(n)))
    rows.append(bytes(range(128, 256)))  # all-high
    data = np.frombuffer(b"".join(rows), dtype=np.uint8).copy()
    offsets = np.zeros(len(rows) + 1, np.int32)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    out, new_off = _latin1_to_utf8(data, offsets)
    buf = out.tobytes()
    for i, raw in enumerate(rows):
        got = buf[new_off[i]: new_off[i + 1]]
        assert got == raw.decode("latin-1").encode("utf-8"), i


def test_unsupported_charset_raises_pointedly():
    # gbk/sjis/cp932 joined the codec space in round 15; ucs2 stays
    # pointedly rejected (2-byte units, NUL bytes in ASCII)
    bad = T.StructType(
        [
            T.StructField(
                "s",
                T.StringType(),
                metadata={"mysql_type": "text", "charset": "ucs2"},
            )
        ]
    )
    with pytest.raises(ValueError, match="ucs2"):
        _cols_from_schema(bad)


def test_ddl_timestamp_maps_to_timestamp2_and_roundtrips():
    """DDL TIMESTAMP produces wire code 17 (what a real server logs),
    not DATETIME2's 18 — and values survive encode+decode (advisor
    finding, round 13)."""
    import datetime as dt

    _, sch = parse_mysql_create(
        "CREATE TABLE t (id BIGINT, ts TIMESTAMP(3), dt DATETIME(6))"
    )
    cols = {c.name: c for c in _cols_from_schema(sch)}
    assert cols["ts"].type_code == TY_TIMESTAMP2
    assert cols["ts"].meta == bytes([3])
    assert cols["dt"].type_code != TY_TIMESTAMP2
    row = {
        "id": 1,
        "ts": dt.datetime(2024, 3, 9, 12, 30, 15, 250000),
        "dt": dt.datetime(2024, 3, 9, 12, 30, 15, 123456),
    }
    blob = build_binlog_file(
        "d", "t", sch, [{"gno": 2, "op": "w", "rows": [row]}]
    )
    (got,) = decode_binlog_bytes(blob, sch, "d", "t")
    assert got["ts"] == row["ts"] and got["dt"] == row["dt"]


def test_ddl_latin1_schema_decodes_latin1_wire_bytes():
    """A DDL history declaring latin1 (table default + per-column)
    yields a schema whose decode handles real >=0x80 latin1 bytes —
    scalar AND columnar."""
    sch = schema_from_ddl_history(
        [
            "CREATE TABLE t ("
            " id BIGINT,"
            " note TEXT,"
            " city VARCHAR(20) CHARACTER SET latin1"
            ") ENGINE=InnoDB DEFAULT CHARSET=latin1",
        ],
        "t",
    )
    assert sch["note"].metadata.get("charset") == "latin1"
    assert sch["city"].metadata.get("charset") == "latin1"
    assert sch["city"].metadata["varchar_len"] == 20  # mbmaxlen 1
    rows = [
        {"id": 1, "note": "crème brûlée", "city": "Málaga"},
        {"id": 2, "note": "°±²³", "city": "Côte d'Azur"},
    ]
    blob = build_binlog_file(
        "d", "t", sch,
        [{"gno": 10 + r["id"], "op": "w", "rows": [r]} for r in rows],
    )
    got = {r["id"]: r for r in decode_binlog_bytes(blob, sch, "d", "t")}
    assert got[1]["note"] == "crème brûlée" and got[2]["city"] == "Côte d'Azur"
    pdf = decode_binlog_pandas(blob, sch, "d", "t")
    assert sorted(pdf["note"]) == sorted(r["note"] for r in rows)


def test_ddl_modify_change_rename_replay_decodes_mid_stream():
    """A history CREATE -> rows -> ALTER MODIFY/CHANGE/RENAME -> rows
    decodes both generations: the replayed schema's LATEST layout reads
    gen-1 rows exactly, and gen-0 rows ride the reader's prefix/rename
    generation handling where layouts agree."""
    create = (
        "CREATE TABLE t (id BIGINT, amt INT, tag VARCHAR(10), n0 INT)"
    )
    alter = (
        "ALTER TABLE t MODIFY COLUMN amt BIGINT, "
        "CHANGE COLUMN tag label VARCHAR(20), "
        "RENAME COLUMN n0 TO n1"
    )
    old = schema_from_ddl_history([create], "t")
    new = schema_from_ddl_history([create, alter], "t")
    assert [f.name for f in new.fields] == ["id", "amt", "label", "n1"]
    assert new["amt"].dataType == T.LongType()
    blob = build_binlog_file(
        "d", "t", new,
        [
            {"gno": 3, "op": "w",
             "rows": [{"id": 2, "amt": 1 << 40, "label": "after", "n1": 7}]},
        ],
    )
    (got,) = decode_binlog_bytes(blob, new, "d", "t")
    assert got["amt"] == 1 << 40 and got["label"] == "after"
    # the old generation still decodes under ITS schema (two-generation
    # streams stage per-generation TABLE_MAPs; the evolution operator
    # key drives the full mixed-file path)
    blob0 = build_binlog_file(
        "d", "t", old,
        [{"gno": 1, "op": "w",
          "rows": [{"id": 1, "amt": 5, "tag": "before", "n0": 3}]}],
    )
    (got0,) = decode_binlog_bytes(blob0, old, "d", "t")
    assert got0["amt"] == 5 and got0["tag"] == "before"


def test_schema_history_mixed_stream_decode():
    """ONE blob, three generations: CREATE -> rows -> ALTER
    ADD+DROP -> rows -> ALTER MODIFY/CHANGE/RENAME -> rows. The
    schema_history walk resolves each generation's TABLE_MAP against
    the layout in effect and surfaces every row under the LATEST
    names via column identity."""
    from mysql_cdc_table_spark.sources.mysql_ddl import SchemaHistory

    create = (
        "CREATE TABLE `d`.`t` (id BIGINT, amt INT, tag VARCHAR(10), "
        "gone INT)"
    )
    alter1 = "ALTER TABLE `d`.`t` ADD COLUMN note TEXT, DROP COLUMN gone"
    alter2 = (
        "ALTER TABLE `d`.`t` MODIFY COLUMN amt BIGINT, "
        "CHANGE COLUMN tag label VARCHAR(20), RENAME COLUMN note TO memo"
    )
    g0 = schema_from_ddl_history([create], "t")
    g1 = schema_from_ddl_history([create, alter1], "t")
    g2 = schema_from_ddl_history([create, alter1, alter2], "t")
    blob = build_binlog_file("d", "t", g0, [
        {"gno": 1, "ddl": create},
        {"gno": 11, "op": "w",
         "rows": [{"id": 1, "amt": 5, "tag": "a", "gone": 9}]},
    ])
    blob += build_binlog_file("d", "t", g1, [
        {"gno": 2, "ddl": alter1},
        {"gno": 12, "op": "w",
         "rows": [{"id": 2, "amt": 6, "tag": "b", "note": "n2"}]},
    ])[4:]
    blob += build_binlog_file("d", "t", g2, [
        {"gno": 3, "ddl": alter2},
        {"gno": 13, "op": "w",
         "rows": [{"id": 3, "amt": 1 << 40, "label": "c", "memo": "n3"}]},
    ])[4:]
    hist = SchemaHistory("t", database="d")
    rows = decode_binlog_bytes(blob, None, "d", "t", schema_history=hist)
    got = {r["id"]: r for r in rows}
    assert len(got) == 3
    # gen-0: tag -> label (CHANGE identity), gone dropped, memo absent
    assert got[1]["label"] == "a" and got[1]["amt"] == 5
    assert "gone" not in got[1] and got[1].get("memo") is None
    # gen-1: note -> memo (RENAME identity)
    assert got[2]["memo"] == "n2" and got[2]["label"] == "b"
    # gen-2 decodes natively, MODIFY widened type carries 2^40
    assert got[3]["amt"] == 1 << 40 and got[3]["memo"] == "n3"


def test_schema_history_recreate_does_not_shadow_dropped_column():
    """DROP COLUMN then ADD COLUMN with the SAME name is a NEW
    identity: an old generation's value must not leak into the
    re-added column (ids are allocated monotonically, never reused)."""
    from mysql_cdc_table_spark.sources.mysql_ddl import SchemaHistory

    create = "CREATE TABLE d.t (id BIGINT, x INT)"
    alter1 = "ALTER TABLE d.t DROP COLUMN x"
    alter2 = "ALTER TABLE d.t ADD COLUMN x INT"
    g0 = schema_from_ddl_history([create], "t")
    g1 = schema_from_ddl_history([create, alter1], "t")
    g2 = schema_from_ddl_history([create, alter1, alter2], "t")
    blob = build_binlog_file("d", "t", g0, [
        {"gno": 1, "ddl": create},
        {"gno": 11, "op": "w", "rows": [{"id": 1, "x": 111}]},
    ])
    blob += build_binlog_file("d", "t", g1, [
        {"gno": 2, "ddl": alter1},
        {"gno": 12, "op": "w", "rows": [{"id": 2}]},
    ])[4:]
    blob += build_binlog_file("d", "t", g2, [
        {"gno": 3, "ddl": alter2},
        {"gno": 13, "op": "w", "rows": [{"id": 3, "x": 333}]},
    ])[4:]
    hist = SchemaHistory("t", database="d")
    rows = decode_binlog_bytes(blob, None, "d", "t", schema_history=hist)
    got = {r["id"]: r for r in rows}
    assert got[1].get("x") is None  # old x retired with its identity
    assert got[2].get("x") is None
    assert got[3]["x"] == 333


def test_schema_history_guards():
    """history mode is whole-file only (a mid-file range cannot see
    the DDL that precedes it — round 15 opened the COLUMNAR kernel,
    but not splits), and a TABLE_MAP before any CREATE raises
    pointedly."""
    from mysql_cdc_table_spark.sources.mysql_ddl import SchemaHistory

    sch = T.StructType([T.StructField("id", T.LongType())])
    blob = build_binlog_file(
        "d", "t", sch,
        [{"gno": 1, "op": "w", "rows": [{"id": 1}]}],
    )
    with pytest.raises(ValueError, match="before any[\\s\\S]*CREATE"):
        decode_binlog_bytes(
            blob, None, "d", "t", schema_history=SchemaHistory("t", database="d")
        )
    with pytest.raises(ValueError, match="mid-file range"):
        decode_binlog_bytes(
            blob, sch, "d", "t",
            schema_history=SchemaHistory("t"), init_state={},
        )


# --- round-14 operators: histogram consumers --------------------------------


def test_selectivity_estimate_bounds(spark):
    """Endpoint probes are EXACT (c = gmax covers every bucket fully;
    c = gmin can only touch the first bucket), estimates are monotone
    in c, and every estimate stays within [0, total]."""
    from conftest import SF_SMOKE
    from mysql_cdc_table_spark.operators.round14 import (
        stats_selectivity_estimate,
    )

    rows = stats_selectivity_estimate(spark, SF_SMOKE).collect()
    assert [r["k"] for r in rows] == list(range(9))
    total = max(r["actual_rows"] for r in rows)
    last = rows[-1]
    assert last["actual_rows"] == total
    assert last["est_rows_x1000"] == total * 1000  # full coverage exact
    ests = [r["est_rows_x1000"] for r in rows]
    assert ests == sorted(ests)  # monotone in c
    for r in rows:
        assert 0 <= r["est_rows_x1000"] <= total * 1000
        # equi-height interpolation error is bounded by ~2 buckets
        assert r["err_x1000"] <= 2 * (total * 1000) // 8 + 1000


def test_zorder_probe_prunes_and_matches_direct(spark, tmp_path, monkeypatch):
    """The probe's candidate buckets are a strict subset of the store's
    partitions (directory pruning is real), and the pruned+filtered
    answer equals the direct box aggregate over orders."""
    import os as _os

    from conftest import SF_CORRECTNESS
    from pyspark.sql import functions as F
    from mysql_cdc_table_spark.operators import round14 as r14
    from mysql_cdc_table_spark.catalog import load_table

    if not _os.path.isdir(SF_CORRECTNESS):
        pytest.skip(f"{SF_CORRECTNESS} not present")
    store = str(tmp_path / "zstore")
    monkeypatch.setattr(r14, "zorder_store_dir", lambda _sf: store)
    got = r14.zorder_point_probe(spark, SF_CORRECTNESS).collect()[0]

    o = load_table(spark, SF_CORRECTNESS, "orders")
    maxck = o.agg(F.max("o_custkey").cast("long")).first()[0]
    direct = (
        o.where(
            F.col("o_custkey").between(maxck * 3 // 10, maxck * 4 // 10)
            & F.col("o_orderdate").between("1994-01-01", "1994-06-30")
        )
        .agg(
            F.count("*").cast("long"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long"),
            F.sum("o_custkey").cast("long"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(direct)

    # pruning proof: the probe touches a minority of the store's files
    all_dirs = [
        d for d in _os.listdir(store + "/rows") if d.startswith("zbucket=")
    ]
    rows = spark.read.parquet(store + "/rows")
    total_files = rows.select(F.input_file_name()).distinct().count()
    from pyspark.sql import functions as _F

    meta = spark.read.parquet(store + "/meta")
    # re-derive the candidate set the probe used
    from mysql_cdc_table_spark.operators.round12b import _zorder_expr

    zx = _zorder_expr("xb", "yb")
    cells = meta.selectExpr(
        "maxck", "maxck * 3 DIV 10 AS cklo", "maxck * 4 DIV 10 AS ckhi"
    ).selectExpr(
        "explode(sequence(least(255, cklo * 256 DIV (maxck + 1)),"
        " least(255, ckhi * 256 DIV (maxck + 1)))) AS xb",
        "sequence("
        " least(255, CAST(datediff(DATE '1994-01-01', DATE '1992-01-01')"
        "   AS BIGINT) * 256 DIV 2500),"
        " least(255, CAST(datediff(DATE '1994-06-30', DATE '1992-01-01')"
        "   AS BIGINT) * 256 DIV 2500)) AS ybs",
    ).selectExpr("xb", "explode(ybs) AS yb")
    buckets = {
        r[0]
        for r in cells.selectExpr(f"CAST(({zx}) >> 8 AS BIGINT) AS zb")
        .distinct()
        .collect()
    }
    touched_files = (
        rows.where(_F.col("zbucket").isin(sorted(buckets)))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert len(buckets) < len(all_dirs)
    assert touched_files < total_files // 2


def test_streaming_ddl_migration_smoke(spark):
    """The streaming migration key at the smoke scale: final store
    equals the fixture arithmetic (alive = id%7!=0; id%3==0 carry the
    update image) — including the RENAMED column's values for rows
    that entered the store before the ALTER existed."""
    from conftest import SF_SMOKE
    from pyspark.sql import functions as F
    from mysql_cdc_table_spark.operators.round14 import (
        cdc_binlog_streaming_ddl_migration,
    )

    got = {
        r["post_alter"]: r
        for r in cdc_binlog_streaming_ddl_migration(spark, SF_SMOKE).collect()
    }
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    want = {
        r["post_alter"]: r
        for r in o.where(F.expr("o_orderkey % 7 <> 0"))
        .selectExpr(
            "o_orderkey % 3 = 0 AS post_alter",
            "CAST(o_orderkey % 100000 AS BIGINT)"
            " + IF(o_orderkey % 3 = 0, 100, 0) AS cents",
            "(65 + o_orderkey % 26) * 256 + 65 + (o_orderkey div 26) % 26"
            " AS ford",
            "o_orderkey * 10 + IF(o_orderkey % 3 = 0, 5, 0) AS gtid",
        )
        .groupBy("post_alter")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("ford").cast("long").alias("flag_ord_sum"),
            F.sum("gtid").cast("long").alias("gtid_sum"),
        )
        .collect()
    }
    assert set(got) == set(want) == {True, False}
    for k in got:
        assert tuple(got[k]) == tuple(want[k])


def test_streaming_ddl_migration_multi_blob_chunks(spark):
    """mapInPandas may split one chunk into several Arrow batches, so
    each batch's feed file holds SEVERAL blobs, each re-stating the
    generation's DDL (self-describing blobs). The history fold must
    apply the re-stated CREATE/ALTER once — a double-applied CREATE
    would silently re-key column identities; a double-applied ALTER
    raises. Reproduced by shrinking the Arrow batch size so even the
    smoke corpus splits."""
    from conftest import SF_SMOKE
    from pyspark.sql import functions as F
    from mysql_cdc_table_spark.operators.round14 import (
        cdc_binlog_streaming_ddl_migration,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "97")  # forces multiple pdfs per chunk
    try:
        got = {
            r["post_alter"]: tuple(r)
            for r in cdc_binlog_streaming_ddl_migration(
                spark, SF_SMOKE
            ).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    want = {
        r["post_alter"]: tuple(r)
        for r in o.where(F.expr("o_orderkey % 7 <> 0"))
        .selectExpr(
            "o_orderkey % 3 = 0 AS post_alter",
            "CAST(o_orderkey % 100000 AS BIGINT)"
            " + IF(o_orderkey % 3 = 0, 100, 0) AS cents",
            "(65 + o_orderkey % 26) * 256 + 65 + (o_orderkey div 26) % 26"
            " AS ford",
            "o_orderkey * 10 + IF(o_orderkey % 3 = 0, 5, 0) AS gtid",
        )
        .groupBy("post_alter")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("ford").cast("long").alias("flag_ord_sum"),
            F.sum("gtid").cast("long").alias("gtid_sum"),
        )
        .collect()
    }
    assert got == want


def test_streaming_ddl_migration_history_is_durable(spark):
    """The schema history rides every version commit (the H frame), so
    a consumer restarted from the checkpoint — whose closure-held
    history died with the driver — re-seeds from the store and can
    decode batch N+1 with batches 0..N's DDL."""
    import hashlib
    import os
    import tempfile

    from conftest import SF_SMOKE
    from mysql_cdc_table_spark.operators.round14 import (
        _DDLMIG_ALTER,
        _DDLMIG_CREATE,
        _ddlmig_load_history,
        cdc_binlog_streaming_ddl_migration,
    )
    from mysql_cdc_table_spark.sources.mysql_ddl import SchemaHistory

    cdc_binlog_streaming_ddl_migration(spark, SF_SMOKE).collect()
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{SF_SMOKE}:ddlmig".encode()
    ).hexdigest()[:12]
    state_dir = os.path.join(
        tempfile.gettempdir(), f"binlog_ddlmig_{tag}", "state"
    )
    stmts = _ddlmig_load_history(spark, state_dir)
    assert stmts == [_DDLMIG_CREATE, _DDLMIG_ALTER]
    h = SchemaHistory("orders", database="tpch")
    for s in stmts:
        h.apply(s)
    assert [f.name for f in h.schema.fields] == [
        "id", "price", "cflag", "status",
    ]


# --- model-based fuzz of the schema-history fold ------------------------------

_FUZZ_TYPES = {
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "VARCHAR(10)": T.StringType(),
    "CHAR(2)": T.StringType(),
    "TEXT": T.StringType(),
    "DECIMAL(12,2)": T.DecimalType(12, 2),
}


def _fuzz_walk(seed: int) -> None:
    """One random DDL walk: CREATE then 1-12 ALTERs (each 1-2 ops from
    ADD/DROP/MODIFY/CHANGE/RENAME, with occasional FIRST/AFTER
    repositioning and name reuse after drops), folded through
    SchemaHistory and through an independent naive model of
    (name, type, identity) triples that re-implements MySQL's
    documented positioning rules from scratch. Any divergence in
    names, identities, or mapped Spark types fails."""
    import random

    from mysql_cdc_table_spark.sources.mysql_ddl import SchemaHistory

    rng = random.Random(seed)
    tys = list(_FUZZ_TYPES)
    pool = [f"c{i}" for i in range(10)]
    n0 = rng.randint(1, 4)
    model = [(pool[i], rng.choice(tys), i) for i in range(n0)]
    next_id = n0
    hist = SchemaHistory("t", database="d")
    assert hist.apply(
        "CREATE TABLE `d`.`t` ("
        + ", ".join(f"`{n}` {ty}" for n, ty, _ in model)
        + ")"
    )

    def names():
        return [n for n, _, _ in model]

    def pos_clause(exclude=None):
        # None (in place/append) | FIRST | AFTER <existing column>
        r = rng.random()
        cands = [n for n in names() if n != exclude]
        if r < 0.6 or not cands:
            return None
        if r < 0.75:
            return "FIRST"
        return f"AFTER `{rng.choice(cands)}`"

    def insert_at(entry, pos, replace_idx):
        if pos is None:
            if replace_idx is None:
                model.append(entry)
            else:
                model.insert(replace_idx, entry)
        elif pos == "FIRST":
            model.insert(0, entry)
        else:
            anchor = pos.split("`")[1]
            model.insert(
                next(i for i, (n, _, _) in enumerate(model) if n == anchor)
                + 1,
                entry,
            )

    for _ in range(rng.randint(1, 12)):
        if rng.random() < 0.12:
            # table-level churn (round 15): DROP then re-CREATE with a
            # random layout — same-named columns must JOIN back to
            # their identities, new names take fresh ids, and the id
            # counter still advances for every declared column
            hist.apply("DROP TABLE `d`.`t`")
            assert hist.schema is None, seed
            k = rng.randint(1, 4)
            cols = rng.sample(pool, k)
            old_ids = {n: i for n, _, i in model}
            model = [
                (n, rng.choice(tys), old_ids.get(n, next_id + j))
                for j, n in enumerate(cols)
            ]
            next_id += k
            hist.apply(
                "CREATE TABLE `d`.`t` ("
                + ", ".join(f"`{n}` {ty}" for n, ty, _ in model)
                + ")"
            )
            assert list(hist.names) == [n for n, _, _ in model], seed
            assert list(hist.ids) == [i for _, _, i in model], seed
            continue
        nonlocal_ops = []
        for _ in range(rng.randint(1, 2)):
            free = [n for n in pool if n not in names()]
            ops = ["add"] if not model else (
                ["add"] if not free else
                ["add", "drop", "modify", "change", "rename"]
            )
            op = rng.choice(ops)
            if op == "add":
                if not free:
                    continue
                n, ty = rng.choice(free), rng.choice(tys)
                pos = pos_clause()
                insert_at((n, ty, next_id), pos, None)
                next_id += 1
                nonlocal_ops.append(
                    f"ADD COLUMN `{n}` {ty}" + (f" {pos}" if pos else "")
                )
            elif op == "drop":
                n = rng.choice(names())
                model[:] = [e for e in model if e[0] != n]
                nonlocal_ops.append(f"DROP COLUMN `{n}`")
            elif op == "modify":
                n = rng.choice(names())
                ty = rng.choice(tys)
                pos = pos_clause(exclude=n)
                idx = next(i for i, e in enumerate(model) if e[0] == n)
                keep = model[idx][2]
                del model[idx]
                insert_at((n, ty, keep), pos, idx)
                nonlocal_ops.append(
                    f"MODIFY COLUMN `{n}` {ty}" + (f" {pos}" if pos else "")
                )
            elif op == "change":
                old = rng.choice(names())
                free = [n for n in pool if n not in names() or n == old]
                new = rng.choice(free)
                ty = rng.choice(tys)
                pos = pos_clause(exclude=old)
                idx = next(i for i, e in enumerate(model) if e[0] == old)
                keep = model[idx][2]
                del model[idx]
                insert_at((new, ty, keep), pos, idx)
                nonlocal_ops.append(
                    f"CHANGE COLUMN `{old}` `{new}` {ty}"
                    + (f" {pos}" if pos else "")
                )
            else:  # rename
                old = rng.choice(names())
                free = [n for n in pool if n not in names() or n == old]
                new = rng.choice(free)
                idx = next(i for i, e in enumerate(model) if e[0] == old)
                model[idx] = (new, model[idx][1], model[idx][2])
                nonlocal_ops.append(f"RENAME COLUMN `{old}` TO `{new}`")
        if not nonlocal_ops:
            continue
        hist.apply("ALTER TABLE `d`.`t` " + ", ".join(nonlocal_ops))
        assert list(hist.names) == [n for n, _, _ in model], (
            seed, nonlocal_ops
        )
        assert list(hist.ids) == [i for _, _, i in model], (
            seed, nonlocal_ops
        )
        got_types = [f.dataType for f in hist.schema.fields]
        want_types = [_FUZZ_TYPES[ty] for _, ty, _ in model]
        assert got_types == want_types, (seed, nonlocal_ops)


@pytest.mark.parametrize("seed", range(300))
def test_schema_history_random_walk_matches_model(seed):
    _fuzz_walk(seed)


def test_records_in_range_bounds(spark):
    """Two-sided estimates stay within [0, total*1000] and within the
    ~2-boundary-bucket interpolation error of the exact count; a
    window that clamps to the span's tail still covers its rows."""
    from conftest import SF_SMOKE
    from mysql_cdc_table_spark.operators.round14 import (
        stats_records_in_range,
    )

    rows = stats_records_in_range(spark, SF_SMOKE).collect()
    assert [r["k"] for r in rows] == list(range(8))
    total = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert 0 <= r["est_rows_x1000"] <= total * 1000
        assert r["err_x1000"] <= 2 * (total * 1000) // 8 + 2000
