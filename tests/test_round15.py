"""Round-15: gbk charset decode (both kernels), table-level RENAME in
the schema history, and the multi-table history fold.

The gbk transcode is the first MULTIBYTE non-utf-8 charset in the
codec space — unlike latin1, its trail bytes overlap the ASCII range
(0x40-0x7E), so the vectorized char-start scan is adversarially
checked against Python's codec on strings that deliberately carry
ASCII-looking trail bytes ('丂' is gbk 0x81 0x40 — the trail is '@').
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysql_cdc_table_spark.sources.mysql_binlog import (
    build_binlog_file,
    decode_binlog_bytes,
)
from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
    decode_binlog_pandas,
)

# every value carries at least one 2-byte gbk char — the raw wire
# bytes are NOT valid utf-8, so a utf-8-assuming decode cannot pass
# by accident. '丂' (U+4E02, gbk 81 40) pins the ASCII-trail case;
# '啊' (U+554A, gbk B0 A1) the high-trail case.
_GBK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "note",
            T.StringType(),
            metadata={"mysql_type": "text", "charset": "gbk"},
        ),
        T.StructField(
            "code",
            T.StringType(),
            metadata={
                "mysql_type": "char", "char_len": 4, "char_bytes": 8,
                "charset": "gbk",
            },
        ),
        T.StructField(
            "city",
            T.StringType(),
            metadata={"varchar_len": 40, "charset": "gbk"},
        ),
    ]
)

_GBK_ROWS = [
    {"id": 1, "note": "你好 world", "code": "丂A丂B", "city": "北京市"},
    {"id": 2, "note": "啊丂啊丂", "code": "中文", "city": "x上y海z"},
    {"id": 3, "note": "", "code": "丂", "city": "pure ascii"},
    {"id": 4, "note": None, "code": None, "city": None},
    # consecutive multibyte runs ending/starting rows: the char-start
    # parity scan must not leak across row boundaries
    {"id": 5, "note": "汉字汉字汉", "code": "字汉", "city": "汉"},
]


def _gbk_blob():
    return build_binlog_file(
        "d", "t", _GBK_SCHEMA,
        [
            {"gno": 10 + r["id"], "op": "w", "rows": [r]}
            for r in _GBK_ROWS
        ],
        checksum=True,
    )


def test_gbk_roundtrip_scalar():
    rows = {
        r["id"]: r
        for r in decode_binlog_bytes(_gbk_blob(), _GBK_SCHEMA, "d", "t")
    }
    for want in _GBK_ROWS:
        got = rows[want["id"]]
        for k in ("note", "code", "city"):
            assert got.get(k) == want[k], (want["id"], k, got.get(k))


def test_gbk_roundtrip_columnar():
    pdf = decode_binlog_pandas(_gbk_blob(), _GBK_SCHEMA, "d", "t")
    got = {int(r["id"]): r for _, r in pdf.iterrows()}
    for want in _GBK_ROWS:
        for k in ("note", "code", "city"):
            v = got[want["id"]][k]
            v = None if v is None or isinstance(v, float) else v
            assert v == want[k], (want["id"], k, v)


def test_gbk_to_utf8_transcode_matches_python_codec():
    """The vectorized buffer transcode equals bytes.decode('gbk')
    .encode('utf-8') row by row — random mixes of ASCII, high-trail
    CJK, and ASCII-trail extension chars, empty rows, all-multibyte
    rows, and the offsets remap."""
    import random

    import numpy as np

    from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
        _gbk_to_utf8,
    )

    rng = random.Random(15)
    # pool: ASCII + BMP CJK (high trails) + extension chars whose gbk
    # trail byte is ASCII-range
    ascii_trail = [
        b.decode("gbk")
        for b in (b"\x81\x40", b"\x81\x41", b"\x82\x7e", b"\xaa\x40")
    ]
    pool = (
        [chr(c) for c in range(0x20, 0x7F)]
        + [chr(0x4E00 + k) for k in range(400)]
        + ascii_trail * 20
    )
    rows = [b"", "丂丂丂".encode("gbk"), b"@@@"]
    for _ in range(300):
        n = rng.randrange(0, 24)
        rows.append("".join(rng.choice(pool) for _ in range(n)).encode("gbk"))
    data = np.frombuffer(b"".join(rows), dtype=np.uint8).copy()
    offsets = np.zeros(len(rows) + 1, np.int32)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    out, new_off = _gbk_to_utf8(data, offsets)
    buf = out.tobytes()
    for i, raw in enumerate(rows):
        got = buf[new_off[i]: new_off[i + 1]]
        assert got == raw.decode("gbk").encode("utf-8"), (i, raw)


def test_gbk_malformed_bytes_failfast_columnar():
    """A lone gbk lead byte (truncated char) must raise, not emit a
    mojibake row — failfast parity with the scalar walk."""
    import numpy as np

    from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
        _gbk_to_utf8,
    )

    data = np.frombuffer(b"ok\x81", dtype=np.uint8).copy()
    offsets = np.array([0, 3], np.int32)
    with pytest.raises((UnicodeDecodeError, ValueError)):
        _gbk_to_utf8(data, offsets)


def test_ddl_gbk_schema_decodes_gbk_wire_bytes():
    """A DDL history declaring gbk (table default + per-column) yields
    a schema whose decode handles real multibyte gbk wire bytes —
    CHAR byte width doubles (mbmaxlen 2), TEXT/VARCHAR transcode."""
    from mysql_cdc_table_spark.sources.mysql_ddl import (
        schema_from_ddl_history,
    )

    schema = schema_from_ddl_history(
        [
            "CREATE TABLE d.t ("
            " id BIGINT,"
            " name VARCHAR(10),"
            " tag CHAR(2),"
            " note TEXT CHARACTER SET gbk"
            ") DEFAULT CHARSET=gbk"
        ],
        "d.t",
    )
    tag = next(f for f in schema.fields if f.name == "tag")
    assert tag.metadata["char_bytes"] == 4  # 2 chars x mbmaxlen 2
    rows = [
        {"id": 7, "name": "丂x北京", "tag": "汉字", "note": "啊丂 ok"},
    ]
    blob = build_binlog_file(
        "d", "t", schema,
        [{"gno": 1, "op": "w", "rows": [r]} for r in rows],
        checksum=True,
    )
    got = decode_binlog_bytes(blob, schema, "d", "t")
    assert got[0]["name"] == "丂x北京"
    assert got[0]["tag"] == "汉字"
    assert got[0]["note"] == "啊丂 ok"
    pdf = decode_binlog_pandas(blob, schema, "d", "t")
    assert pdf.iloc[0]["name"] == "丂x北京"
    assert pdf.iloc[0]["tag"] == "汉字"
    assert pdf.iloc[0]["note"] == "啊丂 ok"


def test_sjis_charset_still_raises_pointedly():
    from mysql_cdc_table_spark.sources.mysql_ddl import (
        schema_from_ddl_history,
    )

    with pytest.raises(ValueError, match="sjis"):
        schema_from_ddl_history(
            ["CREATE TABLE t (s VARCHAR(5) CHARACTER SET sjis)"], "t"
        )
