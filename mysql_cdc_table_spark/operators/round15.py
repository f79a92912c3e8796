"""Round-15 operators: gbk charset decode through BOTH kernels.

gbk is the common pre-8.0 production charset on Chinese MySQL
deployments (mbmaxlen 2; lead bytes 0x81-0xFE, trail bytes 0x40-0xFE
minus 0x7F — the trail range OVERLAPS ASCII, which is what makes its
vectorized transcode genuinely harder than latin1's). The reference
inherits charset handling from the server's Field::unpack
(binlog_table_reader.cc:151-156) and never transcodes — its changelog
surfaces whatever bytes the server stored; this engine converts every
string column to Spark's utf-8 StringType, so gbk needs a real codec
path in the scalar walk AND the columnar Arrow kernel
(sources/mysql_binlog_vec._gbk_to_utf8).

``cdc_binlog_gbk_roundtrip`` decodes ONE fixture through both kernels
and emits a per-kernel aggregate row — the driver's value hash then
proves not just "gbk decodes" but "both kernels decode gbk
byte-identically".
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


def cdc_binlog_gbk_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gbk CHAR/VARCHAR/TEXT through the real binlog v4 framing, decoded
    by the scalar walk AND the columnar Arrow kernel from the same
    blobs. The fixture's codepoints are arithmetic in the order key —
    CJK ideographs U+4E00+f(id) (every one a 2-byte gbk char whose raw
    wire bytes are invalid utf-8) mixed with ASCII separators and the
    extension char U+4E02 ('丂', gbk 0x81 0x40) whose TRAIL byte is
    ASCII '@' — the case a byte-class-only char scan gets wrong. The
    aggregate pins full-codepoint sums per (kernel, status); the two
    kernels' rows must agree with each other and with the oracle's
    pure arithmetic, so one mis-scanned trail byte or a cross-row
    parity leak in the vectorized transcode breaks the value hash."""
    import pandas as pd

    from mysql_cdc_table_spark.sources.mysql_binlog import (
        build_binlog_file,
        decode_binlog_bytes,
    )
    from mysql_cdc_table_spark.sources.mysql_binlog_vec import (
        decode_binlog_pandas,
    )

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "status",
                T.StringType(),
                metadata={"mysql_type": "enum", "values": ["F", "O", "P"]},
            ),
            T.StructField(
                "name",
                T.StringType(),
                metadata={"varchar_len": 20, "charset": "gbk"},
            ),
            T.StructField(
                "tag",
                T.StringType(),
                metadata={
                    "mysql_type": "char", "char_len": 2, "char_bytes": 4,
                    "charset": "gbk",
                },
            ),
            T.StructField(
                "memo",
                T.StringType(),
                metadata={"mysql_type": "text", "charset": "gbk"},
            ),
        ]
    )
    base = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "id")
    )

    file_schema = T.StructType([T.StructField("file_bytes", T.BinaryType())])

    def mk_row(rid: int, status: str) -> dict:
        # name: CJK - ASCII-trail char; tag: 2 CJK; memo: ascii run +
        # one CJK tail — all codepoint arithmetic the oracle recomputes
        return {
            "id": rid,
            "status": status,
            "name": chr(0x4E00 + rid % 20000) + "-"
            + chr(0x4E02 + rid % 93),
            "tag": chr(0x4E00 + rid % 26) + chr(0x4E00 + (rid // 26) % 26),
            "memo": "x" * (rid % 7) + chr(0x4E00 + (rid * 7) % 20000),
        }

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            txns = [
                {
                    "gno": int(r.id),
                    "op": "w",
                    "rows": [mk_row(int(r.id), r.status)],
                }
                for r in pdf.itertuples(index=False)
            ]
            blob = build_binlog_file(
                "tpch", "orders_gbk", target, txns, checksum=True
            )
            yield pd.DataFrame({"file_bytes": [blob]})

    files = base.mapInPandas(encode, schema=file_schema)

    cols = ["id", "status", "name", "tag", "memo", "__gtid"]
    out_schema = T.StructType(
        [
            T.StructField("kernel", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("memo", T.StringType()),
            T.StructField("__gtid", T.LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["file_bytes"]:
                b = bytes(blob)
                rows = decode_binlog_bytes(
                    b, target, "tpch", "orders_gbk"
                )
                scal = pd.DataFrame(
                    {n: [r.get(n) for r in rows] for n in cols}
                )
                scal.insert(0, "kernel", "scalar")
                yield scal
                vec = decode_binlog_pandas(
                    b, target, "tpch", "orders_gbk"
                )[cols].copy()
                vec.insert(0, "kernel", "vec")
                yield vec

    decoded = files.mapInPandas(decode, schema=out_schema)
    cp = F.ascii  # full codepoint of the first char (JVM codePointAt)
    return decoded.groupBy("kernel", "status").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            (cp("name") + cp(F.substring("name", 3, 1))).cast("long")
        ).alias("name_cp_sum"),
        F.sum(
            (cp("tag") * F.lit(65536) + cp(F.substring("tag", 2, 1)))
            .cast("long")
        ).alias("tag_cp_sum"),
        F.sum(F.length("memo").cast("long")).alias("memo_len_sum"),
        F.sum(
            cp(F.substring(F.col("memo"), F.length("memo"), F.lit(1)))
            .cast("long")
        ).alias("memo_cp_sum"),
        F.sum("__gtid").alias("gtid_sum"),
    )


CDC_BINLOG_GBK_ROUNDTRIP_SQL = """
SELECT k.kernel,
       o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(19968 + o_orderkey % 20000
              + 19970 + o_orderkey % 93) AS BIGINT) AS name_cp_sum,
       CAST(sum((19968 + o_orderkey % 26) * 65536
              + 19968 + (o_orderkey // 26) % 26) AS BIGINT) AS tag_cp_sum,
       CAST(sum(o_orderkey % 7 + 1) AS BIGINT) AS memo_len_sum,
       CAST(sum(19968 + (o_orderkey * 7) % 20000) AS BIGINT)
         AS memo_cp_sum,
       CAST(sum(o_orderkey) AS BIGINT) AS gtid_sum
FROM orders,
     (SELECT 'scalar' AS kernel UNION ALL SELECT 'vec') k
GROUP BY 1, 2
"""


QUERIES["cdc_binlog_gbk_roundtrip"] = cdc_binlog_gbk_roundtrip
ORACLES["cdc_binlog_gbk_roundtrip"] = CDC_BINLOG_GBK_ROUNDTRIP_SQL


# --- table-level RENAME: the online-migration cut-over ------------------------

_RT_CREATE = (
    "CREATE TABLE `tpch`.`orders` ("
    " `id` BIGINT NOT NULL,"
    " `price` DECIMAL(12,2),"
    " `flag` CHAR(2),"
    " PRIMARY KEY (`id`)"
    ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
)
_RT_GHOST = (
    "CREATE TABLE `tpch`.`_orders_gho` ("
    " `id` BIGINT NOT NULL,"
    " `price` DECIMAL(14,4),"
    " `note` VARCHAR(40),"
    " `flag` CHAR(2),"
    " PRIMARY KEY (`id`)"
    ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
)
_RT_CUTOVER = (
    "RENAME TABLE `tpch`.`orders` TO `tpch`.`_orders_del`,"
    " `tpch`.`_orders_gho` TO `tpch`.`orders`"
)


def cdc_binlog_table_rename_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The gh-ost/pt-osc online-migration cut-over through real binlog
    bytes — the one routine DDL shape the round-14 schema history
    still refused (and the reference refuses outright:
    ``rename_table`` is HA_ERR_WRONG_COMMAND, binlogdb.cc:784-788).
    One log carries the full migration: CREATE + inserts to ``orders``
    (generation 0, DECIMAL(12,2)); the ghost table's CREATE and its
    BACKFILL writes (which a correct reader must NOT capture — the
    fixture gives backfill rows poisoned values so a leak breaks the
    hash); the atomic ``RENAME TABLE orders TO _orders_del,
    _orders_gho TO orders`` cut-over; post-swap inserts under the
    tracked name with the MIGRATED layout (price widened to (14,4),
    new ``note`` column); and late decoy writes to the parked
    ``_orders_del`` (also not captured). The decode walks ONE pass
    with ``SchemaHistory``: the swap becomes a new generation whose
    same-named columns INHERIT the old identities, so pre-cut-over
    rows surface under the migrated layout with their values carried
    and ``note`` NULL — Debezium's exact contract across an online
    schema migration. The value hash pins both generations' sums, the
    NULL split, and the capture boundary (a leaked backfill/decoy row
    changes n_rows AND the poisoned sums)."""
    import pandas as pd

    from mysql_cdc_table_spark.cdc.schema import changelog_schema
    from mysql_cdc_table_spark.sources.mysql_binlog import (
        build_binlog_file,
        decode_binlog_bytes,
    )
    from mysql_cdc_table_spark.sources.mysql_ddl import (
        SchemaHistory,
        schema_from_ddl_history,
    )

    gen0 = schema_from_ddl_history([_RT_CREATE], "tpch.orders")
    ghost = schema_from_ddl_history([_RT_GHOST], "tpch._orders_gho")
    base = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("id"),
            F.expr(
                "cast(cast(o_orderkey % 100000 as decimal(30,2)) / 100"
                " as decimal(12,2))"
            ).alias("price2"),
            F.expr(
                "cast(cast(o_orderkey % 1000000 as decimal(30,4)) / 10000"
                " as decimal(14,4))"
            ).alias("price4"),
            F.expr(
                "char(65 + o_orderkey % 26) || "
                "char(65 + (o_orderkey div 26) % 26)"
            ).alias("flag"),
            F.expr(
                "repeat('n', o_orderkey % 5) || '#' || o_orderkey"
            ).alias("note"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "id")
    )

    file_schema = T.StructType([T.StructField("file_bytes", T.BinaryType())])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from decimal import Decimal as _D

        for pdf in batches:
            if pdf.empty:
                continue
            pre: list = [{"gno": 1, "ddl": _RT_CREATE}]
            gho: list = [{"gno": 2, "ddl": _RT_GHOST}]
            post: list = []
            parked: list = []
            for r in pdf.itertuples(index=False):
                rid = int(r.id)
                if rid % 3 == 0:  # generation-0 inserts
                    pre.append(
                        {
                            "gno": rid + 10,
                            "op": "w",
                            "rows": [
                                {"id": rid, "price": r.price2,
                                 "flag": r.flag}
                            ],
                        }
                    )
                elif rid % 3 == 1:  # post-cut-over inserts
                    post.append(
                        {
                            "gno": rid + 10,
                            "op": "w",
                            "rows": [
                                {"id": rid, "price": r.price4,
                                 "note": r.note, "flag": r.flag}
                            ],
                        }
                    )
                else:  # id%3==2: poisoned backfill + parked-table decoys
                    gho.append(
                        {
                            "gno": rid + 10,
                            "op": "w",
                            "rows": [
                                {
                                    "id": rid,
                                    "price": r.price4 + _D("1000"),
                                    "note": "backfill-leak",
                                    "flag": "XX",
                                }
                            ],
                        }
                    )
                    parked.append(
                        {
                            "gno": rid * 100,
                            "op": "w",
                            "rows": [
                                {
                                    "id": rid,
                                    "price": r.price2 + _D("1000"),
                                    "flag": "ZZ",
                                }
                            ],
                        }
                    )
            gho.append({"gno": 3, "ddl": _RT_CUTOVER})
            blob = build_binlog_file(
                "tpch", "orders", gen0, pre, checksum=True
            )
            blob += build_binlog_file(
                "tpch", "_orders_gho", ghost, gho, checksum=True
            )[4:]
            blob += build_binlog_file(
                "tpch", "orders", ghost, post, checksum=True
            )[4:]
            blob += build_binlog_file(
                "tpch", "_orders_del", gen0, parked, checksum=True
            )[4:]
            yield pd.DataFrame({"file_bytes": [blob]})

    files = base.mapInPandas(encode, schema=file_schema)

    out_schema = changelog_schema(ghost)
    names = [f.name for f in out_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["file_bytes"]:
                hist = SchemaHistory("orders", database="tpch")
                rows = decode_binlog_bytes(
                    bytes(blob), None, "tpch", "orders",
                    schema_history=hist,
                )
                yield pd.DataFrame(
                    {n: [r.get(n) for r in rows] for n in names}
                )

    decoded = files.mapInPandas(decode, schema=out_schema)
    return decoded.groupBy(
        (F.col("id") % 3).cast("long").alias("gen")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("price") * 10000).cast("long")).alias("price_e4_sum"),
        F.sum(
            (F.ascii("flag") * 256 + F.ascii(F.substring("flag", 2, 1)))
            .cast("long")
        ).alias("flag_ord_sum"),
        F.sum(F.length("note").cast("long")).alias("note_len_sum"),
        F.sum(F.when(F.col("note").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("note_nulls"),
        F.sum(F.col("__gtid") - 10).alias("gtid_sum"),
    )


CDC_BINLOG_TABLE_RENAME_DECODE_SQL = """
SELECT CAST(o_orderkey % 3 AS BIGINT) AS gen,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 3 = 0
                     THEN (o_orderkey % 100000) * 100
                     ELSE o_orderkey % 1000000 END) AS BIGINT)
         AS price_e4_sum,
       CAST(sum((65 + o_orderkey % 26) * 256 + 65 + (o_orderkey // 26) % 26)
            AS BIGINT) AS flag_ord_sum,
       CAST(sum(CASE WHEN o_orderkey % 3 = 1 THEN
           o_orderkey % 5 + 1 + length(CAST(o_orderkey AS VARCHAR))
       END) AS BIGINT) AS note_len_sum,
       CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS note_nulls,
       CAST(sum(o_orderkey) AS BIGINT) AS gtid_sum
FROM orders
WHERE o_orderkey % 3 < 2
GROUP BY 1
"""


QUERIES["cdc_binlog_table_rename_decode"] = cdc_binlog_table_rename_decode
ORACLES["cdc_binlog_table_rename_decode"] = CDC_BINLOG_TABLE_RENAME_DECODE_SQL


def _ddl_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_cdc_table_spark.sources.mysql_binlog import (
        cdc_binlog_ddl_vec_decode,
    )

    return cdc_binlog_ddl_vec_decode(spark, sf_dir)


def _ddl_vec_sql() -> str:
    from mysql_cdc_table_spark.sources.mysql_binlog import (
        CDC_BINLOG_DDL_SCHEMA_DECODE_SQL,
    )

    return CDC_BINLOG_DDL_SCHEMA_DECODE_SQL


# the vec-kernel twin of cdc_binlog_ddl_schema_decode: SAME fixture,
# SAME oracle — the columnar multi-generation decode must aggregate
# identically to the scalar walk
QUERIES["cdc_binlog_ddl_vec_decode"] = _ddl_vec
ORACLES["cdc_binlog_ddl_vec_decode"] = _ddl_vec_sql()
