"""CDC source: decode Debezium-style JSON envelopes into the changelog.

This is the Spark-first re-expression of the reference's scan/decode
dataflow (reference binlog_table_reader.cc — event dispatch :173-429,
table filter :178/:251/:318, row-image decode :175-391, op tagging,
GTID propagation :410-416, update unnest :385-388). Instead of walking
the packed binlog row format with Field::unpack, the primary ingest
format is the externalized envelope (driver north star: "storage of the
CDC log itself is external"):

    value: {"op": "c"|"u"|"d"|"r",
            "before": {...}|null, "after": {...}|null,
            "source": {"db", "table", "gtid", "file", "pos", "ts_ms"}}

Decode is fully declarative — from_json + a per-op image array +
posexplode — so it stays inside whole-stage codegen: no Python UDF, no
shuffle (file -> partition, the same parallelism-free mapping the
reference does single-threaded, except Spark runs one task per file
split). Predicates on __op / db / table / columns push into this plan
for free, exceeding the reference (which decodes every column of every
row and lets MySQL filter afterwards — binlogdb.cc:536-551).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("gtid", T.LongType()),
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


# Multi-source variant: MySQL GTIDs are really "server_uuid:gno"; with
# several replication sources interleaved in one stream, gno alone is not
# globally ordered. This schema keeps gtid as its textual form; the
# decoder splits it into (__gtid_src, __gtid) — order is total WITHIN a
# source (uuid), partial across sources, exactly MySQL's semantics (the
# reference assumes a single source; its multi-source block is commented
# out — binlog_table_reader.cc:418-425).
SOURCE_SCHEMA_UUID = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("gtid", T.StringType()),
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def envelope_schema(
    target: T.StructType, gtid_format: str = "long"
) -> T.StructType:
    """Schema of the JSON ``value`` column for a given target table."""
    src = SOURCE_SCHEMA_UUID if gtid_format == "uuid_gno" else SOURCE_SCHEMA
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", target),
            T.StructField("after", target),
            T.StructField("source", src),
        ]
    )


def _file_seq(file_col: Column) -> Column:
    # binlog file names carry their sequence ("binlog.000007") — extract it
    # rather than sorting a file list on the driver (reference loads the
    # whole index file into an ordered vector, binlog_table_reader.cc:12-19;
    # this stays distributed).
    return F.regexp_extract(file_col, r"(\d+)$", 1).cast("int")


def decode_envelope(
    envelopes: DataFrame,
    target: T.StructType,
    database: str | None = None,
    table: str | None = None,
    value_col: str = "value",
    gtid_format: str = "long",
) -> DataFrame:
    """Decode a DataFrame of envelope JSON strings into changelog rows.

    One output row per row-image: c/r -> one __op=1 row, d -> one __op=0
    row, u -> an __op=2 then __op=3 pair sharing __gtid/__event_seq with
    __image_seq 0/1 (reference update-unnest semantics,
    binlog_table_reader.cc:385-388, :103-161).

    gtid_format="uuid_gno": envelopes carry textual "server_uuid:gno"
    GTIDs (multi-source replication); the output gains a __gtid_src
    column and __gtid holds the gno. (__gtid_src, __gtid) is totally
    ordered within a source, partial across sources — group or window by
    __gtid_src for per-source state, exactly MySQL's guarantee.
    """
    if gtid_format not in ("long", "uuid_gno"):
        raise ValueError(f"gtid_format must be long|uuid_gno, got {gtid_format!r}")
    env = envelopes.withColumn(
        "_e", F.from_json(F.col(value_col), envelope_schema(target, gtid_format))
    )

    # A4 table-id filter. r15 (guide §1.2/§7.2): the two per-field
    # predicates were pushed below the _e projection as TWO separate
    # from_json evaluations — and from_json is CodegenFallback, so the
    # Filter runs interpreted with no common-subexpression elimination:
    # every row paid 3 JSON parses (2 filter + 1 projection). One
    # struct-equality predicate over a single subset-schema parse keeps
    # the same row set (a null/missing field can never equal the
    # non-null literal) at 1 filter parse per row.
    want = []
    if database is not None:
        want.append(("db", database))
    if table is not None:
        want.append(("table", table))
    if want:
        sub = T.StructType(
            [
                T.StructField(
                    "source",
                    T.StructType(
                        [T.StructField(n, T.StringType()) for n, _ in want]
                    ),
                )
            ]
        )
        lit_side = F.struct(
            F.struct(*[F.lit(v).alias(n) for n, v in want]).alias("source")
        )
        env = env.filter(F.from_json(F.col(value_col), sub) == lit_side)

    img = (
        F.when(
            F.col("_e.op") == "u",
            F.array(
                F.struct(F.lit(2).alias("op"), F.col("_e.before").alias("row")),
                F.struct(F.lit(3).alias("op"), F.col("_e.after").alias("row")),
            ),
        )
        .when(
            F.col("_e.op") == "d",
            F.array(F.struct(F.lit(0).alias("op"), F.col("_e.before").alias("row"))),
        )
        .otherwise(  # c (insert) and r (snapshot read) both materialize 'after'
            F.array(F.struct(F.lit(1).alias("op"), F.col("_e.after").alias("row")))
        )
    )

    exploded = env.select(
        F.col("_e.source").alias("_src"), F.posexplode(img).alias("_pos", "_img")
    )
    if gtid_format == "uuid_gno":
        gtid_cols = [
            F.split(F.col("_src.gtid"), ":").getItem(0).alias("__gtid_src"),
            F.split(F.col("_src.gtid"), ":")
            .getItem(1)
            .cast("long")
            .alias("__gtid"),
        ]
    else:
        gtid_cols = [F.col("_src.gtid").alias("__gtid")]
    return exploded.select(
        F.col("_img.row.*"),
        F.col("_img.op").cast("int").alias("__op"),
        *gtid_cols,
        # reference __tm is second-resolution (timeval when,
        # binlog_table_reader.cc:221-225): truncate ts_ms.
        F.timestamp_seconds(F.floor(F.col("_src.ts_ms") / 1000).cast("long")).alias("__tm"),
        _file_seq(F.col("_src.file")).alias("__file_seq"),
        F.col("_src.pos").alias("__event_seq"),
        F.col("_pos").cast("int").alias("__image_seq"),
    )


def cdc_read(
    spark: SparkSession,
    path: str,
    target: T.StructType,
    database: str | None = None,
    table: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Read a directory/glob of JSONL envelope files as a changelog.

    Batch or streaming (``readStream``) — the streaming variant adds the
    offsets/checkpointing the reference lacks (it rescans from file 0 on
    every query, binlogdb.cc:487; Structured Streaming's file source
    tracks processed files instead).

    Unlike the reference's ``<name>_cdc`` suffix convention (fragile
    find_last_of("_cdc") parsing, binlogdb.cc:491-501), the target is an
    explicit argument.
    """
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(T.StructType([T.StructField("value", T.StringType())])).text(path)
    return decode_envelope(raw, target, database=database, table=table)


# The record shape Spark's Kafka source produces (binary key/value +
# provenance) — used by the broker-less decode path and its tests.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def decode_kafka_envelope(
    records: DataFrame,
    target: T.StructType,
    database: str | None = None,
    table: str | None = None,
) -> DataFrame:
    """Decode Kafka-shaped records (KAFKA_RECORD_SCHEMA) whose ``value``
    bytes are Debezium-style JSON envelopes: CAST(value AS STRING) ->
    the standard envelope decode. Pure column transforms, so it is
    testable on a static DataFrame without a broker and applies
    identically to batch and streaming frames."""
    vals = records.select(F.col("value").cast("string").alias("value"))
    return decode_envelope(vals, target, database=database, table=table)


def cdc_read_kafka(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    target: T.StructType,
    database: str | None = None,
    table: str | None = None,
    starting_offsets: str = "earliest",
    streaming: bool = True,
) -> DataFrame:
    """Changelog over a Kafka topic of Debezium-style envelopes — the
    BASELINE approach ("Structured Streaming + CDC source connector")
    wired end to end: Kafka source -> CAST(value AS STRING) ->
    decode_envelope. Offsets/checkpointing come from the Kafka source
    (vs. the reference's rescan-from-file-0, binlogdb.cc:487); one Spark
    partition per Kafka partition, decode stays narrow.

    Requires the spark-sql-kafka package on the classpath at runtime;
    the decode half (``decode_kafka_envelope``) is broker-independent.
    """
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    records = (
        reader.option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_envelope(records, target, database=database, table=table)


def cdc_read_multi(
    spark: SparkSession,
    path: str,
    targets: dict[str, T.StructType],
    database: str | None = None,
    streaming: bool = False,
) -> dict[str, DataFrame]:
    """Demultiplex ONE interleaved envelope stream into per-table
    changelogs, each decoded with its own schema.

    The reference gets this wrong: missing braces after the table-name
    check (reference binlog_table_reader.cc:402-403) mean its decode
    metadata (m_td) is rebuilt from EVERY table's TABLE_MAP event, so
    interleaved multi-table binlogs decode rows with the wrong column
    layout (SURVEY §2A A5). Here each table's filter + schema travel
    together by construction, so interleaving cannot cross wires — and
    all per-table frames share the single underlying scan (Spark plans
    one file read; each decode is a narrow projection of it)."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(
        T.StructType([T.StructField("value", T.StringType())])
    ).text(path)
    return {
        tbl: decode_envelope(raw, schema, database=database, table=tbl)
        for tbl, schema in targets.items()
    }


def register_changelog_view(
    spark: SparkSession, name: str, changelog: DataFrame
) -> DataFrame:
    """Register a changelog as a read-only temp view (the reference's
    CREATE TABLE ... ENGINE=BINLOGDB registration, binlogdb.cc:833-855 —
    minus the silently-discarding write path, binlogdb.cc:283-292, which
    Spark temp views reject naturally)."""
    changelog.createOrReplaceTempView(name)
    return changelog
