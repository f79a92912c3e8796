"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, plus the Spark-side plumbing for decode /
feature-extract / frame-sample stages.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_stub`` is a deterministic fake behind the
same ``mapInPandas`` plumbing a real decoder would use — schema,
Arrow batching, partition behavior are real and tested; swap the fake
body for PIL/libav and nothing else changes. At scale the binary
payloads live in parquet binary columns (or out-of-line object-store
keys) and the decode stage is the one place Python belongs: Arrow
batches amortize the JVM<->Python hop, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep executor
memory flat.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_cdc_table_spark.operators._util import t


def with_binary_payload(d: DataFrame) -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes standing in for an
    image/audio blob, next to text + typed metadata columns."""
    return d.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: size, head bytes, content
    hashes — the dedup/integrity layer for multimodal corpora."""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(payload, 1, 8)"))).alias("head_hex"),
        F.md5("payload").alias("payload_md5"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


# documents.text is ASCII, so DuckDB's char-based substr == byte-based
# substring and md5/sha256 over VARCHAR hash the same bytes.
MM_BINARY_META_SQL = """
SELECT doc_id,
       length(text) AS n_bytes,
       lower(hex(substr(text, 1, 8))) AS head_hex,
       md5(text) AS payload_md5,
       sha256(text) AS payload_sha256
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: cut fixed-stride byte windows out of the
    payload (a real video sampler cuts at container keyframes; the
    slicing/explode dataflow is identical)."""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda i: F.lower(F.hex(F.col("payload").substr(i * 32 + F.lit(1), F.lit(8)))),
    )
    return d.filter(F.length("payload") >= 72).select(
        "doc_id",
        F.posexplode(frames).alias("frame_no", "frame_hex"),
    )


MM_FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(u.pos - 1 AS INTEGER) AS frame_no,
       lower(hex(substr(text, (u.pos - 1) * 32 + 1, 8))) AS frame_hex
FROM documents,
     LATERAL (SELECT unnest([1, 2, 3]) AS pos) u
WHERE length(text) >= 72
"""

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (mapInPandas): deterministic fake in place of a real
    image decode — no imaging library exists in this environment. A real
    implementation replaces the body with e.g. PIL.Image.open(BytesIO(b))
    and keeps the exact same signature/schema."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (payloads.str.len() % 64 + 1).astype("int32"),
                "height": (payloads.str.len() % 48 + 1).astype("int32"),
                "n_channels": 3,
                "mean_intensity": payloads.map(
                    lambda b: float(sum(b[:64]) / max(1, len(b[:64])))
                ),
            }
        )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stage: Arrow-batched mapInPandas over binary payloads.
    Rows-only oracle (the stub's output is asserted in pytest; a real
    decoder's output is not SQL-expressible by definition)."""
    d = with_binary_payload(t(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return d.mapInPandas(decode_image_stub, schema=DECODED_SCHEMA)


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_decode_features": mm_decode_features,
}

ORACLES = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    # mm_decode_features: stubbed decode -> rows-only + pytest
}
