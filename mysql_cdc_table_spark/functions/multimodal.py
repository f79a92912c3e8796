"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, plus the Spark-side decode / feature-extract /
frame-sample stages.

Decode contract: ``decode_image_bytes`` is a REAL decoder for the two
uncompressed public image formats parseable with numpy alone — netpbm
``P6`` (PPM) and Windows BMP (24/32-bit uncompressed, ``BI_RGB``) —
with format sniffing on the payload's magic bytes. Compressed formats
(JPEG/PNG/...) delegate to PIL when it is importable and raise a
pointed error otherwise (this container has no imaging libraries; the
uncompressed path keeps the whole stage real regardless). At scale the
binary payloads live in parquet binary columns (or out-of-line
object-store keys) and the decode stage is the one place Python
belongs: Arrow batches amortize the JVM<->Python hop, and batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep
executor memory flat.

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
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def encode_ppm(width: int, height: int, rgb) -> bytes:
    """Serialize an (h, w, 3) uint8 array — or a constant fill value —
    as binary netpbm P6."""
    import numpy as np

    if isinstance(rgb, int):
        rgb = np.full((height, width, 3), rgb, dtype=np.uint8)
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()


def encode_bmp(width: int, height: int, rgb) -> bytes:
    """Serialize an (h, w, 3) uint8 array — or a constant fill value —
    as an uncompressed 24-bit BI_RGB Windows BMP (bottom-up rows, BGR
    byte order, rows padded to 4-byte multiples)."""
    import struct

    import numpy as np

    if isinstance(rgb, int):
        rgb = np.full((height, width, 3), rgb, dtype=np.uint8)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    bgr = rgb[:, :, ::-1]
    row_len = width * 3
    pad = (-row_len) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + b"\x00" * pad)
    pixel_data = b"".join(rows)
    offset = 14 + 40
    file_size = offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + dib + pixel_data


def decode_image_pixels(payload: bytes):
    """-> (codec, (h, w, 3) uint8 RGB array). The pixel-level decode
    under decode_image_bytes — callers that need spatial content
    (perceptual hashing, resizing) use this; summary callers use the
    tuple wrapper."""
    import numpy as np

    codec, w, h, _nch, _mean, px = _decode_image_impl(payload)
    return codec, np.ascontiguousarray(px.reshape(h, w, 3))


def decode_image_bytes(payload: bytes) -> tuple[str, int, int, int, float]:
    """-> (codec, width, height, n_channels, mean_intensity). Real
    decode of netpbm P6 and uncompressed 24/32-bit BMP with numpy;
    other formats go through PIL when importable, else raise pointedly
    (never a silent fake)."""
    codec, w, h, nch, mean, _px = _decode_image_impl(payload)
    return codec, w, h, nch, mean


def _decode_image_impl(payload: bytes):
    import numpy as np

    if payload[:2] == b"P6":
        # header: magic, whitespace/comment-separated width height
        # maxval, ONE whitespace byte, then raw RGB rows
        fields: list[int] = []
        pos = 2
        size = len(payload)
        while len(fields) < 3:
            while pos < size and payload[pos : pos + 1].isspace():
                pos += 1
            if pos >= size:
                raise ValueError("truncated PPM header")
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("truncated PPM header")
                pos = nl + 1
                continue
            end = pos
            while end < size and not payload[end : end + 1].isspace():
                end += 1
            if end >= size:  # header field ran off the end of the buffer
                raise ValueError("truncated PPM header")
            fields.append(int(payload[pos:end]))
            pos = end
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval >= 256:
            raise ValueError("16-bit PPM not supported")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return "ppm", w, h, 3, float(px.mean()), px
    if payload[:2] == b"BM":
        import struct

        offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(
                f"only uncompressed 24/32-bit BMP supported "
                f"(bpp={bpp}, compression={compression})"
            )
        top_down = h < 0
        h = abs(h)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        px = px[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB, alpha dropped
        return "bmp", w, h, 3, float(px.mean()), px
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        raise ValueError(
            f"payload magic {payload[:4]!r} is not PPM/BMP and PIL is "
            "not importable — install pillow to decode compressed "
            "image formats"
        ) from None
    img = Image.open(BytesIO(payload))
    arr = np.asarray(img.convert("RGB"))
    return (
        (img.format or "unknown").lower(),
        img.width,
        img.height,
        3,
        float(arr.mean()),
        arr,
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode stage over (doc_id, payload) batches."""
    for pdf in batches:
        decoded = [decode_image_bytes(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "codec": [d[0] for d in decoded],
                "width": pd.Series([d[1] for d in decoded], dtype="int32"),
                "height": pd.Series([d[2] for d in decoded], dtype="int32"),
                "n_channels": pd.Series([d[3] for d in decoded], dtype="int32"),
                "mean_intensity": [d[4] for d in decoded],
            }
        )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode: every document synthesizes a valid
    image payload (even doc_ids: netpbm P6; odd: 24-bit BMP) with
    dimensions and a constant fill derived from doc_id, then the decode
    stage sniffs the format and parses it back. Because the constant
    fill makes mean_intensity exactly ``doc_id % 256``, the whole
    pipeline carries a full value-hash oracle — encode, container
    framing (BMP row padding, bottom-up order, BGR), sniffing, and
    decode all sit inside the hash. Both stages are Arrow-batched
    mapInPandas; a corpus whose payloads came from parquet would skip
    the first stage and hit the identical decode plumbing."""
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_ids, out_payloads = [], []
        for pdf in batches:
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, v = did % 64 + 1, did % 48 + 1, did % 256
                payload = (
                    encode_ppm(w, h, v) if did % 2 == 0 else encode_bmp(w, h, v)
                )
                out_ids.append(did)
                out_payloads.append(payload)
        yield pd.DataFrame({"doc_id": out_ids, "payload": out_payloads})

    d = t(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(gen, schema=gen_schema)
    return payloads.mapInPandas(decode_image_batch, schema=DECODED_SCHEMA)


MM_DECODE_FEATURES_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS codec,
       CAST(doc_id % 64 + 1 AS INTEGER) AS width,
       CAST(doc_id % 48 + 1 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(doc_id % 256 AS DOUBLE) AS mean_intensity
FROM documents
"""


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_decode_features": mm_decode_features,
}

ORACLES = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    # round 4: the decode is real (PPM/BMP parse) and the synthesized
    # payloads make its features integer-exact -> full value-hash oracle
    "mm_decode_features": MM_DECODE_FEATURES_SQL,
}
