"""Training-data pipeline operators beyond analysis: document chunking,
deterministic sampling, and embedding quantization — the preprocessing
stages between raw corpus and training shards.

All three are pure built-in column expressions (sequence / slice /
transform / aggregate — JVM-side, codegen'd): chunking fans out rows but
never shuffles; sampling is a scan-side filter (predicate-pushdown
friendly); quantization is per-row math. Each scales linearly and has an
exact DuckDB oracle.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.functions.text import _SQL_TOKENS, tokens
from mysql_cdc_table_spark.operators._util import t

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: token windows of CHUNK_TOKENS
    every CHUNK_STRIDE tokens (overlap = context carry-over for
    training). One output row per chunk with its token span and text;
    documents shorter than one stride still yield their single chunk.
    Map-side fan-out only — no shuffle, chunk count ~ n_tokens/stride."""
    d = t(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    # chunk start offsets: 1, 1+S, 1+2S, ... while start <= n (1-based)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    ex = tk.select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        "tk",
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    return ex.select(
        "doc_id",
        "chunk_id",
        "start",
        F.least(
            (F.col("start") + CHUNK_TOKENS - 1), F.col("n_tokens")
        ).alias("end"),
        F.array_join(
            F.slice(F.col("tk"), F.col("start"), F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
    )


TEXT_CHUNK_SLIDING_SQL = f"""
WITH tk AS (
  SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents
), nz AS (
  SELECT doc_id, tk, len(tk) AS n_tokens FROM tk WHERE len(tk) > 0
), ex AS (
  SELECT doc_id, n_tokens, tk,
         CAST(u.ord - 1 AS INTEGER) AS chunk_id,
         CAST(u.start AS INTEGER) AS start
  FROM nz, LATERAL (
    SELECT UNNEST(range(1, greatest(n_tokens, 1) + 1, {CHUNK_STRIDE})) AS start,
           generate_subscripts(range(1, greatest(n_tokens, 1) + 1,
                                     {CHUNK_STRIDE}), 1) AS ord
  ) u
)
SELECT doc_id, chunk_id, start,
       least(start + {CHUNK_TOKENS} - 1, n_tokens) AS "end",
       array_to_string(tk[start : start + {CHUNK_TOKENS} - 1], ' ')
         AS chunk_text
FROM ex
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: language strata keep different
    rates (the quality-rebalancing step of corpus curation). The keep
    decision is portable arithmetic on doc_id — (doc_id * 2654435761)
    mod 100 < pct — so the sample is reproducible across engines and
    runs, and the filter sits at the scan (pushdown-friendly), no
    shuffle, no RNG state."""
    d = t(spark, sf_dir, "documents")
    slot = (F.col("doc_id") * 2654435761) % 100
    pct = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "de", 80)
        .otherwise(100)
    )
    return d.filter(slot < pct).select(
        "doc_id", "lang", F.length("text").alias("text_len")
    )


SAMPLE_STRATIFIED_SQL = """
SELECT doc_id, lang, length(text) AS text_len
FROM documents
WHERE (doc_id * 2654435761) % 100 <
      CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 80 ELSE 100 END
"""


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector absmax scale,
    codes = round(v * 127 / absmax), plus the max reconstruction error —
    the storage-shrink step before ANN indexing at corpus scale. Codes
    surface as a joined string (integer rendering is engine-identical;
    the driver's hasher cannot take arrays)."""
    e = t(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absmax = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    wz = e.select("vec_id", vec.alias("v"), absmax.alias("m")).filter(
        F.col("m") > 0
    )
    codes = F.transform(
        F.col("v"), lambda x: F.round(x * 127.0 / F.col("m"), 0).cast("int")
    )
    deq_err = F.aggregate(
        F.zip_with(
            codes,
            F.col("v"),
            lambda c, x: F.abs(c.cast("double") * F.col("m") / 127.0 - x),
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return wz.select(
        "vec_id",
        (F.round(F.col("m"), 6) + F.lit(0.0)).alias("scale"),
        F.array_join(
            F.transform(codes, lambda c: c.cast("string")), ","
        ).alias("codes"),
        (F.round(deq_err, 6) + F.lit(0.0)).alias("max_err"),
    )


EMB_QUANTIZE_INT8_SQL = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
  FROM embeddings
), wz AS (
  SELECT * FROM v WHERE m > 0
), q AS (
  SELECT vec_id, m, v,
         list_transform(v, x -> CAST(round(x * 127.0 / m) AS INTEGER)) AS codes
  FROM wz
)
SELECT vec_id,
       round(m, 6) + 0.0 AS scale,
       array_to_string(codes, ',') AS codes,
       round(list_max(list_transform(list_zip(codes, v),
             p -> abs(CAST(p[1] AS DOUBLE) * m / 127.0
                      - CAST(p[2] AS DOUBLE)))), 6) + 0.0 AS max_err
FROM q
"""


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE composed plan: quality gate
    (text_quality_filter) -> exact-dedup keepers only (dedup_exact's
    min-id rule) -> per-(lang, source) shard budget: surviving docs,
    total chars, total training chunks (text_chunk_sliding's window
    arithmetic), mean quality. This is the integration query — the
    stages the other operators provide individually, composed the way a
    real curation job runs them, still as a single Catalyst plan (the
    optimizer sees through the composition: one documents scan per
    stage, joins on doc_id, no materialization barriers)."""
    from mysql_cdc_table_spark.functions.dedup import dedup_exact
    from mysql_cdc_table_spark.functions.text import text_quality_filter

    q = text_quality_filter(spark, sf_dir)
    keep = dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    chunks = (
        F.floor((F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / CHUNK_STRIDE) + 1
    )
    # quality is already 6-decimal; averaging the doubles directly is
    # summation-order-dependent across engines, so aggregate EXACT
    # integer micro-units and report the integer-division mean.
    q_e6 = F.round(F.col("quality") * 1e6).cast("long")
    return (
        q.join(keep, "doc_id")
        .join(d, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(chunks).alias("total_chunks"),
            F.sum(q_e6).alias("q_e6_sum"),
        )
        .withColumn("avg_quality_e6", F.expr("q_e6_sum div n_docs"))
        .drop("q_e6_sum")
    )


def _corpus_prep_pipeline_sql() -> str:
    from mysql_cdc_table_spark.functions.dedup import DEDUP_EXACT_SQL
    from mysql_cdc_table_spark.functions.text import TEXT_QUALITY_FILTER_SQL

    return f"""
WITH q AS (SELECT * FROM ({TEXT_QUALITY_FILTER_SQL})),
k AS (SELECT keep_doc_id AS doc_id FROM ({DEDUP_EXACT_SQL})),
d AS (SELECT doc_id, n_chars, len({_SQL_TOKENS}) AS n_tokens FROM documents)
SELECT q.lang, q.source,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       CAST(sum(floor((greatest(d.n_tokens, 1) - 1) / {CHUNK_STRIDE}) + 1)
            AS BIGINT) AS total_chunks,
       CAST(sum(CAST(round(q.quality * 1e6) AS BIGINT)) AS BIGINT)
         // count(*) AS avg_quality_e6
FROM q JOIN k USING (doc_id) JOIN d USING (doc_id)
GROUP BY q.lang, q.source
"""


QUERIES = {
    "text_chunk_sliding": text_chunk_sliding,
    "sample_stratified": sample_stratified,
    "emb_quantize_int8": emb_quantize_int8,
}

ORACLES = {
    "text_chunk_sliding": TEXT_CHUNK_SLIDING_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "emb_quantize_int8": EMB_QUANTIZE_INT8_SQL,
}
