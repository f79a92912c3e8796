"""Corpus-quality operators: PII scrubbing, repetition-based quality
filtering, source-mixture rebalancing (equalize + temperature), and
shard-manifest packing — the curation stages a training-data pipeline
runs between ingestion and sharding.

All stay JVM-side (regexp_*, explode + grouped aggs, windows) — no
Python in the row path. Each has an exact DuckDB oracle:

- PII scrub builds a deterministic PII-bearing fixture from ``doc_id``
  (the synthetic corpus itself is digit-free), so the regex semantics
  are exercised for real on every row in both engines.
- Repetition scoring (Gopher-style top-n-gram fraction) surfaces only
  integer counts and integer-inequality flags — zero float in the
  compare, so cross-engine parity is exact by construction.
- Mixture equalization downsamples every source stratum to the global
  minimum stratum size with a portable-hash ranking; temperature
  mixing smooths shares by sqrt(stratum size) with integer-exact
  arithmetic — the two deterministic versions of "rebalance the
  domain mix".
- The shard manifest packs documents into fixed-token-budget shards
  with a two-level distributed prefix sum; corpus_pack_sequences
  reuses the same prefix sum to slice the concatenated corpus into
  fixed-SEQ_LEN training sequences (documents split across
  boundaries — GPT-style concat-and-chunk).

Reference parity: this surface is reached through MySQL's SQL layer in
the reference (the plugin contributes only the scan —
/root/reference/binlogdb.cc:477-551; SURVEY.md §2C north-star rows).

Scale notes (100 TB): the scrub is a pure map (scan-pipelined, no
shuffle); repetition scoring is explode + two map-side-combinable
grouped aggs keyed on doc_id — linear, no skew (keys are unique docs);
equalization shuffles once on ``source`` for the per-stratum ranking —
with few heavy strata, the per-source sort is the cost, and the
scan-side alternative (rate-threshold on the hash slot, no ranking) is
noted in the docstring for when exact stratum sizes aren't required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.functions.text import _SQL_TOKENS, tokens
from mysql_cdc_table_spark.operators._util import t

# Patterns restricted to the Java-regex ∩ RE2 common subset so Spark and
# DuckDB compile them identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _augmented_text() -> F.Column:
    """documents.text + deterministic doc_id-derived PII spans (email on
    2/3 of docs, phone on 1/2, IPv4 on 3/5 — mixed presence so the
    redaction counts vary row to row)."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 > 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@mail.example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 > 1,
        F.concat(F.lit(" from 10."), (did % 256).cast("string"), F.lit(".0.1")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, phone numbers, IPv4) with per-kind
    hit counts. Pure per-row regexp_count/regexp_replace — pipelined
    into the scan, no shuffle, linear at any scale."""
    d = t(spark, sf_dir, "documents")
    s = _augmented_text()
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(s, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(s, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(s, F.lit(IP_RE)).cast("long").alias("n_ips"),
        clean.alias("clean_text"),
    )


_PII_AUG_SQL = """
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 > 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 2 = 0
              THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 5 > 1
              THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
              ELSE '' END AS s
  FROM documents
"""

TEXT_PII_SCRUB_SQL = f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(s, '{IP_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(
         s, '{EMAIL_RE}', '<EMAIL>', 'g'),
            '{PHONE_RE}', '<PHONE>', 'g'),
            '{IP_RE}', '<IP>', 'g') AS clean_text
FROM aug
"""


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: top-unigram and
    top-bigram counts vs totals, plus a keep flag (top unigram ≤ 20% of
    tokens AND top bigram ≤ 20% of bigrams). All outputs are integers
    or integer-inequality booleans — exact cross-engine parity.

    Two explode→groupBy(doc_id, gram) passes, each reduced again to one
    row per doc: both aggs are map-side combinable and keyed on the
    (unique) doc_id, so the shuffle carries ~distinct-gram rows and no
    key is hot. The bigram array is built by zipping two slices of the
    materialized token array (no per-element re-evaluation)."""
    d = t(spark, sf_dir, "documents")
    tk = (
        d.select("doc_id", tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") > 0)
        .select("doc_id", "tk", F.size("tk").alias("n_tokens"))
    )
    uc = (
        tk.select("doc_id", "n_tokens", F.explode("tk").alias("w"))
        .groupBy("doc_id", "n_tokens", "w")
        .agg(F.count("*").alias("c"))
    )
    pu = uc.groupBy("doc_id", "n_tokens").agg(
        F.max("c").alias("top_unigram_count"),
        F.count("*").alias("n_distinct"),
    )
    bigrams = F.zip_with(
        F.expr("slice(tk, 1, size(tk) - 1)"),
        F.expr("slice(tk, 2, size(tk) - 1)"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bc = (
        tk.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    pb = bc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("n_bigrams"),
    )
    return (
        pu.join(pb, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "top_unigram_count",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        )
        .withColumn(
            "keep",
            (F.col("top_unigram_count") * 5 <= F.col("n_tokens"))
            & (
                F.col("top_bigram_count") * 5
                <= F.greatest(F.col("n_bigrams"), F.lit(1))
            ),
        )
    )


TEXT_REPETITION_SCORE_SQL = f"""
WITH tkn AS (SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents),
nz AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM tkn WHERE len(tk) > 0),
uc AS (
  SELECT doc_id, n_tokens, w, count(*) AS c
  FROM (SELECT doc_id, n_tokens, unnest(tk) AS w FROM nz)
  GROUP BY 1, 2, 3
),
pu AS (
  SELECT doc_id, n_tokens, CAST(max(c) AS BIGINT) AS top_unigram_count,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM uc GROUP BY 1, 2
),
bc AS (
  SELECT doc_id, b, count(*) AS c
  FROM (SELECT doc_id,
               unnest(list_transform(
                 list_zip(tk[1:len(tk)-1], tk[2:len(tk)]),
                 p -> p[1] || ' ' || p[2])) AS b
        FROM nz WHERE len(tk) >= 2)
  GROUP BY 1, 2
),
pb AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM bc GROUP BY 1
)
SELECT pu.doc_id, n_tokens, n_distinct, top_unigram_count,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(top_bigram_count, 0) AS top_bigram_count,
       (top_unigram_count * 5 <= n_tokens AND
        COALESCE(top_bigram_count, 0) * 5
          <= greatest(COALESCE(n_bigrams, 0), 1)) AS keep
FROM pu LEFT JOIN pb ON pu.doc_id = pb.doc_id
"""


def corpus_mix_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalize the source mixture: every source stratum is downsampled
    to the size of the smallest stratum, choosing rows by portable-hash
    rank (reproducible across engines and runs; no RNG state).

    One shuffle on ``source`` for the per-stratum ranking; the stratum
    floor is a broadcast scalar. If exact stratum sizes aren't required
    at scale, skip the ranking and threshold directly on the hash slot
    (rate = floor/stratum_count) — that variant is pure scan-side."""
    d = t(spark, sf_dir, "documents")
    slot = ((F.col("doc_id") * 2654435761) % 1000003).alias("slot")
    ranked = d.select("doc_id", "source", slot).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy("slot", "doc_id")
        ),
    )
    floor = (
        d.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").alias("m"))
    )
    return (
        ranked.join(F.broadcast(floor))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "source")
    )


CORPUS_MIX_EQUALIZE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 1000003, doc_id) AS rk
  FROM documents
),
m AS (
  SELECT min(cnt) AS m
  FROM (SELECT count(*) AS cnt FROM documents GROUP BY source)
)
SELECT doc_id, source FROM r, m WHERE rk <= m.m
"""


SHARD_TOKENS = 2000  # token budget per training shard
SHARD_BUCKETS = 32  # prefix-sum parallelism


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget training shards and emit
    the per-shard manifest (doc count + token total). Packing order is a
    portable hash of doc_id (deterministic corpus shuffle), and shard
    boundaries come from the global token prefix sum.

    The prefix sum is the scale-relevant part: a naive global cumsum is
    one window over ONE partition. Here it is the standard distributed
    two-level form — cumsum within each of SHARD_BUCKETS hash buckets
    (parallel), plus a broadcast per-bucket offset table (SHARD_BUCKETS
    rows) — so no single task ever sees more than 1/buckets of the
    data, at any corpus size."""
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .withColumn("slot", (F.col("doc_id") * 2654435761) % 1000003)
        .withColumn("bkt", F.col("doc_id") % SHARD_BUCKETS)
    )
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("slot", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("lcum", F.sum("n_tok").over(wloc))
    btot = d.groupBy("bkt").agg(F.sum("n_tok").alias("btok"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt", F.coalesce(F.sum("btok").over(woff), F.lit(0)).alias("off")
    )
    g = local.join(F.broadcast(offs), "bkt").withColumn(
        "gcum", F.col("lcum") + F.col("off")
    )
    return (
        g.withColumn("shard_id", F.expr(f"(gcum - n_tok) div {SHARD_TOKENS}"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
        )
    )


SHARD_MANIFEST_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 1000003 AS slot,
         doc_id % {SHARD_BUCKETS} AS bkt
  FROM documents
),
l AS (
  SELECT doc_id, n_tok, bkt,
         CAST(sum(n_tok) OVER (PARTITION BY bkt ORDER BY slot, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lcum
  FROM d
),
bt AS (SELECT bkt, CAST(sum(n_tok) AS BIGINT) AS btok FROM d GROUP BY bkt),
o AS (
  SELECT bkt,
         CAST(COALESCE(sum(btok) OVER (ORDER BY bkt ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM bt
),
g AS (SELECT doc_id, n_tok, lcum + off AS gcum FROM l JOIN o USING (bkt))
SELECT CAST((gcum - n_tok) // {SHARD_TOKENS} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS shard_tokens
FROM g GROUP BY 1
"""


SEQ_LEN = 512  # training context window (tokens)


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus (in the
    deterministic portable-hash shuffle order) and slice it into
    fixed-SEQ_LEN training sequences, emitting one row per
    (sequence, document) slice — ``doc_from``/``doc_to`` are the token
    half-open range the doc contributes. Unlike shard_manifest (whole
    docs into coarse shards) documents SPLIT across sequence
    boundaries, exactly like concat-and-chunk pretraining ingestion.

    Scale: the global token position comes from the same two-level
    distributed prefix sum as shard_manifest (bucket-local cumsum +
    broadcast bucket offsets — no single-partition window). The
    boundary-spanning fan-out is a per-row ``sequence()`` explode whose
    length is 1 + spans, so output rows = n_docs + n_sequences — linear.
    All arithmetic is integer; the oracle reproduces it bit-for-bit."""
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .withColumn("slot", (F.col("doc_id") * 2654435761) % 1000003)
        .withColumn("bkt", F.col("doc_id") % SHARD_BUCKETS)
        .filter(F.col("n_tok") > 0)
    )
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("slot", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("lcum", F.sum("n_tok").over(wloc))
    btot = d.groupBy("bkt").agg(F.sum("n_tok").alias("btok"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt", F.coalesce(F.sum("btok").over(woff), F.lit(0)).alias("off")
    )
    g = (
        local.join(F.broadcast(offs), "bkt")
        .withColumn("tok_end", F.col("lcum") + F.col("off"))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tok"))
    )
    return (
        g.withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"tok_start div {SEQ_LEN}"),
                    F.expr(f"(tok_end - 1) div {SEQ_LEN}"),
                )
            ),
        )
        .select(
            "seq_id",
            "doc_id",
            (
                F.greatest(F.col("seq_id") * SEQ_LEN, F.col("tok_start"))
                - F.col("tok_start")
            ).alias("doc_from"),
            (
                F.least((F.col("seq_id") + 1) * SEQ_LEN, F.col("tok_end"))
                - F.col("tok_start")
            ).alias("doc_to"),
        )
        .withColumn("n_fill", F.col("doc_to") - F.col("doc_from"))
    )


CORPUS_PACK_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 1000003 AS slot,
         doc_id % {SHARD_BUCKETS} AS bkt
  FROM documents
),
d2 AS (SELECT * FROM d WHERE n_tok > 0),
l AS (
  SELECT doc_id, n_tok, bkt,
         CAST(sum(n_tok) OVER (PARTITION BY bkt ORDER BY slot, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lcum
  FROM d2
),
bt AS (SELECT bkt, CAST(sum(n_tok) AS BIGINT) AS btok FROM d2 GROUP BY bkt),
o AS (
  SELECT bkt,
         CAST(COALESCE(sum(btok) OVER (ORDER BY bkt ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM bt
),
g AS (
  SELECT doc_id, n_tok, lcum + off AS tok_end, lcum + off - n_tok AS tok_start
  FROM l JOIN o USING (bkt)
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(seq_id * {SEQ_LEN}, tok_start) - tok_start AS BIGINT)
         AS doc_from,
       CAST(least((seq_id + 1) * {SEQ_LEN}, tok_end) - tok_start AS BIGINT)
         AS doc_to,
       CAST(least((seq_id + 1) * {SEQ_LEN}, tok_end)
            - greatest(seq_id * {SEQ_LEN}, tok_start) AS BIGINT) AS n_fill
FROM g, unnest(generate_series(tok_start // {SEQ_LEN},
                               (tok_end - 1) // {SEQ_LEN})) AS u(seq_id)
"""


MIX_KEEP_TOTAL = 10_000  # corpus budget for temperature mixing


def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (alpha=0.5) domain mixing: each source gets
    a share of a fixed budget proportional to sqrt(stratum size) — the
    standard up-weighting of small domains — filled deterministically by
    portable-hash rank. All share arithmetic is INTEGER (w = floor(sqrt
    (n)), target = w*BUDGET div sum(w)): sqrt is correctly rounded in
    IEEE so floor(sqrt) is engine-identical, and the integer division
    avoids the cross-engine float-sum-order trap entirely.

    Same shuffle shape as corpus_mix_equalize (one per-source ranking +
    a broadcast share table); emits the per-source manifest."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    weights = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("cnt"))).cast("long")
    )
    total_w = weights.agg(F.sum("w").alias("tw"))
    shares = (
        weights.join(F.broadcast(total_w))
        .withColumn(
            "target", F.expr(f"(w * {MIX_KEEP_TOTAL}) div tw")
        )
        .select("source", "cnt", "target")
    )
    ranked = d.select(
        "doc_id",
        "source",
        ((F.col("doc_id") * 2654435761) % 1000003).alias("slot"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy("slot", "doc_id")
        ),
    )
    kept = ranked.join(F.broadcast(shares), "source").filter(
        F.col("rk") <= F.col("target")
    )
    return kept.groupBy("source").agg(
        F.max("cnt").alias("n_total"),
        F.max("target").alias("share_target"),
        F.count("*").alias("n_kept"),
    )


CORPUS_MIX_TEMPERATURE_SQL = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS cnt,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
s AS (
  SELECT source, cnt,
         CAST((w * {MIX_KEEP_TOTAL}) // (SELECT sum(w) FROM c) AS BIGINT)
           AS target
  FROM c
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 1000003, doc_id) AS rk
  FROM documents
)
SELECT r.source,
       CAST(max(s.cnt) AS BIGINT) AS n_total,
       CAST(max(s.target) AS BIGINT) AS share_target,
       CAST(count(*) AS BIGINT) AS n_kept
FROM r JOIN s ON r.source = s.source
WHERE r.rk <= s.target
GROUP BY r.source
"""


QUERIES = {
    "text_pii_scrub": text_pii_scrub,
    "text_repetition_score": text_repetition_score,
    "corpus_mix_equalize": corpus_mix_equalize,
    "shard_manifest": shard_manifest,
    "corpus_mix_temperature": corpus_mix_temperature,
    "corpus_pack_sequences": corpus_pack_sequences,
}

ORACLES = {
    "text_pii_scrub": TEXT_PII_SCRUB_SQL,
    "text_repetition_score": TEXT_REPETITION_SCORE_SQL,
    "corpus_mix_equalize": CORPUS_MIX_EQUALIZE_SQL,
    "shard_manifest": SHARD_MANIFEST_SQL,
    "corpus_mix_temperature": CORPUS_MIX_TEMPERATURE_SQL,
    "corpus_pack_sequences": CORPUS_PACK_SEQUENCES_SQL,
}
