"""Deduplication for LLM data pipelines: exact, n-gram Jaccard,
MinHash+LSH banding, SimHash.

Engine-portability rule: every hash is built from arithmetic both
engines evaluate identically (token codes + polynomial folds mod a
prime) — never xxhash/murmur, which differ across engines — so each
operator has an exact DuckDB oracle.

Scale design (the part that matters at 100 TB):
- exact dedup: one hash-partition shuffle on the dedup key; at scale the
  key is a 128-bit content hash, so groups are tiny and skew-free.
- n-gram Jaccard: candidate pairs come from an inverted shingle index
  (explode -> self-join on shingle). Hot shingles are capped (HAVING
  count <= CAP) — the standard stop-shingle cut that keeps the join
  output near-linear instead of quadratic.
- MinHash/LSH: signatures are 16 independent min-aggregations over the
  shingle-hash stream (one shuffle, map-side combinable); candidate
  pairs join only within LSH band buckets, again with a bucket-size cap.
- SimHash: one explode + one grouped sum per bit — fully map-side
  combinable; pair search would join on rotated bit-blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.functions.text import MOD, token_code, tokens
from mysql_cdc_table_spark.operators._util import t

N_HASHES = 16
N_BANDS = 4  # 4 rows per band
HOT_SHINGLE_CAP = 100
HOT_BUCKET_CAP = 50


# --- exact dedup -------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized key (here: first 40 chars — at real
    scale: sha2 of normalized text). Keeps the smallest doc_id per group
    (deterministic, unlike dropDuplicates' arbitrary row)."""
    d = t(spark, sf_dir, "documents")
    key = F.substring("text", 1, 40)
    return (
        d.groupBy(key.alias("dup_key"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT substr(text, 1, 40) AS dup_key,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY substr(text, 1, 40)
"""


# --- shingles ----------------------------------------------------------------


def shingle_hashes(codes: Column) -> Column:
    """Distinct hashed 3-gram word shingles: h = ((c1*31+c2)*31+c3) mod p
    over per-token codes, built by zipping three shifted slices of the
    codes array. ``codes`` MUST be a materialized column reference (not a
    derived expression): Catalyst inlines derived arrays into every
    lambda, turning an indexed formulation O(n^2) per document — measured
    17x slower on this corpus. Hashing during shingling (vs materializing
    shingle strings) keeps the exploded stream to 8 bytes per shingle."""
    n = F.size(codes)
    g12 = F.zip_with(
        F.slice(codes, F.lit(1), n - 2),
        F.slice(codes, F.lit(2), n - 2),
        lambda a, b: a * 31 + b,
    )
    grams = F.zip_with(
        g12, F.slice(codes, F.lit(3), n - 2), lambda a, b: (a * 31 + b) % MOD
    )
    return F.array_distinct(
        F.when(n < 3, F.array().cast("array<bigint>")).otherwise(grams)
    )


_SQL_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"

# DuckDB twin: zip the three shifted code slices.
_SQL_SHINGLES = f"""
SELECT doc_id,
       list_distinct(
         CASE WHEN len(tk) < 3 THEN []::BIGINT[]
              ELSE list_transform(
                     list_zip(c[1:len(c)-2], c[2:len(c)-1], c[3:len(c)]),
                     p -> ((p[1]*31 + p[2])*31 + p[3]) % {MOD})
         END) AS sh
FROM (SELECT doc_id, tk,
             list_transform(tk, x -> CAST(length(x)*131 + ascii(x) AS BIGINT)) AS c
      FROM (SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents))
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The documents scan may arrive in few (or one) splits; shingling is
    # CPU-bound, so spread it across the cluster BEFORE deriving shingles
    # (one small shuffle of raw text buys full parallelism for the
    # expensive stage — the standard fix for narrow-input compute).
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # two-stage projection: materialize the codes array once per row, THEN
    # derive shingles from the column reference (see shingle_hashes note)
    codes = d.select(
        "doc_id", F.transform(tokens(F.col("text")), token_code).alias("c")
    )
    return codes.select("doc_id", shingle_hashes(F.col("c")).alias("sh"))


# --- n-gram Jaccard ----------------------------------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from the inverted shingle index; exact Jaccard
    over distinct shingle sets; emit pairs above threshold."""
    docs = _doc_shingles(spark, sf_dir).withColumn("n_sh", F.size("sh"))
    ex = docs.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    # stop-shingle cut (both engines apply the identical deterministic cap)
    hot = ex.groupBy("s").agg(F.count("*").alias("df")).filter(
        F.col("df") <= HOT_SHINGLE_CAP
    )
    ex = ex.join(hot.select("s"), "s")
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("n1") + F.col("n2") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc1", "doc2", "common", "jaccard")
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
docs AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh),
ex AS (SELECT doc_id, n_sh, unnest(sh) AS s FROM docs),
keep AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {HOT_SHINGLE_CAP}),
exk AS (SELECT ex.* FROM ex JOIN keep USING (s)),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.n_sh AS n1, b.n_sh AS n2,
         count(*) AS common
  FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc1, doc2, common,
       round(common / CAST(n1 + n2 - common AS DOUBLE), 6) AS jaccard
FROM pairs
WHERE round(common / CAST(n1 + n2 - common AS DOUBLE), 6) >= 0.2
"""


# --- MinHash + LSH -----------------------------------------------------------
# permutation i: h_i(x) = ((2i+1)*x + 5i+7) mod p


def _minhash_cols() -> list[Column]:
    out = []
    for i in range(N_HASHES):
        a, b = 2 * i + 1, 5 * i + 7
        out.append(
            F.min((F.col("s") * a + b) % MOD).alias(f"mh_{i}")
        )
    return out


def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation MinHash signature per document (docs with <3 tokens
    have no shingles and drop out, in both engines)."""
    ex = _doc_shingles(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("s")
    )
    return ex.groupBy("doc_id").agg(*_minhash_cols())


_SQL_MH = ",\n       ".join(
    f"min((s * {2*i+1} + {5*i+7}) % {MOD}) AS mh_{i}" for i in range(N_HASHES)
)

DEDUP_MINHASH_SIGNATURE_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE len(sh) > 0)
SELECT doc_id,
       {_SQL_MH}
FROM ex GROUP BY doc_id
"""


def _band_expr(j: int) -> Column:
    b = F.col(f"mh_{4 * j}")
    for k in range(1, 4):
        b = (b * 31 + F.col(f"mh_{4 * j + k}")) % MOD
    return b


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: 4 bands x 4 rows; candidate pair = docs sharing any
    band bucket (bucket-size cap applied identically in both engines)."""
    sig = dedup_minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[_band_expr(j) for j in range(N_BANDS)])).alias(
            "band", "bucket"
        ),
    )
    small = bands.groupBy("band", "bucket").agg(F.count("*").alias("bn")).filter(
        F.col("bn") <= HOT_BUCKET_CAP
    )
    bands = bands.join(small.select("band", "bucket"), ["band", "bucket"])
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .distinct()
    )


def _sql_band(j: int) -> str:
    expr = f"mh_{4 * j}"
    for k in range(1, 4):
        expr = f"(({expr}) * 31 + mh_{4 * j + k}) % {MOD}"
    return expr


DEDUP_MINHASH_PAIRS_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE len(sh) > 0),
sig AS (SELECT doc_id, {_SQL_MH} FROM ex GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {j} AS band, {_sql_band(j)} AS bucket FROM sig" for j in range(N_BANDS))}
),
small AS (SELECT band, bucket FROM bands GROUP BY band, bucket
          HAVING count(*) <= {HOT_BUCKET_CAP}),
bk AS (SELECT bands.* FROM bands JOIN small USING (band, bucket))
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
FROM bk a JOIN bk b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


# --- SimHash -----------------------------------------------------------------

N_BITS = 16
_SPREAD = 2_654_435_761  # Knuth multiplicative constant


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the token stream (frequency-weighted): bit b
    of h(token) votes +1/-1; signature bit = sign of the vote sum."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    ex = d.select(
        "doc_id",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).select(
        "doc_id", ((token_code(F.col("tok")) * _SPREAD) % 2147483647).alias("h")
    )
    votes = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v_{b}")
            for b in range(N_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(N_BITS):
        sig = sig + F.when(F.col(f"v_{b}") > 0, 1 << b).otherwise(0)
    return votes.select("doc_id", sig.alias("simhash"))


_SQL_VOTES = ",\n       ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
    for b in range(N_BITS)
)
_SQL_SIG = " + ".join(
    f"CASE WHEN v_{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(N_BITS)
)

DEDUP_SIMHASH_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         (CAST(length(tok)*131 + ascii(tok) AS BIGINT) * {_SPREAD})
           % 2147483647 AS h
  FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents)
),
votes AS (SELECT doc_id, {_SQL_VOTES} FROM ex GROUP BY doc_id)
SELECT doc_id, CAST({_SQL_SIG} AS BIGINT) AS simhash FROM votes
"""




# --- embedding-cosine near-dup ----------------------------------------------


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup removal: candidate pairs come from the
    hot-capped blocked pair search (similarity.ann_block_pairs — bounded
    quadratic), a pair with cosine >= THRESH marks the LARGER vec_id as
    a duplicate, and survivors are the left-anti join against the dup
    set (greedy min-id keeper, the embedding analogue of dedup_exact's
    min(doc_id)). Returns surviving vectors per label."""
    from mysql_cdc_table_spark.functions.similarity import ann_block_pairs

    pairs = ann_block_pairs(spark, sf_dir).filter(
        F.col("cos") >= EMB_DUP_THRESH
    )
    dups = pairs.select(F.col("vec2").alias("vec_id")).distinct()
    e = t(spark, sf_dir, "embeddings")
    return (
        e.join(dups, "vec_id", "left_anti")
        .groupBy("label")
        .agg(F.count("*").alias("n_kept"))
    )


EMB_DUP_THRESH = 0.9

DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH pairs AS (
  SELECT * FROM ({{block_pairs}}) WHERE cos >= {{thresh}}
),
dups AS (SELECT DISTINCT vec2 AS vec_id FROM pairs)
SELECT label, count(*) AS n_kept
FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dups)
GROUP BY label
"""


from mysql_cdc_table_spark.functions.similarity import ANN_BLOCK_PAIRS_SQL

_DEDUP_EMB_SQL = DEDUP_EMBEDDING_COSINE_SQL.format(
    block_pairs=ANN_BLOCK_PAIRS_SQL, thresh=EMB_DUP_THRESH
)

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_signature": dedup_minhash_signature,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_minhash_signature": DEDUP_MINHASH_SIGNATURE_SQL,
    "dedup_minhash_pairs": DEDUP_MINHASH_PAIRS_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_embedding_cosine": _DEDUP_EMB_SQL,
}
