"""Text analysis for LLM data pipelines: tokenization, language ID,
quality scoring, document fingerprinting.

All operators are pure built-in column expressions (split / filter /
transform / aggregate — JVM-side, codegen'd); nothing here touches a
Python UDF, so the hot path scales to 100 TB of documents with zero
serialization overhead. Every op is deterministic and has an exact
DuckDB oracle.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

MOD = 1_000_000_007

# Tiny stopword profiles for the n-gram/stopword language heuristic.
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "zu", "ist"],
    "es": ["el", "la", "de", "y", "que", "es"],
    "fr": ["le", "la", "de", "et", "les", "est"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token filtering."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_code(tok: Column) -> Column:
    """Deterministic per-token code (engine-portable: no xxhash/murmur,
    which differ across engines): length*131 + first-char codepoint."""
    return (F.length(tok) * 131 + F.ascii(tok)).cast("long")


def poly_fingerprint(tok_array: Column) -> Column:
    """Order-sensitive rolling hash over the token stream:
    fold acc -> (acc*31 + code) mod p. The document-fingerprint primitive
    (detects reordered copies that a bag-of-words hash misses)."""
    codes = F.transform(tok_array, token_code)
    return F.when(F.size(codes) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % MOD,
        )
    )


# SQL twin of poly_fingerprint: list_reduce has no init, but
# fold(0,c1)=c1, so reducing from the first element is identical.
def _sql_fingerprint(tk: str) -> str:
    codes = f"list_transform({tk}, x -> CAST(length(x)*131 + ascii(x) AS BIGINT))"
    return (
        f"CASE WHEN len({tk}) = 0 THEN 0 "
        f"ELSE list_reduce({codes}, (a, b) -> (a*31 + b) % {MOD}) END"
    )


_SQL_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"


# --- 3-gram shingles (shared by dedup + contamination ops) -------------------


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


def _doc_shingles(
    spark: SparkSession, sf_dir: str, require_shingles: bool = False
) -> DataFrame:
    # The documents scan may arrive in few (or one) splits; shingling is
    # CPU-bound, so spread it across the cluster BEFORE deriving shingles
    # (one small shuffle of raw text buys full parallelism for the
    # expensive stage — the standard fix for narrow-input compute).
    d = t(spark, sf_dir, "documents")
    if require_shingles:
        # r15 optimization (guide §2.3/§7.2): callers used to append
        # .filter(size(sh) > 0) AFTER this builder — Catalyst pushes
        # that predicate below the repartition exchange with the ENTIRE
        # tokenize+shingle chain inlined (the token subexpression alone
        # six times), so every document paid the full chain twice. A
        # document has shingles iff it has >= 3 tokens, so push the
        # CHEAP equivalent predicate instead: the pre-exchange filter
        # costs one tokenize pass, shuffles fewer rows, and the full
        # shingle chain runs exactly once, after the exchange.
        d = d.filter(F.size(tokens(F.col("text"))) >= 3)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # two-stage projection: materialize the codes array once per row, THEN
    # derive shingles from the column reference (see shingle_hashes note)
    codes = d.select(
        "doc_id", F.transform(tokens(F.col("text")), token_code).alias("c")
    )
    return codes.select("doc_id", shingle_hashes(F.col("c")).alias("sh"))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n = F.size(tk)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_distinct"),
        F.round(
            F.aggregate(
                F.transform(tk, lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / n,
            6,
        ).alias("mean_tok_len"),
        F.round(F.size(F.array_distinct(tk)) / n.cast("double"), 6).alias("ttr"),
        "n_chars",
    )


TEXT_TOKEN_STATS_SQL = f"""
WITH d AS (SELECT doc_id, n_chars, {_SQL_TOKENS} AS tk FROM documents)
SELECT doc_id,
       len(tk) AS n_tokens,
       len(list_distinct(tk)) AS n_distinct,
       round(list_sum(list_transform(tk, x -> CAST(length(x) AS DOUBLE)))
             / len(tk), 6) AS mean_tok_len,
       round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS ttr,
       n_chars
FROM d
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score per language = fraction of
    tokens in that language's profile; prediction = argmax with a fixed
    priority order. (On this corpus the text is synthetic word salad, so
    the interesting property is determinism + the scoring machinery.)"""
    d = t(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n = F.size(tk).cast("double")

    def score(lang: str) -> Column:
        prof = LANG_PROFILES[lang]
        return F.round(
            F.size(F.filter(tk, lambda x: x.isin(prof))) / n, 6
        ).alias(f"score_{lang}")

    scores = {lang: score(lang) for lang in LANG_PROFILES}
    sc = {lang: F.col(f"score_{lang}") for lang in LANG_PROFILES}
    pred = (
        F.when(
            (sc["en"] >= sc["de"]) & (sc["en"] >= sc["es"]) & (sc["en"] >= sc["fr"]),
            "en",
        )
        .when((sc["de"] >= sc["es"]) & (sc["de"] >= sc["fr"]), "de")
        .when(sc["es"] >= sc["fr"], "es")
        .otherwise("fr")
    )
    return (
        d.select("doc_id", "lang", *scores.values())
        .withColumn("pred_lang", pred)
        .withColumn("is_match", F.col("pred_lang") == F.col("lang"))
    )


def _sql_score(lang: str) -> str:
    prof = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        f"round(CAST(len(list_filter(tk, x -> x IN ({prof}))) AS DOUBLE)"
        f" / len(tk), 6)"
    )


TEXT_LANGID_SQL = f"""
WITH d AS (SELECT doc_id, lang, {_SQL_TOKENS} AS tk FROM documents),
s AS (
  SELECT doc_id, lang,
         {_sql_score('en')} AS score_en,
         {_sql_score('de')} AS score_de,
         {_sql_score('es')} AS score_es,
         {_sql_score('fr')} AS score_fr
  FROM d
)
SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
       CASE WHEN score_en >= score_de AND score_en >= score_es
                 AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       (CASE WHEN score_en >= score_de AND score_en >= score_es
                  AND score_en >= score_fr THEN 'en'
             WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr' END) = lang AS is_match
FROM s
"""


def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (type-token ratio, length saturation,
    stopword ratio) + threshold filter — the pre-training quality gate."""
    d = t(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n = F.size(tk).cast("double")
    ttr = F.size(F.array_distinct(tk)) / n
    len_sat = F.least(F.lit(1.0), n / F.lit(100.0))
    stop_ratio = F.size(F.filter(tk, lambda x: x.isin(LANG_PROFILES["en"]))) / n
    q = F.round(0.4 * ttr + 0.3 * len_sat + 0.3 * stop_ratio, 6)
    return (
        d.select("doc_id", "lang", "source", q.alias("quality"))
        .filter(F.col("quality") >= 0.35)
    )


_EN = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
TEXT_QUALITY_FILTER_SQL = f"""
WITH d AS (SELECT doc_id, lang, source, {_SQL_TOKENS} AS tk FROM documents),
s AS (
  SELECT doc_id, lang, source,
         round(0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk))
             + 0.3 * least(1.0, CAST(len(tk) AS DOUBLE) / 100.0)
             + 0.3 * (CAST(len(list_filter(tk, x -> x IN ({_EN}))) AS DOUBLE)
                      / len(tk)), 6) AS quality
  FROM d
)
SELECT doc_id, lang, source, quality FROM s WHERE quality >= 0.35
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint + per-(lang,source) dup audit."""
    d = t(spark, sf_dir, "documents")
    fp = poly_fingerprint(tokens(F.col("text")))
    return d.select("doc_id", "lang", "source", fp.alias("fingerprint"))


TEXT_FINGERPRINT_SQL = f"""
WITH d AS (SELECT doc_id, lang, source, {_SQL_TOKENS} AS tk FROM documents)
SELECT doc_id, lang, source, {_sql_fingerprint('tk')} AS fingerprint
FROM d
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf (idf = ln(N/df), smooth-free;
    ties broken lexicographically). Classic pipeline: explode -> term
    frequencies -> document frequencies (broadcast) -> score -> windowed
    top-k. Two shuffles (doc-term agg, window by doc); df table is tiny
    and broadcast.

    r15 optimization (guide §1.2/§2.3): the df branch used to run
    ``terms.distinct()`` (dedup of the full exploded (doc, term) stream)
    before its per-term count; tf rows are already one per distinct
    (doc, term), so df counts the tf aggregate instead, and the
    doc-count scalar rides in-plan as a broadcast 1-row aggregate
    rather than a separate ``d.count()`` job serialized ahead of the
    query (0.96s -> 0.85s min-of-5 at sf0.1; see
    plans/r15/text_tfidf_top_terms_*.txt)."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # NOTE (r15, measured): tf's aggregation piggybacks on the doc_id
    # repartition exchange (hashpartitioning(doc_id) satisfies the
    # (doc_id, term) clustering), so there is no tf exchange for the df
    # branch to reuse and the branch re-derives tf; a localCheckpoint
    # barrier to share it was measured SLOWER (1.07s vs 0.85s min-of-5
    # at sf0.1) than letting both branches run concurrently.
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = t(spark, sf_dir, "documents").agg(
        F.count("*").cast("double").alias("__n")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 9
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


TEXT_TFIDF_TOP_TERMS_SQL = f"""
WITH d AS (SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents),
terms AS (SELECT doc_id, unnest(tk) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term
                                         FROM terms) GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= 3
"""


# GPT-2-flavoured pre-tokenizer classes: letter runs are one token,
# each digit is its own token, each non-alnum non-space char its own
# token. ASCII classes only, so the Java and RE2 regex engines agree.
BPE_PAT = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (the task's second tokenizer tier beyond
    whitespace): pre-tokenize with the GPT-2-style regex above and
    report per-doc token mix + compression ratio (chars per token) —
    the budgeting number a training pipeline actually needs.

    Pure regexp_extract_all column expressions — JVM-side, codegen'd,
    no Python; one scan, no shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(BPE_PAT), F.lit(0))
    n_bpe = F.size(toks)
    n_word = F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0)))
    n_digit = F.size(F.regexp_extract_all("text", F.lit("[0-9]"), F.lit(0)))
    return d.select(
        "doc_id",
        n_bpe.alias("n_bpe"),
        n_word.alias("n_word"),
        n_digit.alias("n_digit"),
        (n_bpe - n_word - n_digit).alias("n_punct"),
        F.when(n_bpe == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_chars") / n_bpe.cast("double"), 6))
        .alias("chars_per_tok"),
    )


TEXT_TOKEN_BPE_SQL = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         len(regexp_extract_all(text, '{BPE_PAT}')) AS n_bpe,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit
  FROM documents
)
SELECT doc_id, n_bpe, n_word, n_digit,
       n_bpe - n_word - n_digit AS n_punct,
       CASE WHEN n_bpe = 0 THEN 0.0
            ELSE round(n_chars / CAST(n_bpe AS DOUBLE), 6) END AS chars_per_tok
FROM c
"""


BENCH_STRIDE = 97  # "benchmark" set = every 97th document (deterministic)


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each document's 3-gram
    shingles that appear anywhere in a held-out benchmark set (here a
    deterministic 1-in-97 doc sample standing in for an eval suite).
    The standard pre-training decontamination gate: docs with high
    overlap against eval data get quarantined before training.

    Scale design: the benchmark shingle vocabulary is tiny relative to
    the corpus, so it broadcasts; the corpus side explodes its shingles
    map-side, hits the broadcast set, and re-aggregates per doc — one
    shuffle (the per-doc count), no quadratic term anywhere."""
    docs = _doc_shingles(spark, sf_dir).withColumn("n_sh", F.size("sh"))
    bench_sh = (
        docs.filter(F.col("doc_id") % BENCH_STRIDE == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    ex = docs.filter(F.col("n_sh") > 0).select(
        "doc_id", "n_sh", F.explode("sh").alias("s")
    )
    hits = (
        ex.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        docs.filter(F.col("n_sh") > 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_sh").cast("double"), 6
            ).alias("contam_frac"),
        )
    )


TEXT_CONTAMINATION_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
docs AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM docs
          WHERE doc_id % {BENCH_STRIDE} = 0),
ex AS (SELECT doc_id, n_sh, unnest(sh) AS s FROM docs),
hits AS (SELECT doc_id, count(*) AS n_hit
         FROM ex JOIN bench USING (s) GROUP BY doc_id)
SELECT d.doc_id, d.n_sh,
       COALESCE(h.n_hit, 0) AS n_hit,
       round(COALESCE(h.n_hit, 0) / CAST(d.n_sh AS DOUBLE), 6) AS contam_frac
FROM docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


QUERIES = {
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_token_stats": text_token_stats,
    "text_langid": text_langid,
    "text_quality_filter": text_quality_filter,
    "text_fingerprint": text_fingerprint,
    "text_contamination": text_contamination,
    "text_token_bpe": text_token_bpe,
}

ORACLES = {
    "text_contamination": TEXT_CONTAMINATION_SQL,
    "text_token_bpe": TEXT_TOKEN_BPE_SQL,
    "text_tfidf_top_terms": TEXT_TFIDF_TOP_TERMS_SQL,
    "text_token_stats": TEXT_TOKEN_STATS_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_quality_filter": TEXT_QUALITY_FILTER_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
}
