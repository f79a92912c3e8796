"""Round-6 operators: corpus n-gram novelty + boilerplate phrase
mining, character entropy, trailing-window z-score anomalies, forward
as-of join, and a third date/time builtin tier.

Each entry pairs a Spark DataFrame query with a DuckDB oracle running
the same ANSI SQL semantics (driver compare: row count + column names +
value hash). Scale notes per operator docstring — every shape is the
one you'd run at 100 TB (one-pass hash aggregates over exploded grams,
keyed windows instead of global sorts, the one-shuffle as-of idiom).

Float-output convention: wherever a float influences ROW MEMBERSHIP or
an output value that must hash exactly, the operators quantize to
integers first (cents / basis points) and keep every derived double a
deterministic IEEE expression over identical integers — floor, not
round(), so no cross-engine rounding idiom is involved at all.
Genuinely continuous aggregate outputs (entropy, LM log-likelihoods)
round at 6 digits per the repo convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


def _gram_expr(n: int) -> str:
    """Spark SQL expression building word n-grams from the token array
    ``w`` (empty array below n tokens) — ONE definition shared by every
    gram-based operator so tokenization can never diverge between them."""
    terms = ", ".join(f"w[i+{k}]" if k else "w[i]" for k in range(n))
    return (
        f"CASE WHEN size(w) >= {n} THEN transform(sequence(0, size(w)-{n}),"
        f" i -> concat_ws(' ', {terms})) ELSE array() END"
    )


def _gram_sql(n: int) -> str:
    """DuckDB twin of _gram_expr: the n-gram string built from the
    1-indexed token list ``w`` at position ``i``."""
    return " || ' ' || ".join(
        f"w[i+{k}]" if k else "w[i]" for k in range(n)
    )



# --- corpus n-gram novelty ---------------------------------------------------


def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's DISTINCT word
    3-grams whose first corpus occurrence (min doc_id owner) is this
    doc — low novelty flags near-duplicates and boilerplate-heavy docs
    that exact/MinHash dedup can miss. Training-data curation staple.

    Scale shape: ONE gram relation (explode + distinct), ONE hash
    aggregate for first-owner, ONE hash join back, ONE per-doc
    aggregate — no all-pairs anywhere; hot grams (stopword runs) skew a
    single join key, which AQE's skew-join splits. Novelty is floored
    to basis points so the oracle compare is exact (identical IEEE
    division both sides, no round() impl differences)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(_gram_expr(3))
        ).alias("g"),
    ).distinct()
    owner = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(owner, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_if(F.col("doc_id") == F.col("first_doc")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.floor(F.lit(10000.0) * F.col("n_novel") / F.col("n_grams"))
            .cast("long")
            .alias("novelty_bp"),
        )
    )


CORPUS_NGRAM_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM toks WHERE len(w) >= 3
), grams AS (
  SELECT DISTINCT doc_id, {_gram_sql(3)} AS g
  FROM pos
), owner AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE doc_id = first_doc) AS BIGINT) AS n_novel,
       CAST(floor(10000.0 * count(*) FILTER (WHERE doc_id = first_doc)
                  / count(*)) AS BIGINT) AS novelty_bp
FROM grams JOIN owner USING (g)
GROUP BY doc_id
"""


# --- boilerplate phrase mining -----------------------------------------------


def corpus_phrase_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 word 5-grams per source by occurrence count (ties broken
    lexicographically) — boilerplate mining: headers, license blurbs,
    navigation chrome repeat verbatim within a crawl source and these
    phrases are what a curation pass strips.

    Scale shape: explode (narrow) → ONE map-side-combinable hash
    aggregate on (source, gram) → per-source top-k via a window over
    the aggregated grid (cardinality = distinct phrases, never raw
    occurrences)."""
    docs = t(spark, sf_dir, "documents").select(
        "source", F.split(F.lower("text"), " ").alias("w")
    )
    grams = docs.select(
        "source",
        F.explode(
            F.expr(_gram_expr(5))
        ).alias("phrase"),
    )
    cnt = grams.groupBy("source", "phrase").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("phrase").asc()
    )
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "phrase", "n", F.col("rk").cast("long").alias("rk"))
    )


CORPUS_PHRASE_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT source, string_split(lower(text), ' ') AS w FROM documents
), pos AS (
  SELECT source, w, unnest(generate_series(1, len(w) - 4)) AS i
  FROM toks WHERE len(w) >= 5
), grams AS (
  SELECT source, {_gram_sql(5)} AS phrase
  FROM pos
), cnt AS (
  SELECT source, phrase, count(*) AS n FROM grams GROUP BY source, phrase
)
SELECT source, phrase, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT source, phrase, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, phrase ASC) AS rk
  FROM cnt
)
WHERE rk <= 3
"""


# --- character entropy -------------------------------------------------------


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy over characters — the classic
    gibberish/compression-artifact signal (too low: repeated filler;
    too high: base64/binary spill). Quality-scoring companion to
    text_quality_filter.

    Scale shape: explode to (doc, char) — narrow —, ONE hash aggregate
    per (doc, char) (alphabet-bounded: ≤ distinct chars per doc), then
    a per-doc aggregate; entropy rounds at 6 digits (sum order differs
    between engines at ~1e-15; the repo's float convention)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    chars = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 1 THEN"
                " transform(sequence(1, length(text)),"
                " i -> substring(text, i, 1)) ELSE array() END"
            )
        ).alias("c"),
    )
    freq = chars.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    tot = freq.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("tot").cast("long").alias("n_chars2"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
    )


TEXT_CHAR_ENTROPY_SQL = """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE length(text) >= 1
), chars AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c FROM pos
), freq AS (
  SELECT doc_id, c, count(*) AS n FROM chars GROUP BY doc_id, c
), tot AS (
  SELECT doc_id, sum(n) AS tot FROM freq GROUP BY doc_id
)
SELECT doc_id,
       CAST(max(tot) AS BIGINT) AS n_chars2,
       round(-sum((n / tot) * log2(n / tot)), 6) AS entropy
FROM freq JOIN tot USING (doc_id)
GROUP BY doc_id
"""


# --- trailing-window z-score anomalies ---------------------------------------


def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 50-event z-score of `value`; emit events whose
    |z| > 2.5 once the window has ≥20 samples — the standard streaming
    anomaly detector run batch-side. Keyed window only (partition-
    parallel, no global sort); one pass computes both windowed sums and
    the count over the SAME frame so CollapseWindow fuses them.

    Cross-engine determinism (row MEMBERSHIP depends on a float
    threshold, so near-boundary ulps would flip rows between engines):
    values quantize to integer cents, the window carries EXACT integer
    sums Σx and Σx² (associative — no accumulation-order divergence;
    built-in windowed avg/stddev would differ at 1e-15 between Spark
    and DuckDB's segment tree), and mu/sd/z derive from those identical
    integers through an identical IEEE expression — bit-equal doubles
    on both engines, so the >2.5 cut selects identical rows and the
    output ships z floored to basis points (exact, no round() idiom)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-49, 0)
    )
    stats = ev.select(
        "event_id",
        "user_id",
        "vc",
        F.sum("vc").over(w).alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("s2"),
        F.count("*").over(w).alias("cnt"),
    )
    # var = (s2/cnt − mu²)·cnt/(cnt−1): dividing BEFORE multiplying
    # avoids the s1·s1 int64 product (which Spark would silently wrap
    # and DuckDB would raise on for |value| ≳ 6e5 over a full window);
    # every term is a double derived from identical integers, so the
    # expression stays bit-identical across engines. Supported input
    # domain |value| < ~3e7 (vc² per element must fit int64), same as
    # the cents quantization itself.
    mu = F.col("s1").cast("double") / F.col("cnt")
    var = (
        (F.col("s2").cast("double") / F.col("cnt") - mu * mu)
        * F.col("cnt")
        / (F.col("cnt") - 1)
    )
    z = (F.col("vc") - mu) / F.sqrt(var)
    return stats.filter(
        (F.col("cnt") >= 20) & (var > 0) & (F.abs(z) > 2.5)
    ).select(
        "event_id",
        "user_id",
        F.floor(z * 10000).cast("long").alias("z_bp"),
        F.col("cnt").alias("n_window"),
    )


WINDOW_ZSCORE_ANOMALY_SQL = """
WITH stats AS (
  SELECT event_id, user_id, vc,
         CAST(sum(vc) OVER win AS BIGINT) AS s1,
         CAST(sum(vc * vc) OVER win AS BIGINT) AS s2,
         CAST(count(*) OVER win AS BIGINT) AS cnt
  FROM (
    SELECT event_id, user_id, ts,
           CAST(floor(value * 100) AS BIGINT) AS vc
    FROM events
  )
  WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
), scored AS (
  SELECT event_id, user_id, cnt,
         (CAST(s2 AS DOUBLE) / cnt
          - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt))
           * cnt / (cnt - 1) AS var,
         (vc - CAST(s1 AS DOUBLE) / cnt)
           / sqrt((CAST(s2 AS DOUBLE) / cnt
                   - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt))
                  * cnt / (cnt - 1)) AS z
  FROM stats
)
SELECT event_id, user_id,
       CAST(floor(z * 10000) AS BIGINT) AS z_bp,
       cnt AS n_window
FROM scored
WHERE cnt >= 20 AND var > 0 AND abs(z) > 2.5
"""


# --- forward as-of join ------------------------------------------------------


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event (remapped into the orders era) matched
    to the customer's EARLIEST order at-or-after that instant — "next
    touchpoint after the signal", the mirror of join_asof_orders.
    DuckDB oracle uses its native forward ASOF (``ON l.t <= r.t``).
    Right side pre-deduped per (key, time) so ties are deterministic.

    Scale: the one-shuffle union idiom (asof.asof_join_forward) — both
    sides hash-partition by key once, one partition-local sort, a
    single window pass; never a range join."""
    from mysql_cdc_table_spark.operators.asof import asof_join_forward

    e = t(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("custkey"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_interval(days=(F.col("event_id") % 2500).cast("int"))
        ).alias("ts_probe"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "custkey")
    )
    return asof_join_forward(
        e, o, on="custkey", left_time="ts_probe", right_time="o_orderdate",
        right_payload=["o_orderkey"],
    )


JOIN_ASOF_FORWARD_SQL = """
WITH e AS (
  SELECT event_id, user_id AS custkey,
         TIMESTAMP '1995-01-01'
           + to_days(CAST(event_id % 2500 AS INTEGER)) AS ts_probe
  FROM events
), o AS (
  SELECT o_custkey AS custkey, o_orderdate,
         max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.custkey, e.ts_probe, o.o_orderkey
FROM e ASOF LEFT JOIN o
  ON e.custkey = o.custkey AND e.ts_probe <= o.o_orderdate
"""


# --- date/time builtins, tier 3 ----------------------------------------------


def fn_datetime3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third date/time tier (MySQL daily drivers not in fn_datetime2):
    week/quarter truncation, NEXT_DAY (next Monday strictly after),
    ISO day-of-week, first-of-month via MAKE_DATE, timestamp interval
    arithmetic, and epoch-week bucketing. All JVM built-ins — pure scan
    projection; the DuckDB oracle derives NEXT_DAY from isodow
    arithmetic (DuckDB has no next_day builtin), locking the exact
    strictly-after semantics."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    return o.select(
        "o_orderkey",
        F.trunc("d", "week").alias("wk_start"),
        F.trunc("d", "quarter").alias("q_start"),
        F.next_day("d", "Mon").alias("next_monday"),
        (F.weekday("d") + 1).alias("dow_iso"),
        F.make_date(F.year("d"), F.month("d"), F.lit(1)).alias("month_first"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("plus36h"),
        F.floor(
            F.datediff("d", F.lit("1970-01-01").cast("date")) / 7.0
        ).cast("long").alias("epoch_week"),
    )


FN_DATETIME3_SQL = """
SELECT o_orderkey,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_start,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
       CAST(o_orderdate AS DATE)
         + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                     ELSE (8 - isodow(o_orderdate)) % 7 END
                AS INTEGER) AS next_monday,
       CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
       make_date(CAST(year(o_orderdate) AS INTEGER),
                 CAST(month(o_orderdate) AS INTEGER), 1) AS month_first,
       o_orderdate + INTERVAL 36 HOUR AS plus36h,
       CAST(floor(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) / 7.0)
            AS BIGINT) AS epoch_week
FROM orders
"""


QUERIES.update(
    {
        "corpus_ngram_novelty": corpus_ngram_novelty,
        "corpus_phrase_boilerplate": corpus_phrase_boilerplate,
        "text_char_entropy": text_char_entropy,
        "window_zscore_anomaly": window_zscore_anomaly,
        "join_asof_forward": join_asof_forward,
        "fn_datetime3": fn_datetime3,
    }
)

ORACLES.update(
    {
        "corpus_ngram_novelty": CORPUS_NGRAM_NOVELTY_SQL,
        "corpus_phrase_boilerplate": CORPUS_PHRASE_BOILERPLATE_SQL,
        "text_char_entropy": TEXT_CHAR_ENTROPY_SQL,
        "window_zscore_anomaly": WINDOW_ZSCORE_ANOMALY_SQL,
        "join_asof_forward": JOIN_ASOF_FORWARD_SQL,
        "fn_datetime3": FN_DATETIME3_SQL,
    }
)


# --- late keys (registered after the round-6 window filled; pinned ----------
# --- behind it, lead the round-7 window — the ROUND5_LATE_KEYS protocol) ----


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM scoring with add-1 smoothing — the upgrade of
    text_unigram_logprob that actually catches scrambled word order:
    P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), per-doc mean negative
    log-likelihood. The classic cheap LM quality filter tier 2.

    Scale shape: one bigram hash agg + one unigram hash agg + a
    1-row vocab-size aggregate (broadcast by Catalyst), then two hash
    joins back onto the doc bigram stream — term joins left to AQE
    (vocab can exceed any broadcast threshold at corpus scale)."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2),"
                " i -> struct(w[i] AS w1, w[i+1] AS w2)) ELSE array() END"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    words = toks.select(F.explode("w").alias("word"))
    c1 = words.groupBy("word").agg(F.count("*").alias("c1"))
    vocab = words.select(
        F.count_distinct("word").alias("v")
    )  # 1 row — Catalyst broadcasts the cross join
    return (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, bigrams.w1 == c1.word)
        .crossJoin(vocab)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                -F.avg(
                    F.log(
                        (F.col("c2") + 1)
                        / (F.col("c1") + F.col("v"))
                    )
                ),
                6,
            ).alias("mean_nll"),
        )
    )


TEXT_BIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM toks WHERE len(w) >= 2
), bigrams AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM pos
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY w1, w2
), words AS (
  SELECT unnest(w) AS word FROM toks
), c1 AS (
  SELECT word, count(*) AS c1 FROM words GROUP BY word
), vocab AS (
  SELECT count(DISTINCT word) AS v FROM words
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-avg(ln((c2 + 1) * 1.0 / (c1 + v))), 6) AS mean_nll
FROM bigrams
JOIN c2 USING (w1, w2)
JOIN c1 ON bigrams.w1 = c1.word
CROSS JOIN vocab
GROUP BY doc_id
"""


def agg_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier summary via median absolute deviation:
    med = exact interpolated p50 of value, mad = p50 of |value − med|,
    outliers = events beyond 3·1.4826·mad (the normal-consistent MAD
    z-score). Robust twin of window_zscore_anomaly — immune to the
    outliers it hunts.

    Scale shape: three keyed hash aggregates + two same-key joins (no
    global sort; exact percentile state is per-group).

    Cross-engine determinism (the outlier COUNT depends on a float
    threshold): values quantize to integer cents, so the interpolated
    medians are exact halves/quarters (0.5·a + 0.5·b over integers is
    exact in both engines), deviations are exact, and the single
    4.4478 literal (= 3·1.4826, the normal-consistent MAD factor)
    parses to the same IEEE double on both sides — every comparison
    operand is bit-identical, no round() idiom anywhere."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.floor(F.col("value") * 100).cast("long").alias("vc")
    )
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(vc, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").select(
        "user_id", "vc", "med", F.abs(F.col("vc") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max("med").alias("med_cents"),
            F.max("mad").alias("mad_cents"),
            F.count_if(
                F.col("dev") > F.lit(4.4478) * F.col("mad")
            ).alias("n_outliers"),
        )
    )


AGG_MAD_OUTLIER_SQL = """
WITH cents AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
), med AS (
  SELECT user_id, quantile_cont(vc, 0.5) AS med
  FROM cents GROUP BY user_id
), dev AS (
  SELECT e.user_id, e.vc, m.med, abs(e.vc - m.med) AS dev
  FROM cents e JOIN med m USING (user_id)
), mad AS (
  SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY user_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       max(d.med) AS med_cents,
       max(md.mad) AS mad_cents,
       CAST(count(*) FILTER (WHERE d.dev > CAST(4.4478 AS DOUBLE) * md.mad)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad md USING (user_id)
GROUP BY user_id
"""


def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's higher-order array functions (aggregate/filter/exists/
    forall/transform/slice) against DuckDB's list lambdas — the
    array-processing surface MySQL users reach for with JSON_TABLE
    loops. Pure scan projection, all JVM/vectorized; integer-exact."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.sequence(F.lit(1).cast("long"), 1 + F.col("p_partkey") % 7).alias(
            "arr"
        ),
    )
    return p.select(
        "p_partkey",
        F.expr("aggregate(arr, 0L, (a, x) -> a + x)").alias("hof_sum"),
        F.expr("size(filter(arr, x -> x % 2 = 0))")
        .cast("long")
        .alias("n_even"),
        F.expr("exists(arr, x -> x > 5)").alias("any_gt5"),
        F.expr("forall(arr, x -> x > 0)").alias("all_pos"),
        F.expr(
            "aggregate(transform(arr, x -> x * x), 0L, (a, x) -> a + x)"
        ).alias("sq_sum"),
        F.expr("aggregate(slice(arr, 1, 3), 0L, (a, x) -> a + x)").alias(
            "first3_sum"
        ),
    )


FN_HIGHER_ORDER_SQL = """
WITH base AS (
  SELECT p_partkey, generate_series(1, 1 + p_partkey % 7) AS arr FROM part
)
SELECT p_partkey,
       CAST(list_sum(arr) AS BIGINT) AS hof_sum,
       CAST(len(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_even,
       len(list_filter(arr, x -> x > 5)) > 0 AS any_gt5,
       len(list_filter(arr, x -> NOT (x > 0))) = 0 AS all_pos,
       CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sq_sum,
       CAST(list_sum(arr[1:3]) AS BIGINT) AS first3_sum
FROM base
"""


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi join (MySQL's <=> operator; SQL IS NOT DISTINCT
    FROM): NULL keys MATCH each other instead of vanishing — the
    semantics gap behind a whole class of silent row loss when joining
    on nullable dimension keys. Spark `eqNullSafe` compiles to a plain
    hash join on a null-safe key, so the plan stays a shuffle/broadcast
    hash join, never a nested loop."""
    a = (
        t(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 7 == 0, None)
            .otherwise(F.col("o_orderkey") % 100)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n_orders"))
    )
    b = (
        t(spark, sf_dir, "customer")
        .select(
            F.when(F.col("c_custkey") % 11 == 0, None)
            .otherwise(F.col("c_custkey") % 100)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n_customers"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(
        a.k.alias("k"), "n_orders", "n_customers"
    )


JOIN_NULL_SAFE_SQL = """
WITH a AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE o_orderkey % 100 END AS k,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), b AS (
  SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
              ELSE c_custkey % 100 END AS k,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1
)
SELECT a.k, a.n_orders, b.n_customers
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


QUERIES.update(
    {
        "text_bigram_logprob": text_bigram_logprob,
        "agg_mad_outlier": agg_mad_outlier,
        "fn_higher_order": fn_higher_order,
        "join_null_safe": join_null_safe,
    }
)

ORACLES.update(
    {
        "text_bigram_logprob": TEXT_BIGRAM_LOGPROB_SQL,
        "agg_mad_outlier": AGG_MAD_OUTLIER_SQL,
        "fn_higher_order": FN_HIGHER_ORDER_SQL,
        "join_null_safe": JOIN_NULL_SAFE_SQL,
    }
)


def mm_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio branch of the multimodal surface: synthesize deterministic
    PCM16-LE clips as opaque BINARY payloads (one mapInPandas stage —
    numpy int16 encode), then decode them in a second Arrow-batched
    stage and reduce to integer-exact per-clip features: sample count,
    energy (Σv², exact int64), peak |v|, and zero crossings. The byte
    roundtrip (np.int16 → tobytes → frombuffer) sits INSIDE the value
    hash, so a broken binary column path cannot sneak past the oracle —
    which recomputes the same features straight from the sample formula
    ``v(k) = ((doc_id·31 + k·17) mod 65536) − 32768`` in SQL.

    Scale shape: embarrassingly parallel mapInPandas both stages, no
    shuffle; real audio swaps the synthesizer for file bytes and the
    formula oracle for a fixture, the plumbing is identical."""
    import pandas as pd

    from pyspark.sql import types as T

    base = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 256 + (int(doc_id) % 7) * 64
                k = np.arange(n, dtype=np.int64)
                v = ((int(doc_id) * 31 + k * 17) % 65536) - 32768
                payloads.append(v.astype("<i2").tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "pcm": payloads}
            )

    def stats(batches):
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
                "zero_cross": [],
            }
            for doc_id, pcm in zip(pdf["doc_id"], pdf["pcm"]):
                v = np.frombuffer(bytes(pcm), dtype="<i2").astype(np.int64)
                s = v >= 0
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(v))
                out["energy"].append(int((v * v).sum()))
                out["peak"].append(int(np.abs(v).max()))
                out["zero_cross"].append(
                    int(np.count_nonzero(s[1:] != s[:-1]))
                )
            yield pd.DataFrame(out)

    pcm_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("pcm", T.BinaryType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
            T.StructField("peak", T.LongType()),
            T.StructField("zero_cross", T.LongType()),
        ]
    )
    return base.mapInPandas(synth, schema=pcm_schema).mapInPandas(
        stats, schema=out_schema
    )


MM_AUDIO_PCM_STATS_SQL = """
WITH base AS (
  SELECT doc_id, 256 + (doc_id % 7) * 64 AS n
  FROM documents WHERE doc_id < 200
), pos AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k FROM base
), vals AS (
  SELECT doc_id, n, k,
         ((doc_id * 31 + k * 17) % 65536) - 32768 AS v
  FROM pos
), signed AS (
  SELECT doc_id, n, k, v, v >= 0 AS s,
         lag(v >= 0) OVER (PARTITION BY doc_id ORDER BY k) AS prev_s
  FROM vals
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(count(*) FILTER (WHERE prev_s IS NOT NULL AND s <> prev_s)
            AS BIGINT) AS zero_cross
FROM signed
GROUP BY doc_id
"""


QUERIES.update({"mm_audio_pcm_stats": mm_audio_pcm_stats})
ORACLES.update({"mm_audio_pcm_stats": MM_AUDIO_PCM_STATS_SQL})


def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label voting: for a deterministic 1-in-50 query sample, the
    majority label among the 5 nearest neighbours by cosine (ties →
    smaller label) — the classic embedding-space label-propagation /
    auto-labeling pass over a training corpus.

    Scale: candidate generation here is exact (the query sample is
    tiny); at corpus scale the same vote runs over ann_ivf_topk's
    cell-pruned candidates — identical voting stage, cheaper candidate
    stage. Ranking uses the repo's rounded-cosine + vec_id tiebreak so
    neighbour sets are engine-deterministic (the ann_knn_join idiom)."""
    from mysql_cdc_table_spark.functions.similarity import cosine

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            (F.round(cosine(F.col("embedding"), F.col("qv")), 6) + F.lit(0.0))
            .alias("cos"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    top = scored.withColumn("rk", F.row_number().over(w_rank)).filter(
        F.col("rk") <= 5
    )
    votes = top.groupBy("qid", "label").agg(F.count("*").alias("n_votes"))
    w_vote = Window.partitionBy("qid").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vrk", F.row_number().over(w_vote))
        .filter(F.col("vrk") == 1)
        .select(
            "qid",
            F.col("label").alias("pred_label"),
            "n_votes",
        )
    )


EMB_KNN_CLASSIFY_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id % 50 = 0
), scored AS (
  SELECT q.qid, e.vec_id, e.label,
         round(
           list_sum(list_transform(list_zip(e.embedding, q.qv),
                    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(q.qv,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
           + 0.0 AS cos
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
), top AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, vec_id ASC) AS rk
    FROM scored
  ) WHERE rk <= 5
), votes AS (
  SELECT qid, label, count(*) AS n_votes FROM top GROUP BY qid, label
)
SELECT qid, label AS pred_label, CAST(n_votes AS BIGINT) AS n_votes
FROM (
  SELECT qid, label, n_votes,
         row_number() OVER (PARTITION BY qid
                            ORDER BY n_votes DESC, label ASC) AS vrk
  FROM votes
) WHERE vrk = 1
"""


def corpus_cross_source_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct word 5-grams they share and what fraction of the
    SMALLER source's gram set that is — the provenance audit run before
    attributing training data to sources (mirror-site and syndication
    detection; the benchmark-contamination gate's corpus-internal twin).

    Scale shape: one distinct (source, gram) relation, a per-gram
    self-join producing source PAIRS (per-gram fan-out is bounded by
    #sources², a constant — never corpus-quadratic), one pair count,
    one broadcast-joined per-source total. Share floored to basis
    points (exact parity, no round idiom)."""
    docs = t(spark, sf_dir, "documents").select(
        "source", F.split(F.lower("text"), " ").alias("w")
    )
    grams = docs.select(
        "source",
        F.explode(
            F.expr(_gram_expr(5))
        ).alias("g"),
    ).distinct()
    totals = grams.groupBy("source").agg(F.count("*").alias("tot"))
    a = grams.select(F.col("source").alias("s1"), "g")
    b = grams.select(F.col("source").alias("s2"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_shared"))
    )
    t1 = totals.select(F.col("source").alias("s1"), F.col("tot").alias("tot1"))
    t2 = totals.select(F.col("source").alias("s2"), F.col("tot").alias("tot2"))
    return (
        shared.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.floor(
                F.lit(10000.0)
                * F.col("n_shared")
                / F.least("tot1", "tot2")
            )
            .cast("long")
            .alias("containment_bp"),
        )
    )


CORPUS_CROSS_SOURCE_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT source, string_split(lower(text), ' ') AS w FROM documents
), pos AS (
  SELECT source, w, unnest(generate_series(1, len(w) - 4)) AS i
  FROM toks WHERE len(w) >= 5
), grams AS (
  SELECT DISTINCT source, {_gram_sql(5)} AS g
  FROM pos
), totals AS (
  SELECT source, count(*) AS tot FROM grams GROUP BY source
), shared AS (
  SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s1, s2, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(floor(10000.0 * n_shared / least(t1.tot, t2.tot)) AS BIGINT)
         AS containment_bp
FROM shared
JOIN totals t1 ON t1.source = shared.s1
JOIN totals t2 ON t2.source = shared.s2
"""


QUERIES.update(
    {
        "emb_knn_classify": emb_knn_classify,
        "corpus_cross_source_contamination": corpus_cross_source_contamination,
    }
)
ORACLES.update(
    {
        "emb_knn_classify": EMB_KNN_CLASSIFY_SQL,
        "corpus_cross_source_contamination": (
            CORPUS_CROSS_SOURCE_CONTAMINATION_SQL
        ),
    }
)


def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-evaluation primitive: score the seasonal-naive model
    (predict value from the 7th-previous observation in the same
    series) per event_type — MAE and signed bias. The baseline every
    real forecast must beat; running it as a data op is how backtests
    scale.

    Cross-engine determinism: values quantize to integer cents, errors
    are exact int64, and the means come out floored (identical IEEE
    division over identical integers). One keyed window + one hash
    aggregate."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    scored = ev.withColumn("pred", F.lag("vc", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    err = F.col("vc") - F.col("pred")
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_scored"),
        F.floor(F.sum(F.abs(err)) * 1.0 / F.count("*"))
        .cast("long")
        .alias("mae_cents"),
        F.floor(F.sum(err) * 1.0 / F.count("*"))
        .cast("long")
        .alias("bias_cents"),
    )


TS_SEASONAL_NAIVE_ERROR_SQL = """
WITH cents AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
), scored AS (
  SELECT event_type, vc,
         lag(vc, 7) OVER (PARTITION BY event_type
                          ORDER BY ts ASC, event_id ASC) AS pred
  FROM cents
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(floor(sum(abs(vc - pred)) * 1.0 / count(*)) AS BIGINT)
         AS mae_cents,
       CAST(floor(sum(vc - pred) * 1.0 / count(*)) AS BIGINT)
         AS bias_cents
FROM scored WHERE pred IS NOT NULL
GROUP BY event_type
"""


def fn_fuzzy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance builtins (the fuzzy-matching layer under entity
    resolution and dedup candidate scoring): Levenshtein against a
    reversal, against the type string, and against a fixed probe —
    integer-exact, pure scan projection in both engines."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("nm"),
        F.lower("p_type").alias("ty"),
        "p_brand",
    )
    return p.select(
        "p_partkey",
        F.levenshtein("nm", F.reverse(F.col("nm"))).cast("long").alias(
            "lev_rev"
        ),
        F.levenshtein("nm", "ty").cast("long").alias("lev_type"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("long").alias(
            "lev_brand"
        ),
    )


FN_FUZZY_DISTANCE_SQL = """
SELECT p_partkey,
       CAST(levenshtein(lower(p_name), reverse(lower(p_name))) AS BIGINT)
         AS lev_rev,
       CAST(levenshtein(lower(p_name), lower(p_type)) AS BIGINT)
         AS lev_type,
       CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev_brand
FROM part
"""


QUERIES.update(
    {
        "ts_seasonal_naive_error": ts_seasonal_naive_error,
        "fn_fuzzy_distance": fn_fuzzy_distance,
    }
)
ORACLES.update(
    {
        "ts_seasonal_naive_error": TS_SEASONAL_NAIVE_ERROR_SQL,
        "fn_fuzzy_distance": FN_FUZZY_DISTANCE_SQL,
    }
)


def agg_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (percentile_approx / Greenwald-Khanna
    sketch) with a RANK-error-bound oracle — the quantile twin of the
    HLL and IVF bound oracles: the sketch value itself is
    engine-specific, but its rank error is the documented contract
    (≤ 1/accuracy; checked here at a 10× margin). Output carries the
    EXACT interpolated quantiles (cents-quantized, exact halves) plus
    booleans asserting each sketch value's empirical rank-INTERVAL
    brackets q within ±0.01: count(vc < a)/n ≤ q+0.01 AND
    count(vc ≤ a)/n ≥ q−0.01. Tie-robust (advisor fix, round 7): with
    a mass point at the quantile value — plausible after cents
    quantization — the one-sided CDF at a CORRECT sketch value can
    legitimately exceed q+0.01, so the old |CDF−q| form could fake a
    red row; the interval form still trips on real sketch regressions.
    The oracle computes the same exact quantiles and literal TRUE. At
    100 TB only the sketch runs (bounded-size mergeable state); the
    exact companion is the oracle harness."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vc")
    )
    sk = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr("percentile(vc, 0.5)").alias("p50_cents"),
        F.expr("percentile(vc, 0.9)").alias("p90_cents"),
        F.expr("percentile_approx(vc, 0.5, 1000)").alias("a50"),
        F.expr("percentile_approx(vc, 0.9, 1000)").alias("a90"),
    )
    ranked = (
        ev.join(sk, "event_type")
        .groupBy("event_type")
        .agg(
            (
                (F.count_if(F.col("vc") < F.col("a50")) / F.count("*") <= 0.51)
                & (F.count_if(F.col("vc") <= F.col("a50")) / F.count("*") >= 0.49)
            ).alias("rank50_ok"),
            (
                (F.count_if(F.col("vc") < F.col("a90")) / F.count("*") <= 0.91)
                & (F.count_if(F.col("vc") <= F.col("a90")) / F.count("*") >= 0.89)
            ).alias("rank90_ok"),
        )
    )
    return sk.select("event_type", "n", "p50_cents", "p90_cents").join(
        ranked, "event_type"
    )


AGG_APPROX_QUANTILE_BOUND_SQL = """
WITH cents AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       quantile_cont(vc, 0.5) AS p50_cents,
       quantile_cont(vc, 0.9) AS p90_cents,
       TRUE AS rank50_ok,
       TRUE AS rank90_ok
FROM cents
GROUP BY event_type
"""


QUERIES.update({"agg_approx_quantile_bound": agg_approx_quantile_bound})
ORACLES.update({"agg_approx_quantile_bound": AGG_APPROX_QUANTILE_BOUND_SQL})
