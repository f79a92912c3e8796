"""Round-7 operators: the IVF-backed kNN classifier the
``emb_knn_classify`` docstring promised — the scale path tested, not
asserted.

Each entry pairs a Spark DataFrame query with a DuckDB oracle running
the same ANSI SQL semantics (driver compare: row count + column names +
value hash). The IVF-pruned prediction is not SQL-reproducible
row-for-row (float centroid sums differ across engines in ulps), so the
key follows the round-6 recall-bound idiom: emit the EXACT brute-force
classification (value-hash checkable) plus a boolean asserting the
IVF-pruned prediction agrees with it on at least a documented floor of
the queries; the oracle computes the same exact rows and literal TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


# Agreement floor sits with margin under the measured exact-vs-IVF
# prediction agreement per sf: 0.30/0.50/0.42 at sf0.001/0.01/0.1
# (round 13: derived nlist ~ sqrt(N) with n_probe ~ sqrt(nlist) —
# 5 of 22 cells at N=500, 7 of 45 at N=2000; the probe FRACTION is
# lower than the old 3-of-8, so agreement dropped from 0.70/0.60/0.55
# and the floor moved 0.3 -> 0.2 to keep margin under the measured
# minimum instead of sitting exactly on it; re-measured in
# tests/test_round7.py at the per-sf level).
KNN_IVF_AGREE_FLOOR = 0.2
KNN_IVF_K = 5


def emb_knn_classify_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label voting over IVF-CELL-PRUNED candidates — the 100 TB
    path for ``emb_knn_classify`` (operators/round6.py), whose exact
    candidate stage is a broadcast corpus × query-sample nested loop.

    Candidate stage: the TRAINED k-means cells of ann_ivf_trained_topk
    (kmeans_cells — deterministic Lloyd's, no RNG; the label-cell
    heuristic measured far worse here, 0.2-0.4 agreement, because the
    synthetic labels don't cluster cosine space). Rank the cells per
    query by squared distance over the tiny centroid grid (cells ×
    dims, broadcast), keep the top ``n_probe ~ sqrt(nlist)``, and score only
    corpus rows in a probed cell — at scale the cell id is the storage
    partition key, so the probe prunes partitions at the scan and
    per-query work drops from |corpus| to ~n_probe/|cells| of it.
    Voting stage: identical to the exact classifier (top-5 by rounded
    cosine + vec_id tiebreak, majority label, ties → smaller label).

    Driver contract (round-6 recall-bound idiom): output = the EXACT
    classifier's rows plus ``ivf_agree_ok`` asserting the IVF-pruned
    prediction matches the exact prediction on ≥ KNN_IVF_AGREE_FLOOR of
    queries (measured agreement 0.30/0.50/0.42 at sf0.001/0.01/0.1
    under the round-13 derived sizing — nlist ~ sqrt(N), n_probe ~
    sqrt(nlist); floor 0.2 with margin — these embeddings are
    near-uniform, so sqrt-scaled pruning legitimately misses scattered
    neighbours; a candidate-pruning regression that collapses
    agreement still turns the driver row red)."""
    from mysql_cdc_table_spark.functions.similarity import (
        cosine,
        kmeans_cells,
        sq_dist,
        trained_centroids,
    )
    from mysql_cdc_table_spark.operators.round6 import emb_knn_classify

    # the exact subtree feeds BOTH the emitted rows and the agreement
    # aggregate: localCheckpoint (lazy) so it runs once, not twice
    exact = emb_knn_classify(spark, sf_dir).localCheckpoint(eager=False)

    e = t(spark, sf_dir, "embeddings")
    cells = kmeans_cells(spark, sf_dir)
    ec = e.join(cells, "vec_id")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cents = trained_centroids(ec)
    from mysql_cdc_table_spark.functions.similarity import default_nprobe

    n_probe = default_nprobe(cents.count())
    w_cell = Window.partitionBy("qid").orderBy(
        F.col("d").asc(), F.col("cid").asc()
    )
    probe = (
        cents.join(F.broadcast(q))
        .select(
            "cid",
            "qid",
            sq_dist(F.col("centroid"), F.col("qv")).alias("d"),
        )
        .withColumn("crk", F.row_number().over(w_cell))
        .filter(F.col("crk") <= n_probe)
        .select("qid", "cid")
    )
    scored = (
        ec.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(q), "qid")
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
        F.col("rk") <= KNN_IVF_K
    )
    votes = top.groupBy("qid", "label").agg(F.count("*").alias("n_votes"))
    w_vote = Window.partitionBy("qid").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    ivf = (
        votes.withColumn("vrk", F.row_number().over(w_vote))
        .filter(F.col("vrk") == 1)
        .select("qid", F.col("label").alias("ivf_label"))
    )
    # LEFT join from exact: the denominator is the FULL query set, so
    # a candidate-pruning collapse that drops qids from the IVF side
    # counts as disagreement instead of shrinking the sample (an inner
    # join would leave the floor trivially satisfied on the survivors —
    # review finding, round 7)
    agree = exact.join(ivf, "qid", "left").agg(
        (
            F.count_if(
                F.col("ivf_label").isNotNull()
                & (F.col("pred_label") == F.col("ivf_label"))
            )
            >= F.lit(KNN_IVF_AGREE_FLOOR) * F.count("*")
        ).alias("ivf_agree_ok")
    )
    return exact.join(F.broadcast(agree))


def _knn_ivf_oracle_sql() -> str:
    from mysql_cdc_table_spark.operators.round6 import EMB_KNN_CLASSIFY_SQL

    return (
        f"SELECT qid, pred_label, n_votes, TRUE AS ivf_agree_ok\n"
        f"FROM ({EMB_KNN_CLASSIFY_SQL})"
    )


QUERIES.update({"emb_knn_classify_ivf": emb_knn_classify_ivf})
ORACLES.update({"emb_knn_classify_ivf": _knn_ivf_oracle_sql()})


# --- Misra-Gries heavy hitters ----------------------------------------------


HH_K = 10  # report words with global frequency > n/K


def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-then-exact heavy hitters over corpus words — the
    mergeable-sketch alternative to a full vocabulary shuffle. Pass 1:
    one scan, a Misra-Gries summary of capacity K-1 PER PARTITION
    (Arrow-batched mapInPandas, bulk decrement: subtract the K-th
    largest merged count and keep positives — each reduction removes
    mass from ≥ K counters, so per-token undercount ≤ n_p/K, the MG
    invariant). Pigeonhole: any word with GLOBAL count > n/K exceeds
    n_p/K in at least one partition, so the union of partition
    candidates provably contains every true heavy hitter. Pass 2: one
    more scan counts ONLY the candidates (broadcast semi join; shuffle
    carries ≤ partitions×K words, never the vocabulary) and the exact
    n/K threshold filters false candidates. The output is therefore
    EXACTLY the true heavy hitters with exact counts — a full
    value-hash oracle, no probability anywhere. At 100 TB the
    vocabulary never shuffles; per-task state is K counters.

    Reference: delegated-surface aggregation (SURVEY §2C) — MySQL has
    no such operator; this is the corpus-scale top-words primitive."""
    docs = t(spark, sf_dir, "documents").select("text")

    def mg_summaries(batches):
        import pandas as pd

        counters: dict = {}
        n_tokens = 0
        cap = HH_K - 1
        for pdf in batches:
            toks = pdf["text"].str.split(" ").explode()
            toks = toks[toks.notna() & (toks != "")]
            n_tokens += len(toks)
            vc = toks.value_counts()
            for w, c in vc.items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[cap]  # the K-th largest merged count
                counters = {
                    w: c - sub for w, c in counters.items() if c - sub > 0
                }
        out = pd.DataFrame(
            {
                "word": [*counters.keys(), None],
                "cnt": [*counters.values(), n_tokens],
            }
        )
        yield out

    summ = docs.mapInPandas(mg_summaries, schema="word string, cnt long")
    summ = summ.localCheckpoint(eager=False)  # pass 1 runs once
    total = summ.filter(F.col("word").isNull()).agg(
        F.sum("cnt").alias("n_total")
    )
    cands = summ.filter(F.col("word").isNotNull()).select("word").distinct()
    words = t(spark, sf_dir, "documents").select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "word"
        )
    )
    counts = words.join(F.broadcast(cands), "word").groupBy("word").agg(
        F.count("*").alias("freq")
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("freq") * HH_K > F.col("n_total"))
        .select("word", "freq", "n_total")
    )


AGG_HEAVY_HITTERS_MG_SQL = f"""
WITH w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), tot AS (SELECT count(*) AS n FROM w)
SELECT word,
       CAST(count(*) AS BIGINT) AS freq,
       (SELECT CAST(n AS BIGINT) FROM tot) AS n_total
FROM w
GROUP BY word
HAVING count(*) * {HH_K} > (SELECT n FROM tot)
"""


# --- trailing EWMA -----------------------------------------------------------


def ts_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average per user — the
    monitoring smoother (alpha=0.2, zero-initialized, truncated to the
    trailing 20 events so the state is a bounded frame, not an
    unbounded recursion). The weighted sum is expressed as ONE
    sequential left fold over the ordered frame list
    (acc*0.8 + 0.2*x): both engines fold the identical value sequence
    in the identical order with identical IEEE double ops, so the
    result is bit-identical — and the output is FLOOR-quantized to
    millionths (floor is exact on identical doubles; round() is the
    one cross-engine .5-tie hazard, per the parity convention — review
    fix, round 7). One sort per user partition, bounded per-row state
    — the same shape as window_rolling_median; at 100 TB the frame
    never leaves its partition."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(0.8) + F.lit(0.2) * x,
    )
    return ev.select(
        "event_id",
        "user_id",
        F.floor(ewma * 1_000_000).cast("long").alias("ewma_e6"),
    )


TS_EWMA_WINDOW_SQL = """
SELECT event_id, user_id,
       CAST(floor(
         list_reduce(
           list_prepend(0.0, l), (acc, x) -> acc * 0.8 + 0.2 * x
         ) * 1000000
       ) AS BIGINT) AS ewma_e6
FROM (
  SELECT event_id, user_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
         ) AS l
  FROM events
)
"""


# --- passage-level dedup -----------------------------------------------------


PASSAGE_WORDS = 10


def corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup report — the C4/RefinedWeb-style
    preprocessing step document-level dedup misses: split every
    document into disjoint 10-word passages, give each distinct
    passage text one owner (smallest (doc_id, position) instance), and
    report per document how many of its passages are duplicates of an
    earlier occurrence. One explode + one window over passage
    partitions (row_number on the (doc_id, pos) total order — the
    first-owner idiom of corpus_ngram_novelty); the shuffle carries
    each passage instance once. kept_ratio floored to basis points for
    exact cross-engine parity."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("w"),
    )
    pas = docs.filter(F.size("w") > 0).select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(w) / {PASSAGE_WORDS}.0)"
                f" as int) - 1), i -> concat_ws(' ',"
                f" slice(w, i * {PASSAGE_WORDS} + 1, {PASSAGE_WORDS})))"
            )
        ).alias("pos", "passage"),
    )
    w_own = Window.partitionBy("passage").orderBy("doc_id", "pos")
    flagged = pas.withColumn(
        "dup", F.row_number().over(w_own) > 1
    )
    return flagged.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_passages"),
        F.count_if(F.col("dup")).alias("n_dup"),
        F.floor(
            10000.0
            * (F.count("*") - F.count_if(F.col("dup")))
            / F.count("*")
        ).alias("kept_ratio_bp"),
    )


CORPUS_PASSAGE_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), p AS (
  SELECT doc_id, source,
         unnest(generate_series(
           1, CAST(ceil(len(w) / {PASSAGE_WORDS}.0) AS BIGINT)
         )) - 1 AS pos,
         w
  FROM d WHERE len(w) > 0
), pas AS (
  SELECT doc_id, source, pos,
         array_to_string(
           w[pos * {PASSAGE_WORDS} + 1 : pos * {PASSAGE_WORDS} + {PASSAGE_WORDS}],
           ' '
         ) AS passage
  FROM p
), flagged AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY passage ORDER BY doc_id, pos
         ) > 1 AS dup
  FROM pas
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dup,
       CAST(floor(
         10000.0 * (count(*) - count(*) FILTER (WHERE dup)) / count(*)
       ) AS BIGINT) AS kept_ratio_bp
FROM flagged
GROUP BY doc_id, source
"""


QUERIES.update(
    {
        "agg_heavy_hitters_mg": agg_heavy_hitters_mg,
        "ts_ewma_window": ts_ewma_window,
        "corpus_passage_dedup": corpus_passage_dedup,
    }
)
ORACLES.update(
    {
        "agg_heavy_hitters_mg": AGG_HEAVY_HITTERS_MG_SQL,
        "ts_ewma_window": TS_EWMA_WINDOW_SQL,
        "corpus_passage_dedup": CORPUS_PASSAGE_DEDUP_SQL,
    }
)


# --- interval RANGE frame ----------------------------------------------------


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame — the SQL surface the numeric range
    frame (window_range_frame) does not cover: per user, the trailing
    1-hour event count and cents turnover, frame bounded by the ORDER
    BY timestamp value itself (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    AND CURRENT ROW; equal-timestamp peers share a frame, so no
    tiebreak column is needed for determinism). Value sum quantized to
    integer cents before the frame, per the float convention. One
    exchange on user_id, one sort; both aggregates fuse into a single
    Window operator."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
    )
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id",
        "user_id",
        F.expr(f"count(*) {frame}").alias("n_1h"),
        F.expr(f"sum(vc) {frame}").alias("sum_cents_1h"),
    )


WINDOW_RANGE_INTERVAL_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(vc) OVER w AS BIGINT) AS sum_cents_1h
FROM (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
)
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""


# --- HLL sketch union --------------------------------------------------------


HLL_LG_K = 12  # Datasketches HLL lgConfigK: rsd ~ 1.04/sqrt(2^12) ~ 1.6%


def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — THE 100 TB pattern the
    one-shot approx_count_distinct key doesn't show: per (event_type,
    day) HLL sketches built independently (as a daily pipeline would
    materialize them), then UNIONED per event_type and estimated
    (hll_sketch_agg → hll_union_agg → hll_sketch_estimate, Spark 4's
    Datasketches surface). Output follows the round-6 error-bound
    idiom: the exact per-type distinct-user count plus a boolean
    asserting the union estimate lands within 5·rsd — wide enough that
    a statistically normal sketch outlier cannot fake a red row, tight
    enough to catch a real merge/estimate regression. The oracle
    computes the exact counts + literal TRUE. At scale only sketches
    move: daily partials are a few KB per group regardless of row
    count, and re-aggregation to any rollup is a sketch union, not a
    rescan."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "user_id"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("sk")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    rsd = 1.04 / (2.0**HLL_LG_K) ** 0.5
    return exact.join(est, "event_type").select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("est") - F.col("n_users"))
            <= F.lit(5 * rsd) * F.col("n_users")
        ).alias("est_ok"),
    )


AGG_HLL_UNION_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS est_ok
FROM events
GROUP BY event_type
"""


QUERIES.update(
    {
        "window_range_interval": window_range_interval,
        "agg_hll_union": agg_hll_union,
    }
)
ORACLES.update(
    {
        "window_range_interval": WINDOW_RANGE_INTERVAL_SQL,
        "agg_hll_union": AGG_HLL_UNION_SQL,
    }
)


# --- rule-based quality gate report -----------------------------------------


def corpus_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style RULE-based quality gate with per-rule
    accounting — the production complement to text_quality_filter's
    blended score: four integer-exact rules per document, a per-source
    report of how many documents each rule rejects, and the kept
    fraction in basis points. Rules (all integer cross-multiplied, no
    float thresholds): R1 word count in [20, 5000]; R2 mean word
    length in [2, 12] (2n ≤ chars ≤ 12n); R3 no single word exceeds
    10% of the document (10·max_count ≤ n); R4 ≥ 10 distinct words.
    Shape: ONE (doc, word) hash agg → ONE per-doc agg → ONE per-source
    rollup (the gram-relation idiom — per-doc state is four integers,
    never the vocabulary); empty documents join in as R1 failures via
    the left join."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    words = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "w"
        ),
    )
    per_word = words.groupBy("doc_id", "w").agg(
        F.count("*").alias("cnt"),
        (F.count("*") * F.length(F.first("w"))).alias("chars"),
    )
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
        F.sum("chars").alias("chars"),
    )
    flagged = (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_distinct", F.lit(0)).alias("nd"),
            F.coalesce("max_cnt", F.lit(0)).alias("mc"),
            F.coalesce("chars", F.lit(0)).alias("ch"),
        )
        .select(
            "source",
            ((F.col("n") >= 20) & (F.col("n") <= 5000)).alias("r1"),
            (
                (F.col("ch") >= 2 * F.col("n"))
                & (F.col("ch") <= 12 * F.col("n"))
                & (F.col("n") > 0)
            ).alias("r2"),
            ((10 * F.col("mc") <= F.col("n")) & (F.col("n") > 0)).alias("r3"),
            (F.col("nd") >= 10).alias("r4"),
        )
    )
    kept = F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4")
    return flagged.groupBy("source").agg(
        F.count("*").alias("docs_total"),
        F.count_if(~F.col("r1")).alias("fail_len"),
        F.count_if(~F.col("r2")).alias("fail_word_len"),
        F.count_if(~F.col("r3")).alias("fail_dominance"),
        F.count_if(~F.col("r4")).alias("fail_distinct"),
        F.count_if(kept).alias("docs_kept"),
        F.floor(10000.0 * F.count_if(kept) / F.count("*")).alias("kept_bp"),
    )


CORPUS_QUALITY_RULES_SQL = """
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), per_word AS (
  SELECT doc_id, w, count(*) AS cnt, count(*) * length(w) AS chars
  FROM words GROUP BY doc_id, w
), per_doc AS (
  SELECT doc_id, sum(cnt) AS n, count(*) AS nd, max(cnt) AS mc,
         sum(chars) AS ch
  FROM per_word GROUP BY doc_id
), flagged AS (
  SELECT d.source,
         coalesce(p.n, 0) >= 20 AND coalesce(p.n, 0) <= 5000 AS r1,
         coalesce(p.ch, 0) >= 2 * coalesce(p.n, 0)
           AND coalesce(p.ch, 0) <= 12 * coalesce(p.n, 0)
           AND coalesce(p.n, 0) > 0 AS r2,
         10 * coalesce(p.mc, 0) <= coalesce(p.n, 0)
           AND coalesce(p.n, 0) > 0 AS r3,
         coalesce(p.nd, 0) >= 10 AS r4
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_total,
       CAST(count(*) FILTER (WHERE NOT r1) AS BIGINT) AS fail_len,
       CAST(count(*) FILTER (WHERE NOT r2) AS BIGINT) AS fail_word_len,
       CAST(count(*) FILTER (WHERE NOT r3) AS BIGINT) AS fail_dominance,
       CAST(count(*) FILTER (WHERE NOT r4) AS BIGINT) AS fail_distinct,
       CAST(count(*) FILTER (WHERE r1 AND r2 AND r3 AND r4) AS BIGINT)
         AS docs_kept,
       CAST(floor(
         10000.0 * count(*) FILTER (WHERE r1 AND r2 AND r3 AND r4)
         / count(*)
       ) AS BIGINT) AS kept_bp
FROM flagged
GROUP BY source
"""


QUERIES.update({"corpus_quality_rules": corpus_quality_rules})
ORACLES.update({"corpus_quality_rules": CORPUS_QUALITY_RULES_SQL})


# --- as-of with staleness tolerance -----------------------------------------


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a MAX-STALENESS tolerance — the feature
    -store contract ("latest feature at-or-before the probe, but only
    if it is at most 90 days old, else NULL"): join_asof_orders' exact
    idiom (one union, one keyed sort, one last-value window — never a
    range join that would fan each probe across its window) with the
    match dropped when probe − match exceeds the tolerance. Output
    carries the matched age in whole days so the tolerance arithmetic
    itself sits in the value hash. DuckDB oracle: native backward ASOF
    JOIN + the same CASE on datediff."""
    from mysql_cdc_table_spark.operators.asof import asof_join

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
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderdate",
            "o_orderkey",
            F.col("o_orderdate").alias("matched_date"),
        )
    )
    j = asof_join(
        e, o, on="custkey", left_time="ts_probe", right_time="o_orderdate",
        right_payload=["o_orderkey", "matched_date"],
    )
    age = F.datediff(F.to_date("ts_probe"), F.col("matched_date"))
    keep = age <= 90
    return j.select(
        "event_id",
        "custkey",
        "ts_probe",
        F.when(keep, F.col("o_orderkey")).alias("o_orderkey"),
        F.when(keep, age.cast("long")).alias("age_days"),
    )


JOIN_ASOF_TOLERANCE_SQL = """
WITH e AS (
  SELECT event_id, user_id AS custkey,
         TIMESTAMP '1995-01-01 00:00:00'
           + to_days(CAST(event_id % 2500 AS INTEGER)) AS ts_probe
  FROM events
),
o AS (
  SELECT o_custkey AS custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.custkey, e.ts_probe,
       CASE WHEN datediff('day', o.o_orderdate, CAST(e.ts_probe AS DATE))
                 <= 90
            THEN o.o_orderkey END AS o_orderkey,
       CASE WHEN datediff('day', o.o_orderdate, CAST(e.ts_probe AS DATE))
                 <= 90
            THEN CAST(datediff('day', o.o_orderdate,
                               CAST(e.ts_probe AS DATE)) AS BIGINT)
       END AS age_days
FROM e ASOF LEFT JOIN o
  ON e.custkey = o.custkey AND e.ts_probe >= o.o_orderdate
"""


QUERIES.update({"join_asof_tolerance": join_asof_tolerance})
ORACLES.update({"join_asof_tolerance": JOIN_ASOF_TOLERANCE_SQL})


# --- Spark 4 SQL pipe syntax -------------------------------------------------


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL PIPE syntax (FROM ... |> WHERE |> EXTEND
    |> AGGREGATE |> WHERE) — the second SQL entry point next to
    sql_entrypoint_views: the linear form Spark 4 users migrate
    toward, compiled by Catalyst to the identical plan as the nested
    SELECT. DuckDB has no pipe dialect, so the oracle is the
    standard-SQL equivalent — semantic equivalence across dialects is
    exactly what the key asserts. All outputs integer (cents via
    round(x*100), never a .5 tie for 2-decimal doubles, per the
    parity convention)."""
    from mysql_cdc_table_spark.operators.extras import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                  CAST(l_quantity AS BIGINT) AS qty
        |> AGGREGATE COUNT(*) AS n_rows,
                     SUM(qty) AS sum_qty,
                     SUM(cents) AS sum_cents
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 0
        """
    )


SQL_PIPE_SYNTAX_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING count(*) > 0
"""


QUERIES.update({"sql_pipe_syntax": sql_pipe_syntax})
ORACLES.update({"sql_pipe_syntax": SQL_PIPE_SYNTAX_SQL})


# --- windowed co-occurrence + PMI --------------------------------------------


COOC_TOP = 20


def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence within a ±2-token window + pointwise mutual
    information — the collocation-mining primitive under phrase
    detection and word-association analysis. Pair generation is a
    per-document ARRAY expression (each position pairs with the next
    two → ≤2n pairs per doc, linear fan-out, unordered pair
    canonicalized by least/greatest) — the corpus never self-joins.
    One pair hash agg + one unigram hash agg; the top-20 grid (full
    tiebreak: count desc, then both words) joins the tiny unigram
    sides broadcast. PMI = ln(c_ab·N / (c_a·c_b)) over identical
    integers — both engines compute the same IEEE double, rounded at
    6 digits per the continuous-output convention (the logprob keys'
    precedent)."""
    docs = t(spark, sf_dir, "documents").select(
        F.expr("filter(split(text, ' '), x -> x != '')").alias("w")
    )
    toks = docs.select(F.explode("w").alias("tok"))
    tot = toks.agg(F.count("*").alias("nt"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    pairs = (
        docs.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, size(w) - 2), i ->
                      transform(sequence(i + 1, least(i + 2, size(w) - 1)),
                                j -> struct(least(w[i], w[j]) AS a,
                                            greatest(w[i], w[j]) AS b))))
                    """
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    top = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .orderBy(F.col("c_ab").desc(), "a", "b")
        .limit(COOC_TOP)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    return (
        top.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .join(F.broadcast(tot))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("nt"))
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


TEXT_COOCCURRENCE_PMI_SQL = f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), tk AS (
  SELECT unnest(w) AS tok FROM d
), tot AS (SELECT count(*) AS nt FROM tk),
uni AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
i1 AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM d WHERE len(w) >= 2
), pr AS (
  SELECT doc_id, w, i,
         unnest(generate_series(i + 1, least(i + 2, len(w)))) AS j
  FROM i1
), pairs AS (
  SELECT least(w[i], w[j]) AS a, greatest(w[i], w[j]) AS b FROM pr
), pc AS (
  SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b
), top AS (
  SELECT * FROM pc ORDER BY c_ab DESC, a, b LIMIT {COOC_TOP}
)
SELECT t.a, t.b, CAST(t.c_ab AS BIGINT) AS c_ab,
       round(ln((t.c_ab * tot.nt) / (ua.c * ub.c)), 6) AS pmi
FROM top t
CROSS JOIN tot
JOIN uni ua ON ua.tok = t.a
JOIN uni ub ON ub.tok = t.b
"""


QUERIES.update({"text_cooccurrence_pmi": text_cooccurrence_pmi})
ORACLES.update({"text_cooccurrence_pmi": TEXT_COOCCURRENCE_PMI_SQL})


# --- Holt double-exponential smoothing ---------------------------------------


HOLT_ALPHA = 0.3
HOLT_BETA = 0.2
HOLT_FRAME = 20


def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per user: level AND
    trend, so the one-step forecast tracks drifting series the flat
    EWMA (ts_ewma_window) lags behind. Same bounded-frame fold idiom:
    the trailing 20 values fold ONCE left-to-right with a (level,
    trend) STRUCT accumulator —
      l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1});
      b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
    — classic init l_1 = x_1, b_1 = 0, which is exactly what DuckDB's
    list_reduce produces when the value list is mapped to {l: x, b: 0}
    structs and the FIRST element seeds the accumulator (the
    list_prepend trick is not even needed here); Spark's aggregate()
    seeds the same struct explicitly and folds elements 2..n. Both
    engines run the identical IEEE double sequence, so level and
    forecast are bit-identical; output floor-quantized to millionths
    (floor is exact, round is the .5-tie hazard). One sort per user
    partition, O(frame) per row — the frame never leaves its
    partition at any scale."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(HOLT_FRAME - 1), 0)
    )
    a, g = HOLT_ALPHA, HOLT_BETA
    step = (
        f"(acc, x) -> named_struct("
        f"'l', {a} * x + {1 - a} * (acc.l + acc.b), "
        f"'b', {g} * (({a} * x + {1 - a} * (acc.l + acc.b)) - acc.l)"
        f" + {1 - g} * acc.b)"
    )
    fold = F.expr(
        f"aggregate("
        f"  slice(vals, 2, greatest(size(vals) - 1, 0)),"
        f"  named_struct('l', element_at(vals, 1), 'b', cast(0.0 as double)),"
        f"  {step})"
    )
    return (
        ev.withColumn("vals", F.collect_list("value").over(w))
        .withColumn("acc", fold)
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("acc.l") * 1_000_000).cast("long").alias("level_e6"),
            F.floor((F.col("acc.l") + F.col("acc.b")) * 1_000_000)
            .cast("long")
            .alias("forecast_e6"),
        )
    )


# NOTE: the natural list_reduce fold with a STRUCT accumulator is
# WRONG on DuckDB 1.0 — inside the lambda's struct literal, later
# fields see the UPDATED earlier fields (acc.l in the 'b' expression
# binds to the freshly computed 'l'), silently corrupting any coupled
# recurrence. The oracle folds with a recursive CTE instead: plain
# scalar arithmetic per step, the identical IEEE sequence Spark's
# aggregate() runs. (Parity-gotcha list entry.)
TS_HOLT_LINEAR_SQL = f"""
WITH RECURSIVE framed AS (
  SELECT event_id, user_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {HOLT_FRAME - 1} PRECEDING AND CURRENT ROW
         ) AS vals
  FROM events
), rec AS (
  SELECT event_id, user_id, vals, 1 AS i,
         vals[1] AS l, CAST(0.0 AS DOUBLE) AS b
  FROM framed
  UNION ALL
  SELECT event_id, user_id, vals, i + 1,
         {HOLT_ALPHA} * vals[i + 1] + {1 - HOLT_ALPHA} * (l + b),
         {HOLT_BETA} * (({HOLT_ALPHA} * vals[i + 1]
           + {1 - HOLT_ALPHA} * (l + b)) - l) + {1 - HOLT_BETA} * b
  FROM rec WHERE i < len(vals)
)
SELECT event_id, user_id,
       CAST(floor(l * 1000000) AS BIGINT) AS level_e6,
       CAST(floor((l + b) * 1000000) AS BIGINT) AS forecast_e6
FROM rec WHERE i = len(vals)
"""


QUERIES.update({"ts_holt_linear": ts_holt_linear})
ORACLES.update({"ts_holt_linear": TS_HOLT_LINEAR_SQL})


# --- RAKE keyword extraction -------------------------------------------------


RAKE_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
RAKE_TOP_K = 3


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction) per document: candidate
    phrases are the maximal stopword-free token runs; each word scores
    degree/frequency over the DOCUMENT's candidates (degree = summed
    length of the phrases it appears in), and a phrase scores the sum
    of its words' scores — the classic unsupervised keyphrase baseline
    (Rose et al. 2010), complementing text_cooccurrence_pmi (corpus
    collocations) with per-doc phrase extraction. Top-3 phrases per doc
    by (score desc, phrase asc). Everything keys on doc_id (or finer) —
    phrase grouping, word stats, scoring are all document-local, so at
    100 TB the family co-partitions on doc_id and no vocabulary-wide
    state exists anywhere. Per-word scores floor to basis points before
    the integer phrase sum, so no float crosses engines."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("pos", "w")
    )
    flagged = docs.withColumn("is_stop", F.col("w").isin(*RAKE_STOPWORDS))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    grp = flagged.withColumn(
        "g", F.sum(F.col("is_stop").cast("int")).over(w_doc)
    )
    cand = grp.filter(~F.col("is_stop")).select("doc_id", "g", "pos", "w")
    phr = cand.groupBy("doc_id", "g").agg(
        F.count("*").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
    )
    wstat = (
        cand.join(phr.select("doc_id", "g", "plen"), ["doc_id", "g"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
    )
    sc = (
        cand.join(wstat, ["doc_id", "w"])
        .groupBy("doc_id", "g")
        .agg(
            F.sum(
                F.floor(10000.0 * F.col("deg") / F.col("freq")).cast("long")
            ).alias("score_bp")
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score_bp").desc(), F.col("phrase").asc(), F.col("g").asc()
    )
    return (
        phr.join(sc, ["doc_id", "g"])
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= RAKE_TOP_K)
        .select("doc_id", "rk", "phrase", "plen", "score_bp")
    )


_RAKE_STOP_SQL = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)

TEXT_RAKE_KEYWORDS_SQL = f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
), tokpos AS (
  SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, tk
  FROM d WHERE len(tk) > 0
), flagged AS (
  SELECT doc_id, pos, tk[pos] AS w,
         tk[pos] IN ({_RAKE_STOP_SQL}) AS is_stop
  FROM tokpos
), grp AS (
  SELECT doc_id, pos, w, is_stop,
         sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY pos
         ) AS g
  FROM flagged
), cand AS (
  SELECT doc_id, g, pos, w FROM grp WHERE NOT is_stop
), phr AS (
  SELECT doc_id, g, count(*) AS plen,
         string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM cand GROUP BY doc_id, g
), wstat AS (
  SELECT c.doc_id, c.w,
         count(*) AS freq,
         CAST(sum(p.plen) AS BIGINT) AS deg
  FROM cand c JOIN phr p ON c.doc_id = p.doc_id AND c.g = p.g
  GROUP BY c.doc_id, c.w
), sc AS (
  SELECT c.doc_id, c.g,
         CAST(sum(CAST(floor(10000.0 * s.deg / s.freq) AS BIGINT))
              AS BIGINT) AS score_bp
  FROM cand c JOIN wstat s ON c.doc_id = s.doc_id AND c.w = s.w
  GROUP BY c.doc_id, c.g
), ranked AS (
  SELECT p.doc_id, p.phrase, CAST(p.plen AS BIGINT) AS plen, sc.score_bp,
         row_number() OVER (
           PARTITION BY p.doc_id
           ORDER BY sc.score_bp DESC, p.phrase ASC, p.g ASC
         ) AS rk
  FROM phr p JOIN sc ON p.doc_id = sc.doc_id AND p.g = sc.g
)
SELECT doc_id, CAST(rk AS INT) AS rk, phrase, plen, score_bp
FROM ranked WHERE rk <= {RAKE_TOP_K}
"""


QUERIES.update({"text_rake_keywords": text_rake_keywords})
ORACLES.update({"text_rake_keywords": TEXT_RAKE_KEYWORDS_SQL})


# --- per-dimension embedding variance ----------------------------------------


def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance profile of the embedding space — the
    feature-selection / whitening diagnostic (dead dims, dominant dims)
    run before PCA or product quantization. One posexplode + ONE
    map-side-combinable hash agg over the (dim) grid; output is 64 rows
    regardless of corpus size, and the rank window runs over that tiny
    grid only. Components are floor-quantized to 1e-4 BEFORE
    aggregation (float32→double is exact, one identical double multiply
    + floor per value), so Σx and Σx² are exact BIGINT in both engines
    and the scaled variance m_var = n·Σx² − (Σx)² compares exactly —
    no float ever crosses engines. Integer headroom: |xq| ≤ ~5.3e3
    bounds (Σx)² under int64 to ~5×10^5 rows per aggregation; beyond
    that the sums widen to decimal128 (same plan shape)."""
    e = t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "x")
    )
    q = e.select(
        "dim",
        F.floor(F.col("x").cast("double") * 10000).cast("long").alias("xq"),
    )
    agg = q.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("xq").alias("sum_q4"),
        F.sum(F.col("xq") * F.col("xq")).alias("sumsq_q4"),
    )
    m = (F.col("n") * F.col("sumsq_q4") - F.col("sum_q4") * F.col("sum_q4"))
    w = Window.orderBy(F.col("m_var").desc(), F.col("dim").asc())
    return (
        agg.withColumn("m_var", m)
        .withColumn("vrank", F.row_number().over(w))
        .select("dim", "n", "sum_q4", "sumsq_q4", "m_var", "vrank")
    )


EMB_DIM_VARIANCE_SQL = """
WITH x AS (
  SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
         embedding AS emb
  FROM embeddings
), q AS (
  SELECT CAST(dim AS INT) AS dim,
         CAST(floor(CAST(emb[dim + 1] AS DOUBLE) * 10000) AS BIGINT) AS xq
  FROM x
), agg AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xq) AS BIGINT) AS sum_q4,
         CAST(sum(xq * xq) AS BIGINT) AS sumsq_q4
  FROM q GROUP BY dim
)
SELECT dim, n, sum_q4, sumsq_q4,
       n * sumsq_q4 - sum_q4 * sum_q4 AS m_var,
       CAST(row_number() OVER (
         ORDER BY n * sumsq_q4 - sum_q4 * sum_q4 DESC, dim ASC
       ) AS INT) AS vrank
FROM agg
"""


QUERIES.update({"emb_dim_variance": emb_dim_variance})
ORACLES.update({"emb_dim_variance": EMB_DIM_VARIANCE_SQL})


# --- Count-Min sketch --------------------------------------------------------


CMS_D = 4  # hash rows
CMS_W = 512  # counters per row
CMS_MOD = 2_147_483_647  # 2^31 - 1: keeps the char fold inside int64
# fixed (a, b) pairwise-independent hash parameters, one pair per row
CMS_SALTS = ((1_000_003, 12_345), (999_983, 54_321),
             (1_299_709, 7_777), (1_800_451, 99_991))


def _cms_word_code(word: str) -> int:
    """Polynomial char fold mod 2^31-1 — mirrored EXACTLY by the SQL
    fold in agg_count_min_sketch's probe stage (same constants, same
    step order), so builder and prober index identical cells."""
    acc = 0
    for ch in word:
        acc = (acc * 131 + ord(ch)) % CMS_MOD
    return acc


def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over corpus words — the mergeable frequency
    sketch for when per-key exact counts can't shuffle (companion to
    agg_heavy_hitters_mg, which needs a second scan; CMS answers
    point queries from ONE pass of fixed-size state). Build: each
    partition folds its words into a d×w counter table (Arrow-batched
    mapInPandas; the per-unique-word fold is batch-level Python over a
    small vocabulary, never a per-row UDF), emits the non-zero cells,
    and cells MERGE BY SUM in one tiny hash agg (d·w = 2048 cells
    regardless of scale — the whole point). Probe: the top-20 words by
    exact count (deterministic probe set the oracle can reproduce) are
    hashed JVM-side with the identical char fold, joined to the
    broadcast sketch, est = min over the d rows.

    Driver contract (error-bound idiom, like the HLL 5·rsd oracle):
    output = exact top-20 counts plus two booleans the oracle emits as
    literal TRUE — ``overestimates_ok`` (CMS can never undercount; a
    violation means the merge or hash broke) and ``within_bound``
    (est ≤ exact + 3·e·N/w — Markov gives P(fail) ≤ (3e)^-d ≈ 2e-4 per
    probe, and the sketch is fully deterministic, so a pass at this
    data is a pass forever; only a mechanism regression flips it)."""
    import math

    docs = t(spark, sf_dir, "documents").select("text")

    def cms_partials(batches):
        import pandas as pd

        cells: dict[tuple[int, int], int] = {}
        for pdf in batches:
            toks = pdf["text"].str.split(" ").explode()
            toks = toks[toks.notna() & (toks != "")]
            for w, c in toks.value_counts().items():
                code = _cms_word_code(str(w))
                for i, (a, b) in enumerate(CMS_SALTS):
                    idx = (a * code + b) % CMS_MOD % CMS_W
                    cells[(i, idx)] = cells.get((i, idx), 0) + int(c)
        yield pd.DataFrame(
            {
                "i": [k[0] for k in cells],
                "idx": [k[1] for k in cells],
                "cnt": list(cells.values()),
            }
        )

    sketch = (
        docs.mapInPandas(cms_partials, schema="i int, idx int, cnt long")
        .groupBy("i", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )

    words = t(spark, sf_dir, "documents").select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "word"
        )
    )
    counts = words.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    total = counts.agg(F.sum("exact_cnt").alias("n_total"))
    w_rank = Window.orderBy(F.col("exact_cnt").desc(), F.col("word").asc())
    top = (
        counts.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 20)
        .drop("rk")
    )
    code = F.expr(
        f"aggregate(split(word, ''), cast(0 as bigint),"
        f" (acc, c) -> (acc * 131 + ascii(c)) % {CMS_MOD})"
    )
    probes = top.withColumn("code", code).select(
        "word",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[
                    ((F.lit(a) * F.col("code") + F.lit(b)) % CMS_MOD % CMS_W)
                    .cast("int")
                    for a, b in CMS_SALTS
                ]
            )
        ).alias("i", "idx"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "idx"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    slack = F.ceil(F.lit(3 * math.e / CMS_W) * F.col("n_total"))
    return est.join(F.broadcast(total)).select(
        "word",
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("overestimates_ok"),
        (F.col("est") <= F.col("exact_cnt") + slack).alias("within_bound"),
    )


AGG_COUNT_MIN_SKETCH_SQL = """
WITH w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), cnt AS (
  SELECT word, count(*) AS c FROM w GROUP BY word
), top AS (
  SELECT word, CAST(c AS BIGINT) AS exact_cnt,
         row_number() OVER (ORDER BY c DESC, word ASC) AS rk
  FROM cnt
)
SELECT word, exact_cnt,
       TRUE AS overestimates_ok,
       TRUE AS within_bound
FROM top WHERE rk <= 20
"""


QUERIES.update({"agg_count_min_sketch": agg_count_min_sketch})
ORACLES.update({"agg_count_min_sketch": AGG_COUNT_MIN_SKETCH_SQL})


# --- CUSUM drift detection ---------------------------------------------------


CUSUM_FRAME = 20
CUSUM_SLACK = 0.5  # per-step allowance before deviations accumulate
CUSUM_H = 5.0  # alarm threshold


def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per user — the classic
    change-point accumulator (Page 1954): within the trailing 20-event
    frame, s_t = max(0, s_{t-1} + (x_t − x_ref − k)) with the frame's
    FIRST value as the reference (deterministic — a frame-mean
    reference would put a cross-engine float average inside the fold)
    and slack k=0.5; ``drift`` flags s > H=5. A level shift early in
    the frame accumulates ~(shift−k)·len and trips the flag; noise
    resets to 0. SCALAR fold accumulator — immune to the DuckDB
    struct-fold mis-binding ts_holt_linear's oracle works around —
    identical IEEE sequence both engines, output floor-quantized.
    Same one-window plan shape as the EWMA; frame-bounded state."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(CUSUM_FRAME - 1), 0)
    )
    fold = F.expr(
        f"aggregate("
        f"  slice(vals, 2, greatest(size(vals) - 1, 0)),"
        f"  cast(0.0 as double),"
        f"  (acc, x) -> greatest(cast(0.0 as double),"
        f"    acc + (x - element_at(vals, 1) - {CUSUM_SLACK})))"
    )
    return (
        ev.withColumn("vals", F.collect_list("value").over(w))
        .withColumn("s", fold)
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("s") * 1_000_000).cast("long").alias("cusum_e6"),
            (F.col("s") > CUSUM_H).alias("drift"),
        )
    )


TS_CUSUM_DRIFT_SQL = f"""
WITH framed AS (
  SELECT event_id, user_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {CUSUM_FRAME - 1} PRECEDING AND CURRENT ROW
         ) AS vals
  FROM events
), folded AS (
  SELECT event_id, user_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), vals[2:]),
           (acc, x) -> greatest(CAST(0.0 AS DOUBLE),
                                acc + (x - vals[1] - {CUSUM_SLACK}))
         ) AS s
  FROM framed
)
SELECT event_id, user_id,
       CAST(floor(s * 1000000) AS BIGINT) AS cusum_e6,
       s > {CUSUM_H} AS drift
FROM folded
"""


QUERIES.update({"ts_cusum_drift": ts_cusum_drift})
ORACLES.update({"ts_cusum_drift": TS_CUSUM_DRIFT_SQL})


# --- exact weighted quantiles ------------------------------------------------


def agg_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted quantiles (p25/median/p75 of extended price
    weighted by quantity, per return flag) — the inventory-weighted
    distribution summary percentile_* cannot express (every unit of
    quantity counts as one sample). Shape: pre-aggregate to the
    (flag, cents) grid FIRST (ties collapse, so the cumulative sum is
    deterministic), ONE cumulative-weight window per flag over that
    grid, then the quantile picks are conditional mins — smallest
    value whose cumulative weight reaches the rank. All arithmetic in
    integer cents/units; the only float op is the shared
    cents-quantization round, identical per-value in both engines (2dp
    doubles ×100 never land on .5 ties). At scale the window runs over
    the DISTINCT-price grid per flag, not the fact rows."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    grid = li.groupBy("flag", "cents").agg(F.sum("wt").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn("cw", F.sum("w").over(w_cum))
    tot = grid.groupBy("flag").agg(F.sum("w").alias("total_units"))
    j = cum.join(F.broadcast(tot), "flag")
    return j.groupBy("flag", "total_units").agg(
        F.min(
            F.when(4 * F.col("cw") >= F.col("total_units"), F.col("cents"))
        ).alias("wp25_cents"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("total_units"), F.col("cents"))
        ).alias("wmedian_cents"),
        F.min(
            F.when(4 * F.col("cw") >= 3 * F.col("total_units"), F.col("cents"))
        ).alias("wp75_cents"),
    )


AGG_WEIGHTED_QUANTILES_SQL = """
WITH base AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
), grid AS (
  SELECT flag, cents, CAST(sum(wt) AS BIGINT) AS w
  FROM base GROUP BY flag, cents
), cum AS (
  SELECT flag, cents, w,
         CAST(sum(w) OVER (
           PARTITION BY flag ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cw
  FROM grid
), tot AS (
  SELECT flag, CAST(sum(w) AS BIGINT) AS total_units FROM grid GROUP BY flag
)
SELECT c.flag, t.total_units,
       CAST(min(CASE WHEN 4 * c.cw >= t.total_units THEN c.cents END)
            AS BIGINT) AS wp25_cents,
       CAST(min(CASE WHEN 2 * c.cw >= t.total_units THEN c.cents END)
            AS BIGINT) AS wmedian_cents,
       CAST(min(CASE WHEN 4 * c.cw >= 3 * t.total_units THEN c.cents END)
            AS BIGINT) AS wp75_cents
FROM cum c JOIN tot t ON c.flag = t.flag
GROUP BY c.flag, t.total_units
"""


QUERIES.update({"agg_weighted_quantiles": agg_weighted_quantiles})
ORACLES.update({"agg_weighted_quantiles": AGG_WEIGHTED_QUANTILES_SQL})


# --- URL parsing -------------------------------------------------------------


def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — the web-corpus curation primitive
    (host-level dedup/mix keys, path routing, query-param analysis):
    deterministic URLs synthesized from ``part``, parsed with Spark's
    JVM-side ``parse_url`` (HOST / PATH / QUERY / one query param) and
    aggregated per host. The oracle re-derives the same components
    with anchored regexes (DuckDB has no parse_url), so the key pins
    Spark's parser against an independent specification of the same
    grammar rather than itself. Pure scan-side expressions — no
    shuffle beyond the final host aggregate."""
    base = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.lit("https://brand-"),
            F.regexp_replace(F.col("p_brand"), "[^0-9]", ""),
            F.lit(".example.com/part/"),
            F.col("p_partkey"),
            F.lit("?size="),
            F.col("p_size"),
            F.lit("&type="),
            F.regexp_replace(F.col("p_type"), " ", "+"),
        ).alias("url"),
    )
    parsed = base.select(
        "p_partkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("size")).alias("size_s"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.col("size_s").cast("long")).alias("size_sum"),
        F.sum(F.length("path").cast("long")).alias("path_len_sum"),
        F.min("path").alias("first_path"),
    )


FN_URL_PARSE_SQL = """
WITH u AS (
  SELECT p_partkey,
         'https://brand-' || regexp_replace(p_brand, '[^0-9]', '', 'g')
           || '.example.com/part/' || CAST(p_partkey AS VARCHAR)
           || '?size=' || CAST(p_size AS VARCHAR)
           || '&type=' || replace(p_type, ' ', '+') AS url
  FROM part
), parsed AS (
  SELECT p_partkey,
         regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '[?&]size=([^&#]*)', 1) AS size_s
  FROM u
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CAST(size_s AS BIGINT)) AS BIGINT) AS size_sum,
       CAST(sum(length(path)) AS BIGINT) AS path_len_sum,
       min(path) AS first_path
FROM parsed GROUP BY host
"""


QUERIES.update({"fn_url_parse": fn_url_parse})
ORACLES.update({"fn_url_parse": FN_URL_PARSE_SQL})


# --- running-peak drawdown ---------------------------------------------------


def window_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the running-peak deficit metric
    (monitoring: worst regression from a high-water mark; finance:
    peak-to-trough): one cumulative-max window over the ordered
    series, drawdown = peak − value, then a per-user max/argmax
    aggregate. Integer cents end-to-end (per-value round, never a
    cross-engine float sum); the argmax of WHEN the worst drawdown
    happened rides a max_by struct with event_id tiebreak. One sort
    per user partition, O(1) per-row state — the textbook
    prefix-extreme window."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = (
        ev.withColumn("peak", F.max("cents").over(w))
        .withColumn("drawdown", F.col("peak") - F.col("cents"))
        .withColumn(
            "worst",
            F.max(F.col("peak") - F.col("cents")).over(
                Window.partitionBy("user_id")
            ),
        )
    )
    return dd.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("drawdown").alias("max_drawdown_cents"),
        F.max("peak").alias("peak_cents"),
        F.min(
            F.when(F.col("drawdown") == F.col("worst"), F.col("event_id"))
        ).alias("worst_event_id"),
    )


WINDOW_DRAWDOWN_MAX_SQL = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), dd AS (
  SELECT event_id, user_id, cents,
         CAST(max(cents) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS peak
  FROM c
), d2 AS (
  SELECT event_id, user_id, cents, peak, peak - cents AS drawdown,
         max(peak - cents) OVER (PARTITION BY user_id) AS worst
  FROM dd
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
       CAST(max(peak) AS BIGINT) AS peak_cents,
       CAST(min(CASE WHEN drawdown = worst THEN event_id END) AS BIGINT)
         AS worst_event_id
FROM d2 GROUP BY user_id
"""


QUERIES.update({"window_drawdown_max": window_drawdown_max})
ORACLES.update({"window_drawdown_max": WINDOW_DRAWDOWN_MAX_SQL})


# --- Bloom-filter membership -------------------------------------------------


BLOOM_M = 4096  # bits
BLOOM_K = 5  # probes per key (double hashing)


def _bloom_codes(word: str) -> tuple[int, int]:
    """Two independent polynomial char folds (multipliers 131/137) —
    the double-hashing bases; mirrored by the probe stage's SQL
    folds."""
    a = b = 0
    for ch in word:
        o = ord(ch)
        a = (a * 131 + o) % CMS_MOD
        b = (b * 137 + o) % CMS_MOD
    return a, b


def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership over corpus words — the set-sketch that
    rounds out the summary family (HLL cardinality, Misra-Gries heavy
    hitters, CMS frequencies; Bloom answers "have I seen this key?"
    in O(1) bits/key — the join-prefilter and dedup-gate primitive).
    Build: per-partition m=4096-bit arrays as 64 int64 slots
    (Arrow-batched mapInPandas), OR-merged by ONE 64-row bit_or hash
    agg — fixed-size state at any scale, like the CMS. Probe: the
    top-10 words by exact count (present — Bloom can NEVER false-
    negative, so their membership is deterministic TRUE) plus 10
    deterministic absent strings whose false-positive count is bound-
    checked (expected FPR (1−e^{−kn/m})^k ≈ 1e-4 here; bound 2 of 10
    with huge margin, and the filter is deterministic, so a local pass
    is a pass forever). Probe hashing is JVM-side double hashing
    h_i = code_a + i·code_b with the builder's exact char folds."""
    docs = t(spark, sf_dir, "documents").select("text")

    def bloom_partials(batches):
        import pandas as pd

        slots = [0] * (BLOOM_M // 64)
        for pdf in batches:
            toks = pdf["text"].str.split(" ").explode()
            toks = toks[toks.notna() & (toks != "")]
            for w in toks.unique():
                a, b = _bloom_codes(str(w))
                for i in range(BLOOM_K):
                    bit = (a + i * b) % CMS_MOD % BLOOM_M
                    slots[bit >> 6] |= 1 << (bit & 63)
        yield pd.DataFrame(
            {
                "slot": range(len(slots)),
                # int64 overflow-safe: store as signed two's complement
                "bits": [s - (1 << 64) if s >= (1 << 63) else s
                         for s in slots],
            }
        )

    bloom = (
        docs.mapInPandas(bloom_partials, schema="slot int, bits long")
        .groupBy("slot")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )

    words = t(spark, sf_dir, "documents").select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "word"
        )
    )
    counts = words.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    w_rank = Window.orderBy(F.col("exact_cnt").desc(), F.col("word").asc())
    present = (
        counts.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    absent = spark.range(10).select(
        F.concat(F.lit("absent_probe_"), F.col("id")).alias("word"),
        F.lit(None).cast("long").alias("exact_cnt"),
    )

    def probe(df):
        code_a = F.expr(
            f"aggregate(split(word, ''), cast(0 as bigint),"
            f" (acc, c) -> (acc * 131 + ascii(c)) % {CMS_MOD})"
        )
        code_b = F.expr(
            f"aggregate(split(word, ''), cast(0 as bigint),"
            f" (acc, c) -> (acc * 137 + ascii(c)) % {CMS_MOD})"
        )
        bits = df.withColumn("ca", code_a).withColumn("cb", code_b).select(
            "word",
            "exact_cnt",
            F.posexplode(
                F.array(
                    *[
                        ((F.col("ca") + F.lit(i) * F.col("cb"))
                         % CMS_MOD % BLOOM_M).cast("int")
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("i", "bit"),
        )
        hit = bits.join(
            F.broadcast(bloom),
            (F.col("bit") / 64).cast("int") == F.col("slot"),
        ).select(
            "word",
            "exact_cnt",
            (
                F.expr(
                    "shiftrightunsigned(bits, cast(bit % 64 as int)) & 1"
                )
                == 1
            ).alias("bit_set"),
        )
        return hit.groupBy("word", "exact_cnt").agg(
            F.bool_and("bit_set").alias("member")
        )

    fp_ok = probe(absent).agg(
        (F.count_if(F.col("member")) <= F.lit(2)).alias("fp_bound_ok")
    )
    return probe(present).join(F.broadcast(fp_ok)).select(
        "word",
        "exact_cnt",
        F.col("member").alias("present_found"),
        "fp_bound_ok",
    )


AGG_BLOOM_MEMBERSHIP_SQL = """
WITH w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), cnt AS (
  SELECT word, count(*) AS c FROM w GROUP BY word
), top AS (
  SELECT word, CAST(c AS BIGINT) AS exact_cnt,
         row_number() OVER (ORDER BY c DESC, word ASC) AS rk
  FROM cnt
)
SELECT word, exact_cnt,
       TRUE AS present_found,
       TRUE AS fp_bound_ok
FROM top WHERE rk <= 10
"""


QUERIES.update({"agg_bloom_membership": agg_bloom_membership})
ORACLES.update({"agg_bloom_membership": AGG_BLOOM_MEMBERSHIP_SQL})


# --- Spark-4 bitmap distinct -------------------------------------------------


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through Spark 4's bitmap aggregate
    surface (bitmap_bucket_number / bitmap_construct_agg /
    bitmap_count) — the roaring-style mechanism warehouses use when
    count(distinct) must be both exact AND re-aggregatable: per
    (status, bucket) a fixed 4KB bitmap marks the customer ids seen,
    partials OR-merge map-side, and the per-group distinct count is
    the SUM of per-bucket bit counts. Unlike HLL this is exact, so
    the oracle is a plain COUNT(DISTINCT) — any bitmap-surface bug is
    a value mismatch, not a bound violation. Shuffle carries
    (groups × touched buckets) 4KB bitmaps, never the id stream."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("cust"),
    )
    per_bucket = (
        o.withColumn("bucket", F.expr("bitmap_bucket_number(cust)"))
        .groupBy("status", "bucket")
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(cust))")
             .alias("bm"))
    )
    return per_bucket.groupBy("status").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_cust"),
        F.count("*").alias("n_buckets"),
    )


AGG_BITMAP_DISTINCT_SQL = """
SELECT o_orderstatus AS status,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust,
       CAST(count(DISTINCT CAST(ceil(o_custkey / 32768.0) AS BIGINT))
            AS BIGINT) AS n_buckets
FROM orders GROUP BY o_orderstatus
"""


QUERIES.update({"agg_bitmap_distinct": agg_bitmap_distinct})
ORACLES.update({"agg_bitmap_distinct": AGG_BITMAP_DISTINCT_SQL})


# --- exact integer autocorrelation -------------------------------------------


ACF_LAGS = (1, 2, 3)


def ts_autocorr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation terms per user — seasonality/memory
    detection — with NO float crossing engines: values quantize to
    integer cents, lagged pairs come from k lag windows over one sort,
    and the output is the EXACT integer Pearson pieces (n, Σxy, and
    the two scaled variance terms n·Σx²−(Σx)²) rather than the rooted
    ratio — callers divide; the driver hash compares integers. One
    user_id exchange; per-lag state is one window column."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "c",
        *[F.lag("c", k).over(w).alias(f"l{k}") for k in ACF_LAGS],
    )
    out_cols = []
    for k in ACF_LAGS:
        lk = F.col(f"l{k}")
        n = F.count(F.when(lk.isNotNull(), 1))
        sx, sy = F.sum(lk), F.sum(F.when(lk.isNotNull(), F.col("c")))
        sxy = F.sum(lk * F.col("c"))
        sxx = F.sum(lk * lk)
        syy = F.sum(F.when(lk.isNotNull(), F.col("c") * F.col("c")))
        out_cols += [
            n.alias(f"n{k}"),
            (n * sxy - sx * sy).alias(f"cov{k}"),
            (n * sxx - sx * sx).alias(f"varx{k}"),
            (n * syy - sy * sy).alias(f"vary{k}"),
        ]
    return lagged.groupBy("user_id").agg(*out_cols)


def _acf_oracle_sql() -> str:
    per_lag = []
    for k in ACF_LAGS:
        per_lag.append(
            f"CAST(count(l{k}) AS BIGINT) AS n{k},\n"
            f"       CAST(count(l{k}) * sum(l{k} * c)"
            f" - sum(l{k}) * sum(CASE WHEN l{k} IS NOT NULL THEN c END)"
            f" AS BIGINT) AS cov{k},\n"
            f"       CAST(count(l{k}) * sum(l{k} * l{k})"
            f" - sum(l{k}) * sum(l{k}) AS BIGINT) AS varx{k},\n"
            f"       CAST(count(l{k}) * sum(CASE WHEN l{k} IS NOT NULL"
            f" THEN c * c END)"
            f" - sum(CASE WHEN l{k} IS NOT NULL THEN c END)"
            f" * sum(CASE WHEN l{k} IS NOT NULL THEN c END)"
            f" AS BIGINT) AS vary{k}"
        )
        lags = ",\n         ".join(
            f"lag(c, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
            f" AS l{j}"
            for j in ACF_LAGS
        )
    return (
        "WITH c AS (\n"
        "  SELECT event_id, user_id, ts,\n"
        "         CAST(round(value * 100) AS BIGINT) AS c\n"
        "  FROM events\n"
        "), lagged AS (\n"
        f"  SELECT user_id, c,\n         {lags}\n"
        "  FROM c\n"
        ")\n"
        "SELECT user_id,\n       "
        + ",\n       ".join(per_lag)
        + "\nFROM lagged GROUP BY user_id"
    )


QUERIES.update({"ts_autocorr_exact": ts_autocorr_exact})
ORACLES.update({"ts_autocorr_exact": _acf_oracle_sql()})


# --- source vocabulary overlap -----------------------------------------------


def corpus_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between SOURCES — the corpus-mix
    diagnostic ("which feeds are near-duplicates of each other?"):
    distinct (source, term) pairs, term-keyed self-join with s1 < s2
    for intersection sizes, per-source vocab sizes broadcast back, and
    Jaccard floored to basis points. Per-term fan-out is bounded by
    #sources² (the contamination-matrix contract) — the corpus itself
    never self-joins, and the output is a #sources² grid regardless of
    scale."""
    st = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("term"),
        )
        .distinct()
    )
    st = st.localCheckpoint(eager=False)  # three consumers, one scan
    sizes = st.groupBy("source").agg(F.count("*").alias("vsz"))
    a = st.select(F.col("source").alias("s1"), "term")
    b = st.select(F.col("source").alias("s2"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "s1")
                        .withColumnRenamed("vsz", "v1")),
            "s1",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "s2")
                        .withColumnRenamed("vsz", "v2")),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "inter",
            "v1",
            "v2",
            F.floor(
                10000.0
                * F.col("inter")
                / (F.col("v1") + F.col("v2") - F.col("inter"))
            ).alias("jaccard_bp"),
        )
    )


CORPUS_SOURCE_VOCAB_OVERLAP_SQL = """
WITH st AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), sizes AS (
  SELECT source, count(*) AS vsz FROM st GROUP BY source
), inter AS (
  SELECT a.source AS s1, b.source AS s2, count(*) AS inter
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.s1, i.s2,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(za.vsz AS BIGINT) AS v1,
       CAST(zb.vsz AS BIGINT) AS v2,
       CAST(floor(
         10000.0 * i.inter / (za.vsz + zb.vsz - i.inter)
       ) AS BIGINT) AS jaccard_bp
FROM inter i
JOIN sizes za ON za.source = i.s1
JOIN sizes zb ON zb.source = i.s2
"""


QUERIES.update({"corpus_source_vocab_overlap": corpus_source_vocab_overlap})
ORACLES.update(
    {"corpus_source_vocab_overlap": CORPUS_SOURCE_VOCAB_OVERLAP_SQL}
)


# --- language-ID confusion matrix --------------------------------------------


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + per-class shares for the language-ID
    heuristic against the labeled ``lang`` column — the
    classifier-eval pattern every curation heuristic needs before it
    gates a corpus (is the cheap model wrong uniformly, or only for
    one class?). Pure composition: text_langid's per-doc predictions
    group to the |langs|² cell grid, per-true-class totals broadcast
    back, cell shares floored to basis points. The eval is itself
    oracled: the SQL twin wraps text_langid's own oracle as a CTE, so
    a scoring drift breaks BOTH keys coherently."""
    from mysql_cdc_table_spark.functions.text import text_langid

    pred = text_langid(spark, sf_dir).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    totals = pred.groupBy("lang").agg(F.count("*").alias("lang_total"))
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "pred_lang",
        "n",
        "lang_total",
        F.floor(10000.0 * F.col("n") / F.col("lang_total")).alias(
            "cell_bp"
        ),
    )


def _langid_confusion_sql() -> str:
    from mysql_cdc_table_spark.functions.text import TEXT_LANGID_SQL

    return f"""
WITH pred AS ({TEXT_LANGID_SQL}),
cells AS (
  SELECT lang, pred_lang, count(*) AS n
  FROM pred GROUP BY lang, pred_lang
), totals AS (
  SELECT lang, count(*) AS lang_total FROM pred GROUP BY lang
)
SELECT c.lang, c.pred_lang,
       CAST(c.n AS BIGINT) AS n,
       CAST(t.lang_total AS BIGINT) AS lang_total,
       CAST(floor(10000.0 * c.n / t.lang_total) AS BIGINT) AS cell_bp
FROM cells c JOIN totals t ON c.lang = t.lang
"""


QUERIES.update({"text_langid_confusion": text_langid_confusion})
ORACLES.update({"text_langid_confusion": _langid_confusion_sql()})


# --- GROUP BY ALL ------------------------------------------------------------


def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's GROUP BY ALL — the modern shorthand that infers the
    grouping keys from the non-aggregate select items (third SQL
    entry-point key next to sql_entrypoint_views and sql_pipe_syntax).
    The oracle spells the keys out, so the key asserts the inference
    resolves to exactly the explicit grouping — a computed expression
    among the keys (the priority prefix) makes the inference
    non-trivial. Integer outputs per the parity convention."""
    from mysql_cdc_table_spark.operators.extras import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus,
               substring(o_orderpriority, 1, 1) AS prio,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_sum
        FROM orders
        GROUP BY ALL
        """
    )


SQL_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus,
       substring(o_orderpriority, 1, 1) AS prio,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderstatus, substring(o_orderpriority, 1, 1)
"""


QUERIES.update({"sql_group_by_all": sql_group_by_all})
ORACLES.update({"sql_group_by_all": SQL_GROUP_BY_ALL_SQL})


# --- image average-hash (perceptual near-dup) --------------------------------


def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over REAL image decode — the image
    near-dup primitive (aHash: 8×8 block means vs global mean → 64
    bits; images equal up to small noise share most bits). Every doc
    synthesizes a GRADIENT image (per-channel linear patterns in
    x/y/doc_id; even ids P6, odd ids BMP), the decode stage sniffs and
    parses REAL bytes back to pixels (decode_image_pixels), and the
    hash computes from a channel-WEIGHTED intensity 3R+2G+B in exact
    integer arithmetic (block_sum·total_px > total_sum·block_px — no
    division). Because the pattern is spatial and the weights are
    asymmetric, the value hash now pins what the mean-only decode key
    cannot: BMP bottom-up row order, BGR→RGB channel order, and row
    padding all flip bits if mishandled. The oracle recomputes the
    hash from the pattern formula — pure SQL integer arithmetic.
    Arrow-batched mapInPandas both stages; embarrassingly parallel."""
    import numpy as np

    from mysql_cdc_table_spark.functions.multimodal import (
        decode_image_pixels,
        encode_bmp,
        encode_ppm,
    )

    out_schema = (
        "doc_id long, codec string, width int, height int, "
        "hash_hi long, hash_lo long, n_bits int"
    )

    def gen_and_hash(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 16 + 8, did % 12 + 8
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                rgb = np.stack(
                    [
                        (x + y + did) % 256,
                        (2 * x + y + did) % 256,
                        (x + 3 * y + did) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payload = (
                    encode_ppm(w, h, rgb)
                    if did % 2 == 0
                    else encode_bmp(w, h, rgb)
                )
                # REAL decode back from the container bytes
                codec, px = decode_image_pixels(payload)
                s = (
                    3 * px[:, :, 0].astype(np.int64)
                    + 2 * px[:, :, 1].astype(np.int64)
                    + px[:, :, 2].astype(np.int64)
                )
                bx = (np.arange(w) * 8) // w
                by = (np.arange(h) * 8) // h
                block_sum = np.zeros((8, 8), dtype=np.int64)
                block_px = np.zeros((8, 8), dtype=np.int64)
                np.add.at(block_sum, (by[:, None], bx[None, :]), s)
                np.add.at(
                    block_px,
                    (by[:, None], bx[None, :]),
                    np.ones((h, w), dtype=np.int64),
                )
                total_sum, total_px = int(s.sum()), w * h
                bits = (
                    block_sum * total_px > total_sum * block_px
                ).ravel()  # p = by*8 + bx
                lo = hi = 0
                for p, b in enumerate(bits):
                    if b:
                        if p < 32:
                            lo |= 1 << p
                        else:
                            hi |= 1 << (p - 32)
                rows.append(
                    (did, codec, w, h, hi, lo, int(bits.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "codec", "width", "height",
                    "hash_hi", "hash_lo", "n_bits",
                ],
            )

    d = t(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(gen_and_hash, schema=out_schema)


MM_IMAGE_AHASH_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, w * h - 1)) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h,
         ((i % w) * 8) // w AS bx,
         ((i // w) * 8) // h AS by,
         3 * ((i % w + i // w + doc_id) % 256)
         + 2 * ((2 * (i % w) + i // w + doc_id) % 256)
         + ((i % w + 3 * (i // w) + doc_id) % 256) AS s
  FROM px
), blocks AS (
  SELECT doc_id, w, h, by * 8 + bx AS p,
         CAST(sum(s) AS BIGINT) AS bsum,
         CAST(count(*) AS BIGINT) AS bpx
  FROM v GROUP BY doc_id, w, h, bx, by
), tot AS (
  SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS tsum
  FROM blocks GROUP BY doc_id
), bits AS (
  SELECT b.doc_id, b.w, b.h, b.p,
         b.bsum * (b.w * b.h) > t.tsum * b.bpx AS bit
  FROM blocks b JOIN tot t ON b.doc_id = t.doc_id
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS codec,
       CAST(max(w) AS INTEGER) AS width,
       CAST(max(h) AS INTEGER) AS height,
       CAST(sum(CASE WHEN bit AND p >= 32
                     THEN (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END)
            AS BIGINT) AS hash_hi,
       CAST(sum(CASE WHEN bit AND p < 32
                     THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
            AS BIGINT) AS hash_lo,
       CAST(count(*) FILTER (WHERE bit) AS INTEGER) AS n_bits
FROM bits GROUP BY doc_id
"""


QUERIES.update({"mm_image_ahash": mm_image_ahash})
ORACLES.update({"mm_image_ahash": MM_IMAGE_AHASH_SQL})


# --- bucketed fact-x-fact interval join --------------------------------------


IVJ_BUCKET_DAYS = 7


def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-×-fact interval-overlap join WITHOUT a nested loop — the
    scale path join_interval_overlap (small broadcast side) does not
    need but two big sides do: both interval sets explode into
    7-day-bucket ids (bounded fan-out: interval length ≤ 14 days → ≤ 3
    buckets), pairs meet by EQUI join on the bucket — hash/sort-merge,
    shuffles partition by bucket — and each overlapping pair is
    counted EXACTLY ONCE without a distinct: the bucket containing
    max(starts) owns the pair (it lies inside both intervals'
    bucket ranges, so both sides explode into it, and the ownership
    predicate kills every other meeting). Shipment intervals
    [l_shipdate, +1+qty%14) meet order activity windows
    [o_orderdate, +1+o_orderkey%10) from the SAME H1-1995 slice; the
    plan audit asserts no BroadcastNestedLoopJoin anywhere — the
    difference between this and a naive range join at 100 TB. Oracle:
    the plain inequality join, exact at driver scale."""
    day0 = F.lit("1970-01-01")
    a = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-06-01")
        )
        .select(
            F.col("l_quantity").cast("long").alias("qty"),
            F.datediff(F.col("l_shipdate").cast("date"), day0).alias(
                "a_start"
            ),
        )
        .withColumn("a_end", F.col("a_start") + 1 + F.col("qty") % 14)
    )
    b = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-06-01")
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.datediff(F.col("o_orderdate").cast("date"), day0).alias(
                "b_start"
            ),
            (F.col("o_orderkey") % 10).alias("okey_mod"),
        )
        .withColumn("b_end", F.col("b_start") + 1 + F.col("okey_mod"))
        .drop("okey_mod")
    )
    bkt = lambda s, e: F.sequence(
        F.floor(s / IVJ_BUCKET_DAYS).cast("long"),
        F.floor((e - 1) / IVJ_BUCKET_DAYS).cast("long"),
    )
    ax = a.withColumn("bucket", F.explode(bkt(F.col("a_start"), F.col("a_end"))))
    bx = b.withColumn("bucket", F.explode(bkt(F.col("b_start"), F.col("b_end"))))
    pairs = ax.join(bx, "bucket").filter(
        (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end"))
        & (
            F.floor(
                F.greatest(F.col("a_start"), F.col("b_start"))
                / IVJ_BUCKET_DAYS
            ).cast("long")
            == F.col("bucket")
        )
    )
    return pairs.groupBy("status").agg(
        F.count("*").alias("n_pairs"),
        F.sum("qty").alias("qty_sum"),
        F.min(F.col("a_start")).alias("first_ship_day"),
        F.max(F.col("b_end")).alias("last_window_end"),
    )


JOIN_INTERVAL_BUCKETED_SQL = """
WITH a AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS a_start
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-06-01'
), a2 AS (
  SELECT qty, a_start, a_start + 1 + qty % 14 AS a_end FROM a
), b AS (
  SELECT o_orderstatus AS status,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS b_start,
         o_orderkey
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-06-01'
), b2 AS (
  SELECT status, b_start, b_start + 1 + o_orderkey % 10 AS b_end FROM b
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(qty) AS BIGINT) AS qty_sum,
       CAST(min(a_start) AS BIGINT) AS first_ship_day,
       CAST(max(b_end) AS BIGINT) AS last_window_end
FROM a2 JOIN b2 ON a_start < b_end AND b_start < a_end
GROUP BY status
"""


QUERIES.update({"join_interval_bucketed": join_interval_bucketed})
ORACLES.update({"join_interval_bucketed": JOIN_INTERVAL_BUCKETED_SQL})


# --- MinHash estimator calibration -------------------------------------------


def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration report for the MinHash estimator over its OWN LSH
    candidates — the sketch-eval pattern (like text_langid_confusion
    for a classifier): for every candidate pair, the 16-component
    signature agreement (the estimator: matches/16 ≈ Jaccard) is
    cross-tabulated against the EXACT shingle Jaccard, grouped by
    match count. One row per agreement level with exact-integer
    evidence (pair count, how many clear Jaccard ≥ 0.3 via the
    10·common ≥ 3·union integer test, and the summed common/union
    masses). A broken permutation, banding, or shingle pipeline shifts
    the whole curve. Joins key on doc ids; candidate volume is
    LSH-bounded, never all-pairs."""
    from mysql_cdc_table_spark.functions.dedup import (
        N_HASHES,
        dedup_minhash_pairs,
        dedup_minhash_signature,
    )
    from mysql_cdc_table_spark.functions.text import _doc_shingles

    pairs = dedup_minhash_pairs(spark, sf_dir)
    sig = dedup_minhash_signature(spark, sf_dir).localCheckpoint(
        eager=False
    )
    sh = (
        _doc_shingles(spark, sf_dir, require_shingles=True)
        .localCheckpoint(eager=False)
    )
    sa = sig.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    est = (
        pairs.join(sa, "doc1")
        .join(sb, "doc2")
        .select("doc1", "doc2", matches.alias("mh_matches"))
    )
    ja = sh.select(F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1"))
    jb = sh.select(F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2"))
    exact = (
        est.join(ja, "doc1")
        .join(jb, "doc2")
        .select(
            "mh_matches",
            F.size(F.array_intersect("sh1", "sh2")).alias("common"),
            (
                F.size("sh1") + F.size("sh2")
                - F.size(F.array_intersect("sh1", "sh2"))
            ).alias("uni"),
        )
    )
    return exact.groupBy("mh_matches").agg(
        F.count("*").alias("n_pairs"),
        F.count_if(10 * F.col("common") >= 3 * F.col("uni")).alias(
            "n_exact_ge_03"
        ),
        F.sum("common").alias("common_sum"),
        F.sum("uni").alias("union_sum"),
    )


def _minhash_eval_sql() -> str:
    from mysql_cdc_table_spark.functions.dedup import (
        DEDUP_MINHASH_PAIRS_SQL,
        N_HASHES,
    )
    from mysql_cdc_table_spark.functions.text import _SQL_SHINGLES

    match_terms = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES)
    )
    # re-derive the signature CTE text from the pairs oracle's own
    # building blocks so the two keys cannot drift apart
    from mysql_cdc_table_spark.functions.dedup import _SQL_MH

    return f"""
WITH cand AS ({DEDUP_MINHASH_PAIRS_SQL}),
shs AS ({_SQL_SHINGLES}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shs WHERE len(sh) > 0),
sig AS (SELECT doc_id, {_SQL_MH} FROM ex GROUP BY doc_id),
m AS (
  SELECT c.doc1, c.doc2, {match_terms} AS mh_matches
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc1
  JOIN sig sb ON sb.doc_id = c.doc2
), j AS (
  SELECT m.mh_matches,
         len(list_intersect(d1.sh, d2.sh)) AS common,
         len(d1.sh) + len(d2.sh) - len(list_intersect(d1.sh, d2.sh)) AS uni
  FROM m
  JOIN shs d1 ON d1.doc_id = m.doc1
  JOIN shs d2 ON d2.doc_id = m.doc2
)
SELECT CAST(mh_matches AS INTEGER) AS mh_matches,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE 10 * common >= 3 * uni) AS BIGINT)
         AS n_exact_ge_03,
       CAST(sum(common) AS BIGINT) AS common_sum,
       CAST(sum(uni) AS BIGINT) AS union_sum
FROM j GROUP BY mh_matches
"""


QUERIES.update({"dedup_minhash_eval": dedup_minhash_eval})
ORACLES.update({"dedup_minhash_eval": _minhash_eval_sql()})


# --- two-sample Kolmogorov-Smirnov drift -------------------------------------


def agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic for every pair of
    event types — the distribution-drift detector ("do errors carry
    the same value distribution as clicks?"), with the usual float CDF
    gymnastics replaced by integers: values quantize to cents, per
    (pair, cents) grid counts cumulate in ONE window per pair, and
    D = max|F1−F2| is carried as its exact integer numerator
    max|ca·nb − cb·na| over denominator na·nb (the drift flag tests
    D > 0.05 as 20·num > na·nb — no division anywhere). The pair
    dimension is #types² and rides two broadcast equi-joins; the
    window runs over the distinct-cents grid per pair, not raw
    events."""
    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    ty = ev.select("t").distinct()
    pairs = (
        ty.select(F.col("t").alias("t1"))
        .join(ty.select(F.col("t").alias("t2")))
        .filter(F.col("t1") < F.col("t2"))
    )
    side_a = ev.join(
        F.broadcast(pairs), ev["t"] == pairs["t1"]
    ).select("t1", "t2", "cents", F.lit(1).alias("da"), F.lit(0).alias("db"))
    side_b = ev.join(
        F.broadcast(pairs), ev["t"] == pairs["t2"]
    ).select("t1", "t2", "cents", F.lit(0).alias("da"), F.lit(1).alias("db"))
    tagged = side_a.unionByName(side_b)
    grid = tagged.groupBy("t1", "t2", "cents").agg(
        F.sum("da").alias("da"), F.sum("db").alias("db")
    )
    w = (
        Window.partitionBy("t1", "t2")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn("ca", F.sum("da").over(w)).withColumn(
        "cb", F.sum("db").over(w)
    )
    tot = grid.groupBy("t1", "t2").agg(
        F.sum("da").alias("na"), F.sum("db").alias("nb")
    )
    j = cum.join(F.broadcast(tot), ["t1", "t2"])
    return j.groupBy("t1", "t2", "na", "nb").agg(
        F.max(
            F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
        ).alias("d_num"),
    ).withColumn(
        "drift_gt_05", 20 * F.col("d_num") > F.col("na") * F.col("nb")
    )


AGG_KS_DRIFT_SQL = """
WITH c AS (
  SELECT event_type AS t,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), ty AS (SELECT DISTINCT t FROM c),
pairs AS (
  SELECT a.t AS t1, b.t AS t2 FROM ty a JOIN ty b ON a.t < b.t
), tagged AS (
  SELECT p.t1, p.t2, c.cents,
         CASE WHEN c.t = p.t1 THEN 1 ELSE 0 END AS da,
         CASE WHEN c.t = p.t2 THEN 1 ELSE 0 END AS db
  FROM pairs p JOIN c ON c.t = p.t1 OR c.t = p.t2
), grid AS (
  SELECT t1, t2, cents,
         CAST(sum(da) AS BIGINT) AS da, CAST(sum(db) AS BIGINT) AS db
  FROM tagged GROUP BY t1, t2, cents
), cum AS (
  SELECT t1, t2, cents, da, db,
         CAST(sum(da) OVER w AS BIGINT) AS ca,
         CAST(sum(db) OVER w AS BIGINT) AS cb
  FROM grid
  WINDOW w AS (PARTITION BY t1, t2 ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT t1, t2, CAST(sum(da) AS BIGINT) AS na,
         CAST(sum(db) AS BIGINT) AS nb
  FROM grid GROUP BY t1, t2
)
SELECT c.t1, c.t2, t.na, t.nb,
       CAST(max(abs(c.ca * t.nb - c.cb * t.na)) AS BIGINT) AS d_num,
       20 * max(abs(c.ca * t.nb - c.cb * t.na)) > t.na * t.nb
         AS drift_gt_05
FROM cum c JOIN tot t ON c.t1 = t.t1 AND c.t2 = t.t2
GROUP BY c.t1, c.t2, t.na, t.nb
"""


QUERIES.update({"agg_ks_drift": agg_ks_drift})
ORACLES.update({"agg_ks_drift": AGG_KS_DRIFT_SQL})


# --- SMA crossover signals ---------------------------------------------------


SMA_FAST = 5
SMA_SLOW = 20


def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow moving-average crossover signals per user — the
    classic trend-change detector — in pure integers: cents sums over
    the trailing 5- and 20-row frames compare via cross-multiplication
    (fast_sum·n_slow vs slow_sum·n_fast — no division, partial frames
    handled exactly), the state flag is that comparison's sign, and a
    SIGNAL fires where the flag flips between consecutive rows (one
    lag over the same sort). Output per user: signal counts by
    direction and the first golden-cross event id. Two frames + one
    lag share ONE user_id exchange."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = base.rowsBetween(-(SMA_FAST - 1), 0)
    ws = base.rowsBetween(-(SMA_SLOW - 1), 0)
    flagged = (
        ev.withColumn("fs", F.sum("c").over(wf))
        .withColumn("nf", F.count("c").over(wf))
        .withColumn("ss", F.sum("c").over(ws))
        .withColumn("ns", F.count("c").over(ws))
        .withColumn(
            "above", F.col("fs") * F.col("ns") > F.col("ss") * F.col("nf")
        )
        .withColumn("prev_above", F.lag("above").over(base))
    )
    sig = flagged.filter(
        F.col("prev_above").isNotNull()
        & (F.col("above") != F.col("prev_above"))
    )
    return sig.groupBy("user_id").agg(
        F.count("*").alias("n_signals"),
        F.count_if(F.col("above")).alias("n_golden"),
        F.count_if(~F.col("above")).alias("n_death"),
        F.min(F.when(F.col("above"), F.col("event_id"))).alias(
            "first_golden_event"
        ),
    )


TS_SMA_CROSSOVER_SQL = f"""
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), framed AS (
  SELECT event_id, user_id, ts,
         CAST(sum(c) OVER wf AS BIGINT) AS fs,
         CAST(count(c) OVER wf AS BIGINT) AS nf,
         CAST(sum(c) OVER ws AS BIGINT) AS ss,
         CAST(count(c) OVER ws AS BIGINT) AS ns
  FROM c
  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {SMA_FAST - 1} PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {SMA_SLOW - 1} PRECEDING AND CURRENT ROW)
), flagged AS (
  SELECT event_id, user_id,
         fs * ns > ss * nf AS above,
         lag(fs * ns > ss * nf) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_above
  FROM framed
), sig AS (
  SELECT * FROM flagged
  WHERE prev_above IS NOT NULL AND above <> prev_above
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_signals,
       CAST(count(*) FILTER (WHERE above) AS BIGINT) AS n_golden,
       CAST(count(*) FILTER (WHERE NOT above) AS BIGINT) AS n_death,
       CAST(min(CASE WHEN above THEN event_id END) AS BIGINT)
         AS first_golden_event
FROM sig GROUP BY user_id
"""


QUERIES.update({"ts_sma_crossover": ts_sma_crossover})
ORACLES.update({"ts_sma_crossover": TS_SMA_CROSSOVER_SQL})


# --- AES encrypt/decrypt roundtrip -------------------------------------------


AES_KEY = "0123456789abcdef"  # 16-byte demo key (AES-128)


def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's column-level crypto surface (aes_encrypt/aes_decrypt —
    MySQL ships AES_ENCRYPT/AES_DECRYPT, so the reference's users have
    this in their queries): every customer name encrypts under
    AES-128-ECB (the deterministic mode — GCM's random IV would break
    the value hash by design) and decrypts back. The aggregate pins
    three things the oracle can state independently: the roundtrip
    returns the exact plaintext (n_ok = n), ciphertext length follows
    the PKCS7 block law (16·(len//16 + 1) — a padding bug shifts the
    sum), and ECB determinism (same plaintext → same ciphertext:
    distinct ciphertexts == distinct plaintexts)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("pt"),
        F.col("c_mktsegment").alias("seg"),
    )
    enc = c.withColumn(
        "ct",
        F.expr(f"aes_encrypt(pt, '{AES_KEY}', 'ECB')"),
    ).withColumn(
        "rt",
        F.expr(f"cast(aes_decrypt(ct, '{AES_KEY}', 'ECB') as string)"),
    )
    return enc.groupBy("seg").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("rt") == F.col("pt")).alias("n_roundtrip_ok"),
        F.sum(F.length("ct").cast("long")).alias("ct_len_sum"),
        F.countDistinct("ct").alias("n_distinct_ct"),
        F.countDistinct("pt").alias("n_distinct_pt"),
    )


FN_AES_ROUNDTRIP_SQL = """
SELECT c_mktsegment AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(sum(16 * (length(c_name) // 16 + 1)) AS BIGINT) AS ct_len_sum,
       CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct_ct,
       CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct_pt
FROM customer GROUP BY c_mktsegment
"""


QUERIES.update({"fn_aes_roundtrip": fn_aes_roundtrip})
ORACLES.update({"fn_aes_roundtrip": FN_AES_ROUNDTRIP_SQL})


# --- rolling MAD outliers ----------------------------------------------------


MAD_FRAME = 7


def window_rolling_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING robust outliers: |x − frame median| > 3·frame MAD over
    the trailing 7 events per user — the windowed version of
    agg_mad_outlier (global MAD) that tracks level shifts instead of
    flagging the whole regime. Entirely integer: with cents c, the
    doubled median is the sum of the two middle elements of the sorted
    frame (exact for odd AND even/partial frames), doubled deviations
    are |2c − m2|, the quadrupled MAD is their middle-sum, and the
    flag compares 2·d > 3·dm2 — no float division anywhere, so both
    engines agree bit-for-bit. Per-row cost is one sort of ≤7 values
    inside the projection; one user_id exchange."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MAD_FRAME - 1), 0)
    )
    mid = (
        "element_at(s, cast(((size(s) - 1) div 2) + 1 as int))"
        " + element_at(s, cast((size(s) div 2) + 1 as int))"
    )
    dmid = (
        "element_at(ds, cast(((size(ds) - 1) div 2) + 1 as int))"
        " + element_at(ds, cast((size(ds) div 2) + 1 as int))"
    )
    return (
        ev.withColumn("vals", F.collect_list("c").over(w))
        .withColumn("s", F.array_sort("vals"))
        .withColumn("m2", F.expr(mid))
        .withColumn(
            "ds", F.expr("array_sort(transform(vals, v -> abs(2*v - m2)))")
        )
        .withColumn("dm2", F.expr(dmid))
        .select(
            "event_id",
            "user_id",
            F.col("m2").alias("med2_cents"),
            F.col("dm2").alias("mad4_cents"),
            (2 * F.abs(2 * F.col("c") - F.col("m2")) > 3 * F.col("dm2"))
            .alias("is_outlier"),
        )
    )


WINDOW_ROLLING_MAD_OUTLIER_SQL = f"""
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), framed AS (
  SELECT event_id, user_id, c,
         list_sort(list(c) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {MAD_FRAME - 1} PRECEDING AND CURRENT ROW
         )) AS s
  FROM c
), med AS (
  SELECT event_id, user_id, c, s,
         s[(len(s) - 1) // 2 + 1]
           + s[len(s) // 2 + 1] AS m2
  FROM framed
), dev AS (
  SELECT event_id, user_id, c, m2,
         list_sort(list_transform(s, v -> abs(2 * v - m2))) AS ds
  FROM med
)
SELECT event_id, user_id,
       CAST(m2 AS BIGINT) AS med2_cents,
       CAST(ds[(len(ds) - 1) // 2 + 1]
            + ds[len(ds) // 2 + 1] AS BIGINT) AS mad4_cents,
       2 * abs(2 * c - m2)
         > 3 * (ds[(len(ds) - 1) // 2 + 1]
                + ds[len(ds) // 2 + 1]) AS is_outlier
FROM dev
"""


QUERIES.update({"window_rolling_mad_outlier": window_rolling_mad_outlier})
ORACLES.update(
    {"window_rolling_mad_outlier": WINDOW_ROLLING_MAD_OUTLIER_SQL}
)


# --- Zipf coverage curve -----------------------------------------------------


ZIPF_KS = (10, 100, 1000)


def corpus_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token coverage of the top-k vocabulary (the Zipf
    curve): what fraction of all corpus tokens do the 10 / 100 / 1000
    most frequent words account for — the number tokenizer-budget and
    stopword decisions start from. One vocabulary hash agg, then a
    rank+cumsum window over the VOCABULARY (≪ corpus — the documented
    vocab-sized sort; the fact stream never sorts), coverages floored
    to basis points. Single-row output regardless of scale."""
    words = t(spark, sf_dir, "documents").select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "word"
        )
    )
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    ranked = counts.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.sum("cnt").alias("total_tokens"),
        F.count("*").alias("vocab_size"),
    ]
    for k in ZIPF_KS:
        aggs.append(
            F.floor(
                10000.0
                * F.max(F.when(F.col("rk") <= k, F.col("cum")))
                / F.sum("cnt")
            ).alias(f"cov{k}_bp")
        )
    return ranked.agg(*aggs)


def _zipf_sql() -> str:
    cov = ",\n       ".join(
        f"CAST(floor(10000.0 * max(CASE WHEN rk <= {k} THEN cum END)"
        f" / sum(cnt)) AS BIGINT) AS cov{k}_bp"
        for k in ZIPF_KS
    )
    return f"""
WITH w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), counts AS (
  SELECT word, count(*) AS cnt FROM w GROUP BY word
), ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, word ASC) AS rk,
         sum(cnt) OVER (ORDER BY cnt DESC, word ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM counts
)
SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT) AS vocab_size,
       {cov}
FROM ranked
"""


QUERIES.update({"corpus_zipf_coverage": corpus_zipf_coverage})
ORACLES.update({"corpus_zipf_coverage": _zipf_sql()})


# --- embedding centroid drift ------------------------------------------------


def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two halves of the embedding
    corpus (even vs odd vec_ids — the deterministic split; swap in
    time/batch for production drift monitoring): the exact integer
    cross-difference |Σ₁·n₂ − Σ₂·n₁| per dimension over e-4 quantized
    components, reduced to the per-label max and the count of
    dimensions whose mean shift exceeds 0.01 (100 quantized units —
    the integer inequality |diff| > 100·n₁·n₂, no division). The
    embedding-distribution health check run before re-training an IVF
    codebook on new data. One posexplode + one (label, half, dim)
    hash agg + a 64-dim grid self-join."""
    e = t(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    q = e.select(
        "label",
        "half",
        "dim",
        F.floor(F.col("x").cast("double") * 10000).cast("long").alias("xq"),
    )
    g = q.groupBy("label", "half", "dim").agg(
        F.sum("xq").alias("s"), F.count("*").alias("n")
    )
    h0 = g.filter(F.col("half") == 0).select(
        "label", "dim", F.col("s").alias("s0"), F.col("n").alias("n0")
    )
    h1 = g.filter(F.col("half") == 1).select(
        "label", "dim", F.col("s").alias("s1"), F.col("n").alias("n1")
    )
    j = h0.join(h1, ["label", "dim"])
    num = F.abs(F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0"))
    return j.groupBy("label").agg(
        F.max("n0").alias("n_even"),
        F.max("n1").alias("n_odd"),
        F.max(num).alias("max_drift_num"),
        F.count_if(num > 100 * F.col("n0") * F.col("n1")).alias(
            "n_drifted_dims"
        ),
    )


EMB_CENTROID_DRIFT_SQL = """
WITH x AS (
  SELECT label, vec_id % 2 AS half,
         unnest(generate_series(1, len(embedding))) - 1 AS dim,
         embedding AS emb
  FROM embeddings
), q AS (
  SELECT label, half, CAST(dim AS INT) AS dim,
         CAST(floor(CAST(emb[dim + 1] AS DOUBLE) * 10000) AS BIGINT) AS xq
  FROM x
), g AS (
  SELECT label, half, dim,
         CAST(sum(xq) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY label, half, dim
), j AS (
  SELECT h0.label, h0.dim,
         h0.s AS s0, h0.n AS n0, h1.s AS s1, h1.n AS n1
  FROM g h0 JOIN g h1
    ON h0.label = h1.label AND h0.dim = h1.dim
   AND h0.half = 0 AND h1.half = 1
)
SELECT label,
       CAST(max(n0) AS BIGINT) AS n_even,
       CAST(max(n1) AS BIGINT) AS n_odd,
       CAST(max(abs(s0 * n1 - s1 * n0)) AS BIGINT) AS max_drift_num,
       CAST(count(*) FILTER (
         WHERE abs(s0 * n1 - s1 * n0) > 100 * n0 * n1
       ) AS BIGINT) AS n_drifted_dims
FROM j GROUP BY label
"""


QUERIES.update({"emb_centroid_drift": emb_centroid_drift})
ORACLES.update({"emb_centroid_drift": EMB_CENTROID_DRIFT_SQL})


# --- monotone run lengths ----------------------------------------------------


def window_monotone_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length analytics per user: longest strictly-increasing
    streak and run counts over the ordered value series — the
    gaps-and-islands variant where the island key is the DIRECTION
    flip (cumulative count of non-increasing steps), entirely integer
    on cents. Two stacked windows share one user sort; run sizes
    aggregate per (user, run) then per user."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = (
        ev.withColumn("prev", F.lag("c").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("c") <= F.col("prev")), 1
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("brk").over(wc))
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return per_run.groupBy("user_id").agg(
        F.max("run_len").alias("longest_up_run"),
        F.count("*").alias("n_runs"),
        F.sum("run_len").alias("n_events"),
    )


WINDOW_MONOTONE_RUNS_SQL = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), flagged AS (
  SELECT user_id,
         CASE WHEN lag(c) OVER w IS NULL OR c <= lag(c) OVER w
              THEN 1 ELSE 0 END AS brk,
         event_id, ts
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM flagged
), per_run AS (
  SELECT user_id, run_id, count(*) AS run_len
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       CAST(max(run_len) AS BIGINT) AS longest_up_run,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_events
FROM per_run GROUP BY user_id
"""


QUERIES.update({"window_monotone_runs": window_monotone_runs})
ORACLES.update({"window_monotone_runs": WINDOW_MONOTONE_RUNS_SQL})


# --- Gini concentration ------------------------------------------------------


def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini per order status — the inequality
    summary ("do a few orders carry most of the money?") — as EXACT
    integers: with cents x sorted ascending and rank i, Gini =
    (2·Σi·x − (n+1)·Σx) / (n·Σx); numerator and denominator emit as
    BIGINTs, callers divide. Rank ties are harmless (equal x makes
    Σi·x order-invariant inside the tie group), so the value hash is
    deterministic. One rank window per status partition over cents +
    one hash agg; also emitted in basis points via the floor
    convention."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    w = Window.partitionBy("status").orderBy("x", "k")
    r = o.withColumn("i", F.row_number().over(w))
    return r.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        (
            2 * F.sum(F.col("i") * F.col("x"))
            - (F.count("*") + 1) * F.sum("x")
        ).alias("gini_num"),
        (F.count("*") * F.sum("x")).alias("gini_den"),
        F.floor(
            10000.0
            * (
                2 * F.sum(F.col("i") * F.col("x"))
                - (F.count("*") + 1) * F.sum("x")
            )
            / (F.count("*") * F.sum("x"))
        ).alias("gini_bp"),
    )


AGG_GINI_REVENUE_SQL = """
WITH r AS (
  SELECT o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey
         ) AS i
  FROM orders
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS BIGINT)
         AS gini_num,
       CAST(count(*) * sum(x) AS BIGINT) AS gini_den,
       CAST(floor(
         10000.0 * (2 * sum(i * x) - (count(*) + 1) * sum(x))
         / (count(*) * sum(x))
       ) AS BIGINT) AS gini_bp
FROM r GROUP BY status
"""


QUERIES.update({"agg_gini_revenue": agg_gini_revenue})
ORACLES.update({"agg_gini_revenue": AGG_GINI_REVENUE_SQL})
