"""Round-8 operators: production-sampling and statistical-test shapes.

Each entry follows the repo contract: a ``QUERIES`` callable
(spark, sf_dir) -> DataFrame and an ``ORACLES`` ANSI-SQL twin DuckDB
runs on the same parquet — column names aliased identically, sums cast
BIGINT, float arithmetic kept to fixed-order per-row expressions both
engines compute bit-identically (the repo's verify recipe documents
these cross-engine rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


# --- corpus_hash_sample -------------------------------------------------------


def corpus_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed sampling — THE production way to
    sample at 100 TB: keep a document iff the first hex char of
    md5(doc_id) lands in a fixed 2/16 bucket. No RNG state, no seed
    coordination, no shuffle: the predicate evaluates map-side at the
    scan, any worker reproduces the same sample, and re-runs are
    idempotent (the property reservoir/Bernoulli sampling loses the
    moment tasks retry). MD5 is bit-identical across engines, so the
    oracle applies the SAME predicate in DuckDB and the whole sample
    membership sits in the value hash. Output: per-source sample
    accounting with the share in exact basis points (floor of an
    IEEE-identical double — no rounding ties)."""
    d = t(spark, sf_dir, "documents")
    sampled = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(sampled).alias("n_sampled"),
            F.sum(F.when(sampled, F.col("n_chars")).otherwise(0)).alias(
                "chars_sampled"
            ),
        )
        .select(
            "source",
            "n_total",
            "n_sampled",
            "chars_sampled",
            F.floor(
                F.lit(10000.0) * F.col("n_sampled") / F.col("n_total")
            ).cast("long").alias("share_bp"),
        )
        .orderBy("source")
    )


CORPUS_HASH_SAMPLE_SQL = """
WITH s AS (
  SELECT source,
         n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1') AS smp
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE smp) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN smp THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_sampled,
       CAST(floor(10000.0 * (count(*) FILTER (WHERE smp)) / count(*))
            AS BIGINT) AS share_bp
FROM s
GROUP BY source
ORDER BY source
"""

QUERIES["corpus_hash_sample"] = corpus_hash_sample
ORACLES["corpus_hash_sample"] = CORPUS_HASH_SAMPLE_SQL


# --- agg_chi2_independence ----------------------------------------------------


def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cross-tab over orders (status ×
    priority): observed counts, expected counts under independence
    (row_total × col_total / N), and each cell's chi-square
    contribution (obs − exp)² / exp. Emitted PER CELL, not summed:
    every number is a fixed-order expression over exact integers —
    one int64 product, one double divide, one square, one divide —
    which both engines evaluate to the same IEEE double, so flooring
    to milli/micro units is hash-exact (a cross-cell float SUM would
    depend on engine-specific accumulation order). Distributed shape:
    three map-side-combinable counts over one scan, then two broadcast
    joins of tiny marginal relations onto the cells — no fact-fact
    shuffle, survives any N."""
    o = t(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_obs")
    )
    row_t = o.groupBy("o_orderstatus").agg(F.count("*").alias("row_total"))
    col_t = o.groupBy("o_orderpriority").agg(F.count("*").alias("col_total"))
    n = o.groupBy().agg(F.count("*").alias("n_all"))
    # DOUBLE-cast before the product: bigint row_total*col_total
    # overflows int64 past ~3e9 rows (the welch lesson); int64->double
    # casts are correctly rounded, so the floored outputs stay
    # hash-exact at any N
    e = (
        F.col("row_total").cast("double") * F.col("col_total").cast("double")
    ) / F.col("n_all").cast("double")
    diff = F.col("n_obs") - e
    return (
        cells.join(F.broadcast(row_t), "o_orderstatus")
        .join(F.broadcast(col_t), "o_orderpriority")
        .join(F.broadcast(n))
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n_obs",
            F.floor(e * 1000.0).cast("long").alias("expected_milli"),
            F.floor(diff * diff / e * 1_000_000.0)
            .cast("long")
            .alias("contrib_micro"),
        )
        .orderBy("status", "priority")
    )


AGG_CHI2_INDEPENDENCE_SQL = """
WITH cells AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1, 2
), rt AS (
  SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS row_total
  FROM orders GROUP BY 1
), ct AS (
  SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS col_total
  FROM orders GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all FROM orders
)
SELECT status, priority, n_obs,
       CAST(floor(((CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) / CAST(n_all AS DOUBLE)) * 1000.0) AS BIGINT)
         AS expected_milli,
       CAST(floor(
         (n_obs - (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) / CAST(n_all AS DOUBLE))
         * (n_obs - (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) / CAST(n_all AS DOUBLE))
         / ((CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) / CAST(n_all AS DOUBLE)) * 1000000.0
       ) AS BIGINT) AS contrib_micro
FROM cells
JOIN rt USING (status)
JOIN ct USING (priority)
CROSS JOIN nn
ORDER BY status, priority
"""

QUERIES["agg_chi2_independence"] = agg_chi2_independence
ORACLES["agg_chi2_independence"] = AGG_CHI2_INDEPENDENCE_SQL


# --- ts_theil_sen_slope -------------------------------------------------------


def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the MEDIAN of all
    pairwise slopes between daily totals — the estimator that shrugs
    off the outlier days an OLS fit chases. Shape: aggregate first
    (events collapse to a ≤#days-per-type grid), THEN fan out pairs —
    the pair relation is days²-bounded per type, independent of event
    volume, so 100 TB of events costs one map-side-combinable daily
    rollup plus a tiny grid join. The median is DISCRETE (the lower
    middle element by (slope, pair-id) total order — row_number over
    the pair window), so no interpolation arithmetic crosses engines;
    slopes are floored to micro-units per pair (one subtract, one
    divide — fixed-order IEEE both engines compute identically)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("d"),
            # floor per EVENT, sum as integers: a double SUM's
            # accumulation order differs between engines
            F.floor(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("vm").alias("v_milli"))
        .select(
            "event_type",
            F.datediff(F.col("d"), F.lit("1970-01-01")).alias("dd"),
            "v_milli",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dd") < F.col("b.dd")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.floor(
                (F.col("b.v_milli") - F.col("a.v_milli"))
                / (F.col("b.dd") - F.col("a.dd"))
                * 1000.0
            ).cast("long").alias("slope_micro"),
            # cast before the product: dd*100000 would overflow INT32
            # for dates past 2028
            (F.col("a.dd").cast("long") * 100000 + F.col("b.dd")).alias(
                "pair_id"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro", "pair_id")
    ranked = pairs.withColumn("rk", F.row_number().over(w))
    n = pairs.groupBy("event_type").agg(F.count("*").alias("n_pairs"))
    return (
        ranked.join(F.broadcast(n), "event_type")
        .filter(F.col("rk") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "event_type",
            "n_pairs",
            F.col("slope_micro").alias("theil_sen_slope_micro"),
        )
        .orderBy("event_type")
    )


TS_THEIL_SEN_SLOPE_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS dd,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v_milli
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(floor((b.v_milli - a.v_milli) * 1.0
                    / (b.dd - a.dd) * 1000.0) AS BIGINT) AS slope_micro,
         CAST(a.dd AS BIGINT) * 100000 + b.dd AS pair_id
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.dd < b.dd
), ranked AS (
  SELECT event_type, slope_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_micro, pair_id) AS rk,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
  FROM pairs
)
SELECT event_type, n_pairs, slope_micro AS theil_sen_slope_micro
FROM ranked
WHERE rk = (n_pairs + 1) // 2
ORDER BY event_type
"""

QUERIES["ts_theil_sen_slope"] = ts_theil_sen_slope
ORACLES["ts_theil_sen_slope"] = TS_THEIL_SEN_SLOPE_SQL


# --- text_hashing_features ----------------------------------------------------


def text_hashing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing-trick vectorizer): every token maps
    to one of 16 fixed buckets by the first hex char of its md5 — no
    vocabulary to build, no dictionary to broadcast, no OOV problem;
    the feature space is CLOSED before the data is read, which is what
    lets a 100 TB featurization run as one map-side pass + one
    bounded-key aggregation (16 × sources cells). MD5 is bit-identical
    across engines, so bucket membership — counts AND distinct-token
    cardinality per bucket — sits in the value hash. The per-source
    bucket histogram is the hashed bag-of-words a downstream linear
    model consumes."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("w"),
    )
    return (
        tok.select(
            "source",
            F.substring(F.md5(F.col("w")), 1, 1).alias("bucket"),
            "w",
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("w").alias("n_distinct"),
        )
        .orderBy("source", "bucket")
    )


TEXT_HASHING_FEATURES_SQL = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
)
SELECT source,
       substr(md5(w), 1, 1) AS bucket,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct
FROM tok
GROUP BY source, bucket
ORDER BY source, bucket
"""

QUERIES["text_hashing_features"] = text_hashing_features
ORACLES["text_hashing_features"] = TEXT_HASHING_FEATURES_SQL


# --- emb_quantize_error_stats --------------------------------------------------------


def emb_quantize_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate reconstruction-error accounting for symmetric int8
    quantization (the per-vector codes live in emb_quantize_int8,
    functions/pipeline.py; this is the corpus-level quality report) —
    the 4× storage/bandwidth cut every large vector store applies
    before ANN — with per-label reconstruction-error accounting. Per
    vector: scale = max|v|, q_i = floor(v_i·127/scale + 0.5) (no
    round(): its tie rule differs between engines; floor of the same
    IEEE expression is bit-exact), reconstruction error
    Σ(v_i − q_i·scale/127)². Everything that crosses the per-label SUM
    is floored to integer units per vector first (a double SUM's
    accumulation order is engine-specific); the in-vector fold is a
    sequential left fold — bit-identical in both engines (the
    ts_ewma_window precedent). One scan, higher-order functions only,
    map-side-combinable group agg: embarrassingly parallel at any N."""
    e = t(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("maxabs", F.expr("array_max(transform(v, x -> abs(x)))"))
    per = (
        v.filter("maxabs > 0")
        .withColumn(
            "q_l1",
            F.expr(
                "aggregate(transform(v, x ->"
                " abs(floor(x * 127.0 / maxabs + 0.5d))),"
                " 0L, (a, x) -> a + x)"
            ),
        )
        .withColumn(
            "err_nano",
            F.expr(
                "cast(floor(aggregate(transform(v, x ->"
                " (x - floor(x * 127.0 / maxabs + 0.5d) * maxabs / 127.0)"
                " * (x - floor(x * 127.0 / maxabs + 0.5d) * maxabs / 127.0)),"
                " cast(0.0 as double), (a, x) -> a + x) * 1e9) as bigint)"
            ),
        )
        .withColumn(
            "maxabs_micro", F.expr("cast(floor(maxabs * 1e6) as bigint)")
        )
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("q_l1").alias("sum_q_l1"),
            F.sum("err_nano").alias("sum_err_nano"),
            F.sum("maxabs_micro").alias("sum_maxabs_micro"),
        )
        .orderBy("label")
    )


EMB_QUANTIZE_ERROR_STATS_SQL = """
WITH vv AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), m AS (
  SELECT label, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM vv
), per AS (
  SELECT label,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(v, x ->
               CAST(abs(floor(x * 127.0 / maxabs + 0.5)) AS BIGINT))),
           (a, b) -> a + b) AS BIGINT) AS q_l1,
         CAST(floor(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x ->
               (x - floor(x * 127.0 / maxabs + 0.5) * maxabs / 127.0)
               * (x - floor(x * 127.0 / maxabs + 0.5) * maxabs / 127.0))),
           (a, b) -> a + b) * 1e9) AS BIGINT) AS err_nano,
         CAST(floor(maxabs * 1e6) AS BIGINT) AS maxabs_micro
  FROM m
  WHERE maxabs > 0
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(q_l1) AS BIGINT) AS sum_q_l1,
       CAST(sum(err_nano) AS BIGINT) AS sum_err_nano,
       CAST(sum(maxabs_micro) AS BIGINT) AS sum_maxabs_micro
FROM per
GROUP BY label
ORDER BY label
"""

QUERIES["emb_quantize_error_stats"] = emb_quantize_error_stats
ORACLES["emb_quantize_error_stats"] = EMB_QUANTIZE_ERROR_STATS_SQL


# --- agg_entropy_decomp -------------------------------------------------------


def agg_entropy_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy decomposition of each event type's hour-of-day
    activity profile: per (event_type, hour) cell, the probability in
    exact basis points and the −p·log2(p) entropy contribution in
    micro-units. Emitted PER CELL — the entropy's cross-cell float sum
    would hinge on engine accumulation order, while each cell is one
    division + one log2 + one multiply over exact integers, evaluated
    in the same order by both engines (a last-ulp libm divergence
    would still need to land within 2⁻³⁰ of a floor boundary to flip
    a row). Shape: one map-side-combinable count over the scan plus a
    broadcast of the #types-sized totals — the 24×#types grid is tiny
    at any N."""
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", F.hour("ts").alias("hh")
    ).agg(F.count("*").alias("n"))
    totals = e.groupBy("event_type").agg(F.count("*").alias("n_type"))
    p = F.col("n") / F.col("n_type")
    return (
        cells.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "hh",
            "n",
            F.floor(F.lit(10000.0) * p).cast("long").alias("p_bp"),
            F.floor(-p * F.log2(p) * 1_000_000.0)
            .cast("long")
            .alias("entropy_micro"),
        )
        .orderBy("event_type", "hh")
    )


AGG_ENTROPY_DECOMP_SQL = """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hh,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
  FROM events GROUP BY 1
)
SELECT event_type, hh, n,
       CAST(floor(10000.0 * (n / n_type)) AS BIGINT) AS p_bp,
       CAST(floor(-(n / n_type) * log2(n / n_type) * 1000000.0) AS BIGINT)
         AS entropy_micro
FROM cells JOIN totals USING (event_type)
ORDER BY event_type, hh
"""

QUERIES["agg_entropy_decomp"] = agg_entropy_decomp
ORACLES["agg_entropy_decomp"] = AGG_ENTROPY_DECOMP_SQL


# --- agg_log2_histogram -------------------------------------------------------


def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed value histogram per event type — the HDR-style
    latency/size distribution every ops surface wants, with EXACT
    integer bucketing: bucket = bit length of floor(value·1000) via
    the string length of its binary rendering (bin()/printf-%b — no
    float log2 near power-of-two boundaries, where a last-ulp
    divergence would flip the bucket). Map-side-combinable single
    scan; #types × ~40 output cells at any N."""
    e = t(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000).cast("long")
    bucket = F.when(vm <= 0, F.lit(0)).otherwise(
        F.length(F.bin(vm))
    ).cast("int")
    return (
        e.select("event_type", bucket.alias("bucket"), vm.alias("vm"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("vm").alias("sum_milli"),
            F.min("vm").alias("min_milli"),
            F.max("vm").alias("max_milli"),
        )
        .orderBy("event_type", "bucket")
    )


AGG_LOG2_HISTOGRAM_SQL = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events
)
SELECT event_type,
       CAST(CASE WHEN vm <= 0 THEN 0 ELSE length(bin(vm)) END AS INTEGER)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vm) AS BIGINT) AS sum_milli,
       CAST(min(vm) AS BIGINT) AS min_milli,
       CAST(max(vm) AS BIGINT) AS max_milli
FROM v
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""

QUERIES["agg_log2_histogram"] = agg_log2_histogram
ORACLES["agg_log2_histogram"] = AGG_LOG2_HISTOGRAM_SQL


# --- window_weighted_moving_avg -----------------------------------------------


def window_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangular-weighted moving average per user (weights 4/3/2/1
    over the last four events, newest heaviest) — the smoothing shape
    monitoring dashboards run over event streams. All-integer: values
    floor to milli-units per row, the weighted numerator is exact
    int64 (Σ weights = 10 is the implied denominator), and only FULL
    frames emit (rn ≥ 4), so no partial-frame float division crosses
    engines. One partitioned window, partition-parallel at any N."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vm = F.floor(F.col("value") * 1000).cast("long")
    d = e.select(
        "event_id", "user_id", "ts", vm.alias("vm")
    ).select(
        "event_id",
        "user_id",
        "vm",
        F.lag("vm", 1).over(w).alias("v1"),
        F.lag("vm", 2).over(w).alias("v2"),
        F.lag("vm", 3).over(w).alias("v3"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        d.filter(F.col("rn") >= 4)
        .select(
            "event_id",
            "user_id",
            "vm",
            (
                4 * F.col("vm") + 3 * F.col("v1")
                + 2 * F.col("v2") + F.col("v3")
            ).alias("wma_x10_milli"),
        )
    )


WINDOW_WEIGHTED_MOVING_AVG_SQL = """
WITH d AS (
  SELECT event_id, user_id,
         CAST(floor(value * 1000) AS BIGINT) AS vm,
         lag(CAST(floor(value * 1000) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
         lag(CAST(floor(value * 1000) AS BIGINT), 2)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2,
         lag(CAST(floor(value * 1000) AS BIGINT), 3)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v3,
         row_number()
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id, vm,
       CAST(4 * vm + 3 * v1 + 2 * v2 + v3 AS BIGINT) AS wma_x10_milli
FROM d
WHERE rn >= 4
"""

QUERIES["window_weighted_moving_avg"] = window_weighted_moving_avg
ORACLES["window_weighted_moving_avg"] = WINDOW_WEIGHTED_MOVING_AVG_SQL


# --- stream_late_data_audit ---------------------------------------------------


def stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-semantics audit as a batch twin: replaying each event
    type's stream in arrival order (event_id — the Kafka-partition
    offset analogue), an event is LATE for watermark W when its event
    time trails the running max seen so far by more than W. Reports,
    per event type, how many rows a 60s / 600s watermark would drop
    and the worst observed lateness — the numbers that size a real
    `withWatermark` before deploying the streaming job. One window
    per event-type partition (running max is partition-local state,
    exactly like the streaming watermark it models), then a map-side
    aggregate; timestamps compare exactly, nothing float crosses
    engines."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lateness = F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp(
        F.col("ts")
    )
    d = e.select("event_type", lateness.alias("late_s"))
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("late_s") > 60).alias("n_late_60s"),
            F.count_if(F.col("late_s") > 600).alias("n_late_600s"),
            F.max("late_s").alias("max_lateness_s"),
        )
        .orderBy("event_type")
    )


STREAM_LATE_DATA_AUDIT_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(epoch(max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS UNBOUNDED PRECEDING)) AS BIGINT)
           - CAST(epoch(ts) AS BIGINT) AS late_s
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE late_s > 60) AS BIGINT) AS n_late_60s,
       CAST(count(*) FILTER (WHERE late_s > 600) AS BIGINT) AS n_late_600s,
       CAST(max(late_s) AS BIGINT) AS max_lateness_s
FROM d
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["stream_late_data_audit"] = stream_late_data_audit
ORACLES["stream_late_data_audit"] = STREAM_LATE_DATA_AUDIT_SQL


# --- agg_welch_t_pairs --------------------------------------------------------


def agg_welch_t_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-statistic for every ordered pair of event types — the
    unequal-variance two-sample test an experimentation platform runs
    across arms. The per-type sufficient statistics (n, Σv, Σv² of
    CENTI-unit values) accumulate as exact int64 — Σv² stays in range
    to ~10⁹ rows per type (the sf1 scale check caught milli units
    overflowing at 10⁷ rows; past 10⁹, promote the Σv² accumulator to
    decimal(38) or switch to shifted/Welford double moments). The
    t/df formula then runs on DOUBLE-cast stats: an int64→double cast
    is correctly rounded, and every subsequent product/divide/sqrt is
    a fixed-order IEEE op both engines evaluate identically, so the
    floored outputs stay hash-exact while the magnitudes (n·q ≈ 10²²
    at sf1) live comfortably in double range. The pair fan-out is the
    #types² grid of a broadcast self-join — independent of event
    volume, the agg_ks_drift shape."""
    e = t(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 100).cast("long")
    stats = e.select("event_type", vm.alias("vm")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("q"),
    )
    a = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    # DOUBLE-cast stats; the expression order below is mirrored
    # character-for-character in the oracle so every intermediate
    # double is identical
    nad, sad, qad = (F.col(c).cast("double") for c in ("na", "sa", "qa"))
    nbd, sbd, qbd = (F.col(c).cast("double") for c in ("nb", "sb", "qb"))
    ma = sad / nad
    mb = sbd / nbd
    va = (nad * qad - sad * sad) / (nad * (nad - 1))
    vb = (nbd * qbd - sbd * sbd) / (nbd * (nbd - 1))
    sea = va / nad
    seb = vb / nbd
    tstat = (ma - mb) / F.sqrt(sea + seb)
    df_ws = ((sea + seb) * (sea + seb)) / (
        sea * sea / (nad - 1) + seb * seb / (nbd - 1)
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "na",
            "nb",
            F.floor(tstat * 1_000_000.0).cast("long").alias("t_micro"),
            F.floor(df_ws * 1000.0).cast("long").alias("df_milli"),
        )
        .orderBy("type_a", "type_b")
    )


AGG_WELCH_T_PAIRS_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)
                  * CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) AS q
  FROM events GROUP BY 1
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
       CAST(floor(
         ((a.s / a.n) - (b.s / b.n))
         / sqrt(((a.n * a.q - a.s * a.s) / (a.n * (a.n - 1))) / a.n
                + ((b.n * b.q - b.s * b.s) / (b.n * (b.n - 1))) / b.n)
         * 1000000.0) AS BIGINT) AS t_micro,
       CAST(floor(
         ((((a.n * a.q - a.s * a.s) / (a.n * (a.n - 1))) / a.n
           + ((b.n * b.q - b.s * b.s) / (b.n * (b.n - 1))) / b.n)
          * (((a.n * a.q - a.s * a.s) / (a.n * (a.n - 1))) / a.n
             + ((b.n * b.q - b.s * b.s) / (b.n * (b.n - 1))) / b.n))
         / ((((a.n * a.q - a.s * a.s) / (a.n * (a.n - 1))) / a.n)
            * (((a.n * a.q - a.s * a.s) / (a.n * (a.n - 1))) / a.n)
            / (a.n - 1)
            + (((b.n * b.q - b.s * b.s) / (b.n * (b.n - 1))) / b.n)
              * (((b.n * b.q - b.s * b.s) / (b.n * (b.n - 1))) / b.n)
              / (b.n - 1))
         * 1000.0) AS BIGINT) AS df_milli
FROM stats a JOIN stats b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""

QUERIES["agg_welch_t_pairs"] = agg_welch_t_pairs
ORACLES["agg_welch_t_pairs"] = AGG_WELCH_T_PAIRS_SQL


# --- ts_mann_kendall ----------------------------------------------------------


def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type — the standard partner
    of the Theil–Sen slope (ts_theil_sen_slope): S = Σ sign(v_j − v_i)
    over all day pairs i<j, plus the tie-corrected variance's exact
    integer numerator (18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5) over
    tie groups t). EVERYTHING is exact int64 — sign comparisons of
    integer milli totals, counts, the closed-form products — nothing
    float crosses engines at all. Same scale shape as Theil–Sen:
    aggregate to the daily grid first, pair fan-out is days²-bounded
    per type regardless of event volume."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.floor(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("vm").alias("v_milli"))
        .select(
            "event_type",
            F.datediff(F.col("d"), F.lit("1970-01-01")).alias("dd"),
            "v_milli",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dd") < F.col("b.dd")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.v_milli") - F.col("a.v_milli")).cast("double")
                ).cast("long")
            ).alias("s_stat"),
            F.count("*").alias("n_pairs"),
        )
    )
    n = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    ties = (
        daily.groupBy("event_type", "v_milli")
        .agg(F.count("*").alias("tt"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tt") * (F.col("tt") - 1) * (2 * F.col("tt") + 5)
            ).alias("tie_term")
        )
    )
    return (
        s.join(n, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            ).alias("var_x18"),
        )
        .orderBy("event_type")
    )


TS_MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS dd,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v_milli
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(sum(CAST(sign(b.v_milli - a.v_milli) AS BIGINT)) AS BIGINT)
           AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.dd < b.dd
  GROUP BY 1
), n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, v_milli, CAST(count(*) AS BIGINT) AS tt
        FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT event_type, n_days, s_stat,
       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)
         AS var_x18
FROM s JOIN n USING (event_type) JOIN ties USING (event_type)
ORDER BY event_type
"""

QUERIES["ts_mann_kendall"] = ts_mann_kendall
ORACLES["ts_mann_kendall"] = TS_MANN_KENDALL_SQL


# --- sql_parameterized --------------------------------------------------------


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 parameterized SQL — ``spark.sql(query, args={...})``
    with named parameter markers, the injection-safe entry point an
    application layer uses instead of string-splicing literals (fourth
    SQL entry-point key next to views / pipe syntax / GROUP BY ALL).
    The markers bind a predicate constant, a LIMIT-style rank bound,
    and an arithmetic scale factor, so binding has to work in all
    three positions; the oracle spells the same constants as literals,
    asserting the binding resolves to exactly the literal plan."""
    from pyspark.sql import functions as F  # noqa: F401 (parity imports)

    from mysql_cdc_table_spark.operators.extras import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * :scale) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders
        WHERE o_orderpriority = :prio
          AND o_orderkey % :modulus = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        args={"prio": "1-URGENT", "modulus": 3, "scale": 100},
    )


SQL_PARAMETERIZED_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum
FROM orders
WHERE o_orderpriority = '1-URGENT'
  AND o_orderkey % 3 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

QUERIES["sql_parameterized"] = sql_parameterized
ORACLES["sql_parameterized"] = SQL_PARAMETERIZED_SQL


# --- sql_scripting ------------------------------------------------------------


def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN…END, DECLARE, WHILE) — the
    procedural entry point (fifth SQL surface): a WHILE loop walks the
    five priority classes, accumulating counts and cents into declared
    variables via scalar-subquery SETs; the script's final SELECT is
    the result. The oracle computes the same totals in one declarative
    aggregate, so the loop's control flow, variable scoping, and
    per-iteration predicates must all resolve to exactly the set-based
    answer. (Control flow runs on the DRIVER; each iteration's scan is
    a normal pushed-filter job — scripting is orchestration sugar, not
    a new execution path, which is why the set-based oracle form is
    what production should ship.)"""
    from mysql_cdc_table_spark.operators.extras import register_views

    register_views(spark, sf_dir)
    # enable scripting only for this statement — restore the prior
    # session value so a registry sweep / bench run doesn't inherit
    # the flag as a side effect of building this one key
    try:
        prior = spark.conf.get("spark.sql.scripting.enabled")
    except Exception:
        prior = None
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE n_total BIGINT DEFAULT 0;
          DECLARE cents BIGINT DEFAULT 0;
          WHILE i <= 5 DO
            SET n_total = n_total + (
              SELECT count(*) FROM orders
              WHERE o_orderpriority LIKE CAST(i AS STRING) || '-%'
            );
            SET cents = cents + (
              SELECT coalesce(
                sum(CAST(floor(o_totalprice * 100) AS BIGINT)), 0
              )
              FROM orders
              WHERE o_orderpriority LIKE CAST(i AS STRING) || '-%'
            );
            SET i = i + 1;
          END WHILE;
          SELECT n_total, cents;
        END
        """
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prior)


SQL_SCRIPTING_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE substr(o_orderpriority, 1, 2) IN ('1-', '2-', '3-', '4-', '5-')
"""

QUERIES["sql_scripting"] = sql_scripting
ORACLES["sql_scripting"] = SQL_SCRIPTING_SQL


# --- cdc_incremental_agg ------------------------------------------------------


def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, driver-proven: a grouped aggregate
    (rows + cents per status) maintained purely from SIGNED changelog
    deltas — insert/update-after images add, delete/update-before
    images subtract — must equal the same aggregate over the
    materialized latest state. This is THE reason CDC engines exist at
    100 TB: the delta form is ONE map-side-combinable pass over new
    changelog rows (no per-key window, no rescan of accumulated
    state — foldable into any running store), while the oracle
    recomputes the aggregate from the fully ranked latest state. The
    accounting telescopes per key across chained updates and
    status-changing updates move their key between groups via the
    -before/+after pair, so one wrong op sign or a missed tombstone
    image breaks the hash."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    cl = synthetic_changelog(spark, sf_dir)
    sgn = F.when(F.col("__op").isin(1, 3), F.lit(1)).otherwise(F.lit(-1))
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        cl.select(
            F.col("o_orderstatus").alias("status"),
            sgn.alias("sgn"),
            (sgn * cents).alias("dc"),
        )
        .groupBy("status")
        .agg(
            F.sum("sgn").alias("n_rows"),
            F.sum("dc").alias("cents_sum"),
        )
        .filter(F.col("n_rows") > 0)
        .orderBy("status")
    )


def _cdc_incremental_agg_sql() -> str:
    from mysql_cdc_table_spark.cdc.synthetic import CHANGELOG_CTE

    return f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_orderkey
      ORDER BY __gtid DESC, __event_seq DESC, __image_seq DESC) AS __rn
  FROM changelog
)
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum
FROM ranked
WHERE __rn = 1 AND __op <> 0
GROUP BY o_orderstatus
ORDER BY status
"""


QUERIES["cdc_incremental_agg"] = cdc_incremental_agg
ORACLES["cdc_incremental_agg"] = _cdc_incremental_agg_sql()


# --- agg_mann_whitney_u -------------------------------------------------------

_RANK_BUCKETS = 32  # grid prefix-sum parallelism (shard_manifest's knob)


def _grid_prefix_prev(grid: DataFrame, ct: str) -> DataFrame:
    """Strictly-below prefix count over the ``vm`` value grid, in the
    distributed two-level form (the shard_manifest pattern, round 9):
    an unpartitioned ``Window.orderBy("vm")`` is a single-partition
    sort whose safety is a property of the DATA (grid cardinality), not
    of the plan — a wide or high-entropy value domain at 100 TB pushes
    the grid toward N and kills the driver. Here the grid is RANGE-
    bucketed by approxQuantile boundaries (monotone in vm, so equal
    values — ties — always share a bucket), the running sum is computed
    per bucket in parallel, and a broadcast ``_RANK_BUCKETS``-row offset
    table lifts local sums to global ones; no task ever sorts more than
    ~1/buckets of the grid. Returns ``grid`` plus a ``prev`` column
    (observations strictly below each vm). The boundary probe is one
    bounded extra pass (a ≤31-element percentile array).

    r15 optimization (guide §1/§7.3): the probe used to be a driver-side
    ``approxQuantile`` ACTION — every caller paid one extra Spark job
    (plus the checkpoint materialization it forces) before the query
    even built. The boundaries now come from a LAZY in-plan
    ``percentile_approx`` aggregate broadcast back onto the grid; the
    bucket assignment (count of boundaries strictly below vm) is
    identical, any monotone boundary set yields the same prefix sums,
    and building the query runs zero jobs."""
    from pyspark.sql import Window

    # lineage cut (lazy): every downstream branch — bounds probe, local
    # window, bucket totals — reuses ONE materialization of the grid
    # instead of re-running the upstream fact scan per branch;
    # eager=False so merely BUILDING the query runs no job.
    grid = grid.localCheckpoint(eager=False)
    probes = [i / _RANK_BUCKETS for i in range(1, _RANK_BUCKETS)]
    bounds = grid.agg(
        F.percentile_approx("vm", F.lit(probes)).alias("__bs")
    )
    g = (
        grid.join(F.broadcast(bounds))
        .withColumn(
            "bkt",
            F.size(F.filter("__bs", lambda b: b < F.col("vm"))).cast("int"),
        )
        .drop("__bs")
    )
    wloc = Window.partitionBy("bkt").orderBy("vm").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = g.withColumn("lprev", F.sum(ct).over(wloc) - F.col(ct))
    btot = g.groupBy("bkt").agg(F.sum(ct).alias("btot"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt", F.coalesce(F.sum("btot").over(woff), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offs), "bkt")
        .withColumn("prev", F.col("lprev") + F.col("off"))
        .drop("bkt", "lprev", "off")
    )


def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U — the nonparametric twin of agg_welch_t_pairs —
    for the two lexicographically first event types, computed by
    DISTRIBUTED ranking: collapse both samples onto the DISTINCT-value
    grid first (one map-side-combinable count per (value, side)), then
    rank on the grid — tied observations share a value row, so the
    average-rank tie rule becomes exact integer arithmetic
    (2·avg_rank = 2·prefix + count + 1, no halves), and the only
    ordered structure is a grid-sized running sum — computed in the
    range-bucketed two-level prefix-sum form (``_grid_prefix_prev``),
    so even a grid that approaches N never funnels through one
    partition (round 9; previously an unpartitioned window whose
    safety depended on the value-domain cardinality). Emits
    doubled rank sums and U statistics so everything stays int64; the
    tie term Σt(t−1)(t+1) feeds the variance correction downstream.
    100 TB shape: two scans' worth of counts, one tiny-grid window —
    never a global sort of raw rows. Magnitude note: doubled rank
    sums are inherently ~n² (U ≤ n1·n2), so int64 holds to ~2·10⁹
    combined rows — past that, promote the rank-sum accumulators to
    decimal(38) (the statistic itself is already z-scored through
    doubles downstream)."""
    e = t(spark, sf_dir, "events")
    two = (
        e.groupBy("event_type").count().orderBy("event_type").limit(2)
    )
    picked = [r["event_type"] for r in two.collect()]
    ta, tb = picked[0], picked[1]
    vm = F.floor(F.col("value") * 1000).cast("long")
    grid = (
        e.filter(F.col("event_type").isin(ta, tb))
        .select(
            vm.alias("vm"),
            F.when(F.col("event_type") == ta, 1).otherwise(0).alias("isa"),
        )
        .groupBy("vm")
        .agg(
            F.count_if(F.col("isa") == 1).alias("c1"),
            F.count_if(F.col("isa") == 0).alias("c2"),
        )
        .withColumn("ct", F.col("c1") + F.col("c2"))
    )
    ranked = _grid_prefix_prev(grid, "ct")
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * F.col("prev") + F.col("c1") + F.col("c2") + 1)
        ).alias("r1_x2"),
        F.sum(
            (F.col("c1") + F.col("c2"))
            * (F.col("c1") + F.col("c2") - 1)
            * (F.col("c1") + F.col("c2") + 1)
        ).alias("tie_term"),
    )
    return agg.select(
        F.lit(ta).alias("type_a"),
        F.lit(tb).alias("type_b"),
        "n1",
        "n2",
        "r1_x2",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_x2"),
        "tie_term",
    )


AGG_MANN_WHITNEY_U_SQL = """
WITH two AS (
  SELECT event_type FROM events GROUP BY 1 ORDER BY 1 LIMIT 2
), named AS (
  SELECT min(event_type) AS ta, max(event_type) AS tb FROM two
), grid AS (
  SELECT CAST(floor(e.value * 1000) AS BIGINT) AS vm,
         CAST(count(*) FILTER (WHERE e.event_type = n.ta) AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE e.event_type = n.tb) AS BIGINT) AS c2
  FROM events e CROSS JOIN named n
  WHERE e.event_type IN (n.ta, n.tb)
  GROUP BY 1
), ranked AS (
  SELECT vm, c1, c2,
         CAST(sum(c1 + c2) OVER (ORDER BY vm
              ROWS UNBOUNDED PRECEDING) - (c1 + c2) AS BIGINT) AS prev
  FROM grid
), agg AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * (2 * prev + c1 + c2 + 1)) AS BIGINT) AS r1_x2,
         CAST(sum((c1 + c2) * (c1 + c2 - 1) * (c1 + c2 + 1)) AS BIGINT)
           AS tie_term
  FROM ranked
)
SELECT n.ta AS type_a, n.tb AS type_b,
       a.n1, a.n2, a.r1_x2,
       CAST(a.r1_x2 - a.n1 * (a.n1 + 1) AS BIGINT) AS u1_x2,
       a.tie_term
FROM agg a CROSS JOIN named n
"""

QUERIES["agg_mann_whitney_u"] = agg_mann_whitney_u
ORACLES["agg_mann_whitney_u"] = AGG_MANN_WHITNEY_U_SQL


# --- agg_kruskal_rank_sums ----------------------------------------------------


def agg_kruskal_rank_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis sufficient statistics — the k-sample extension of
    agg_mann_whitney_u, ALL event types ranked in ONE pass: collapse
    every sample onto the shared distinct-value grid (counts per
    (value, type)), rank on the grid (ties share a value row, doubled
    average ranks stay exact integers), and emit each type's n_j and
    doubled rank sum — the exact inputs of H = 12/(N(N+1))·ΣR_j²/n_j
    − 3(N+1). H itself is NOT emitted: it sums floats across types,
    whose accumulation order is engine-specific; the integer
    sufficient statistics are the deterministic contract (the Welch
    precedent). Scale shape: one map-side-combinable count, one
    grid-sized RANGE-BUCKETED two-level prefix sum shared by all k
    samples (``_grid_prefix_prev``, round 9 — ranking k groups costs
    the same as ranking two, and no single task ever sorts more than
    ~1/_RANK_BUCKETS of the grid)."""
    # r15 audit note: spreading the single-row-group input before the
    # grid aggregate (spread_narrow_scan) was tried and REVERTED — the
    # extra exchange interacts badly with the lazy-checkpointed tot
    # materialization (measured ~5x slower exec); the grid collapse is
    # cheap enough single-task at bench scale.
    e = t(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000).cast("long")
    grid = (
        e.select("event_type", vm.alias("vm"))
        .groupBy("vm", "event_type")
        .agg(F.count("*").alias("c"))
    )
    tot = grid.groupBy("vm").agg(F.sum("c").alias("ct"))
    ranked = _grid_prefix_prev(tot, "ct")
    return (
        grid.join(ranked, "vm")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n_j"),
            F.sum(
                F.col("c") * (2 * F.col("prev") + F.col("ct") + 1)
            ).alias("r_x2"),
        )
        .orderBy("event_type")
    )


AGG_KRUSKAL_RANK_SUMS_SQL = """
WITH grid AS (
  SELECT CAST(floor(value * 1000) AS BIGINT) AS vm,
         event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT vm, CAST(sum(c) AS BIGINT) AS ct FROM grid GROUP BY 1
), ranked AS (
  SELECT vm, ct,
         CAST(sum(ct) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) - ct
              AS BIGINT) AS prev
  FROM tot
)
SELECT g.event_type,
       CAST(sum(g.c) AS BIGINT) AS n_j,
       CAST(sum(g.c * (2 * r.prev + r.ct + 1)) AS BIGINT) AS r_x2
FROM grid g JOIN ranked r USING (vm)
GROUP BY g.event_type
ORDER BY g.event_type
"""

QUERIES["agg_kruskal_rank_sums"] = agg_kruskal_rank_sums
ORACLES["agg_kruskal_rank_sums"] = AGG_KRUSKAL_RANK_SUMS_SQL
