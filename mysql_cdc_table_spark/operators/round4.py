"""Round-4 operator additions: SQL-surface parity + time-series +
vector-aggregation shapes.

- ``sql_recursive_cte``: WITH RECURSIVE runs natively on Spark 4 AND
  DuckDB (shared SQL text) — MySQL 8 syntax the reference's users
  already have (the reference delegates its whole query surface to
  MySQL; /root/reference/binlogdb.cc:477-551, SURVEY.md §2C).
- ``ts_resample_ohlc``: hypertable-style OHLC resample — one map-side-
  combinable aggregation (min_by/max_by/min/max/count), no window, so
  it scales as a plain hash aggregate at 100 TB.
- ``join_asof_nearest``: nearest-direction as-of join (operators.asof.
  asof_join_nearest), one shuffle, two window passes over one sort.
- ``agg_mode``: deterministic per-group mode (max count, then smallest
  value) — MySQL's missing MODE() that its users emulate with exactly
  this GROUP BY + window idiom.
- ``fn_mysql_compat``: MySQL string/number builtins the reference's
  users call today (CONV, SUBSTRING_INDEX, ELT, FIELD, LPAD, printf-
  style FORMAT), expressed as Spark built-ins (JVM codegen, no UDFs).
- ``emb_centroid_stats``: per-label embedding centroids via posexplode
  + hash agg — the vector-average building block of IVF training and
  cluster summaries; linear fan-out (n_rows x dims), map-side partial
  aggregation, no single-partition choke point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import register_views
from mysql_cdc_table_spark.operators._util import t
from mysql_cdc_table_spark.operators.asof import asof_join_nearest

# Shared ANSI text: digit-chain recursion over customer keys (parent =
# floor(key/10)): per terminal digit and chain depth, how many
# customers land there and their key mass. Exercises the recursive
# anchor/step, per-iteration join, and termination.
_RECURSIVE_SQL = """
WITH RECURSIVE chain(ck, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT ck, CAST(floor(anc / 10) AS BIGINT), depth + 1
  FROM chain WHERE anc >= 10
)
SELECT anc AS root_digit, depth,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(ck) AS BIGINT) AS key_sum
FROM chain WHERE anc < 10
GROUP BY anc, depth
"""


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through spark.sql — the same SQL string the
    DuckDB oracle runs. Spark executes the recursion as an iterative
    union-all loop (each step a distributed join against the previous
    frontier); depth here is bounded by log10(max key)."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


SQL_RECURSIVE_CTE_SQL = _RECURSIVE_SQL


def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resample of the events stream: per (event_type, hour)
    open/high/low/close/volume/turnover. open/close pick by the TOTAL
    order (ts, event_id) — min_by/max_by over a struct — so same-stamp
    ties are deterministic in both engines. One hash aggregation:
    partials combine map-side; no window, no sort of the fact table.
    Turnover in integer cents keeps the sum order-independent."""
    e = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").alias("volume"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "turnover_cents"
        ),
    )


TS_RESAMPLE_OHLC_SQL = """
WITH w AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS volume,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS turnover_cents
FROM w GROUP BY event_type, bucket
"""


ASOF_NEAREST_TOL_S = 60 * 86400  # 60 days


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each probe matches the customer's
    CLOSEST order in time (before or after) within 60 days, ties to the
    earlier order. Same probe/era construction as join_asof_orders;
    matched_side pins the direction logic inside the value hash."""
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
            F.col("o_orderdate").cast("timestamp").alias("o_ts"),
            "o_orderkey",
        )
    )
    return asof_join_nearest(
        e, o, on="custkey", left_time="ts_probe", right_time="o_ts",
        right_payload=["o_orderkey"], tolerance=F.lit(ASOF_NEAREST_TOL_S),
    )


JOIN_ASOF_NEAREST_SQL = f"""
WITH e AS (
  SELECT event_id, user_id AS custkey,
         TIMESTAMP '1995-01-01 00:00:00'
           + to_days(CAST(event_id % 2500 AS INTEGER)) AS ts_probe
  FROM events
),
o AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS TIMESTAMP) AS o_ts,
         max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.custkey, e.ts_probe, m.o_orderkey,
       CASE WHEN m.o_ts IS NULL THEN NULL
            WHEN m.o_ts <= e.ts_probe THEN 'b' ELSE 'f' END AS matched_side
FROM e LEFT JOIN LATERAL (
  SELECT o.o_orderkey, o.o_ts
  FROM o
  WHERE o.custkey = e.custkey
    AND abs(epoch(e.ts_probe) - epoch(o.o_ts)) <= {ASOF_NEAREST_TOL_S}
  ORDER BY abs(epoch(e.ts_probe) - epoch(o.o_ts)), o.o_ts
  LIMIT 1
) m ON true
"""


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent o_orderpriority
    per order status, ties broken toward the lexicographically smallest
    value (engine-native MODE() leaves ties unspecified — unusable
    cross-engine). Counts first (map-side combinable), then a window
    over the tiny (status, priority) grid, never over the fact table."""
    counts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


AGG_MODE_SQL = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM c
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       CAST(cnt AS BIGINT) AS mode_count
FROM r WHERE rn = 1
"""


def fn_mysql_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL builtins the reference's users call through its delegated
    SQL surface, as Spark JVM built-ins: CONV (base conversion),
    SUBSTRING_INDEX, ELT, FIELD (via array_position), LPAD, and
    printf-style formatting. No Python UDFs — every expression stays
    inside whole-stage codegen."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.conv(F.col("p_partkey").cast("string"), 10, 16).alias("key_hex"),
        F.substring_index(F.col("p_type"), " ", 2).alias("type_prefix2"),
        F.substring_index(F.col("p_type"), " ", -1).alias("type_last"),
        F.expr(
            "elt(1 + p_partkey % 3, 'alpha', 'beta', 'gamma')"
        ).alias("elt_pick"),
        F.array_position(
            F.split(F.col("p_type"), " "), F.lit("PLATED")
        ).cast("long").alias("field_plated"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.format_string("%08d/%s", F.col("p_partkey"), F.col("p_brand")).alias(
            "key_fmt"
        ),
    )


FN_MYSQL_COMPAT_SQL = """
SELECT p_partkey,
       upper(to_hex(p_partkey)) AS key_hex,
       array_to_string(list_slice(string_split(p_type, ' '), 1, 2), ' ')
         AS type_prefix2,
       string_split(p_type, ' ')[-1] AS type_last,
       CASE 1 + p_partkey % 3 WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
            ELSE 'gamma' END AS elt_pick,
       CAST(coalesce(list_position(string_split(p_type, ' '), 'PLATED'), 0)
            AS BIGINT) AS field_plated,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
       printf('%08d/%s', p_partkey, p_brand) AS key_fmt
FROM part
"""


EMB_DIM = 64


def emb_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the vector-average
    kernel under IVF/k-means training and cluster summarization. Shape:
    posexplode to (label, dim, component) then ONE hash aggregation —
    linear fan-out (rows x dims), partials combine map-side, and the
    (label, dim) grid output is tiny regardless of input scale. Rounded
    to 6 decimals (the repo's cosine-oracle idiom) so cross-engine
    float-sum ordering can't flip the hash."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            (F.round(F.avg(F.col("x").cast("double")), 6) + F.lit(0.0)).alias(
                "centroid"
            ),
            F.count("*").alias("n"),
        )
    )


EMB_CENTROID_STATS_SQL = f"""
SELECT label, CAST(i - 1 AS INTEGER) AS dim,
       round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) + 0.0
         AS centroid,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings, range(1, {EMB_DIM + 1}) r(i)
GROUP BY label, i
"""


def fn_json_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL 8 JSON_TABLE: flatten a JSON array of objects into typed
    rows with an ordinality column. Spark's equivalent is
    from_json(..., 'array<struct<...>>') + posexplode — fully JVM-side.
    The JSON text is built from order keys (real parse, not a fixture
    file); the oracle reconstructs the flattened rows arithmetically,
    so a parser/ordinality/typing slip breaks the value hash."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.format_string(
            '[{"i":1,"v":%d},{"i":2,"v":%d},{"i":3,"v":%d}]',
            F.col("o_orderkey") % 7,
            F.col("o_orderkey") % 11,
            F.col("o_orderkey") % 13,
        ).alias("j"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_json("j", "array<struct<i:int,v:int>>").alias("a"),
    )
    return parsed.select(
        "o_orderkey", F.posexplode("a").alias("ord", "item")
    ).select(
        "o_orderkey",
        "ord",
        F.col("item.i").alias("i"),
        F.col("item.v").alias("v"),
    )


FN_JSON_TABLE_SQL = """
SELECT o_orderkey, CAST(p.i AS INTEGER) AS ord,
       CAST(p.i + 1 AS INTEGER) AS i,
       CAST(CASE p.i WHEN 0 THEN o_orderkey % 7
                     WHEN 1 THEN o_orderkey % 11
                     ELSE o_orderkey % 13 END AS INTEGER) AS v
FROM orders, range(0, 3) p(i)
"""


def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL date builtins round 2: DAYNAME/MONTHNAME (locale-stable
    English in both engines), QUARTER, DAYOFYEAR, WEEKOFYEAR (ISO —
    MySQL WEEK(d,3)), LAST_DAY, TO_DAYS-style epoch-day arithmetic, and
    ADD_MONTHS month-end clamping."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    return o.select(
        "o_orderkey",
        F.date_format("d", "EEEE").alias("day_name"),
        F.date_format("d", "MMMM").alias("month_name"),
        F.quarter("d").alias("qtr"),
        F.dayofyear("d").alias("doy"),
        F.weekofyear("d").alias("iso_week"),
        F.last_day("d").alias("month_end"),
        F.datediff("d", F.lit("1970-01-01").cast("date")).alias("epoch_days"),
        F.add_months("d", 1).alias("next_month"),
    )


FN_DATETIME2_SQL = """
SELECT o_orderkey,
       dayname(o_orderdate) AS day_name,
       monthname(o_orderdate) AS month_name,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       last_day(o_orderdate) AS month_end,
       CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            AS INTEGER) AS epoch_days,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
FROM orders
"""


def window_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / DENSE_RANK over a deterministic total
    order (price, key) — the ranking-family stragglers. Sampled to
    every 19th order to keep the compare set small; the window itself
    runs before the filter so bucket boundaries come from the full
    partition, exactly what the oracle computes."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias("pct_rank"),
            F.dense_rank().over(w).alias("drank"),
        )
        .filter(F.col("o_orderkey") % 19 == 0)
    )


WINDOW_NTILE_BUCKETS_SQL = """
WITH r AS (
  SELECT o_orderkey, o_orderstatus,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) + 0.0 AS pct_rank,
         CAST(dense_rank() OVER w AS BIGINT) AS drank
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey)
)
SELECT * FROM r WHERE o_orderkey % 19 = 0
"""


def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: COUNT_IF, BOOL_AND/BOOL_OR (MySQL's
    users emulate via MIN/MAX over 0/1), plus a deterministic
    ANY_VALUE stand-in (min) — all map-side combinable."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.min("o_orderpriority").alias("first_priority"),
    )


AGG_BOOL_LOGIC_SQL = """
SELECT o_orderstatus,
       CAST(count(*) FILTER (o_totalprice > 150000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       min(o_orderpriority) AS first_priority
FROM orders GROUP BY o_orderstatus
"""


def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — the set-op straggler: customers who ordered
    but never urgently. DataFrame.subtract IS ANSI EXCEPT (distinct,
    removes a key entirely when it appears on the right — NOT
    exceptAll+distinct, which would keep keys whose left multiplicity
    exceeds the right's)."""
    o = t(spark, sf_dir, "orders")
    return o.select("o_custkey").subtract(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    )


SET_EXCEPT_DISTINCT_SQL = """
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def agg_percentile_disc_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC per group — discrete quantiles return an ACTUAL
    data value (no interpolation), so unlike continuous percentiles
    they hash exactly cross-engine with no rounding idiom needed."""
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_pd")
    return spark.sql(
        """
        SELECT o_orderstatus,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p25,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p90
        FROM orders_pd GROUP BY o_orderstatus
        """
    )


AGG_PERCENTILE_DISC_GROUP_SQL = """
SELECT o_orderstatus,
       quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.9) AS p90
FROM orders GROUP BY o_orderstatus
"""


def emb_centroid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-cluster structure: cosine similarity between every pair of
    label centroids. Builds on the emb_centroid_stats kernel — after
    the per-(label, dim) aggregation the centroid grid is tiny
    (labels x dims), so the pairwise self-join costs nothing at any
    input scale; the heavy lifting stays in the one hash agg."""
    e = t(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        # the cent subtree feeds THREE consumers (self-join a/b + norms);
        # ReusedExchange covers the self-join but the norms branch can
        # re-run the posexplode+agg over the fact table — cut the
        # lineage once here (the grid is labels x dims, a few hundred
        # rows), so the fact table is scanned exactly once.
        # eager=False: the default eager=True runs the whole job at
        # DataFrame BUILD time, which would bill a fact-table scan to
        # every caller that merely constructs or EXPLAINs the query
        .localCheckpoint(eager=False)
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(b, (F.col("a.dim") == F.col("b.dim"))
               & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("l1"), F.col("b.label").alias("l2"))
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    norms = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    n1 = norms.select(F.col("label").alias("l1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("label").alias("l2"), F.col("nrm").alias("nrm2"))
    return dots.join(F.broadcast(n1), "l1").join(F.broadcast(n2), "l2").select(
        "l1", "l2",
        (F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6)
         + F.lit(0.0)).alias("cos"),
    )


EMB_CENTROID_PAIRS_SQL = f"""
WITH cent AS (
  SELECT label, i AS dim, avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS c
  FROM embeddings, range(1, {EMB_DIM + 1}) r(i)
  GROUP BY label, i
),
dots AS (
  SELECT a.label AS l1, b.label AS l2, sum(a.c * b.c) AS dot
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
),
norms AS (
  SELECT label, sqrt(sum(c * c)) AS nrm FROM cent GROUP BY label
)
SELECT d.l1, d.l2, round(d.dot / (n1.nrm * n2.nrm), 6) + 0.0 AS cos
FROM dots d
JOIN norms n1 ON n1.label = d.l1
JOIN norms n2 ON n2.label = d.l2
"""


QUERIES = {
    "sql_recursive_cte": sql_recursive_cte,
    "ts_resample_ohlc": ts_resample_ohlc,
    "join_asof_nearest": join_asof_nearest,
    "agg_mode": agg_mode,
    "fn_mysql_compat": fn_mysql_compat,
    "emb_centroid_stats": emb_centroid_stats,
    "fn_json_table": fn_json_table,
    "fn_datetime2": fn_datetime2,
    "window_ntile_buckets": window_ntile_buckets,
    "agg_bool_logic": agg_bool_logic,
    "set_except_distinct": set_except_distinct,
    "agg_percentile_disc_group": agg_percentile_disc_group,
    "emb_centroid_pairs": emb_centroid_pairs,
}

ORACLES = {
    "sql_recursive_cte": SQL_RECURSIVE_CTE_SQL,
    "ts_resample_ohlc": TS_RESAMPLE_OHLC_SQL,
    "join_asof_nearest": JOIN_ASOF_NEAREST_SQL,
    "agg_mode": AGG_MODE_SQL,
    "fn_mysql_compat": FN_MYSQL_COMPAT_SQL,
    "emb_centroid_stats": EMB_CENTROID_STATS_SQL,
    "fn_json_table": FN_JSON_TABLE_SQL,
    "fn_datetime2": FN_DATETIME2_SQL,
    "window_ntile_buckets": WINDOW_NTILE_BUCKETS_SQL,
    "agg_bool_logic": AGG_BOOL_LOGIC_SQL,
    "set_except_distinct": SET_EXCEPT_DISTINCT_SQL,
    "agg_percentile_disc_group": AGG_PERCENTILE_DISC_GROUP_SQL,
    "emb_centroid_pairs": EMB_CENTROID_PAIRS_SQL,
}
