"""Round-10 operators.

Driver-proof for the round-9 relay composition plus the round-10
statistics/corpus additions. Every key carries a full DuckDB oracle;
cross-engine exactness follows the established contracts (exact
integer sufficient statistics, digit strings past int64, floor-e6
ratios of exact int64 numerators/denominators, ordered bounded folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


def cdc_binlog_relay_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-proof of the FILTERING REPLICATION RELAY (round 9's
    composition, previously only pytest-covered): the full synthetic
    changelog is staged as a real binlog v4 series, then
    ``mysql_binlog_relay`` tails it with a transaction-stable
    predicate (__gtid % 2 = 0 — update pairs share a gtid, so
    transactions relay whole), re-emitting a NEW rotating series via
    the checkpointed streaming sink (availableNow). The destination is
    decoded back and aggregated per op; the oracle aggregates the
    filtered changelog CTE and never touches the wire — a relay that
    drops a transaction, tears an update pair, or duplicates a batch
    across the seam breaks the value hash. The reference can neither
    filter nor write a binlog (binlogdb.cc:283-345); this is the
    engine exceeding it as a composable replication component."""
    import hashlib
    import os
    import tempfile

    from mysql_cdc_table_spark.cdc.queries import ORDERS_TARGET_SCHEMA
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.sources.datasource import register
    from mysql_cdc_table_spark.sources.mysql_binlog import (
        mysql_binlog_read,
        mysql_binlog_relay,
    )

    register(spark)
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{sf_dir}:relay".encode()
    ).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"cdc_relay_{tag}")
    src, dst, ckpt = (os.path.join(base, d) for d in ("src", "dst", "ckpt"))
    ddl = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    (
        synthetic_changelog(spark, sf_dir)
        .repartition(4, "__gtid")
        .write.format("mysql_binlog")
        .option("schema_ddl", ddl)
        .option("database", "tpch")
        .option("table", "orders")
        .mode("overwrite")
        .save(src)
    )
    q = mysql_binlog_relay(
        spark,
        src,
        dst,
        ddl,
        "tpch",
        "orders",
        checkpoint=ckpt,
        predicate=F.col("__gtid") % 2 == 0,
        partitions=2,
        available_now=True,
    )
    q.awaitTermination()
    back = mysql_binlog_read(
        spark, dst, ORDERS_TARGET_SCHEMA, "tpch", "orders"
    )
    return back.groupBy("__op").agg(
        F.count("*").alias("n_rows"),
        F.sum("__gtid").alias("gtid_sum"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents_sum"
        ),
        F.count_distinct("o_orderkey").alias("n_keys"),
    )


def _relay_roundtrip_sql() -> str:
    from mysql_cdc_table_spark.cdc.synthetic import CHANGELOG_CTE

    return f"""
WITH {CHANGELOG_CTE}
SELECT __op,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(__gtid) AS BIGINT) AS gtid_sum,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
FROM changelog
WHERE __gtid % 2 = 0
GROUP BY __op
"""


QUERIES["cdc_binlog_relay_roundtrip"] = cdc_binlog_relay_roundtrip
ORACLES["cdc_binlog_relay_roundtrip"] = _relay_roundtrip_sql()


def ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type — the
    batch-effect detector a pipeline runs before trusting daily
    aggregates (a crawler that only fires on weekdays skews any
    day-grained statistic downstream). Counts per (type, dow) with the
    engine-proof weekday (days-since-epoch % 7, 0 = Thursday — never
    dayofweek(), whose origin differs across engines), share in ppm
    from ONE division of exact int64s, and the exact uniformity
    deviation |7·c − total| per cell (integer — max over cells is the
    sup-norm distance from uniform scaled by 7·total). Shape: one
    map-side-combinable count to a ≤ types×7 grid; everything after is
    grid-sized."""
    e = t(spark, sf_dir, "events")
    dow = (
        F.datediff(F.date_trunc("day", F.col("ts")), F.lit("1970-01-01")) % 7
    )
    grid = e.groupBy(
        "event_type", dow.cast("int").alias("dow")
    ).agg(F.count("*").cast("long").alias("n_events"))
    tot = grid.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("total")
    )
    return (
        grid.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "n_events",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("n_events").cast("double")
                / F.col("total").cast("double")
            )
            .cast("long")
            .alias("share_e6"),
            F.abs(7 * F.col("n_events") - F.col("total"))
            .cast("long")
            .alias("dev7"),
        )
        .orderBy("event_type", "dow")
    )


TS_DOW_SEASONALITY_SQL = """
WITH e AS (
  SELECT event_type,
         CAST((CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 7
              AS INTEGER) AS dow
  FROM events
), grid AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total
  FROM grid GROUP BY 1
)
SELECT g.event_type, g.dow, g.n_events,
       CAST(floor(1000000.0 * CAST(g.n_events AS DOUBLE)
            / CAST(t.total AS DOUBLE)) AS BIGINT) AS share_e6,
       CAST(abs(7 * g.n_events - t.total) AS BIGINT) AS dev7
FROM grid g JOIN tot t USING (event_type)
ORDER BY g.event_type, g.dow
"""

QUERIES["ts_dow_seasonality"] = ts_dow_seasonality
ORACLES["ts_dow_seasonality"] = TS_DOW_SEASONALITY_SQL


def text_ttr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source — type-token ratio and
    hapax share, the corpus-quality signal that separates organic text
    from template/boilerplate floods (a source whose TTR collapses is
    emitting near-duplicate spans; one whose hapax share spikes is
    emitting noise). Per source: total tokens, distinct tokens
    (types), hapax count (types seen exactly once IN that source), TTR
    and hapax share in ppm from single divisions of exact int64s.
    Shape: explode once, count the (source, token) grid map-side, then
    two bounded per-source aggregates — the grid is vocabulary-sized,
    never corpus-sized."""
    from mysql_cdc_table_spark.functions.text import tokens

    d = t(spark, sf_dir, "documents").select(
        "source", tokens(F.lower(F.col("text"))).alias("toks")
    )
    tok = d.select("source", F.explode("toks").alias("tok"))
    grid = tok.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        grid.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.count_if(F.col("c") == 1).cast("long").alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            )
            .cast("long")
            .alias("ttr_e6"),
            F.floor(
                F.lit(1_000_000.0)
                * F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double")
            )
            .cast("long")
            .alias("hapax_e6"),
        )
        .orderBy("source")
    )


TEXT_TTR_PROFILE_SQL = """
WITH d AS (
  SELECT source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), tok AS (
  SELECT source, unnest(toks) AS tok FROM d
), grid AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       CAST(floor(1000000.0 * CAST(count(*) AS DOUBLE)
            / CAST(sum(c) AS DOUBLE)) AS BIGINT) AS ttr_e6,
       CAST(floor(1000000.0 * CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS hapax_e6
FROM grid
GROUP BY source
ORDER BY source
"""

QUERIES["text_ttr_profile"] = text_ttr_profile
ORACLES["text_ttr_profile"] = TEXT_TTR_PROFILE_SQL


EMB_COV_DIMS = 8  # leading dimensions profiled; pairs = d*(d+1)/2


def emb_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension-pair covariance sufficient statistics over the
    leading EMB_COV_DIMS embedding dimensions — the embedding-space
    health check that catches dimension collapse (a pair with |corr|
    near 1 means the encoder wastes capacity) and dead dimensions
    (zero variance) before an ANN index or whitening transform trusts
    the space. Components quantize to exact integers (floor(x·10⁴) —
    float→double cast exact, one multiply, floor), so Σq_iq_j / Σq_i /
    n are EXACT int64 sufficient statistics (|q| ≤ ~10⁴·‖x‖∞, products
    ≤ 10⁸, sums safe to ~10¹⁰ rows — past that promote to
    decimal(38,0) digit strings, the brown_forsythe contract). The
    covariance/correlation matrix is a driver-sized formula over the
    emitted grid. Shape: ZERO joins/explodes — d(d+1)/2 + d sum
    columns in ONE map-side-combinable aggregate, then a bounded
    stack to rows."""
    e = t(spark, sf_dir, "embeddings")
    q = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 10_000
        ).cast("long")
        for i in range(EMB_COV_DIMS)
    ]
    aggs = [F.count("*").cast("long").alias("n")]
    for i in range(EMB_COV_DIMS):
        aggs.append(F.sum(q[i]).cast("long").alias(f"s_{i}"))
    for i in range(EMB_COV_DIMS):
        for j in range(i, EMB_COV_DIMS):
            aggs.append(
                F.sum(q[i] * q[j]).cast("long").alias(f"p_{i}_{j}")
            )
    one = e.agg(*aggs)
    pairs = ", ".join(
        f"{i}, {j}, n, s_{i}, s_{j}, p_{i}_{j}"
        for i in range(EMB_COV_DIMS)
        for j in range(i, EMB_COV_DIMS)
    )
    n_pairs = EMB_COV_DIMS * (EMB_COV_DIMS + 1) // 2
    return (
        one.selectExpr(
            f"stack({n_pairs}, {pairs}) AS (dim_i, dim_j, n, s_i, s_j, sp)"
        )
        .orderBy("dim_i", "dim_j")
    )


def _emb_dim_cov_sql() -> str:
    sel = []
    for i in range(EMB_COV_DIMS):
        for j in range(i, EMB_COV_DIMS):
            sel.append(
                f"SELECT {i} AS dim_i, {j} AS dim_j,"
                " CAST(count(*) AS BIGINT) AS n,"
                f" CAST(sum(q{i}) AS BIGINT) AS s_i,"
                f" CAST(sum(q{j}) AS BIGINT) AS s_j,"
                f" CAST(sum(q{i} * q{j}) AS BIGINT) AS sp"
                " FROM q"
            )
    qcols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 10000)"
        f" AS BIGINT) AS q{i}"
        for i in range(EMB_COV_DIMS)
    )
    body = " UNION ALL ".join(sel)
    return (
        f"WITH q AS (SELECT {qcols} FROM embeddings)\n{body}\n"
        "ORDER BY dim_i, dim_j"
    )


QUERIES["emb_dim_covariance"] = emb_dim_covariance
ORACLES["emb_dim_covariance"] = _emb_dim_cov_sql()
