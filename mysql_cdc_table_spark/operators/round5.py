"""Round-5 operators: interval joins/islands, linear interpolation,
CDC GTID gap auditing, corpus split hashing, and unigram-LM scoring.

Each entry pairs a Spark DataFrame query with a DuckDB oracle running
the same ANSI SQL semantics (driver compare: row count + column names +
value hash). Scale notes per operator docstring — every shape here is
the one you'd run at 100 TB (binned interval joins instead of
cross-joins, per-key windows instead of global sorts, one-pass hash
aggregates, join-on-term left to AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t


# --- interval overlap join ---------------------------------------------------
#
# The missing join type between equi (joins.py) and theta-band
# (join_theta_band): "which promo windows does each shipment interval
# overlap". Reference users run this as a raw theta join that MySQL
# nested-loops; at scale the right shape is a BINNED join — explode each
# interval to the fixed-width time bins it covers, equi-join on bin (a
# shuffle join Catalyst/AQE can size), then re-check the exact overlap
# predicate and dedupe pairs that met in more than one bin.

_BIN_DAYS = 7


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per promo window (derived from nation): how many Q1-Q2/1995
    shipment intervals overlap it and their total quantity. Shipment
    interval: [l_shipdate, l_shipdate + 1 + qty%14 days); window w for
    nation k: [1995-01-01 + 4k days, +9 days) — half-open overlap
    a.start < b.end AND b.start < a.end."""
    line = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-06-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
            .alias("a_start"),
        )
        .withColumn("a_end", F.col("a_start") + 1 + F.col("qty") % 14)
    )
    win = (
        t(spark, sf_dir, "nation")
        .select(
            "n_name",
            (
                F.datediff(F.lit("1995-01-01"), F.lit("1970-01-01"))
                + F.col("n_nationkey") * 4
            ).alias("b_start"),
        )
        .withColumn("b_end", F.col("b_start") + 9)
    )
    bins = lambda s, e: F.sequence(
        F.floor(s / _BIN_DAYS), F.floor((e - 1) / _BIN_DAYS)
    )
    line_b = line.withColumn("bin", F.explode(bins(F.col("a_start"), F.col("a_end"))))
    win_b = win.withColumn("bin", F.explode(bins(F.col("b_start"), F.col("b_end"))))
    # a pair meeting in several bins is counted ONCE by attributing it
    # to the bin of its first overlapping day — no distinct/dedup
    # shuffle needed (and no reliance on row identity: the synthetic
    # lineitem has duplicate (orderkey, linenumber) keys)
    first_overlap_bin = F.floor(
        F.greatest(F.col("a_start"), F.col("b_start")) / _BIN_DAYS
    )
    pairs = line_b.join(F.broadcast(win_b), "bin").filter(
        (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end"))
        & (F.col("bin") == first_overlap_bin)
    )
    return pairs.groupBy("n_name").agg(
        F.count("*").alias("n_overlaps"),
        F.sum("qty").alias("qty_sum"),
    )


JOIN_INTERVAL_OVERLAP_SQL = """
WITH line AS (
  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS a_start
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1995-06-01'
),
line2 AS (SELECT *, a_start + 1 + qty % 14 AS a_end FROM line),
win AS (
  SELECT n_name,
         (DATE '1995-01-01' - DATE '1970-01-01') + n_nationkey * 4 AS b_start
  FROM nation
),
win2 AS (SELECT *, b_start + 9 AS b_end FROM win)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(qty) AS BIGINT) AS qty_sum
FROM line2 JOIN win2
  ON line2.a_start < win2.b_end AND win2.b_start < line2.a_end
GROUP BY n_name
"""


# --- gaps-and-islands over intervals -----------------------------------------


def window_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each supplier's shipment intervals into maximal overlapping
    islands (classic gaps-and-islands: an island breaks where an
    interval starts strictly after the running max end of everything
    before it), then report islands/coverage per supplier. One sort per
    supplier partition — no global sort, no self-join; the 100 TB shape
    for interval coalescing."""
    iv = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
            .alias("s"),
            (F.col("l_quantity") % 10).cast("long").alias("q"),
        )
        .withColumn("e", F.col("s") + 1 + F.col("q"))
    )
    order = [F.col("s"), F.col("e"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_prev = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    per_island = islands.groupBy("l_suppkey", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    return per_island.groupBy("l_suppkey").agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).alias("covered_days"),
        F.max(F.col("i_end") - F.col("i_start")).alias("longest_island"),
    )


WINDOW_INTERVAL_ISLANDS_SQL = """
WITH iv AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS s,
         CAST(l_quantity AS BIGINT) % 10 AS q
  FROM lineitem
),
iv2 AS (SELECT *, s + 1 + q AS e FROM iv),
marked AS (
  SELECT *,
         max(e) OVER (PARTITION BY l_suppkey
                      ORDER BY s, e, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv2
),
flagged AS (
  SELECT *,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
           AS new_island
  FROM marked
),
islands AS (
  SELECT *,
         sum(new_island) OVER (PARTITION BY l_suppkey
                               ORDER BY s, e, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS island
  FROM flagged
),
per_island AS (
  SELECT l_suppkey, island, min(s) AS i_start, max(e) AS i_end
  FROM islands GROUP BY 1, 2
)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_end - i_start) AS BIGINT) AS covered_days,
       CAST(max(i_end - i_start) AS BIGINT) AS longest_island
FROM per_island GROUP BY l_suppkey
"""


# --- CDC GTID gap audit ------------------------------------------------------


def cdc_gtid_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication data-quality audit: per binlog file, find holes in
    the GTID sequence bigger than the expected stride. The changelog
    drops every gtid divisible by 97 ("lost transactions"); the audit
    surfaces gaps of >= 20 missing gnos as (file, gap bounds, size).
    One distinct + one lag window per file partition — audit cost is
    linear in the changelog, never a self-join."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    cl = synthetic_changelog(spark, sf_dir).filter(F.col("__gtid") % 97 != 0)
    gtids = cl.select("__file_seq", "__gtid").distinct()
    w = Window.partitionBy("__file_seq").orderBy("__gtid")
    gaps = (
        gtids.withColumn("prev_gtid", F.lag("__gtid").over(w))
        .filter(F.col("__gtid") - F.col("prev_gtid") > 20)
        .select(
            F.col("__file_seq").alias("file_seq"),
            (F.col("prev_gtid") + 1).alias("gap_start"),
            (F.col("__gtid") - 1).alias("gap_end"),
            (F.col("__gtid") - F.col("prev_gtid") - 1).alias("n_missing"),
        )
    )
    return gaps


from mysql_cdc_table_spark.cdc.synthetic import CHANGELOG_CTE as _CL_CTE

CDC_GTID_GAP_AUDIT_SQL = f"""
WITH {_CL_CTE},
gtids AS (
  SELECT DISTINCT __file_seq, __gtid FROM changelog WHERE __gtid % 97 <> 0
),
lagged AS (
  SELECT __file_seq, __gtid,
         lag(__gtid) OVER (PARTITION BY __file_seq ORDER BY __gtid)
           AS prev_gtid
  FROM gtids
)
SELECT __file_seq AS file_seq, prev_gtid + 1 AS gap_start,
       __gtid - 1 AS gap_end, __gtid - prev_gtid - 1 AS n_missing
FROM lagged WHERE __gtid - prev_gtid > 20
"""


# --- deterministic corpus split ----------------------------------------------


def corpus_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: a Knuth multiplicative hash
    of doc_id mod 100 buckets into 80/10/10 — reproducible across
    engines and runs, no sampling state, no shuffle beyond the final
    tiny aggregate. The split column is a pure projection, so at corpus
    scale the assignment costs one scan and the per-(source, split)
    audit is one map-side-combinable hash agg."""
    d = t(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
    )


CORPUS_SPLIT_HASH_SQL = """
WITH tagged AS (
  SELECT source, n_chars,
         CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
              WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM tagged GROUP BY source, split
"""


# --- unigram language-model scoring ------------------------------------------


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level unigram LM quality score: train token frequencies
    over the whole corpus in one hash agg, then score each document by
    its mean negative log-likelihood (surprising-token documents score
    high — the classic cheap LM filter). The token->count join is a
    plain shuffle join on term (vocab ≪ corpus but can exceed broadcast
    budgets at web scale; AQE picks broadcast when it fits). The global
    total rides a 1-row broadcast cross join."""
    from mysql_cdc_table_spark.functions.text import tokens

    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    counts = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    scored = (
        terms.join(counts, "term")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            (-F.log(F.col("cnt").cast("double") / F.col("total"))).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.round(F.avg("nll"), 6) + F.lit(0.0)).alias("avg_nll"),
    )


from mysql_cdc_table_spark.functions.text import _SQL_TOKENS as _TK

TEXT_UNIGRAM_LOGPROB_SQL = f"""
WITH d AS (SELECT doc_id, {_TK} AS tk FROM documents),
terms AS (SELECT doc_id, unnest(tk) AS term FROM d),
counts AS (SELECT term, count(*) AS cnt FROM terms GROUP BY term),
total AS (SELECT sum(cnt) AS total FROM counts),
scored AS (
  SELECT doc_id, -ln(CAST(cnt AS DOUBLE) / total) AS nll
  FROM terms JOIN counts USING (term), total
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(nll), 6) + 0.0 AS avg_nll
FROM scored GROUP BY doc_id
"""


# --- linear interpolation onto an hourly grid --------------------------------


def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style `interpolate()`: resample each user's event
    series onto an hourly grid with LINEAR interpolation between the
    surrounding samples (gap-fill fills with the last value; this
    draws the line). Grid points lie strictly inside (min_ts, max_ts)
    so both neighbours always exist.

    Shape: the grid and the samples are unioned and sorted ONCE per
    user partition; the previous sample comes from one run of
    last_value(ignoreNulls) and the next sample from the mirrored
    window — the same one-sort two-pass trick as join_asof_nearest.
    Weights are integer microseconds; the only float math is the final
    lerp, rounded."""
    ev = t(spark, sf_dir, "events")
    # dedupe duplicate timestamps deterministically (keep max event_id)
    samples = (
        ev.groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            "ts",
            "value",
            F.lit(0).alias("is_grid"),
        )
    )
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    grid_start = F.date_trunc("hour", F.col("min_ts")) + F.expr(
        "INTERVAL 1 HOUR"
    )
    trunc_max = F.date_trunc("hour", F.col("max_ts"))
    grid_stop = F.when(
        trunc_max == F.col("max_ts"), trunc_max - F.expr("INTERVAL 1 HOUR")
    ).otherwise(trunc_max)
    grid = (
        span.select(
            "user_id", grid_start.alias("g0"), grid_stop.alias("g1")
        )
        .filter(F.col("g0") <= F.col("g1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("g0"), F.col("g1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    u = samples.unionByName(grid)
    # explicit NTZ->timestamp cast (wall-clock identity under the pinned
    # UTC session tz): unix_micros rejects TIMESTAMP_NTZ, and relying on
    # the union's implicit coercion to LTZ is fragile
    ev_ts = F.when(
        F.col("is_grid") == 0, F.unix_micros(F.col("ts").cast("timestamp"))
    )
    ev_v = F.when(F.col("is_grid") == 0, F.col("value"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # ONE select for all four lasts: chained withColumn interleaves
    # projections between the Window operators, which blocks Catalyst's
    # CollapseWindow — the plan then runs FOUR window passes instead of
    # two (measured 7.0s -> 1.9s at sf0.1 on the collapsed form)
    out = u.select(
        "user_id",
        "ts",
        "is_grid",
        F.last(ev_ts, ignorenulls=True).over(w_prev).alias("prev_us"),
        F.last(ev_v, ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(ev_ts, ignorenulls=True).over(w_next).alias("next_us"),
        F.last(ev_v, ignorenulls=True).over(w_next).alias("next_v"),
    ).filter(F.col("is_grid") == 1)
    h_us = F.unix_micros(F.col("ts").cast("timestamp"))
    frac = (h_us - F.col("prev_us")).cast("double") / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    return out.select(
        "user_id",
        "ts",
        (
            F.round(
                F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
                6,
            )
            + F.lit(0.0)  # normalize -0.0 (cross-engine hash parity)
        ).alias("value"),
    )


TS_INTERPOLATE_LINEAR_SQL = """
WITH samples AS (
  SELECT user_id, ts, max_by(value, event_id) AS value, 0 AS is_grid
  FROM events GROUP BY user_id, ts
),
span AS (
  SELECT user_id, min(ts) AS min_ts, max(ts) AS max_ts
  FROM events GROUP BY user_id
),
bounds AS (
  SELECT user_id,
         date_trunc('hour', min_ts) + INTERVAL 1 HOUR AS g0,
         CASE WHEN date_trunc('hour', max_ts) = max_ts
              THEN date_trunc('hour', max_ts) - INTERVAL 1 HOUR
              ELSE date_trunc('hour', max_ts) END AS g1
  FROM span
),
grid AS (
  SELECT user_id, unnest(generate_series(g0, g1, INTERVAL 1 HOUR)) AS ts,
         CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
  FROM bounds WHERE g0 <= g1
),
u AS (SELECT * FROM samples UNION ALL SELECT * FROM grid),
walked AS (
  SELECT *,
    last_value(CASE WHEN is_grid = 0 THEN epoch_us(ts) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts ASC, is_grid ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
    last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts ASC, is_grid ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN is_grid = 0 THEN epoch_us(ts) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts DESC, is_grid DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_us,
    last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts DESC, is_grid DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_v
  FROM u
)
SELECT user_id, ts,
       round(prev_v + (next_v - prev_v)
             * (CAST(epoch_us(ts) - prev_us AS DOUBLE)
                / CAST(next_us - prev_us AS DOUBLE)), 6) + 0.0 AS value
FROM walked WHERE is_grid = 1
"""


QUERIES = {
    "join_interval_overlap": join_interval_overlap,
    "window_interval_islands": window_interval_islands,
    "cdc_gtid_gap_audit": cdc_gtid_gap_audit,
    "corpus_split_hash": corpus_split_hash,
    "text_unigram_logprob": text_unigram_logprob,
    "ts_interpolate_linear": ts_interpolate_linear,
}

ORACLES = {
    "join_interval_overlap": JOIN_INTERVAL_OVERLAP_SQL,
    "window_interval_islands": WINDOW_INTERVAL_ISLANDS_SQL,
    "cdc_gtid_gap_audit": CDC_GTID_GAP_AUDIT_SQL,
    "corpus_split_hash": CORPUS_SPLIT_HASH_SQL,
    "text_unigram_logprob": TEXT_UNIGRAM_LOGPROB_SQL,
    "ts_interpolate_linear": TS_INTERPOLATE_LINEAR_SQL,
}


# --- SCD2 point-in-time (as-of) dimension join -------------------------------


def join_dim_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension built from the
    changelog: each order probes the version of ITSELF valid 36 hours
    after o_orderdate (update 1 lands at +1 day, update 2 at +2 days,
    delete at +3 — so the probe lands on a mid-history version). This
    is the warehouse consumption pattern for cdc_scd2's output.

    Scale shape: an EQUI-join on the business key with the validity
    predicate as a post-join filter — versions per key are few, so this
    is a plain keyed join (AQE-sizable), never a range join over the
    whole interval axis."""
    from mysql_cdc_table_spark.cdc import ops
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    dim = ops.scd2(synthetic_changelog(spark, sf_dir), ["o_orderkey"])
    probes = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_orderdate") + F.expr("INTERVAL 36 HOURS")).alias("probe_tm"),
    )
    j = probes.join(dim, probes.key == dim.o_orderkey).filter(
        (F.col("valid_from") <= F.col("probe_tm"))
        & (F.col("valid_to").isNull() | (F.col("probe_tm") < F.col("valid_to")))
    )
    return j.select(
        "key",
        F.col("o_orderstatus").alias("version_status"),
        # round before the cast: 2-dec double * 100 lands epsilon-under
        # the exact integer, and bare CAST truncates in Spark but rounds
        # in DuckDB — round() lands both on the exact value
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("version_cents"),
        F.col("__gtid").alias("version_id"),
        F.col("is_current").alias("was_current"),
    )


JOIN_DIM_SNAPSHOT_SQL = f"""
WITH {_CL_CTE},
versions AS (SELECT * FROM changelog WHERE __op <> 2),
iv AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, __op, __gtid,
         __tm AS valid_from,
         lead(__tm) OVER w AS valid_to,
         lead(__op) OVER w IS NULL AS is_current
  FROM versions
  WINDOW w AS (PARTITION BY o_orderkey
               ORDER BY __gtid ASC, __event_seq ASC, __image_seq ASC)
),
dim AS (SELECT * FROM iv WHERE __op <> 0),
probes AS (
  SELECT o_orderkey AS key, o_orderdate + INTERVAL 36 HOUR AS probe_tm
  FROM orders
)
SELECT key, dim.o_orderstatus AS version_status,
       CAST(round(dim.o_totalprice * 100) AS BIGINT) AS version_cents,
       dim.__gtid AS version_id, dim.is_current AS was_current
FROM probes JOIN dim ON probes.key = dim.o_orderkey
WHERE dim.valid_from <= probes.probe_tm
  AND (dim.valid_to IS NULL OR probes.probe_tm < dim.valid_to)
"""


# --- Matryoshka-style prefix energy ------------------------------------------


def emb_prefix_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation diagnostic: per label and prefix length k,
    the mean fraction of each vector's L2 norm captured by its first k
    dims (the number you check before shipping truncated embeddings).
    Pure higher-order-function math on the scan + one tiny hash agg —
    JVM-evaluated, zero Python, shuffle carries labels x |ks| rows."""
    from mysql_cdc_table_spark.functions.similarity import sqnorm

    e = t(spark, sf_dir, "embeddings")
    ks = [4, 8, 16, 32]
    rows = e.select(
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        (
                            F.sqrt(sqnorm(F.slice("embedding", 1, k)))
                            / F.sqrt(sqnorm(F.col("embedding")))
                        ).alias("energy"),
                    )
                    for k in ks
                ]
            )
        ).alias("pe"),
    ).select("label", "pe.k", "pe.energy")
    return rows.groupBy("label", "k").agg(
        F.round(F.avg("energy"), 6).alias("mean_energy"),
        F.count("*").alias("n_vectors"),
    )


_SQL_SQNORM = (
    "list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)

EMB_PREFIX_ENERGY_SQL = f"""
WITH ks AS (SELECT unnest([4, 8, 16, 32]) AS k),
per AS (
  SELECT label, k,
         sqrt({_SQL_SQNORM.format(a='embedding[1:k]')})
           / sqrt({_SQL_SQNORM.format(a='embedding')}) AS energy
  FROM embeddings, ks
)
SELECT label, k, round(avg(energy), 6) AS mean_energy,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM per GROUP BY label, k
"""


# --- CDC orphan-event audit --------------------------------------------------


def cdc_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication consistency audit: keys whose FIRST event (in
    changelog order) is not an INSERT — the signature of a feed that
    lost its initial snapshot or started mid-history. The changelog
    drops INSERTs for keys divisible by 13 to simulate the loss; the
    audit must recover exactly those keys. One window per key
    partition, integer output."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    cl = synthetic_changelog(spark, sf_dir).filter(
        ~((F.col("__op") == 1) & (F.col("o_orderkey") % 13 == 0))
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("__gtid").asc(), F.col("__event_seq").asc(),
        F.col("__image_seq").asc(),
    )
    wc = Window.partitionBy("o_orderkey")
    flagged = cl.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_events", F.count("*").over(wc)
    )
    return flagged.filter((F.col("rn") == 1) & (F.col("__op") != 1)).select(
        F.col("o_orderkey").alias("key"),
        F.col("__op").alias("first_op"),
        F.col("__gtid").alias("first_gtid"),
        F.col("n_events").cast("long").alias("n_events"),
    )


CDC_ORPHAN_AUDIT_SQL = f"""
WITH {_CL_CTE},
pruned AS (
  SELECT * FROM changelog
  WHERE NOT (__op = 1 AND o_orderkey % 13 = 0)
),
flagged AS (
  SELECT o_orderkey, __op, __gtid,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY __gtid ASC, __event_seq ASC,
                                     __image_seq ASC) AS rn,
         count(*) OVER (PARTITION BY o_orderkey) AS n_events
  FROM pruned
)
SELECT o_orderkey AS key, __op AS first_op, __gtid AS first_gtid,
       CAST(n_events AS BIGINT) AS n_events
FROM flagged WHERE rn = 1 AND __op <> 1
"""


# --- cumulative distinct via first-seen flags --------------------------------


def window_first_seen_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT event types each user has seen up to
    every event — the "novelty curve" behind activation metrics.
    Windowed count(distinct) doesn't exist in either engine; the
    portable (and scale-correct) form is a first-occurrence flag
    (row_number over (user, type) = 1) plus a running sum over the user
    timeline. Two keyed windows, both partition-parallel."""
    ev = t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
    )


WINDOW_FIRST_SEEN_CUM_SQL = """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ASC, event_id ASC) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)
            AS BIGINT)
         AS distinct_types_so_far
FROM flagged
"""


# --- string builtins round 3 -------------------------------------------------


def fn_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string-builtin tier (MySQL users' daily drivers):
    TRANSLATE, REPEAT, REVERSE, MD5, TO_BASE64, BIT_COUNT, LEFT/RIGHT.
    All JVM built-ins, pure scan projection."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
        F.repeat(F.left("p_brand", F.lit(2)), 3).alias("rep"),
        F.reverse("p_type").alias("rev"),
        F.md5(F.col("p_name").cast("binary")).alias("h"),
        F.base64(F.col("p_brand").cast("binary")).alias("b64"),
        F.bit_count("p_partkey").alias("bits"),
        F.right("p_type", F.lit(4)).alias("r4"),
    )


FN_STRING3_SQL = """
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS tr,
       repeat(left(p_brand, 2), 3) AS rep,
       reverse(p_type) AS rev,
       md5(p_name) AS h,
       to_base64(CAST(p_brand AS BLOB)) AS b64,
       bit_count(p_partkey) AS bits,
       right(p_type, 4) AS r4
FROM part
"""


QUERIES.update(
    {
        "join_dim_snapshot": join_dim_snapshot,
        "emb_prefix_energy": emb_prefix_energy,
        "cdc_orphan_audit": cdc_orphan_audit,
        "window_first_seen_cum": window_first_seen_cum,
        "fn_string3": fn_string3,
    }
)

ORACLES.update(
    {
        "join_dim_snapshot": JOIN_DIM_SNAPSHOT_SQL,
        "emb_prefix_energy": EMB_PREFIX_ENERGY_SQL,
        "cdc_orphan_audit": CDC_ORPHAN_AUDIT_SQL,
        "window_first_seen_cum": WINDOW_FIRST_SEEN_CUM_SQL,
        "fn_string3": FN_STRING3_SQL,
    }
)


# --- asymmetric containment dedup --------------------------------------------


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-superset detection: containment = |A∩B| / min(|A|, |B|)
    over 3-gram shingle sets. Jaccard misses a short document embedded
    verbatim in a long one (union dominates); containment is the
    criterion wire services and chunk-dedup actually need. Same
    capped inverted-index candidate generation as dedup_ngram_jaccard
    — bucketed, never all-pairs."""
    from mysql_cdc_table_spark.functions.dedup import HOT_SHINGLE_CAP
    from mysql_cdc_table_spark.functions.text import _doc_shingles

    docs = _doc_shingles(spark, sf_dir).withColumn("n_sh", F.size("sh"))
    ex = docs.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    hot = ex.groupBy("s").agg(F.count("*").alias("df")).filter(
        F.col("df") <= HOT_SHINGLE_CAP
    )
    ex = ex.join(hot.select("s"), "s")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count("*").alias("common"))
    )
    contain = F.round(
        F.col("common") / F.least("n1", "n2").cast("double"), 6
    )
    return (
        pairs.withColumn("containment", contain)
        .filter(F.col("containment") >= 0.5)
        .select("doc1", "doc2", "common", "containment")
    )


from mysql_cdc_table_spark.functions.dedup import HOT_SHINGLE_CAP as _HOT
from mysql_cdc_table_spark.functions.text import _SQL_SHINGLES as _SH

DEDUP_CONTAINMENT_SQL = f"""
WITH sh AS ({_SH}),
docs AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh),
ex AS (SELECT doc_id, n_sh, unnest(sh) AS s FROM docs),
keep AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {_HOT}),
exk AS (SELECT ex.* FROM ex JOIN keep USING (s)),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.n_sh AS n1, b.n_sh AS n2,
         count(*) AS common
  FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc1, doc2, common,
       round(common / CAST(least(n1, n2) AS DOUBLE), 6) AS containment
FROM pairs
WHERE round(common / CAST(least(n1, n2) AS DOUBLE), 6) >= 0.5
"""


# --- per-series rate of change -----------------------------------------------


def ts_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete derivative per user series: (value - lag(value)) over
    elapsed seconds — the monitoring primitive behind rate()/deriv().
    One lag window per user partition; time deltas in integer
    microseconds, one float division at the end."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # events.ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the cast
    # is wall-clock identity under the pinned UTC session tz
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_v = F.lag("value").over(w)
    prev_us = F.lag(us).over(w)
    # + 0.0 normalizes IEEE negative zero: Spark's round gives 0.0 where
    # DuckDB's gives -0.0 for tiny negative deltas; the value hash
    # formats them differently (same idiom as emb_centroid_pairs)
    rate = F.round(
        (F.col("value") - prev_v)
        / ((us - prev_us).cast("double") / F.lit(1_000_000.0)),
        6,
    ) + F.lit(0.0)
    return ev.select(
        "event_id", "user_id", rate.alias("rate_per_sec")
    )


TS_RATE_OF_CHANGE_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, value, epoch_us(ts) AS us,
         lag(value) OVER w AS prev_v,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT event_id, user_id,
       round((value - prev_v)
             / (CAST(us - prev_us AS DOUBLE) / 1000000.0), 6) + 0.0
         AS rate_per_sec
FROM lagged
"""


# --- corpus length histogram -------------------------------------------------


def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length histogram per source — the first chart every
    corpus audit draws. Integer CASE ladder (identical literals both
    engines, no float log2), one map-side-combinable agg."""
    d = t(spark, sf_dir, "documents")
    n = F.col("n_chars")
    bucket = (
        F.when(n < 64, 64)
        .when(n < 128, 128)
        .when(n < 256, 256)
        .when(n < 512, 512)
        .when(n < 1024, 1024)
        .when(n < 2048, 2048)
        .otherwise(4096)
    )
    return (
        d.select("source", bucket.alias("len_bucket"), "n_chars")
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
    )


CORPUS_LENGTH_HISTOGRAM_SQL = """
WITH tagged AS (
  SELECT source, n_chars,
         CASE WHEN n_chars < 64 THEN 64
              WHEN n_chars < 128 THEN 128
              WHEN n_chars < 256 THEN 256
              WHEN n_chars < 512 THEN 512
              WHEN n_chars < 1024 THEN 1024
              WHEN n_chars < 2048 THEN 2048
              ELSE 4096 END AS len_bucket
  FROM documents
)
SELECT source, len_bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM tagged GROUP BY source, len_bucket
"""


# --- null-aware NOT IN semantics ---------------------------------------------


def subquery_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, cross-engine: against a NULL-free list the
    anti-join filters normally; inject ONE NULL into the same list and
    NOT IN must return ZERO rows (three-valued logic: x <> NULL is
    UNKNOWN, so nothing satisfies the predicate). Both engines must
    agree on both counts — Spark plans the null-aware case as a
    special anti join. Output: one row per case."""
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("v_orders_nin")
    clean = spark.sql(
        """
        SELECT 'no_null' AS case_label, CAST(count(*) AS LONG) AS n
        FROM v_orders_nin
        WHERE o_custkey NOT IN (
          SELECT o_custkey FROM v_orders_nin WHERE o_orderkey % 7 = 0
        )
        """
    )
    nullish = spark.sql(
        """
        SELECT 'with_null' AS case_label, CAST(count(*) AS LONG) AS n
        FROM v_orders_nin
        WHERE o_custkey NOT IN (
          SELECT CASE WHEN o_orderkey % 1000 = 1 THEN NULL
                      ELSE o_custkey END
          FROM v_orders_nin WHERE o_orderkey % 7 = 0
        )
        """
    )
    return clean.unionByName(nullish)


SUBQUERY_NOT_IN_NULL_SQL = """
SELECT 'no_null' AS case_label, CAST(count(*) AS BIGINT) AS n
FROM orders
WHERE o_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderkey % 7 = 0
)
UNION ALL
SELECT 'with_null' AS case_label, CAST(count(*) AS BIGINT) AS n
FROM orders
WHERE o_custkey NOT IN (
  SELECT CASE WHEN o_orderkey % 1000 = 1 THEN NULL ELSE o_custkey END
  FROM orders WHERE o_orderkey % 7 = 0
)
"""


QUERIES.update(
    {
        "dedup_containment": dedup_containment,
        "ts_rate_of_change": ts_rate_of_change,
        "corpus_length_histogram": corpus_length_histogram,
        "subquery_not_in_null": subquery_not_in_null,
    }
)

ORACLES.update(
    {
        "dedup_containment": DEDUP_CONTAINMENT_SQL,
        "ts_rate_of_change": TS_RATE_OF_CHANGE_SQL,
        "corpus_length_histogram": CORPUS_LENGTH_HISTOGRAM_SQL,
        "subquery_not_in_null": SUBQUERY_NOT_IN_NULL_SQL,
    }
)


# --- late keys (registered in round 5, driver window row in round 6) ---------


def cdc_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse CDC primitive: MERGE a changelog into an existing
    snapshot — upserts overwrite, tombstones delete, untouched rows
    SURVIVE. The changelog is restricted to keys with o_orderkey % 3
    != 0, so a third of the snapshot is genuinely untouched and the
    surviving src='snapshot' rows sit inside the value hash (an
    implementation that ignored the snapshot would hash differently).

    Shape: ONE keyed max_by aggregate yields each changed key's final
    image AND final op (so upserts and tombstones come from the same
    shuffle), then ONE anti join removes every changed key from the
    snapshot before unioning the upserts back — the batch equivalent of
    foreachBatch MERGE; with a bucketed/mergeable store the anti join
    becomes co-located or file-skipping MERGE INTO."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    snap = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.lit("snapshot").alias("src"),
    )
    cl = synthetic_changelog(spark, sf_dir).filter(
        F.col("o_orderkey") % 3 != 0
    )
    final = cl.groupBy("o_orderkey").agg(
        F.max_by(
            F.struct("__op", "o_orderstatus", "o_totalprice"),
            F.struct("__gtid", "__event_seq", "__image_seq"),
        ).alias("last")
    )
    fresh = final.filter(F.col("last.__op") != 0).select(
        F.col("o_orderkey").alias("key"),
        F.col("last.o_orderstatus").alias("status"),
        F.round(F.col("last.o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.lit("changelog").alias("src"),
    )
    touched = final.select(F.col("o_orderkey").alias("key"))
    merged = snap.join(touched, "key", "left_anti").unionByName(fresh)
    return merged.groupBy("src", "status").agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents_sum"),
    )


CDC_APPLY_MERGE_SQL = f"""
WITH {_CL_CTE},
flt AS (SELECT * FROM changelog WHERE o_orderkey % 3 <> 0),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_orderkey
      ORDER BY __gtid DESC, __event_seq DESC, __image_seq DESC) AS __rn
  FROM flt
),
final AS (SELECT * FROM ranked WHERE __rn = 1),
fresh AS (
  SELECT o_orderkey AS key, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         'changelog' AS src
  FROM final WHERE __op <> 0
),
snap AS (
  SELECT o_orderkey AS key, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         'snapshot' AS src
  FROM orders
),
merged AS (
  SELECT * FROM snap
  WHERE key NOT IN (SELECT o_orderkey FROM final)
  UNION ALL
  SELECT * FROM fresh
)
SELECT src, status, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents_sum
FROM merged GROUP BY src, status
"""


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median of the last 5 events per user — the p50
    smoother dashboards run over latency/value series. Exact percentile
    over a bounded ROWS frame: state per window position is 5 values,
    partition-parallel by user."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.round(F.expr("percentile(value, 0.5)").over(w), 6) + F.lit(0.0))
        .alias("rolling_p50"),
    )


WINDOW_ROLLING_MEDIAN_SQL = """
SELECT event_id, user_id,
       round(quantile_cont(value, 0.5) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) + 0.0
         AS rolling_p50
FROM events
"""


# Late registration: these two keys are documented ROUND5_LATE_KEYS —
# they sit BEHIND the 50-slot driver window this round (the window is
# exactly filled by 15 new + 7 re-verify + 27 r01-standing + 1) and
# lead the round-6 window for their first driver rows, the same
# protocol ROUND3_LATE_KEYS followed.
QUERIES.update(
    {
        "cdc_apply_merge": cdc_apply_merge,
        "window_rolling_median": window_rolling_median,
    }
)

ORACLES.update(
    {
        "cdc_apply_merge": CDC_APPLY_MERGE_SQL,
        "window_rolling_median": WINDOW_ROLLING_MEDIAN_SQL,
    }
)


# --- full dedup cascade (late key #4) ----------------------------------------


def corpus_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production curation composition: exact dedup (rolling-hash
    fingerprint, min-id keeper) -> near-dup removal (exact Jaccard >=
    0.5 over the capped inverted shingle index, computed among exact
    survivors) -> containment removal (containment >= 0.8 among near
    survivors, catching short-doc-inside-long-doc).

    Removal policy per similarity tier: ONE-SHOT — a document is
    removed when ANY smaller-id qualifying partner exists among the
    tier's input set, without re-evaluating chains (in A<B<C with
    A~B and B~C but not A~C, both B and C are removed; a sequential
    greedy pass would keep C). One-shot is the standard single-join
    policy at corpus scale — no iteration, one deterministic pass —
    and both engines implement it identically, so the whole cascade
    carries a value-hash oracle. Output: per (source, verdict) counts
    and volumes — the removal report every corpus run ships.

    Scale: the pair relation is computed ONCE over the survivors'
    shingles (both metrics from the same aggregation); each tier is a
    filter over it. Costs match the individual dedup keys — bucketed
    inverted-index joins with the hot-shingle cap, never all-pairs."""
    from mysql_cdc_table_spark.functions.dedup import HOT_SHINGLE_CAP
    from mysql_cdc_table_spark.functions.text import (
        _doc_shingles,
        poly_fingerprint,
        tokens,
    )

    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    fp = d.select(
        "doc_id",
        "source",
        "n_chars",
        poly_fingerprint(tokens(F.col("text"))).alias("fp"),
    )
    keep1 = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    s1 = fp.join(keep1, "fp").withColumn(
        "exact_dup", F.col("doc_id") != F.col("keep_id")
    )

    surv1 = s1.filter(~F.col("exact_dup")).select("doc_id")
    sh = (
        _doc_shingles(spark, sf_dir)
        .join(surv1, "doc_id")
        .withColumn("n_sh", F.size("sh"))
    )
    ex = sh.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    hot = ex.groupBy("s").agg(F.count("*").alias("df")).filter(
        F.col("df") <= HOT_SHINGLE_CAP
    )
    ex = ex.join(hot.select("s"), "s")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jac",
            F.round(
                F.col("common")
                / (F.col("n1") + F.col("n2") - F.col("common")).cast("double"),
                6,
            ),
        )
        .withColumn(
            "cont",
            F.round(F.col("common") / F.least("n1", "n2").cast("double"), 6),
        )
    )
    near = pairs.filter(F.col("jac") >= 0.5).select(
        F.col("doc2").alias("doc_id")
    ).distinct()
    cont = (
        pairs.filter(F.col("cont") >= 0.8)
        .join(near.select(F.col("doc_id").alias("doc1")), "doc1", "left_anti")
        .join(near.select(F.col("doc_id").alias("doc2")), "doc2", "left_anti")
        .select(F.col("doc2").alias("doc_id"))
        .distinct()
    )
    verdict = (
        F.when(F.col("exact_dup"), "exact")
        .when(F.col("near").isNotNull(), "near")
        .when(F.col("cont").isNotNull(), "contained")
        .otherwise("kept")
    )
    tagged = (
        s1.join(near.withColumn("near", F.lit(1)), "doc_id", "left")
        .join(cont.withColumn("cont", F.lit(1)), "doc_id", "left")
        .select("source", "n_chars", verdict.alias("verdict"))
    )
    return tagged.groupBy("source", "verdict").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
    )


from mysql_cdc_table_spark.functions.text import _SQL_TOKENS as _TKC
from mysql_cdc_table_spark.functions.text import _sql_fingerprint as _FPC

CORPUS_DEDUP_CASCADE_SQL = f"""
WITH d AS (SELECT doc_id, source, n_chars, {_TKC} AS tk FROM documents),
fp AS (SELECT doc_id, source, n_chars, {_FPC('tk')} AS fp FROM d),
keep1 AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp),
s1 AS (
  SELECT fp.*, fp.doc_id <> keep1.keep_id AS exact_dup
  FROM fp JOIN keep1 USING (fp)
),
shall AS ({_SH}),
sh AS (
  SELECT shall.doc_id, shall.sh, len(shall.sh) AS n_sh
  FROM shall JOIN s1 ON s1.doc_id = shall.doc_id AND NOT s1.exact_dup
),
ex AS (SELECT doc_id, n_sh, unnest(sh) AS s FROM sh),
keep AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {_HOT}),
exk AS (SELECT ex.* FROM ex JOIN keep USING (s)),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.n_sh AS n1, b.n_sh AS n2,
         count(*) AS common
  FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
metr AS (
  SELECT *,
         round(common / CAST(n1 + n2 - common AS DOUBLE), 6) AS jac,
         round(common / CAST(least(n1, n2) AS DOUBLE), 6) AS cont
  FROM pairs
),
near AS (SELECT DISTINCT doc2 AS doc_id FROM metr WHERE jac >= 0.5),
contd AS (
  SELECT DISTINCT doc2 AS doc_id FROM metr
  WHERE cont >= 0.8
    AND doc1 NOT IN (SELECT doc_id FROM near)
    AND doc2 NOT IN (SELECT doc_id FROM near)
),
tagged AS (
  SELECT s1.source, s1.n_chars,
         CASE WHEN s1.exact_dup THEN 'exact'
              WHEN s1.doc_id IN (SELECT doc_id FROM near) THEN 'near'
              WHEN s1.doc_id IN (SELECT doc_id FROM contd) THEN 'contained'
              ELSE 'kept' END AS verdict
  FROM s1
)
SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM tagged GROUP BY source, verdict
"""


QUERIES.update({"corpus_dedup_cascade": corpus_dedup_cascade})
ORACLES.update({"corpus_dedup_cascade": CORPUS_DEDUP_CASCADE_SQL})
