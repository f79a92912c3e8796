"""Round-13 operators: BPE merge training on the word-frequency grid,
and equi-height column histograms (the ANALYZE-histogram surface).

Both follow the repo's aggregate-once / iterate-on-the-grid identity:
the corpus (or fact table) is scanned once into a bounded grid, and
everything iterative or sorted happens on the grid — never on raw
rows. Reference tie-ins: MySQL 8's ``ANALYZE TABLE ... UPDATE
HISTOGRAM`` builds exactly the equi-height buckets
``stats_column_histogram`` emits (the reference handler delegates all
stats to that machinery — ``binlogdb.h:178-187`` stubs the costs and
relies on server stats); BPE merge training is the canonical
LLM-tokenizer preprocessing pass over a corpus this engine's
documents table models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t

QUERIES: dict = {}
ORACLES: dict = {}


# --- BPE merge training ------------------------------------------------------
#
# Classic byte-pair-encoding vocabulary training (Sennrich et al. 2016,
# public algorithm): repeatedly merge the most frequent adjacent symbol
# pair. The production trick that makes it Spark-shaped: pair counts
# are a linear function of the WORD-FREQUENCY table, so the corpus is
# scanned ONCE into a (word, count) grid (map-side combinable,
# vocabulary-bounded) and every merge iteration runs on that grid —
# pair explode + hash agg + top-1 — never on raw documents. Per-step
# driver state is ONE (a, b) pair (the documented bounded-scalar
# class). The symbolization rides a string with double-space
# separators (" s  c  a  n "), which makes greedy left-to-right merge
# application a single non-overlapping replace(" a  b " -> " ab ") —
# the consumed boundary spaces are exactly restored by the
# replacement, so consecutive occurrences ("a b a b") merge correctly
# in one pass, identically in Spark and DuckDB.

BPE_MERGES = 6


def _bpe_word_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass -> (word, cnt, s) with s the spaced char
    symbolization. The only corpus-sized job in the key."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "s",
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("word"), ""), "  "),
                F.lit(" "),
            ),
        )
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str, merges: int = BPE_MERGES
) -> tuple[list, DataFrame]:
    """Run the ``merges``-step training loop; return (per-step rows,
    final word grid). Shared by the train key (emits the steps) and
    the apply key (tokenizes through the final grid). The registry
    keys run BPE_MERGES steps (the oracle CTE chain depth); pytest
    additionally drives ~200 merges to prove the localCheckpoint-per-
    step loop holds a FLAT per-merge cost (no lineage growth) at
    realistic vocabulary-training depths."""
    import time as _time

    grid = _bpe_word_grid(spark, sf_dir).localCheckpoint(eager=False)
    out_rows = []
    step_walls: list[float] = []  # surfaced on the returned rows list
    for step in range(1, merges + 1):
        _t0 = _time.monotonic()
        syms = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            grid.select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        syms.alias("a"),
                        F.slice(syms, 2, 1 << 20).alias("b"),
                    )
                ).alias("pr"),
            )
            .filter(F.col("pr.b").isNotNull())
            .groupBy(
                F.col("pr.a").alias("a"), F.col("pr.b").alias("b")
            )
            .agg(F.sum("cnt").cast("long").alias("pc"))
        )
        top = pairs.orderBy(
            F.col("pc").desc(), F.col("a").asc(), F.col("b").asc()
        ).first()  # bounded: ONE row per step, the merge decision
        if top is None:
            # tiny/degenerate corpus: every word is a single symbol
            # before the merge budget is spent — the vocabulary is
            # fully merged, stop (advisor finding, round 13)
            break
        a, b, pc = top["a"], top["b"], top["pc"]
        grid = grid.withColumn(
            "s",
            # literal replace (not regex) — non-overlapping left-to-
            # right, the greedy BPE application; the double-space
            # invariant restores itself (see module docstring)
            F.replace(
                F.col("s"),
                F.lit(f" {a}  {b} "),
                F.lit(f" {a}{b} "),
            ),
        ).localCheckpoint(eager=False)
        tokens_after = grid.select(
            F.sum(
                F.col("cnt") * F.size(F.split(F.trim(F.col("s")), "  "))
            ).cast("long")
        ).first()[0]
        out_rows.append((step, a, b, int(pc), int(tokens_after)))
        step_walls.append(_time.monotonic() - _t0)
    # expose per-step walls without changing the return shape: pytest
    # reads them to assert the per-merge cost stays FLAT at depth
    # (lineage-growth detection); the keys ignore the attribute
    _bpe_train.last_step_walls = step_walls  # type: ignore[attr-defined]
    return out_rows, grid


def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train BPE_MERGES byte-pair merges over the documents corpus and
    emit, per step: the merged pair, its weighted frequency at the
    moment of the merge, and the total weighted token count AFTER
    applying it — so the value hash covers both the DECISION sequence
    (a wrong pair count or tiebreak reorders the merges) and the
    APPLICATION (a merge that misses an occurrence shifts every later
    token count). Ties break (count desc, a asc, b asc),
    deterministically in both engines.

    Scale: the corpus pass is one map-side word count; each of the k
    iterations is a pair explode + hash agg over the distinct-word
    grid (vocabulary-bounded, broadcast-sized) plus one bounded
    scalar collect — cost is k * O(vocab), independent of corpus
    row count."""
    out_rows, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        out_rows,
        "step int, sym_a string, sym_b string, pair_cnt bigint, "
        "tokens_after bigint",
    ).orderBy("step")


def text_bpe_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INFERENCE half of BPE: tokenize the corpus through the
    trained merges and report per-source budget stats — document
    count, word count, BPE token count, and the chars-per-token ratio
    in basis points (the number a pretraining-data pipeline actually
    budgets against). The tokenizer is the final word grid itself
    (word -> token count is a pure function of the trained merges), so
    applying BPE to the corpus is ONE broadcast vocab join — no
    per-document merge replay, no UDF. Exact integers end to end:
    chars_per_token_bp = floor(10000 * total_chars / total_tokens).

    Scale: train cost is the other key's (one corpus pass + grid
    iterations); apply cost is one corpus scan joined to the
    broadcast-sized vocabulary — the same plan as any dimension
    enrichment."""
    _, grid = _bpe_train(spark, sf_dir)
    tok = grid.select(
        "word",
        F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_chars"),
    )
    words = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        words.join(F.broadcast(tok), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(10000 * sum(n_chars) DIV sum(n_tok) AS BIGINT)"
            ).alias("chars_per_token_bp"),
        )
        .orderBy("source")
    )


def _bpe_cte_prefix(k: int = BPE_MERGES) -> str:
    """The WITH-chain replaying k merges to w{k} (shared by the train
    oracle and the tokenize-apply oracle)."""
    parts = [
        """
WITH wc AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(str_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
),
w0 AS MATERIALIZED (
  SELECT word, cnt,
         ' ' || array_to_string(str_split(word, ''), '  ') || ' ' AS s
  FROM wc
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
p{i} AS MATERIALIZED (
  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(cnt) AS BIGINT) AS pc
  FROM (SELECT cnt, unnest(list_zip(sy, sy[2:])) AS pr
        FROM (SELECT cnt, str_split(trim(s), '  ') AS sy FROM w{i - 1}))
  WHERE pr[2] IS NOT NULL GROUP BY 1, 2
),
m{i} AS MATERIALIZED (SELECT a, b, pc FROM p{i} ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
w{i} AS MATERIALIZED (
  SELECT word, cnt,
         replace(s, ' ' || (SELECT a FROM m{i}) || '  '
                      || (SELECT b FROM m{i}) || ' ',
                    ' ' || (SELECT a FROM m{i})
                      || (SELECT b FROM m{i}) || ' ') AS s
  FROM w{i - 1}
)"""
        )
    return "".join(parts)


def _bpe_oracle_sql(k: int = BPE_MERGES) -> str:
    """The same k merge steps as one chained-CTE DuckDB query."""
    steps = "\nUNION ALL\n".join(
        f"""SELECT {i} AS step, (SELECT a FROM m{i}) AS sym_a,
       (SELECT b FROM m{i}) AS sym_b, (SELECT pc FROM m{i}) AS pair_cnt,
       (SELECT CAST(sum(cnt * len(str_split(trim(s), '  '))) AS BIGINT)
        FROM w{i}) AS tokens_after"""
        for i in range(1, k + 1)
    )
    return (
        _bpe_cte_prefix(k)
        + f"\nSELECT * FROM (\n{steps}\n) ORDER BY step"
    )


TEXT_BPE_TRAIN_MERGES_SQL = _bpe_oracle_sql()

TEXT_BPE_TOKENIZE_APPLY_SQL = (
    _bpe_cte_prefix()
    + f""",
tok AS MATERIALIZED (
  SELECT word,
         CAST(len(str_split(trim(s), '  ')) AS BIGINT) AS n_tok,
         CAST(len(word) AS BIGINT) AS n_chars
  FROM w{BPE_MERGES}
),
dw AS (
  SELECT doc_id, source, word
  FROM (SELECT doc_id, source,
               unnest(str_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> ''
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(10000 * sum(n_chars) // sum(n_tok) AS BIGINT)
         AS chars_per_token_bp
FROM dw JOIN tok USING (word)
GROUP BY source ORDER BY source
"""
)


# --- equi-height column histograms -------------------------------------------


HIST_BUCKETS = 8


def _hist_one_column(
    vals: DataFrame, colname: str, n_parts: int = 32
) -> DataFrame:
    """Equi-height buckets for one (val, rid) relation via the
    DISTRIBUTED global rank: range-partition on (val, rid), rank
    locally inside each partition (a per-partition window — parallel,
    never one task), then add broadcast prefix offsets from the
    P-sized per-partition count grid (the shard_manifest two-level
    prefix-sum idiom). The global rank is identical for ANY disjoint
    ordered range boundaries, so the bucketing does not depend on the
    range sampler."""
    from pyspark.sql import Window

    part = (
        vals.repartitionByRange(n_parts, "val", "rid")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # feeds counts AND the rank pass
    )
    counts = part.groupBy("pid").agg(F.count("*").alias("c"))
    woff = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # P-sized grid: a driver-light window, never data-sized
    offs = counts.select(
        "pid",
        F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    wloc = Window.partitionBy("pid").orderBy("val", "rid")
    ranked = (
        part.join(F.broadcast(offs), "pid")
        .select(
            "val",
            (
                (F.row_number().over(wloc) + F.col("off") - 1)
                * HIST_BUCKETS
            ).alias("scaled"),
            "n_total",
        )
        .select(
            "val",
            F.expr("scaled div n_total").alias("bucket"),
        )
    )
    hist = ranked.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.countDistinct("val").cast("long").alias("ndv"),
    )
    cum = Window.orderBy("bucket")  # K-sized grid
    return hist.select(
        F.lit(colname).alias("col"),
        "bucket",
        "n_rows",
        "min_val",
        "max_val",
        "ndv",
        F.sum("n_rows").over(cum).cast("long").alias("cum_rows"),
    )


def stats_column_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL-8-style equi-height histograms (``ANALYZE TABLE ...
    UPDATE HISTOGRAM WITH N BUCKETS``) for two orders columns — price
    cents and custkey: deterministic total order (value, then
    o_orderkey so the bucketing is unique), bucket id
    floor((rn-1)*K/n), then per-bucket rows / min / max / NDV and the
    cumulative row count the optimizer's selectivity math consumes.
    The reference delegates exactly this to MySQL's server stats
    (its handler stubs costs, binlogdb.h:178-187); here the histogram
    BUILD is the distributed operator.

    Scale: the global rank is the two-level form — range partition,
    per-partition window, broadcast P-sized prefix offsets — so no
    single task ever sorts a whole column (the first cut used one
    col-partitioned window and measured 5.9x at 10x data; this form
    measures ~1.3x). Production histograms additionally sample or
    use the percentile sketch; the exact variant is the
    oracle-checkable contract."""
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("val"),
        F.col("o_orderkey").alias("rid"),
    )
    custkey = o.select(
        F.col("o_custkey").cast("long").alias("val"),
        F.col("o_orderkey").alias("rid"),
    )
    return (
        _hist_one_column(cents, "cents")
        .unionByName(_hist_one_column(custkey, "custkey"))
        .orderBy("col", "bucket")
    )


STATS_COLUMN_HISTOGRAM_SQL = f"""
WITH vals AS (
  SELECT 'cents' AS col, CAST(floor(o_totalprice * 100) AS BIGINT) AS val,
         o_orderkey AS rid
  FROM orders
  UNION ALL
  SELECT 'custkey', CAST(o_custkey AS BIGINT), o_orderkey FROM orders
),
bucketed AS (
  SELECT col, val,
         ((row_number() OVER (PARTITION BY col ORDER BY val, rid) - 1)
              * {HIST_BUCKETS})
              // count(*) OVER (PARTITION BY col) AS bucket
  FROM vals
),
hist AS (
  SELECT col, bucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(val) AS min_val, max(val) AS max_val,
         CAST(count(DISTINCT val) AS BIGINT) AS ndv
  FROM bucketed GROUP BY col, bucket
)
SELECT col, bucket, n_rows, min_val, max_val, ndv,
       CAST(sum(n_rows) OVER (PARTITION BY col ORDER BY bucket)
            AS BIGINT) AS cum_rows
FROM hist ORDER BY col, bucket
"""


QUERIES.update(
    {
        "text_bpe_train_merges": text_bpe_train_merges,
        "text_bpe_tokenize_apply": text_bpe_tokenize_apply,
        "stats_column_histogram": stats_column_histogram,
    }
)
ORACLES.update(
    {
        "text_bpe_train_merges": TEXT_BPE_TRAIN_MERGES_SQL,
        "text_bpe_tokenize_apply": TEXT_BPE_TOKENIZE_APPLY_SQL,
        "stats_column_histogram": STATS_COLUMN_HISTOGRAM_SQL,
    }
)
