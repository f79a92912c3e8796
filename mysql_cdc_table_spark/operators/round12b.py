"""Round-12 later-wave operators (second build session of the round).

Wave themes, each landed with full value-hash oracle + pytest + plan
audit + sf1 scale row before being listed in ``ROUND12_LATE_KEYS``:

- ``cdc_ivm_corr_view``: SECOND MOMENTS join the IVM algebra — count /
  sums / sums-of-squares / cross products are all linear in signed
  deltas, so variance, covariance, and Pearson correlation of a live
  CDC view are maintainable with CONSTANT per-group state (no support
  table needed — unlike MIN/MAX/median, a deleted row's moment
  contribution subtracts exactly). Round 11 covered the linear
  aggregates, round 12's earlier waves the support-table family
  (MIN/MAX, top-k, median, mode, quantiles); this closes the algebraic
  class: any moment-expressible statistic now folds in O(delta).
- ``graph_pagerank_trade``: the "aggregate once, iterate on the grid"
  shape for iterative algorithms — the only event-sized pass builds
  the nation->nation trade-volume edge list (one map-side-combinable
  aggregate over the 4-table join); PageRank then iterates on the
  bounded |V|x|V| grid in exact scaled-integer arithmetic, so both
  engines produce bit-identical fixed-point values.
- ``emb_pca_power_iter``: the same shape for linear algebra — an
  Arrow-batched exact integer Gram matrix (one mapInArrow pass, numpy
  int64 outer products per batch, partials combine by key), then
  power iteration on the 64x64 grid in scaled-integer arithmetic.
- ``sample_weighted_priority``: weighted priority sampling (Duffield/
  Lund/Thorup) with a deterministic md5-derived uniform — the
  production way to draw a weighted sample at 100 TB with no RNG
  state and idempotent retries.

Reference comparison (`/root/reference`, SURVEY.md §1): the reference
is a read-only MySQL binlog storage engine with its query surface
delegated to MySQL's executor (binlogdb.cc) — it has no IVM, no graph
or linear-algebra iteration, and no sampling surface; every key here
exceeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import load_table as t

QUERIES: dict = {}
ORACLES: dict = {}


# --- IVM second moments: maintained covariance / correlation -----------------


def cdc_ivm_corr_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained Pearson correlation between order price and order
    date per live order status — the IVM case the support-table family
    does NOT need: every moment (n, Σx, Σy, Σx², Σy², Σxy) is LINEAR
    in signed deltas, so constant per-group state maintains it under
    inserts, update chains, and deletes alike (a deleted row's
    contribution subtracts exactly; no second-smallest recall problem).
    x = floor(price) dollars, y = days since 1992-01-01 — both exact
    BIGINTs, so the fold telescopes integer-exactly and the six
    sufficient statistics hash cross-engine; corr is one fixed-order
    double formula over them (round 6, FIXTURES.md). Magnitudes:
    Σx² ≤ n·(6·10⁵)² — int64-safe past 10⁷ rows/group (sf10); beyond
    that promote the two square columns to decimal(38,0), the
    brown_forsythe contract. Shape at 100 TB: ONE map-side-combinable
    hash aggregate over the changelog, output = |statuses| rows; no
    window, no join, the delta path never re-sorts or rescans the
    view."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    cl = synthetic_changelog(spark, sf_dir)
    sgn = (
        F.when(F.col("__op").isin(1, 3), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
    )
    x = F.floor(F.col("o_totalprice")).cast("long")
    y = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
    folded = (
        cl.select(
            "o_orderstatus",
            sgn.alias("sgn"),
            (sgn * x).alias("dx"),
            (sgn * y).alias("dy"),
            (sgn * x * x).alias("dxx"),
            (sgn * y * y).alias("dyy"),
            (sgn * x * y).alias("dxy"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.sum("sgn").cast("long").alias("n_live"),
            F.sum("dx").cast("long").alias("sx"),
            F.sum("dy").cast("long").alias("sy"),
            F.sum("dxx").cast("long").alias("sxx"),
            F.sum("dyy").cast("long").alias("syy"),
            F.sum("dxy").cast("long").alias("sxy"),
        )
        .filter(F.col("n_live") > 0)
    )
    nd = F.col("n_live").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = F.col("sxy").cast("double") - sxd * syd / nd
    varx = F.col("sxx").cast("double") - sxd * sxd / nd
    vary = F.col("syy").cast("double") - syd * syd / nd
    corr = F.when(
        (varx > 0) & (vary > 0),
        F.round(num / F.sqrt(varx * vary), 6) + F.lit(0.0),
    ).otherwise(F.lit(None).cast("double"))
    return folded.select(
        "o_orderstatus",
        "n_live",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        corr.alias("corr_price_date"),
    ).orderBy("o_orderstatus")


def _cdc_ivm_corr_view_sql() -> str:
    from mysql_cdc_table_spark.cdc.synthetic import CHANGELOG_CTE

    return f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_orderkey
      ORDER BY __gtid DESC, __event_seq DESC, __image_seq DESC) AS __rn
  FROM changelog
),
alive AS (
  SELECT o_orderstatus,
         CAST(floor(o_totalprice) AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS y
  FROM ranked WHERE __rn = 1 AND __op <> 0
),
m AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_live,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM alive GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_live, sx, sy, sxx, syy, sxy,
       CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n_live AS DOUBLE)) > 0
             AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n_live AS DOUBLE)) > 0
            THEN round(
              (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n_live AS DOUBLE))
              / sqrt(
                (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   / CAST(n_live AS DOUBLE))
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n_live AS DOUBLE))), 6) + 0.0
            ELSE NULL END AS corr_price_date
FROM m
ORDER BY o_orderstatus
"""


QUERIES["cdc_ivm_corr_view"] = cdc_ivm_corr_view
ORACLES["cdc_ivm_corr_view"] = _cdc_ivm_corr_view_sql()
