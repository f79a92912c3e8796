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
# prediction agreement per sf: 0.70/0.60/0.55 at sf0.001/0.01/0.1
# (n_probe=3 of 8 trained cells; re-measured in tests/test_round7.py
# at the per-sf level).
KNN_IVF_AGREE_FLOOR = 0.3
KNN_IVF_N_PROBE = 3
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
    dims, broadcast), keep the top ``KNN_IVF_N_PROBE``, and score only
    corpus rows in a probed cell — at scale the cell id is the storage
    partition key, so the probe prunes partitions at the scan and
    per-query work drops from |corpus| to ~n_probe/|cells| of it.
    Voting stage: identical to the exact classifier (top-5 by rounded
    cosine + vec_id tiebreak, majority label, ties → smaller label).

    Driver contract (round-6 recall-bound idiom): output = the EXACT
    classifier's rows plus ``ivf_agree_ok`` asserting the IVF-pruned
    prediction matches the exact prediction on ≥ KNN_IVF_AGREE_FLOOR of
    queries (measured agreement 0.70/0.60/0.55 at sf0.001/0.01/0.1;
    floor 0.3 with margin — these embeddings are near-uniform, so
    3-of-8-cell pruning legitimately misses scattered neighbours; a
    candidate-pruning regression that collapses agreement still turns
    the driver row red)."""
    from mysql_cdc_table_spark.functions.similarity import (
        cosine,
        kmeans_cells,
        sq_dist,
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
    cents = (
        ec.select("cid", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
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
        .filter(F.col("crk") <= KNN_IVF_N_PROBE)
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
    agree = exact.join(ivf, "qid").agg(
        (
            F.count_if(F.col("pred_label") == F.col("ivf_label"))
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
