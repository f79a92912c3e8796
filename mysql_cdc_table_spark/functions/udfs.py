"""Python UDF surface: scalar pandas UDF, grouped-map applyInPandas,
grouped-agg pandas UDF, Python UDTF. (mapInPandas lives in
functions/multimodal.py — the decode stage.)

These exist to prove the full UDF surface of §2C; each body is
deterministic arithmetic so the result still gets an exact DuckDB
oracle — the point under test is the Arrow data path (JVM -> Python
batches -> JVM), schema handling, and grouping semantics, not the math.

Scale: pandas UDFs move Arrow record batches (10k rows per batch via
session conf), ~10-100x the throughput of row-at-a-time Python UDFs;
still strictly slower than builtins — production rule: builtins first
(everything outside this module), Arrow UDFs only for logic Spark
can't express (here: as a harness; multimodal decode is the real use).

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from mysql_cdc_table_spark.operators._util import t


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDFs are created inside the function: a module-level @pandas_udf
    # would be re-created at import time inside executor workers, where no
    # SparkSession exists.
    @pandas_udf("double")
    def net_price(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # same expression as the q1 charge term; vectorized over Arrow batches
        return ext * (1.0 - disc) * (1.0 + tax)

    li = t(spark, sf_dir, "lineitem")
    # round at 6: the product of 2-decimal factors is EXACT at 6 decimals,
    # so rounding tighter (e.g. 4) lands on .5 ties where Spark (decimal
    # HALF_UP on shortest repr) and DuckDB (binary half-away) disagree.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net_price("l_extendedprice", "l_discount", "l_tax"), 6).alias(
            "charge"
        ),
    )


UDF_PANDAS_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
"""


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["l_quantity"].mean()
    std = pdf["l_quantity"].std(ddof=1)  # sample std, matches stddev_samp
    z = (pdf["l_quantity"] - mean) / std if std and std > 0 else pdf["l_quantity"] * 0.0
    return pd.DataFrame(
        {
            "l_suppkey": pdf["l_suppkey"],
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "qty_z": z.round(6) + 0.0,  # collapse -0.0
        }
    )


def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: within-supplier quantity z-scores.
    One shuffle on the group key; each group becomes one pandas frame
    (group size must fit an executor — true of any keyed normalization)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").applyInPandas(
        _zscore_group,
        schema="l_suppkey long, l_orderkey long, l_linenumber int, qty_z double",
    )


UDF_GROUPED_MAP_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round((l_quantity - avg(l_quantity) OVER w)
             / stddev_samp(l_quantity) OVER w, 6) + 0.0 AS qty_z
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey)
"""


def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted average price."""

    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg_price("l_extendedprice", "l_quantity"), 4
            ).alias("wavg_price")
        )
    )


UDF_GROUPED_AGG_SQL = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


def udf_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): explode each order into per-100k
    price tranches — one input row, variable output rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, tranche int, tranche_amt double")
    class PriceTranches:
        def eval(self, o_orderkey: int, o_totalprice: float):
            remaining = o_totalprice
            tranche = 0
            while remaining > 0:
                amt = min(remaining, 100_000.0)
                yield o_orderkey, tranche, round(amt, 2)
                remaining -= 100_000.0
                tranche += 1

    spark.udtf.register("price_tranches", PriceTranches)
    t(spark, sf_dir, "orders").createOrReplaceTempView("_udtf_orders")
    return spark.sql(
        """
        SELECT p.o_orderkey, p.tranche, p.tranche_amt
        FROM _udtf_orders o,
             LATERAL price_tranches(o.o_orderkey, o.o_totalprice) p
        """
    )


UDF_UDTF_SQL = """
SELECT o_orderkey,
       CAST(g.t AS INTEGER) AS tranche,
       round(least(o_totalprice - g.t * 100000.0, 100000.0), 2) AS tranche_amt
FROM orders, LATERAL (
  SELECT unnest(range(0, CAST(ceil(o_totalprice / 100000.0) AS BIGINT))) AS t
) g
"""


QUERIES = {
    "udf_pandas_scalar": udf_pandas_scalar,
    "udf_grouped_map": udf_grouped_map,
    "udf_grouped_agg": udf_grouped_agg,
    "udf_udtf": udf_udtf,
}

ORACLES = {
    "udf_pandas_scalar": UDF_PANDAS_SCALAR_SQL,
    "udf_grouped_map": UDF_GROUPED_MAP_SQL,
    "udf_grouped_agg": UDF_GROUPED_AGG_SQL,
    "udf_udtf": UDF_UDTF_SQL,
}
