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
