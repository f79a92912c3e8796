"""Deterministic synthetic changelog over the ``orders`` table.

The reference has no test fixtures (its repo ships zero tests); the
driver's oracle check needs a changelog both Spark and DuckDB can build
*identically*, so this recipe uses only exact arithmetic on
``o_orderkey`` (integer mod / multiply, exact double addition, timestamp
+ whole-day intervals) — no RNG, no engine-specific hashing:

- every order        -> INSERT        (__op=1, __gtid=k*10,   __tm=o_orderdate)
- keys with k%5==0   -> UPDATE pair 1 (__gtid=k*10+1, __tm=+1 day):
    before = current image (op=2), after (op=3): status='U',
    totalprice+100.0, and keys with k%15==5 transition
    o_orderpriority -> NULL (the reference's null-bit path,
    binlog_table_reader.cc:144-149)
- keys with k%10==0  -> UPDATE pair 2 (__gtid=k*10+2, __tm=+2 days):
    before = update-1 after image; after: status='U2', totalprice+300.0
- keys with k%7==0   -> DELETE        (__gtid=k*10+5, __tm=+3 days);
    tombstone carries the last-known image, as the reference decodes the
    delete row-image verbatim (binlog_table_reader.cc:248-313)

Updates always emit a 2-then-3 pair sharing __gtid/__event_seq with
__image_seq 0/1 (reference adjacency semantics, binlog_table_reader.cc:
385-388, :103-161). ``CHANGELOG_CTE`` is the DuckDB twin used by every
CDC oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_cdc_table_spark.catalog import load_table

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

ORDERS_TARGET_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def _k():
    return F.col("o_orderkey")


def _prio_after_update():
    """o_orderpriority after any update: NULL for k%15==5 keys."""
    return F.when(_k() % 15 == 5, F.lit(None).cast("string")).otherwise(
        F.col("o_orderpriority")
    )


def _meta(df: DataFrame, op: int, gtid_off: int, days: int, image_seq: int) -> DataFrame:
    return (
        df.withColumn("__op", F.lit(op).cast("int"))
        .withColumn("__gtid", (_k() * 10 + gtid_off).cast("long"))
        .withColumn("__tm", F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAY"))
        .withColumn("__file_seq", (_k() % 4).cast("int"))
        .withColumn("__event_seq", (_k() * 10 + gtid_off).cast("long"))
        .withColumn("__image_seq", F.lit(image_seq).cast("int"))
    )


def synthetic_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the orders changelog (UNION ALL of 6 branches) in ONE
    ``spark.sql`` call over ``CHANGELOG_CTE`` — the exact text the
    DuckDB oracles run, which Spark parses identically (verified
    value-for-value against the original per-branch DataFrame builder,
    kept below as ``synthetic_changelog_df`` for the parity test).

    One-shot SQL matters for wall time: the DataFrame builder chains
    ~50 intermediate Datasets and classic PySpark analyzes each one
    eagerly over the growing 6-branch plan — measured 0.66s of pure
    driver-side plan construction at any scale vs 0.15s for the single
    parse+analysis here (optimization guide §7.3: plan construction is
    single-threaded driver work). The physical plan is unchanged: each
    branch is a narrow projection of the same parquet scan with pushed
    filters, no shuffle at all; the changelog stays partition-local.
    """
    from mysql_cdc_table_spark.catalog import ensure_session_confs, load_table

    ensure_session_confs(spark)
    cols = ", ".join([*_ORDER_COLS, *_META_COLS])
    # orders rides in as a {df} placeholder through load_table (schema
    # cached — guide §1.2): a parquet.`path` reference re-infers the
    # footer schema on every build
    return spark.sql(
        "WITH orders AS (SELECT * FROM {t_orders}),\n"
        f"{CHANGELOG_CTE}\n"
        f"SELECT {cols} FROM changelog",
        t_orders=load_table(spark, sf_dir, "orders"),
    )


_META_COLS = [
    "__op",
    "__gtid",
    "__tm",
    "__file_seq",
    "__event_seq",
    "__image_seq",
]


def synthetic_changelog_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original per-branch DataFrame formulation of
    ``synthetic_changelog`` — semantically identical (asserted by
    tests/test_cdc.py parity), kept as the executable specification of
    the recipe."""
    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)

    ins = _meta(orders, 1, 0, 0, 0)

    upd_keys = orders.filter(_k() % 5 == 0)
    upd1_before = _meta(upd_keys, 2, 1, 1, 0)
    upd1_after = _meta(
        upd_keys.withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
        .withColumn("o_orderpriority", _prio_after_update()),
        3,
        1,
        1,
        1,
    )

    upd2_keys = orders.filter(_k() % 10 == 0)
    upd2_before = _meta(
        upd2_keys.withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
        .withColumn("o_orderpriority", _prio_after_update()),
        2,
        2,
        2,
        0,
    )
    upd2_after = _meta(
        upd2_keys.withColumn("o_orderstatus", F.lit("U2"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(300.0))
        .withColumn("o_orderpriority", _prio_after_update()),
        3,
        2,
        2,
        1,
    )

    del_keys = orders.filter(_k() % 7 == 0)
    tomb = (
        del_keys.withColumn(
            "o_orderstatus",
            F.when(_k() % 10 == 0, F.lit("U2"))
            .when(_k() % 5 == 0, F.lit("U"))
            .otherwise(F.col("o_orderstatus")),
        )
        .withColumn(
            "o_totalprice",
            F.when(_k() % 10 == 0, F.col("o_totalprice") + F.lit(300.0))
            .when(_k() % 5 == 0, F.col("o_totalprice") + F.lit(100.0))
            .otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(_k() % 5 == 0, _prio_after_update()).otherwise(
                F.col("o_orderpriority")
            ),
        )
    )
    dele = _meta(tomb, 0, 5, 3, 0)

    out = ins
    for branch in (upd1_before, upd1_after, upd2_before, upd2_after, dele):
        out = out.unionByName(branch)
    return out


def _image(status, price, prio) -> F.Column:
    """A row-image struct in ORDERS_TARGET_SCHEMA field order."""
    return F.struct(
        F.col("o_orderkey").alias("o_orderkey"),
        F.col("o_custkey").alias("o_custkey"),
        status.alias("o_orderstatus"),
        price.alias("o_totalprice"),
        F.col("o_orderdate").alias("o_orderdate"),
        prio.alias("o_orderpriority"),
    )


def _null_image() -> F.Column:
    return F.lit(None).cast(ORDERS_TARGET_SCHEMA)


def _source(gtid_off: int, days: int) -> F.Column:
    return F.struct(
        F.lit("tpch").alias("db"),
        F.lit("orders").alias("table"),
        (_k() * 10 + gtid_off).cast("long").alias("gtid"),
        F.format_string("binlog.%06d", (_k() % 4).cast("int")).alias("file"),
        (_k() * 10 + gtid_off).cast("long").alias("pos"),
        (
            F.unix_timestamp(F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAY"))
            * 1000
        ).alias("ts_ms"),
    )


def synthetic_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same changelog as Debezium-style JSON envelopes (one per event:
    updates are a single 'u' envelope carrying before+after — the decode
    path's update-unnest recreates the 2-row pair).

    The orders scan is one file at test scale; real envelope streams
    arrive in many files/partitions, so spread the source before the
    CPU-bound to_json/from_json stages (same narrow-input fix as
    dedup shingling)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(*_ORDER_COLS)
        .repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    )

    orig = _image(
        F.col("o_orderstatus"), F.col("o_totalprice"), F.col("o_orderpriority")
    )
    after1 = _image(
        F.lit("U"), F.col("o_totalprice") + F.lit(100.0), _prio_after_update()
    )
    after2 = _image(
        F.lit("U2"), F.col("o_totalprice") + F.lit(300.0), _prio_after_update()
    )
    tomb = _image(
        F.when(_k() % 10 == 0, F.lit("U2"))
        .when(_k() % 5 == 0, F.lit("U"))
        .otherwise(F.col("o_orderstatus")),
        F.when(_k() % 10 == 0, F.col("o_totalprice") + F.lit(300.0))
        .when(_k() % 5 == 0, F.col("o_totalprice") + F.lit(100.0))
        .otherwise(F.col("o_totalprice")),
        F.when(_k() % 5 == 0, _prio_after_update()).otherwise(
            F.col("o_orderpriority")
        ),
    )

    def env(op: str, before: F.Column, after: F.Column, gtid_off: int, days: int):
        return F.to_json(
            F.struct(
                F.lit(op).alias("op"),
                before.alias("before"),
                after.alias("after"),
                _source(gtid_off, days).alias("source"),
            )
        ).alias("value")

    ins = orders.select(env("c", _null_image(), orig, 0, 0))
    upd1 = orders.filter(_k() % 5 == 0).select(env("u", orig, after1, 1, 1))
    upd2 = orders.filter(_k() % 10 == 0).select(env("u", after1, after2, 2, 2))
    dele = orders.filter(_k() % 7 == 0).select(env("d", tomb, _null_image(), 5, 3))
    return ins.unionByName(upd1).unionByName(upd2).unionByName(dele)


# DuckDB twin of synthetic_changelog(); every CDC oracle starts with this CTE.
CHANGELOG_CTE = """
changelog AS (
  -- INSERT for every order
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority,
         1 AS __op, o_orderkey * 10 AS __gtid, o_orderdate AS __tm,
         CAST(o_orderkey % 4 AS INTEGER) AS __file_seq,
         o_orderkey * 10 AS __event_seq, 0 AS __image_seq
  FROM orders
  UNION ALL
  -- UPDATE 1 before-image
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority,
         2, o_orderkey * 10 + 1, o_orderdate + INTERVAL 1 DAY,
         CAST(o_orderkey % 4 AS INTEGER), o_orderkey * 10 + 1, 0
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  -- UPDATE 1 after-image
  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 100.0, o_orderdate,
         CASE WHEN o_orderkey % 15 = 5 THEN NULL ELSE o_orderpriority END,
         3, o_orderkey * 10 + 1, o_orderdate + INTERVAL 1 DAY,
         CAST(o_orderkey % 4 AS INTEGER), o_orderkey * 10 + 1, 1
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  -- UPDATE 2 before-image (= update-1 after image)
  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 100.0, o_orderdate,
         CASE WHEN o_orderkey % 15 = 5 THEN NULL ELSE o_orderpriority END,
         2, o_orderkey * 10 + 2, o_orderdate + INTERVAL 2 DAY,
         CAST(o_orderkey % 4 AS INTEGER), o_orderkey * 10 + 2, 0
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  -- UPDATE 2 after-image
  SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 300.0, o_orderdate,
         CASE WHEN o_orderkey % 15 = 5 THEN NULL ELSE o_orderpriority END,
         3, o_orderkey * 10 + 2, o_orderdate + INTERVAL 2 DAY,
         CAST(o_orderkey % 4 AS INTEGER), o_orderkey * 10 + 2, 1
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  -- DELETE with last-known tombstone image
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'U2'
              WHEN o_orderkey % 5 = 0 THEN 'U'
              ELSE o_orderstatus END,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 300.0
              WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END,
         o_orderdate,
         CASE WHEN o_orderkey % 5 = 0
              THEN (CASE WHEN o_orderkey % 15 = 5 THEN NULL
                         ELSE o_orderpriority END)
              ELSE o_orderpriority END,
         0, o_orderkey * 10 + 5, o_orderdate + INTERVAL 3 DAY,
         CAST(o_orderkey % 4 AS INTEGER), o_orderkey * 10 + 5, 0
  FROM orders WHERE o_orderkey % 7 = 0
)
"""
