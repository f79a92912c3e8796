"""Second-wave coverage: union distinct, the SQL entry point over
registered views, extra string/bitwise functions, nth_value /
ignore-nulls windows, outer explode, collect aggregates, and the salted
skew join (result-identical to the plain join, by oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import register_views
from mysql_cdc_table_spark.operators._util import t
from mysql_cdc_table_spark.operators.skew import salted_join


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.unionByName(b).distinct()


SET_UNION_DISTINCT_SQL = """
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


_SHARED_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def sql_entrypoint_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry point over the registered view catalog — the
    exact SQL string the DuckDB oracle runs also runs on Spark (shared
    ANSI dialect), mirroring how the reference's users live entirely in
    MySQL SQL."""
    register_views(spark, sf_dir)
    return spark.sql(_SHARED_Q1)


def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.reverse("c_name").alias("name_rev"),
        F.instr("c_name", "mer").alias("pos_mer"),
        F.split_part("c_name", F.lit("#"), F.lit(1)).alias("name_stem"),
        (F.instr("c_mktsegment", "ING") > 0).alias("has_ing"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.left("c_name", F.lit(4)).alias("l4"),
        F.right("c_name", F.lit(3)).alias("r3"),
    )


FN_STRING2_SQL = """
SELECT c_custkey,
       repeat('ab', 3) AS rep,
       reverse(c_name) AS name_rev,
       strpos(c_name, 'mer') AS pos_mer,
       split_part(c_name, '#', 1) AS name_stem,
       strpos(c_mktsegment, 'ING') > 0 AS has_ing,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       left(c_name, 4) AS l4,
       right(c_name, 3) AS r3
FROM customer
"""


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a, b = F.col("l_orderkey"), F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        a.bitwiseAND(b).alias("band"),
        a.bitwiseOR(b).alias("bor"),
        a.bitwiseXOR(b).alias("bxor"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("shl"),
        F.shiftright(a, 2).alias("shr"),
        F.bit_count(a).alias("popcount"),
    )


FN_BITWISE_SQL = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & l_partkey AS band,
       l_orderkey | l_partkey AS bor,
       xor(l_orderkey, l_partkey) AS bxor,
       CAST(l_linenumber << 3 AS INTEGER) AS shl,
       l_orderkey >> 2 AS shr,
       CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
FROM lineitem
"""


def window_nth_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + last(ignore nulls) over a derived nullable column."""
    o = t(spark, sf_dir, "orders").withColumn(
        "big_price", F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice"))
    )
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.last("big_price", ignorenulls=True).over(run).alias("last_big_so_far"),
    )


WINDOW_NTH_IGNORE_NULLS_SQL = """
WITH o AS (
  SELECT *, CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price
  FROM orders
)
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 2) OVER wfull AS second_price,
       last_value(big_price IGNORE NULLS) OVER wrun AS last_big_so_far
FROM o
WINDOW wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: rows with empty arrays survive with NULLs (the
    outer-unnest semantics plain explode drops)."""
    d = t(spark, sf_dir, "documents")
    longtok = F.filter(
        F.split(F.col("text"), " "), lambda x: F.length(x) >= 9
    )
    return d.select(
        "doc_id", F.posexplode_outer(longtok).alias("pos", "tok")
    )


EXPLODE_OUTER_TOKENS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) >= 9) AS tk
  FROM documents
),
padded AS (
  SELECT doc_id, CASE WHEN len(tk) = 0 THEN [NULL] ELSE tk END AS tk2 FROM d
)
SELECT doc_id,
       CASE WHEN u.val IS NULL AND u.pos = 1 AND len(tk2) = 1
            THEN NULL ELSE CAST(u.pos - 1 AS INTEGER) END AS pos,
       u.val AS tok
FROM padded,
     LATERAL (SELECT unnest(tk2) AS val, generate_subscripts(tk2, 1) AS pos) u
"""


def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set made deterministic via sort_array (bare
    collect order is partition-dependent — never hash unsorted lists), then
    joined to strings (the driver's value-hasher cannot hash list cells)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("order_keys"),
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.size(F.collect_set("o_orderpriority")).alias("n_prios"),
    )


AGG_COLLECT_SORTED_SQL = """
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
         AS statuses,
       CAST(count(DISTINCT o_orderpriority) AS INTEGER) AS n_prios
FROM orders GROUP BY o_custkey
"""


def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace / regexp_count / regexp_like / regexp_substr over
    document text (patterns chosen where Java and RE2-ish dialects agree)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("table")).alias("n_table"),
        F.regexp_like(F.col("text"), F.lit("^[a-z]")).alias("starts_lower"),
        F.substring(
            F.regexp_replace(F.col("text"), "[aeiou]", "_"), 1, 40
        ).alias("devoweled_40"),
        F.regexp_substr(F.col("text"), F.lit("[a-z]{6,}")).alias("first_long_word"),
    )


FN_REGEX_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, 'table')) AS INTEGER) AS n_table,
       regexp_matches(text, '^[a-z]') AS starts_lower,
       substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_40,
       nullif(regexp_extract(text, '[a-z]{6,}'), '') AS first_long_word
FROM documents
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection, multiplicity = min of sides)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select("l_orderkey")
    b = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    return a.intersectAll(b)


SET_INTERSECT_ALL_SQL = """
SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
INTERSECT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
"""


def fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array batch: flatten, arrays_zip, array_join, array_repeat,
    sequence, array_position, array_remove."""
    e = t(spark, sf_dir, "embeddings")
    # "+ 0.0" collapses IEEE negative zero: Spark round() returns +0.0 for
    # tiny negatives (BigDecimal) while DuckDB round() keeps -0.0
    head = F.transform(
        F.slice("embedding", 1, 3), lambda x: F.round(x.cast("double"), 4) + F.lit(0.0)
    )
    # every output column is scalar: the driver's value-hasher cannot hash
    # list cells, so arrays are surfaced via array_join/size.
    dec_str = lambda x: x.cast("decimal(10,4)").cast("string")  # noqa: E731
    return e.select(
        "vec_id",
        # double->string rendering differs across engines (-3.0E-4 vs
        # -0.0003): route through DECIMAL for fixed-point text both sides
        F.array_join(
            F.transform(F.flatten(F.array(head, head)), dec_str), "|"
        ).alias("doubled"),
        F.array_join(F.transform(head, dec_str), "|").alias("joined"),
        F.array_join(
            F.array_repeat(F.col("label").cast("string"), 3), ","
        ).alias("label3"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.col("label") % 4) + 1),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("seq_to_label"),
        F.array_position(
            F.sort_array(head, asc=False), F.array_max(head)
        ).alias("max_pos"),
        F.size(
            F.array_remove(F.array_repeat(F.col("label"), 3), F.col("label"))
        ).alias("n_removed"),
    )


FN_ARRAY2_SQL = """
WITH h AS (
  SELECT vec_id, label,
         list_transform(embedding[1:3],
                        x -> round(CAST(x AS DOUBLE), 4) + 0.0) AS head
  FROM embeddings
)
SELECT vec_id,
       array_to_string(list_transform(flatten([head, head]),
           x -> CAST(CAST(x AS DECIMAL(10,4)) AS VARCHAR)), '|') AS doubled,
       array_to_string(list_transform(head,
           x -> CAST(CAST(x AS DECIMAL(10,4)) AS VARCHAR)), '|') AS joined,
       array_to_string([label, label, label], ',') AS label3,
       array_to_string(range(1, (label % 4) + 2), ',') AS seq_to_label,
       CAST(list_position(list_reverse(list_sort(head)), list_max(head))
            AS BIGINT) AS max_pos,
       0 AS n_removed
FROM h
"""


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket + grouped counts."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(20)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# DuckDB 1.0 lacks width_bucket — same semantics arithmetically:
# bucket 0 below range, n+1 above, else floor((x-min)/width)+1
AGG_HISTOGRAM_SQL = """
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 500000.0 THEN 21
            ELSE floor(o_totalprice / 25000.0) + 1 END AS BIGINT) AS bucket,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg equivalent):
    deterministic via sorted collect."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
        ).alias("keys_csv")
    )


AGG_STRING_AGG_SQL = """
SELECT o_custkey,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
         AS keys_csv
FROM orders WHERE o_custkey <= 50 GROUP BY o_custkey
"""


def fn_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions: try_divide / try_cast return NULL instead
    of failing the task (at 100 TB one poison row must not kill a stage)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("user_id") % 3).alias("div_maybe"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_or_null"),
        F.col("event_type").try_cast("double").alias("never_a_number"),
    )


FN_TRY_OPS_SQL = """
SELECT event_id,
       CASE WHEN user_id % 3 = 0 THEN NULL
            ELSE value / (user_id % 3) END AS div_maybe,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_or_null,
       TRY_CAST(event_type AS DOUBLE) AS never_a_number
FROM events
"""


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — result must equal the plain join (the oracle IS
    the plain join), while spreading each key across 8 sub-keys."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li,
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        key="l_orderkey",
        salts=8,
        salt_col=(F.col("l_linenumber") % 8),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("rev"),
    )


JOIN_SALTED_SQL = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(l_extendedprice), 2) AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


_LATERAL_SQL = """
SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
FROM orders o, LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber
  LIMIT 2
) l
WHERE o.o_orderkey % 50 = 0
"""


def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per-order
    top-2 priciest lineitems. A distinct operator shape from the
    window-function top-k: the per-row dependent subquery, which
    Catalyst decorrelates into a ranked join. The identical SQL string
    runs on both engines (shared ANSI dialect)."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_UNPIVOT_SQL = """
SELECT o_orderkey, metric, val
FROM (SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS price,
             CAST(o_custkey AS DOUBLE) AS cust
      FROM orders)
UNPIVOT (val FOR metric IN (price, cust))
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): each order row becomes one row per
    metric — the inverse of agg_pivot, SQL-standard syntax shared by
    both engines verbatim."""
    register_views(spark, sf_dir)
    return spark.sql(_UNPIVOT_SQL)


# agg_collect_sorted / fn_array2 lead: their round-1 array-typed output
# columns were scalarized for the driver's hasher and need a green row.
QUERIES = {
    "join_lateral_topn": join_lateral_topn,
    "unpivot_metrics": unpivot_metrics,
    "agg_collect_sorted": agg_collect_sorted,
    "fn_array2": fn_array2,
    "join_salted": join_salted,
    "set_union_distinct": set_union_distinct,
    "sql_entrypoint_views": sql_entrypoint_views,
    "fn_string2": fn_string2,
    "fn_bitwise": fn_bitwise,
    "window_nth_ignore_nulls": window_nth_ignore_nulls,
    "explode_outer_tokens": explode_outer_tokens,
    "fn_regex": fn_regex,
    "set_intersect_all": set_intersect_all,
    "agg_histogram": agg_histogram,
    "agg_string_agg": agg_string_agg,
    "fn_try_ops": fn_try_ops,
}

ORACLES = {
    "join_lateral_topn": _LATERAL_SQL,
    "unpivot_metrics": _UNPIVOT_SQL,
    "set_union_distinct": SET_UNION_DISTINCT_SQL,
    "sql_entrypoint_views": _SHARED_Q1,
    "fn_string2": FN_STRING2_SQL,
    "fn_bitwise": FN_BITWISE_SQL,
    "window_nth_ignore_nulls": WINDOW_NTH_IGNORE_NULLS_SQL,
    "explode_outer_tokens": EXPLODE_OUTER_TOKENS_SQL,
    "agg_collect_sorted": AGG_COLLECT_SORTED_SQL,
    "join_salted": JOIN_SALTED_SQL,
    "fn_regex": FN_REGEX_SQL,
    "set_intersect_all": SET_INTERSECT_ALL_SQL,
    "fn_array2": FN_ARRAY2_SQL,
    "agg_histogram": AGG_HISTOGRAM_SQL,
    "agg_string_agg": AGG_STRING_AGG_SQL,
    "fn_try_ops": FN_TRY_OPS_SQL,
}
