"""Type-strict oracle sweep (closes the round-5 red-row class).

The round-5 driver red (``window_first_seen_cum``) was invisible
locally: DuckDB typed the windowed SUM as HUGEINT (int128) where Spark
returns BIGINT.  Values were equal as Python ints, so the value compare
in tests/_parity.py passed — but the driver's value hash goes through
pandas dtypes, where an object-dtype int128 column and an int64 column
hash differently.  This sweep makes the local harness fail exactly
where the driver fails: DESCRIBE every oracle in DuckDB (plan-only, no
execution), take every Spark query's analyzed schema, and reject any
shared column whose two sides land in different numeric hash classes —
HUGEINT/UHUGEINT/DECIMAL on the oracle side against an integral or
floating Spark column, or an int/float split between the engines.

DuckDB types SUM over any integer column as HUGEINT, so every uncast
``sum(...)`` in an oracle is caught here; the repo convention is
``CAST(... AS BIGINT)`` (cf. operators/round5.py CDC audits).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from mysql_cdc_table_spark.operators import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()

_DUCK_NUMERIC = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "hugeint",
    "UHUGEINT": "hugeint",
    "FLOAT": "float",
    "DOUBLE": "float",
}


def _duck_class(type_name: str) -> str | None:
    """Numeric hash class of a DuckDB type string, else None."""
    base = type_name.strip().upper()
    if base.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_NUMERIC.get(re.sub(r"\(.*", "", base))


def _spark_class(dt: T.DataType) -> str | None:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    return None


_DESCRIBE_CACHE: dict[str, list[tuple[str, str]]] = {}


def _describe_oracle(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, duckdb type) pairs for an oracle — DESCRIBE binds and
    plans the query against the sf views without executing it."""
    if sql not in _DESCRIBE_CACHE:
        from tests._parity import connect_views

        con = connect_views(sf_dir)
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        finally:
            con.close()
        _DESCRIBE_CACHE[sql] = [(r[0], r[1]) for r in rows]
    return _DESCRIBE_CACHE[sql]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_hash_compatible(spark, sf_dir, name):
    oracle_types = dict(_describe_oracle(ORACLES[name], sf_dir))
    spark_types = {
        f.name: f.dataType for f in QUERIES[name](spark, sf_dir).schema.fields
    }
    bad = []
    for col, s_dt in spark_types.items():
        if col not in oracle_types:
            continue  # column-name parity is the driver's schema check
        s_cls = _spark_class(s_dt)
        o_cls = _duck_class(oracle_types[col])
        if s_cls is None and o_cls is None:
            continue
        if s_cls != o_cls:
            bad.append(
                f"{col}: spark={s_dt.simpleString()}({s_cls}) "
                f"oracle={oracle_types[col]}({o_cls})"
            )
    assert not bad, (
        f"{name}: oracle/Spark numeric type-class mismatch — the driver's "
        f"pandas value hash distinguishes these even when values are "
        f"equal. Add CAST(... AS BIGINT/DOUBLE) to the oracle SQL "
        f"(repo convention):\n  " + "\n  ".join(bad)
    )
