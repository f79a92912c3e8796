"""Sweep every registry query for driver-hasher-hostile output columns.

The round-1 driver crashed hashing list-valued cells (pandas
``TypeError: unhashable type: 'list'``) and mismatched on DECIMAL cells
(decimal.Decimal vs float64 across the Spark/DuckDB pandas paths). This
sweep runs every ``queries()`` entry at sf0.001, flags Array/Map/Struct/
Decimal-typed output columns from the Spark schema, and then actually
runs ``pd.util.hash_pandas_object`` over the collected result — the same
operation shape the driver uses — so anything un-hashable fails here
first, not in the round's one driver shot.

Usage: python scripts/schema_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from mysql_cdc_table_spark.session import get_spark  # noqa: E402
from mysql_cdc_table_spark.operators import all_queries  # noqa: E402

BAD_TYPES = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    bad = 0
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            flagged = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, BAD_TYPES)
            ]
            pdf = df.limit(200).toPandas()
            try:
                pd.util.hash_pandas_object(pdf, index=False)
                hash_err = None
            except TypeError as exc:
                hash_err = str(exc)
            if flagged or hash_err:
                bad += 1
                print(f"FLAG {name}: types={flagged} hash_err={hash_err}")
            else:
                print(f"ok   {name}")
        except Exception as exc:  # surface, keep sweeping
            bad += 1
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
