"""Binary-JSON residue measurement (round-9 verdict watch item 2).

The columnar binlog kernel (sources/mysql_binlog_vec.py) vectorizes
every fixed-width and dictionary type; binary JSON is the one remaining
per-cell scalar closure (variable-shape trees, excluded by declaration).
This measures what that residue actually COSTS on a JSON-heavy schema
at sf1-like row counts: the same row data encoded twice — once with the
payload as a MySQL binary-JSON column, once as a plain VARCHAR of the
identical serialized text — through the same full read path. The delta
is the jsonb tree-walk's share of decode wall time.

Staging (file build) is untimed; timing is min-of-3 full decodes via
mysql_binlog_read (columnar kernel) with a count() sink.

Run: python scripts/json_residue_bench.py   (JSON lines to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 8
TXNS_PER_FILE = 250
ROWS_PER_TXN = 100   # 8 * 250 * 100 = 200k rows


def payload(i: int) -> str:
    # a realistic small document: mixed types, nested array + object
    return json.dumps(
        {
            "id": i,
            "tag": f"t{i % 97}",
            "score": i % 1000,
            "flags": [i % 2 == 0, i % 3 == 0],
            "meta": {"src": "gen", "rev": i % 7},
        },
        separators=(",", ":"),
        sort_keys=True,
    )


def flat_payload(i: int) -> str:
    # top-level scalars — the round-10 vectorized subset: a JSON column
    # holding a typed value (id ints, tag strings), no container
    return json.dumps(i if i % 2 == 0 else f"tag-{i}")


def stage(variant: str, root: str) -> str:
    from pyspark.sql import types as T

    from mysql_cdc_table_spark.sources.mysql_binlog import (
        build_binlog_file,
    )

    tgt = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "doc",
                T.StringType(),
                metadata=(
                    {"mysql_type": "json"}
                    if variant.startswith("json")
                    else {}
                ),
            ),
        ]
    )
    out = os.path.join(root, variant)
    os.makedirs(out, exist_ok=True)
    rid = 0
    for f in range(N_FILES):
        txns = []
        for t in range(TXNS_PER_FILE):
            rows = []
            for _ in range(ROWS_PER_TXN):
                gen = flat_payload if variant.endswith("_flat") else payload
                rows.append({"id": rid, "doc": gen(rid)})
                rid += 1
            txns.append(
                {"gno": f * TXNS_PER_FILE + t + 1, "op": "w", "rows": rows}
            )
        blob = build_binlog_file("d", "t", tgt, txns, checksum=True)
        with open(os.path.join(out, f"binlog.{f + 1:06d}"), "wb") as fh:
            fh.write(blob)
    return out


def main() -> None:
    from pyspark.sql import types as T

    from mysql_cdc_table_spark.session import get_spark
    from mysql_cdc_table_spark.sources.mysql_binlog import (
        mysql_binlog_read,
    )

    spark = get_spark("json-residue-bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), "json_residue_bench")
    shutil.rmtree(root, ignore_errors=True)

    results = {}
    for variant in ("varchar", "json", "varchar_flat", "json_flat"):
        t0 = time.perf_counter()
        d = stage(variant, root)
        staged = time.perf_counter() - t0
        tgt = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "doc",
                    T.StringType(),
                    metadata=(
                        {"mysql_type": "json"}
                        if variant.startswith("json")
                        else {}
                    ),
                ),
            ]
        )
        samples = []
        n = None
        for _ in range(3):
            t1 = time.perf_counter()
            n = mysql_binlog_read(spark, d, tgt, "d", "t").count()
            samples.append(time.perf_counter() - t1)
        results[variant] = min(samples)
        print(
            json.dumps(
                {
                    "variant": variant,
                    "rows": n,
                    "stage_sec": round(staged, 1),
                    "decode_sec": round(min(samples), 2),
                }
            ),
            flush=True,
        )
    ratio = results["json"] / results["varchar"]
    flat_ratio = results["json_flat"] / results["varchar_flat"]
    print(
        json.dumps(
            {
                "jsonb_residue_overhead": round(ratio, 2),
                "residue_share_of_json_decode": round(
                    1 - results["varchar"] / results["json"], 2
                ),
                "flat_scalar_overhead": round(flat_ratio, 2),
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
