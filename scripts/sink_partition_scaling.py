"""Sink partition-scaling measurement (round-9 verdict item 5).

SCALE.md's claim for the mysql_binlog sink is "embarrassingly parallel;
partitions are the scale-out knob". This measures that claim directly:
the SAME sf1 changelog written through df.write.format("mysql_binlog")
at 2 / 4 / 8 / 16 / 32 partitions (one file per non-empty partition —
partition count IS the parallelism), timing the write alone (encode +
atomic land + O(#files) driver ROTATE-chain commit; no read-back). If
the per-partition encode dominates and the driver commit is the
milliseconds it is documented to be, wall time should fall with
partition count until the per-file fixed costs and local[32] scheduling
overhead flatten it.

Run: python scripts/sink_partition_scaling.py   (JSON lines to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    "scale_sf1",
)

DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def main() -> None:
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.session import get_spark
    from mysql_cdc_table_spark.sources.datasource import register

    spark = get_spark("sink-partition-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    if not os.path.isdir(SF1):
        raise SystemExit("run scripts/scale_check.py once to stage sf1")

    stage = os.path.join(tempfile.gettempdir(), "sink_scaling_changelog")
    synthetic_changelog(spark, SF1).repartition(32, "__gtid").write.mode(
        "overwrite"
    ).parquet(stage)
    n_rows = spark.read.parquet(stage).count()
    print(json.dumps({"stage": "input", "rows": n_rows}), flush=True)

    out = os.path.join(tempfile.gettempdir(), "sink_scaling_out")
    for parts in (2, 4, 8, 16, 32):
        samples = []
        for _ in range(3):
            shutil.rmtree(out, ignore_errors=True)
            df = spark.read.parquet(stage).repartition(parts, "__gtid")
            t0 = time.perf_counter()
            (
                df.write.format("mysql_binlog")
                .option("schema_ddl", DDL)
                .option("database", "tpch")
                .option("table", "orders")
                .mode("overwrite")
                .save(out)
            )
            samples.append(time.perf_counter() - t0)
        n_files = len(
            [f for f in os.listdir(out) if f.startswith("binlog.")]
        )
        print(
            json.dumps(
                {
                    "partitions": parts,
                    "files": n_files,
                    "sec": round(min(samples), 2),
                }
            ),
            flush=True,
        )
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
