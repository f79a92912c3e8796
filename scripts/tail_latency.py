"""Measure events-to-visible latency of the sub-rotation binlog tail.

The mysql_binlog_tail DataSource emits only rows past the checkpointed
cursor; since round 6 each micro-batch is O(delta) — carried header
state + columnar decode of just the new bytes (SCALE.md §real binlog),
so latency should be FLAT in active-file size. This script appends one
transaction to active files of several sizes under a live
processingTime stream and measures wall time from file write to the
row surfacing in foreachBatch (the table in SCALE.md).

Usage: python scripts/tail_latency.py [sizes_mib ...]   (default 1 4 16)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import types as T  # noqa: E402

from mysql_cdc_table_spark.session import get_spark  # noqa: E402
from mysql_cdc_table_spark.sources.datasource import register  # noqa: E402
from mysql_cdc_table_spark.sources.mysql_binlog import (  # noqa: E402
    build_binlog_file,
    mysql_binlog_tail_stream,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("amt", T.DecimalType(10, 2)),
    ]
)
DDL = "id bigint, v string, amt decimal(10,2)"


def _txns(n: int, start_gno: int = 1) -> list[dict]:
    return [
        {
            "gno": start_gno + g,
            "op": "w",
            "rows": [
                {
                    "id": g * 10 + k,
                    "v": f"value-{g}-{k}" * 3,
                    "amt": Decimal(f"{g % 1000}.{k:02d}"),
                }
                for k in range(10)
            ],
        }
        for g in range(n)
    ]


def measure(spark, size_mib: int, probes: int = 5) -> list[float]:
    tmp = Path(tempfile.mkdtemp(prefix=f"tail_lat_{size_mib}m_"))
    logs = tmp / "logs"
    logs.mkdir()
    ckpt = str(tmp / "ckpt")

    # grow the base file to ~size_mib (each txn ≈ 450 bytes)
    n_base = max(2, int(size_mib * (1 << 20) / 450))
    base = _txns(n_base)
    (logs / "binlog.000001").write_bytes(
        build_binlog_file("d", "t", TARGET, base)
    )

    seen: dict[int, float] = {}  # gno -> wall time first visible

    def on_batch(df, _eid):
        t = time.time()
        for r in df.groupBy().max("__gtid").collect():
            g = r[0]
            if g is not None and g not in seen:
                seen[g] = t

    q = (
        mysql_binlog_tail_stream(spark, str(logs), DDL, "d", "t")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while n_base not in seen and time.time() < deadline:
            time.sleep(0.05)
        assert n_base in seen, "initial consume never completed"

        lat: list[float] = []
        txns = list(base)
        for k in range(probes):
            gno = n_base + 1 + k
            txns = txns + _txns(1, start_gno=gno)
            blob = build_binlog_file("d", "t", TARGET, txns)
            t0 = time.time()
            (logs / "binlog.000001").write_bytes(blob)
            deadline = time.time() + 60
            while gno not in seen and time.time() < deadline:
                time.sleep(0.01)
            assert gno in seen, f"gno {gno} never surfaced"
            lat.append(seen[gno] - t0)
        return lat
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("tail-latency")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    print(f"{'active file':>12} {'rows':>8} {'median':>8} {'p max':>8}")
    for s in sizes:
        lat = sorted(measure(spark, s))
        n_rows = max(2, int(s * (1 << 20) / 450)) * 10
        med = lat[len(lat) // 2]
        print(f"{s:>10} MiB {n_rows:>8} {med:>7.2f}s {lat[-1]:>7.2f}s")


if __name__ == "__main__":
    main()
