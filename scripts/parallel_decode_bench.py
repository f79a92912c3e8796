"""Throughput of the parallel single-file binlog scan vs the
sequential per-file walk — both on the round-6 columnar kernel.

Builds one large binlog file (default ~100 MiB of checksummed
10-row-per-event transactions), then times:
  1. mysql_binlog_read        — one file = one decode task
  2. mysql_binlog_read_parallel — transaction-aligned ranges fan out
     across local[32] tasks (the scan the single-threaded reference
     cannot express, binlog_table_reader.cc:75-96)

Usage: python scripts/parallel_decode_bench.py [n_txns] [split_mib]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import types as T  # noqa: E402

from mysql_cdc_table_spark.session import get_spark  # noqa: E402
from mysql_cdc_table_spark.sources.mysql_binlog import (  # noqa: E402
    build_binlog_file,
    mysql_binlog_read,
    mysql_binlog_read_parallel,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("ts", T.TimestampType()),
    ]
)


def main() -> None:
    import datetime as dt

    n_txns = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    split_mib = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    tmp = Path(tempfile.mkdtemp(prefix="par_decode_"))
    try:
        t0 = time.perf_counter()
        txns = [
            {
                "gno": g + 1,
                "op": "w",
                "rows": [
                    {
                        "id": g * 10 + r,
                        "k": (g * 10 + r) % 9973,
                        "v": f"payload-{g}-{r}",
                        "amt": Decimal(f"{g % 1000}.{r:02d}"),
                        "ts": dt.datetime(2024, 1 + g % 12, 1 + g % 28),
                    }
                    for r in range(10)
                ],
            }
            for g in range(n_txns)
        ]
        blob = build_binlog_file("d", "t", TARGET, txns, checksum=True)
        (tmp / "binlog.000001").write_bytes(blob)
        print(
            f"fixture: {len(blob) >> 20} MiB, {n_txns * 10} rows "
            f"(built in {time.perf_counter() - t0:.1f}s)"
        )

        spark = get_spark("parallel-decode-bench")
        spark.sparkContext.setLogLevel("ERROR")

        def timed(label, df_fn, runs=2):
            """min over ``runs`` invocations; runs=1 isolates a COLD
            pass (the split-spec cache makes parallel run 2+ warm)."""
            best = None
            for _ in range(runs):
                t1 = time.perf_counter()
                n = df_fn().count()
                sec = time.perf_counter() - t1
                best = sec if best is None else min(best, sec)
            print(
                f"{label}: {best:.2f}s  "
                f"({n} rows, {len(blob) / 1e6 / best:.0f} MB/s, "
                f"{n / best / 1e6:.2f}M rows/s)"
            )
            return best

        seq = timed(
            "sequential (1 task)   ",
            lambda: mysql_binlog_read(spark, str(tmp), TARGET, "d", "t"),
        )
        par_fn = lambda: mysql_binlog_read_parallel(  # noqa: E731
            spark,
            str(tmp),
            TARGET,
            "d",
            "t",
            split_bytes=split_mib << 20,
        )
        # cold first: header walk runs for real and populates the
        # split-spec cache (scan_binlog_splits_cached, round 7)
        par_cold = timed(
            f"parallel ({split_mib} MiB splits, cold walk)", par_fn, runs=1
        )
        # warm re-scan: split specs served from cache — the serial
        # header-walk floor disappears; remaining time ≈ pure decode
        par_warm = timed(
            f"parallel ({split_mib} MiB splits, warm walk)", par_fn, runs=2
        )
        print(
            f"speedup: {seq / par_cold:.1f}x cold, {seq / par_warm:.1f}x "
            f"warm (header walk amortized: -{par_cold - par_warm:.1f}s)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
