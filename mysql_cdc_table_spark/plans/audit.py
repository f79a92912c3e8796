"""Physical-plan auditing: programmatic assertions over
``explain("formatted")`` output so the optimizer properties the engine
relies on (SCALE.md) are regression-tested, not just eyeballed.

The reference pushes nothing down (MySQL filters after a full decode —
reference binlogdb.cc:536-551, SURVEY §4); here pushdown/pruning/
broadcast are load-bearing and these helpers keep them true.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@dataclass
class ScanInfo:
    pushed_filters: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)


def parquet_scans(df: DataFrame) -> list[ScanInfo]:
    """Parse every parquet scan node's PushedFilters and ReadSchema."""
    plan = formatted_plan(df)
    scans: list[ScanInfo] = []
    cur: ScanInfo | None = None
    for line in plan.splitlines():
        if re.match(r"\(\d+\) Scan parquet", line.strip()):
            cur = ScanInfo()
            scans.append(cur)
        elif cur is not None and "PushedFilters:" in line:
            body = line.split("PushedFilters:", 1)[1].strip().strip("[]")
            cur.pushed_filters = [f.strip() for f in body.split(",") if f.strip()]
        elif cur is not None and "ReadSchema:" in line:
            body = line.split("ReadSchema:", 1)[1].strip()
            cur.read_columns = re.findall(r"(\w+):", body)
    return scans


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    scans = parquet_scans(df)
    assert any(
        any(column in f for f in s.pushed_filters) for s in scans
    ), f"no pushed filter on {column}; scans={[s.pushed_filters for s in scans]}"


def assert_columns_pruned(df: DataFrame, table_width: int) -> None:
    """Every scan must read strictly fewer columns than the full table."""
    scans = parquet_scans(df)
    assert scans, "no parquet scans found"
    widest = max(len(s.read_columns) for s in scans)
    assert widest < table_width, (
        f"scan reads {widest} columns — projection not pushed"
    )


def count_nodes(df: DataFrame, node: str) -> int:
    plan = formatted_plan(df)
    return len(re.findall(rf"\(\d+\) {re.escape(node)}", plan))


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    n = count_nodes(df, "BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, found {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    assert count_nodes(df, "CartesianProduct") == 0, "unexpected cartesian product"


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
