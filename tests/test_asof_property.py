"""Property test: the union+window as-of join must agree with pandas
merge_asof (direction='backward', inclusive) on random inputs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mysql_cdc_table_spark.operators.asof import asof_join

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("lid", T.LongType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("payload", T.LongType()),
    ]
)

keys = st.integers(0, 3)
times = st.integers(0, 50)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=25),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    # dedupe right per (k, t): asof ties at identical instants are
    # undefined in any engine — the operator's documented precondition
    right_dedup = {}
    for k, t in right:
        right_dedup[(k, t)] = max(right_dedup.get((k, t), 0), k * 100 + t)
    right_rows = [(k, t, p) for (k, t), p in right_dedup.items()]

    ldf = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    rdf = spark.createDataFrame(
        right_rows or [(0, -1, 0)], RIGHT_SCHEMA
    )  # merge_asof needs a non-empty frame; t=-1 never matches t>=0? it does
    # (t=-1 <= any left t) — harmless: pandas gets the same row.

    got = {
        r["lid"]: r["payload"]
        for r in asof_join(
            ldf, rdf, on="k", left_time="t", right_time="t",
            right_payload=["payload"],
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame(
        right_rows or [(0, -1, 0)], columns=["k", "t", "payload"]
    ).sort_values("t")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        int(row.lid): (None if pd.isna(row.payload) else int(row.payload))
        for row in merged.itertuples()
    }
    assert got == want


def test_asof_matched_rows_null_payload_not_backfilled(spark):
    """When the true as-of right row carries a NULL payload column, the
    join must return that NULL — not let it fall through to an OLDER
    right row (per-column fill would mix columns across right rows;
    matches DuckDB ASOF JOIN / pandas merge_asof)."""
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, t long, lid long")
    rdf = spark.createDataFrame(
        [(1, 1, 100, "old"), (1, 5, None, "new")],
        "k long, t long, price long, tag string",
    )
    [row] = asof_join(ldf, rdf, on="k", left_time="t", right_time="t").collect()
    # the t=5 row is the match: its NULL price must survive, its tag too
    assert row["tag"] == "new"
    assert row["price"] is None


def test_asof_nearest_directions_ties_and_tolerance(spark):
    """Hand-pinned semantics of asof_join_nearest: backward match when
    closer, forward when closer, tie -> backward (earlier), tolerance
    excludes both sides independently, no right rows -> unmatched."""
    from mysql_cdc_table_spark.operators.asof import asof_join_nearest
    from pyspark.sql import functions as F

    ldf = spark.createDataFrame(
        [
            (1, 10, 1),   # right at 8 (d2) and 13 (d3) -> backward 8
            (1, 12, 2),   # right at 8 (d4) and 13 (d1) -> forward 13
            (1, 18, 3),   # right at 13 (d5) and 23 (d5) -> tie -> backward 13
            (1, 40, 4),   # nearest right 23 at d17 > tol -> unmatched
            (2, 5, 5),    # key with no right rows -> unmatched
            (3, 7, 6),    # exact-t right row -> distance 0 backward
        ],
        "k long, t long, lid long",
    )
    rdf = spark.createDataFrame(
        [(1, 8, 80), (1, 13, 130), (1, 23, 230), (3, 7, 70)],
        "k long, t long, payload long",
    )
    rows = {
        r["lid"]: r
        for r in asof_join_nearest(
            ldf, rdf, on="k", left_time="t", right_time="t",
            tolerance=F.lit(10),
        ).collect()
    }
    assert (rows[1]["payload"], rows[1]["matched_side"]) == (80, "b")
    assert (rows[2]["payload"], rows[2]["matched_side"]) == (130, "f")
    assert (rows[3]["payload"], rows[3]["matched_side"]) == (130, "b")
    assert (rows[4]["payload"], rows[4]["matched_side"]) == (None, None)
    assert (rows[5]["payload"], rows[5]["matched_side"]) == (None, None)
    assert (rows[6]["payload"], rows[6]["matched_side"]) == (70, "b")
