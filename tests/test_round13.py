"""Round-13 operators: BPE merge training and equi-height histograms.

The BPE key is additionally checked against a from-scratch pure-Python
BPE trainer (independent of both engines' SQL), and the merge
application's double-space replace invariant is unit-tested on the
pathological consecutive-occurrence case.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators.round13 import (
    BPE_MERGES,
    HIST_BUCKETS,
    stats_column_histogram,
    text_bpe_train_merges,
)


def _python_bpe(word_counts: dict[str, int], k: int):
    """Reference BPE trainer: list-of-symbols per word, greedy
    left-to-right merge application — no string tricks shared with
    the implementation under test."""
    grids = {w: list(w) for w in word_counts}
    out = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for w, syms in grids.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in grids.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            grids[w] = ns
        tokens = sum(word_counts[w] * len(s) for w, s in grids.items())
        out.append((step, a, b, cnt, tokens))
    return out


def test_bpe_matches_pure_python_trainer(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].lower().split(" "):
            if w:
                wc[w] += 1
    want = _python_bpe(dict(wc), BPE_MERGES)
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["pair_cnt"], r["tokens_after"])
        for r in text_bpe_train_merges(spark, sf_dir).collect()
    ]
    assert got == want


def test_bpe_replace_invariant_consecutive_pairs(spark):
    """The double-space representation merges CONSECUTIVE occurrences
    in one non-overlapping pass (' a  b  a  b ' -> ' ab  ab ') — the
    case a single-space representation gets wrong because the first
    replacement consumes the next occurrence's leading boundary."""
    df = spark.createDataFrame([(" a  b  a  b ",), (" a  b  x ",)], "s string")
    out = [
        r["s"]
        for r in df.select(
            F.replace(F.col("s"), F.lit(" a  b "), F.lit(" ab ")).alias("s")
        ).collect()
    ]
    assert out == [" ab  ab ", " ab  x "]
    # and a symbol whose NAME extends the pair's second symbol is not
    # a false positive: 'b' must be boundary-anchored
    df2 = spark.createDataFrame([(" a  bx ",)], "s string")
    assert (
        df2.select(
            F.replace(F.col("s"), F.lit(" a  b "), F.lit(" ab ")).alias("s")
        ).first()["s"]
        == " a  bx "
    )


def test_bpe_iterations_do_not_rescan_corpus(spark, sf_dir):
    """Aggregate-once contract: after the word grid materializes, a
    merge iteration's pair aggregation reads the checkpointed grid,
    not the documents parquet."""
    from mysql_cdc_table_spark.operators.round13 import _bpe_word_grid
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    grid = _bpe_word_grid(spark, sf_dir).localCheckpoint(eager=True)
    syms = F.split(F.trim(F.col("s")), "  ")
    pairs = (
        grid.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    syms.alias("a"), F.slice(syms, 2, 1 << 20).alias("b")
                )
            ).alias("pr"),
        )
        .filter(F.col("pr.b").isNotNull())
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.sum("cnt").alias("pc"))
    )
    plan = formatted_plan(pairs)
    assert "documents" not in plan.lower()
    assert "parquet" not in plan.lower()


def test_histogram_equi_height_properties(spark, sf_dir):
    rows = stats_column_histogram(spark, sf_dir).collect()
    by_col: dict = {}
    for r in rows:
        by_col.setdefault(r["col"], []).append(r)
    assert set(by_col) == {"cents", "custkey"}
    for col, rs in by_col.items():
        assert [r["bucket"] for r in rs] == list(range(HIST_BUCKETS))
        sizes = [r["n_rows"] for r in rs]
        # equi-height: bucket sizes within 1 of each other
        assert max(sizes) - min(sizes) <= 1, (col, sizes)
        # cumulative counts are the running sum and end at n
        total = sum(sizes)
        cum = 0
        for r in rs:
            cum += r["n_rows"]
            assert r["cum_rows"] == cum
        assert cum == total
        # value ranges are ordered and non-overlapping (ties can share
        # a boundary value across buckets; min<=max always)
        for r in rs:
            assert r["min_val"] <= r["max_val"]
            assert 1 <= r["ndv"] <= r["n_rows"]
        for prev, nxt in zip(rs, rs[1:]):
            assert prev["max_val"] <= nxt["min_val"]


def test_histogram_matches_pandas_recompute(spark, sf_dir):
    import pandas as pd  # noqa: F401

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pdf = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("val"),
        F.col("o_orderkey").alias("rid"),
    ).toPandas()
    pdf = pdf.sort_values(["val", "rid"]).reset_index(drop=True)
    n = len(pdf)
    pdf["bucket"] = (pdf.index * HIST_BUCKETS) // n
    want = {
        int(b): (int(g["val"].count()), int(g["val"].min()),
                 int(g["val"].max()), int(g["val"].nunique()))
        for b, g in pdf.groupby("bucket")
    }
    got = {
        r["bucket"]: (r["n_rows"], r["min_val"], r["max_val"], r["ndv"])
        for r in stats_column_histogram(spark, sf_dir).collect()
        if r["col"] == "cents"
    }
    assert got == want
