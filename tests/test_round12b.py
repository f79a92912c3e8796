"""Round-12 later-wave tests: IVM second moments, iterate-on-the-grid
algorithms (PageRank, power iteration), weighted priority sampling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_CORRECTNESS
from mysql_cdc_table_spark.plans.audit import formatted_plan


def _latest_alive(spark, sf_dir):
    from mysql_cdc_table_spark.cdc import ops
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    return ops.latest_state(synthetic_changelog(spark, sf_dir), ["o_orderkey"])


# --- cdc_ivm_corr_view --------------------------------------------------------


def test_corr_view_equals_latest_state_recompute(spark, sf_dir):
    """The six signed-moment folds must equal the moments of the ranked
    latest alive state — a sign error or a non-telescoping update chain
    shifts a sum; corr itself must match pyspark's corr to 1e-6."""
    from mysql_cdc_table_spark.operators.round12b import cdc_ivm_corr_view

    got = cdc_ivm_corr_view(spark, sf_dir).collect()
    x = F.floor(F.col("o_totalprice")).cast("long")
    y = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
    want = (
        _latest_alive(spark, sf_dir)
        .select("o_orderstatus", x.alias("x"), y.alias("y"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_live"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.corr(F.col("x").cast("double"), F.col("y").cast("double")).alias(
                "corr"
            ),
        )
        .orderBy("o_orderstatus")
    ).collect()
    assert len(got) == len(want) >= 4
    for g, w in zip(got, want):
        assert tuple(g)[:7] == tuple(w)[:7]
        if w["corr"] is not None:
            assert abs(g["corr_price_date"] - w["corr"]) < 1e-6


def test_corr_view_fold_is_linear_in_deltas(spark, sf_dir):
    """O(delta) maintainability is exactly the linearity of the fold:
    moments(prefix) + moments(delta chunk) must equal moments(full) —
    per group, for an arbitrary __gtid split."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog

    cl = synthetic_changelog(spark, sf_dir)
    cut = int(
        cl.agg(F.percentile_approx("__gtid", 0.5, 1000)).collect()[0][0]
    )

    def fold(df):
        sgn = (
            F.when(F.col("__op").isin(1, 3), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
        )
        x = F.floor(F.col("o_totalprice")).cast("long")
        y = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
        rows = (
            df.select(
                "o_orderstatus",
                sgn.alias("sgn"),
                (sgn * x).alias("dx"),
                (sgn * x * x).alias("dxx"),
                (sgn * x * y).alias("dxy"),
            )
            .groupBy("o_orderstatus")
            .agg(
                F.sum("sgn").alias("n"),
                F.sum("dx").alias("sx"),
                F.sum("dxx").alias("sxx"),
                F.sum("dxy").alias("sxy"),
            )
            .collect()
        )
        return {r["o_orderstatus"]: (r["n"], r["sx"], r["sxx"], r["sxy"]) for r in rows}

    full = fold(cl)
    pre = fold(cl.filter(F.col("__gtid") <= cut))
    post = fold(cl.filter(F.col("__gtid") > cut))
    keys = set(pre) | set(post)
    assert keys >= set(full)
    for k in keys:
        a = pre.get(k, (0, 0, 0, 0))
        b = post.get(k, (0, 0, 0, 0))
        s = tuple(ai + bi for ai, bi in zip(a, b))
        assert s == full.get(k, (0, 0, 0, 0)), k


def test_corr_view_plan_one_agg_no_window_no_join(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round12b import cdc_ivm_corr_view
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = cdc_ivm_corr_view(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(df, "Window") == 0, plan
    assert count_nodes(df, "Join") == 0, plan
    assert "partial" in plan.lower()  # map-side combine on the fold


# --- graph_pagerank_trade -----------------------------------------------------


def test_pagerank_mass_and_shape(spark, sf_dir):
    """25 rows always (Laplace smoothing completes the grid); total
    fixed-point mass stays within the truncation budget of SCALE (each
    of 625 edge divisions loses < 1 unit per iteration); every rank is
    at least the exact teleport floor."""
    from mysql_cdc_table_spark.operators.round12b import (
        _PR_ITERS,
        _PR_SCALE,
        graph_pagerank_trade,
    )

    rows = graph_pagerank_trade(spark, sf_dir).collect()
    assert len(rows) == 25
    total = sum(r["rank_e9"] for r in rows)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - _PR_ITERS * (625 + 25)
    teleport = (15 * _PR_SCALE) // (100 * 25)
    assert all(r["rank_e9"] >= teleport for r in rows)


def test_pagerank_uniform_graph_is_uniform(spark, sf_dir):
    """On a uniform weight grid the damped iteration is a fixed point
    of the uniform vector: replaying the exact integer recursion on
    equal weights must keep every node at the same rank — which pins
    the teleport constant and the flow formula."""
    from mysql_cdc_table_spark.operators.round12b import _PR_SCALE

    n = 25
    r = _PR_SCALE // n
    for _ in range(3):
        # every node receives n equal flows of (85 * w * r) // (100 * n * w)
        r = (15 * _PR_SCALE) // (100 * n) + n * ((85 * r) // (100 * n))
    # sanity: stays within one truncation ulp per step of SCALE/n
    assert abs(r - _PR_SCALE // n) <= 3 * n


def test_pagerank_fact_scanned_once_iterations_broadcast(spark, sf_dir):
    """The iteration must NOT rescan the fact table: exactly one
    lineitem scan in the final plan (the lineage cut after the edge
    aggregate), and every per-iteration join is a broadcast."""
    from mysql_cdc_table_spark.operators.round12b import graph_pagerank_trade
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = graph_pagerank_trade(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Scan parquet") == 0 or "lineitem" not in plan, (
        "iterations leaked the fact scan past the lineage cut:\n" + plan
    )
    assert count_nodes(df, "SortMergeJoin") == 0, plan
    assert count_nodes(df, "CartesianProduct") == 0, plan


# --- emb_pca_power_iter ---------------------------------------------------------


def _pca_numpy_pipeline(sf_dir):
    """Bit-exact numpy replication of the fixed-point pipeline."""
    import duckdb
    import numpy as np

    from mysql_cdc_table_spark.operators.round12b import (
        _PCA_ITERS,
        _PCA_M_CAP,
        _PCA_Q,
        _PCA_V_CAP,
    )

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    q = np.floor(x * _PCA_Q).astype(np.int64)
    n = q.shape[0]
    m = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))

    def tdiv(a, d):
        return np.sign(a) * (np.abs(a) // d)

    ms = tdiv(m, max(1, int(np.max(np.abs(m))) // _PCA_M_CAP))
    v = np.full(64, 1_000_000, dtype=np.int64)
    trail = [v]
    for _ in range(_PCA_ITERS):
        u = ms @ v
        v = tdiv(u, max(1, int(np.max(np.abs(u))) // _PCA_V_CAP))
        trail.append(v)
    return ms, trail


def test_pca_power_iter_bit_exact_vs_numpy(spark, sf_dir):
    """The distributed Gram + fixed-point iteration must reproduce the
    single-machine integer pipeline BIT-exactly — any float sneaking
    into the matvec, a wrong truncation direction on a negative entry,
    or a partial-Gram combine error shifts some coordinate."""
    from mysql_cdc_table_spark.operators.round12b import emb_pca_power_iter

    got = emb_pca_power_iter(spark, sf_dir).collect()
    _, trail = _pca_numpy_pipeline(sf_dir)
    want = trail[-1]
    assert [r["dim"] for r in got] == list(range(64))
    assert [r["v_fp"] for r in got] == [int(w) for w in want]


def test_pca_rayleigh_quotient_increases_each_step(spark, sf_dir):
    """Power iteration on a symmetric PSD matrix increases the Rayleigh
    quotient monotonically — the per-step guarantee the key's contract
    rests on (full convergence is data-dependent and not claimed)."""
    import numpy as np

    ms, trail = _pca_numpy_pipeline(sf_dir)
    msf = ms.astype(np.float64)

    def rayleigh(v):
        vf = v.astype(np.float64)
        return (vf @ msf @ vf) / (vf @ vf)

    rs = [rayleigh(v) for v in trail]
    assert all(rs[i] < rs[i + 1] for i in range(len(rs) - 1)), rs
    # and alignment with the true dominant eigenvector improves
    _, vecs = np.linalg.eigh(msf)
    top = vecs[:, -1]

    def cos(v):
        return abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))

    assert cos(trail[-1]) > cos(trail[0])


def test_pca_corpus_scanned_once_iterations_grid_bounded(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round12b import emb_pca_power_iter
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = emb_pca_power_iter(spark, sf_dir)
    plan = formatted_plan(df)
    assert "embeddings" not in plan, (
        "iterations leaked the corpus scan past the lineage cut:\n" + plan
    )
    assert count_nodes(df, "SortMergeJoin") == 0, plan


# --- sample_weighted_priority ---------------------------------------------------


def test_priority_sample_matches_bruteforce(spark, sf_dir):
    """Exact replication: top-5 per source by w/u with the Knuth
    uniform, τ = 6th priority, est term = max(w, τ) — recomputed
    per-document in Python."""
    import duckdb
    import math

    from mysql_cdc_table_spark.operators.round12b import (
        sample_weighted_priority,
    )

    docs = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_source: dict = {}
    for source, doc_id, n_chars in docs:
        u = (doc_id * 2654435761) % 4294967296 + 1
        p = float(n_chars * 4294967296) / float(u)
        by_source.setdefault(source, []).append((p, doc_id, n_chars))
    want = []
    for source in sorted(by_source):
        ranked = sorted(by_source[source], key=lambda t: (-t[0], t[1]))
        tau = ranked[5][0] if len(ranked) > 5 else 0.0
        for rk, (p, doc_id, n_chars) in enumerate(ranked[:5], start=1):
            want.append(
                (
                    source,
                    rk,
                    doc_id,
                    n_chars,
                    math.floor(max(float(n_chars), tau) * 1_000_000),
                )
            )
    got = [tuple(r) for r in sample_weighted_priority(spark, sf_dir).collect()]
    assert got == want


def test_priority_sample_topk_pushdown(spark, sf_dir):
    """The per-source top-k must ride WindowGroupLimit so the exchange
    carries ≤6 rows per input partition, never the corpus."""
    from mysql_cdc_table_spark.operators.round12b import (
        sample_weighted_priority,
    )

    plan = formatted_plan(sample_weighted_priority(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


# --- stream_static_enrich -------------------------------------------------------


def test_stream_static_enrich_multibatch_append_once(spark, sf_dir):
    """The enrichment must actually run across multiple micro-batches
    (4 staged chunks), emit every settled window EXACTLY once (append
    mode — a re-emission would double a (window, nation) row), and
    keep aggregate state bounded by windows-in-flight, not stream
    length."""
    from mysql_cdc_table_spark.operators.round12b import stream_static_enrich

    qs: list = []
    out = stream_static_enrich(spark, sf_dir, _query_out=qs)
    rows = out.collect()
    assert rows
    keys = [(r["win_start"], r["n_name"]) for r in rows]
    assert len(keys) == len(set(keys)), "a window emitted twice"

    (q,) = qs
    batches = [
        p
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]
    assert len(batches) >= 4, "feed collapsed into fewer batches"
    state_rows = [
        so["numRowsTotal"]
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
        if so.get("numRowsTotal") is not None
    ]
    # daily windows x 25 nations over a 30-day fixture: state never
    # exceeds the windows-in-flight bound regardless of row count
    assert state_rows and max(state_rows) <= 31 * 25


# --- cdc_binlog_streaming_evolution ---------------------------------------------


def test_binlog_streaming_evolution_converges_and_resumes(spark, sf_dir):
    """The maintained store must hold BOTH generations correctly (the
    pre-ALTER plane surfaces as NULL status, the post-ALTER plane
    carries values), and a second run — same checkpoint, same staged
    feed — must be a resume-noop that reads the identical store."""
    from mysql_cdc_table_spark.operators.round12b import (
        cdc_binlog_streaming_evolution,
    )

    first = [tuple(r) for r in cdc_binlog_streaming_evolution(spark, sf_dir).collect()]
    assert len(first) == 2  # NULL-status and status planes both present
    assert all(n_rows > 0 for _, n_rows, _, _ in first)
    second = [tuple(r) for r in cdc_binlog_streaming_evolution(spark, sf_dir).collect()]
    assert first == second


def test_evolution_apply_batch_replay_is_noop(spark, tmp_path):
    """A replayed micro-batch must find its committed version and skip
    — applying the same batch twice cannot double-fold a key."""
    from mysql_cdc_table_spark.operators.round12 import _ivm_versions
    from mysql_cdc_table_spark.operators.round12b import (
        _EVO_STORE_SCHEMA,
        evolution_apply_batch,
    )

    state_dir = str(tmp_path / "evostate")
    batch = spark.createDataFrame(
        [
            (1, None, None, 1, 10, 10, 0),
            (1, None, "F", 3, 15, 15, 1),
            (2, None, None, 1, 20, 20, 0),
        ],
        _EVO_STORE_SCHEMA,
    )
    evolution_apply_batch(spark, batch, state_dir, 0)
    once = sorted(
        tuple(r)
        for r in spark.read.schema(_EVO_STORE_SCHEMA)
        .parquet(f"{state_dir}/v0/D")
        .collect()
    )
    # key 1 folded to its (gtid 15) after-image, key 2 to its insert
    assert [r[0] for r in once] == [1, 2]
    assert dict((r[0], r[4]) for r in once) == {1: 15, 2: 20}
    evolution_apply_batch(spark, batch, state_dir, 0)  # replay
    again = sorted(
        tuple(r)
        for r in spark.read.schema(_EVO_STORE_SCHEMA)
        .parquet(f"{state_dir}/v0/D")
        .collect()
    )
    assert once == again
    assert _ivm_versions(spark, state_dir) == [0]


# --- stream_stream_three_way ------------------------------------------------------


def test_three_way_runs_two_stateful_joins_multibatch(spark, sf_dir):
    """The chained funnel must run BOTH stream-stream joins as
    stateful operators (two state stores in every progress record),
    across ≥4 micro-batches, with nonempty settled output."""
    from mysql_cdc_table_spark.operators.round12b import (
        stream_stream_three_way,
    )

    qs: list = []
    rows = stream_stream_three_way(spark, sf_dir, _query_out=qs).collect()
    assert rows and all(r["n_funnels"] > 0 for r in rows)
    (q,) = qs
    progresses = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    assert len(progresses) >= 4
    n_state_ops = {len(p.get("stateOperators", [])) for p in q.recentProgress}
    assert 2 in n_state_ops, n_state_ops


# --- mm_image_resize --------------------------------------------------------------


def test_resize_is_spatially_sensitive():
    """The gradient fixture must detect spatial bugs a constant fill
    cannot: a vertically flipped decode (the classic BMP bottom-up
    mistake) or a swapped channel order (BGR) must CHANGE the resized
    checksum; codec containers must round-trip pixel-identically."""
    import numpy as np

    from mysql_cdc_table_spark.functions.multimodal import (
        decode_image_pixels,
        encode_bmp,
        encode_ppm,
    )

    did = 12345
    w, h = did % 60 + 5, did % 44 + 5
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    px = ((3 * xs + 5 * ys + 7 * cs + did) % 256).astype(np.uint8)

    for enc in (encode_ppm, encode_bmp):
        _, back = decode_image_pixels(enc(w, h, px))
        assert np.array_equal(back, px), enc.__name__

    ix = (np.arange(4, dtype=np.int64) * w) // 4
    iy = (np.arange(4, dtype=np.int64) * h) // 4
    cw = np.array([1, 2, 3], dtype=np.int64)

    def wsum(arr):
        return int((arr[np.ix_(iy, ix)].astype(np.int64) * cw).sum())

    good = wsum(px)
    assert good != wsum(px[::-1])  # bottom-up row bug
    assert good != wsum(px[:, :, ::-1])  # BGR channel swap


# --- stats_table_profile -----------------------------------------------------------


def test_stats_profile_invariants_and_one_scan(spark, sf_dir):
    """The profile must be internally consistent (o_orderkey is the
    PK: ndv == n_rows, zero nulls; every ndv ≤ n_rows) and come from
    ONE scan of the table (the expand-based count_distinct rides the
    same pass — a per-column scan would read the table six times)."""
    from mysql_cdc_table_spark.operators.round12b import stats_table_profile

    df = stats_table_profile(spark, sf_dir)
    rows = {r["column_name"]: r for r in df.collect()}
    assert len(rows) == 6
    n = rows["o_orderkey"]["n_rows"]
    assert rows["o_orderkey"]["ndv"] == n
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert all(r["ndv"] <= n for r in rows.values())
    assert rows["o_orderstatus"]["ndv"] <= 3
    from mysql_cdc_table_spark.plans.audit import parquet_scans

    assert len(parquet_scans(df)) == 1, formatted_plan(df)


# --- funnel_no_interference ---------------------------------------------------------


def test_negation_is_load_bearing_and_costs_no_extra_join(spark, sf_dir):
    """Some pairs must actually be dirty (otherwise the negation is
    untested), and the prefix-counter trick must keep the plan at ONE
    join — the naive NOT EXISTS form would add an error-probe join."""
    from mysql_cdc_table_spark.operators.round12b import (
        funnel_no_interference,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = funnel_no_interference(spark, sf_dir)
    import re

    plan = formatted_plan(df)  # pre-execution: AQE prints one plan
    rows = df.collect()
    assert sum(r["n_pairs"] for r in rows) > sum(r["n_clean"] for r in rows)
    assert all(r["n_clean"] <= r["n_pairs"] for r in rows)
    n_joins = len(re.findall(r"\(\d+\) \w*(Join|CartesianProduct)", plan))
    assert n_joins == 1, plan
    # the corpus-wide counter window materializes ONCE (lineage cut);
    # neither branch recomputes it, and no error-probe join appears
    assert count_nodes(df, "Window") == 0, plan


# --- cdc_ivm_streaming_corr -----------------------------------------------------


def test_streaming_corr_converges_chop_invariant_replay_noop(spark, sf_dir, tmp_path):
    """The streamed second-moment store must equal the one-shot batch
    fold under ANY chop of the feed (linearity), a replayed batch must
    no-op, and the converged readout must equal the batch key row for
    row."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round12 import _ivm_versions
    from mysql_cdc_table_spark.operators.round12b import (
        _CORR_STORE_SCHEMA,
        cdc_ivm_corr_view,
        cdc_ivm_streaming_corr,
        corr_apply_batch,
    )

    # converged streamed readout == batch key
    got = [tuple(r) for r in cdc_ivm_streaming_corr(spark, sf_dir).collect()]
    want = [tuple(r) for r in cdc_ivm_corr_view(spark, sf_dir).collect()]
    assert got == want

    # manual chop invariance + replay: 1-batch vs 3-skewed-batch
    cl = synthetic_changelog(spark, sf_dir)
    one = str(tmp_path / "one")
    three = str(tmp_path / "three")
    corr_apply_batch(spark, cl, one, 0)
    chops = [
        cl.filter(F.col("o_orderkey") % 10 < 7),
        cl.filter(F.col("o_orderkey") % 10 == 7),
        cl.filter(F.col("o_orderkey") % 10 > 7),
    ]
    for i, part in enumerate(chops):
        corr_apply_batch(spark, part, three, i)
    corr_apply_batch(spark, chops[-1], three, 2)  # replay must no-op
    assert _ivm_versions(spark, three) == [1, 2]  # retain=2

    def read(d, v):
        return sorted(
            tuple(r)
            for r in spark.read.schema(_CORR_STORE_SCHEMA)
            .parquet(f"{d}/v{v}/M")
            .collect()
        )

    assert read(one, 0) == read(three, 2)


# --- cdc_replication_lag ------------------------------------------------------------


def test_replication_lag_lanes_and_watermarks(spark, sf_dir):
    """Four lanes (k % 4), every lag non-negative, at least one lane
    at zero (it holds the global watermark), and counts reconcile
    against the changelog size."""
    from mysql_cdc_table_spark.cdc.synthetic import synthetic_changelog
    from mysql_cdc_table_spark.operators.round12b import cdc_replication_lag

    rows = cdc_replication_lag(spark, sf_dir).collect()
    assert [r["lane"] for r in rows] == [0, 1, 2, 3]
    assert all(r["lag_seconds"] >= 0 for r in rows)
    assert any(r["lag_seconds"] == 0 for r in rows)
    total = synthetic_changelog(spark, sf_dir).count()
    assert sum(r["n_events"] for r in rows) == total
    assert all(r["n_txns"] <= r["n_events"] for r in rows)


# --- sort_zorder_layout ---------------------------------------------------------------


def test_zorder_layout_concentrates_2d_boxes(spark, tmp_path):
    """The point of the z-order key: a 2-D box predicate over the
    z-clustered layout touches a small fraction of the files, while
    the same box over a 1-D (orderkey-sorted) layout scatters across
    essentially all of them. An aligned 32×32 box maps to ONE
    contiguous z-interval, so the gap is large, not marginal."""
    from mysql_cdc_table_spark.catalog import load_table
    from mysql_cdc_table_spark.operators.round12b import _zorder_expr

    # sf0.01 deliberately (not the session smoke dir): the file-count
    # gap needs enough orders rows to fill 32 range partitions
    sf_dir = SF_CORRECTNESS
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_custkey").cast("long").alias("maxck"))
    coords = o.crossJoin(F.broadcast(mx)).selectExpr(
        "o_orderkey",
        "least(255, o_custkey * 256 DIV (maxck + 1)) AS xb",
        "least(255, CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"
        " * 256 DIV 2500) AS yb",
    ).selectExpr(
        "o_orderkey", "xb", "yb",
        f"CAST(({_zorder_expr('xb', 'yb')}) AS BIGINT) AS zkey",
    )
    zdir = str(tmp_path / "zsorted")
    ldir = str(tmp_path / "linear")
    coords.repartitionByRange(32, "zkey").sortWithinPartitions(
        "zkey"
    ).write.mode("overwrite").parquet(zdir)
    coords.repartitionByRange(32, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.mode("overwrite").parquet(ldir)

    box = (
        (F.col("xb") >= 64) & (F.col("xb") < 96)
        & (F.col("yb") >= 128) & (F.col("yb") < 160)
    )

    def files_touched(d):
        return (
            spark.read.parquet(d)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    z_files, l_files = files_touched(zdir), files_touched(ldir)
    assert z_files > 0  # the box is nonempty
    assert z_files * 4 <= l_files, (z_files, l_files)


# --- emb_project_dominant -------------------------------------------------------------


def test_projection_bit_exact_vs_numpy(spark, sf_dir):
    """The JVM-side zip_with/aggregate fold must reproduce the numpy
    integer projection onto the same fixed-point iterate bit-exactly,
    per label."""
    import duckdb
    import numpy as np

    from mysql_cdc_table_spark.operators.round12b import (
        _PCA_Q,
        emb_project_dominant,
    )

    _, trail = _pca_numpy_pipeline(sf_dir)
    v = trail[-1]
    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    want: dict = {}
    for label, emb in rows:
        q = np.floor(np.asarray(emb, dtype=np.float64) * _PCA_Q).astype(
            np.int64
        )
        p = int(q @ v)
        n, mn, mx, sm = want.get(label, (0, None, None, 0))
        want[label] = (
            n + 1,
            p if mn is None else min(mn, p),
            p if mx is None else max(mx, p),
            sm + p,
        )
    got = {
        r["label"]: (r["n_vecs"], r["min_proj"], r["max_proj"], r["sum_proj"])
        for r in emb_project_dominant(spark, sf_dir).collect()
    }
    assert got == want


# --- join_dpp_partition_pruned ----------------------------------------------------------


def test_dpp_fires_and_prunes_partitions(spark, sf_dir):
    """The fact scan must carry a dynamicpruning PartitionFilter (the
    month list is only known after the dimension scan — static pruning
    cannot express it), and the result must equal a statically pruned
    read of the same 3 partitions."""
    from mysql_cdc_table_spark.operators.round12b import (
        join_dpp_partition_pruned,
    )

    df = join_dpp_partition_pruned(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), plan
    rows = df.collect()
    assert [r["ym"] for r in rows] == ["1995-01", "1995-02", "1995-03"]
    assert all(r["n_orders"] > 0 for r in rows)


# --- corpus_split_leakage_audit ----------------------------------------------------------


def test_cluster_split_eliminates_leakage(spark, sf_dir):
    """Per-document splitting leaks (cross-split near-dup pairs
    exist); cluster-keyed splitting has ZERO cross-split pairs by
    construction, and both schemes see the same pair total."""
    from mysql_cdc_table_spark.operators.round12b import (
        corpus_split_leakage_audit,
    )

    rows = corpus_split_leakage_audit(spark, sf_dir).collect()
    doc = [r for r in rows if r["scheme"] == "doc"]
    cluster = [r for r in rows if r["scheme"] == "cluster"]
    assert sum(r["n_pairs"] for r in doc) == sum(
        r["n_pairs"] for r in cluster
    )
    assert any(r["split_lo"] != r["split_hi"] for r in doc), (
        "fixture has no leaky pairs — the audit is vacuous"
    )
    assert all(r["split_lo"] == r["split_hi"] for r in cluster)
