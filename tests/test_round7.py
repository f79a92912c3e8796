"""Round-7 operator tests: the IVF-backed kNN classifier."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from mysql_cdc_table_spark.session import get_spark

    s = get_spark("test-round7")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_knn_ivf_matches_exact_rows_and_agree_flag(spark):
    """The emitted rows ARE the exact classifier's (value-hash
    contract), and the agreement boolean holds at both test sfs — the
    measured agreement (0.70/0.60 at sf0.001/0.01) clears the 0.3
    floor with margin."""
    from mysql_cdc_table_spark.operators.round6 import emb_knn_classify
    from mysql_cdc_table_spark.operators.round7 import emb_knn_classify_ivf

    for sf_dir in (SF, SF01):
        out = emb_knn_classify_ivf(spark, sf_dir)
        assert out.columns == ["qid", "pred_label", "n_votes", "ivf_agree_ok"]
        rows = out.collect()
        exact = {
            (r["qid"], r["pred_label"], r["n_votes"])
            for r in emb_knn_classify(spark, sf_dir).collect()
        }
        assert {
            (r["qid"], r["pred_label"], r["n_votes"]) for r in rows
        } == exact
        assert rows and all(r["ivf_agree_ok"] for r in rows)


def test_knn_ivf_candidate_stage_is_pruned(spark):
    """The scale claim, asserted not narrated: the IVF candidate stage
    scores strictly fewer (query, candidate) pairs than the exact
    broadcast nested loop — n_probe/|cells| of the corpus per query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.functions.similarity import (
        cosine,
        kmeans_cells,
        sq_dist,
    )
    from mysql_cdc_table_spark.functions.similarity import default_nprobe
    from mysql_cdc_table_spark.operators._util import t

    e = t(spark, SF, "embeddings")
    cells = kmeans_cells(spark, SF)
    ec = e.join(cells, "vec_id")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cents = (
        ec.select("cid", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    n_probe = default_nprobe(cents.count())
    w_cell = Window.partitionBy("qid").orderBy(
        F.col("d").asc(), F.col("cid").asc()
    )
    probe = (
        cents.join(F.broadcast(q))
        .select("cid", "qid", sq_dist(F.col("centroid"), F.col("qv")).alias("d"))
        .withColumn("crk", F.row_number().over(w_cell))
        .filter(F.col("crk") <= n_probe)
        .select("qid", "cid")
    )
    n_queries = q.count()
    n_corpus = e.count()
    pruned_pairs = ec.join(probe, "cid").count()
    assert pruned_pairs < n_queries * (n_corpus - 1)
    # sqrt(nlist) of sqrt(N) cells: well under the exhaustive count
    assert pruned_pairs < 0.7 * n_queries * n_corpus


# --- round 9: two-level grid ranking property ---------------------------------


def test_grid_prefix_prev_equals_naive_window(spark):
    """_grid_prefix_prev (range-bucketed two-level prefix sum) must
    return EXACTLY the naive unpartitioned running sum it replaced —
    for adversarial grids: heavy ties (all values equal), negative
    values, single value, values straddling approxQuantile boundaries,
    and counts that differ per value."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.operators.round8 import _grid_prefix_prev

    rnd = random.Random(90210)
    cases = [
        [(v, 1) for v in range(100)],                      # dense grid
        [(7, 13)],                                         # single value
        [(v, 3) for v in [5] * 1],                         # trivial
        [(-(10**9) + v * 7919, rnd.randint(1, 9))          # wide + negative
         for v in range(257)],
        [(rnd.randint(-50, 50), rnd.randint(1, 5))         # heavy ties
         for _ in range(300)],
    ]
    for rows in cases:
        # collapse duplicate vm (the helper's contract: grid rows unique)
        agg: dict[int, int] = {}
        for v, c in rows:
            agg[v] = agg.get(v, 0) + c
        grid = spark.createDataFrame(
            [(v, c) for v, c in agg.items()], "vm long, ct long"
        ).repartition(8)
        got = {
            r["vm"]: r["prev"]
            for r in _grid_prefix_prev(grid, "ct").collect()
        }
        w = Window.orderBy("vm").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["vm"]: r["prev"]
            for r in grid.select(
                "vm", (F.sum("ct").over(w) - F.col("ct")).alias("prev")
            ).collect()
        }
        assert got == want


# --- round 10: brute-force value checks for the pair statistics -------------


def test_kendall_tau_grid_matches_bruteforce(spark, sf_dir):
    """τ-b sufficient statistics from the grid-pair form must equal the
    O(n²) definition on the actual (small-sf) data."""
    from mysql_cdc_table_spark.operators.round10 import agg_kendall_tau_grid

    row = agg_kendall_tau_grid(spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "cast(floor(l_quantity) as long) x",
            "cast(l_linenumber as long) y",
        )
        .collect()
    )
    xs = [(r["x"], r["y"]) for r in li]
    nc = nd = 0
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            dx = (xs[i][0] > xs[j][0]) - (xs[i][0] < xs[j][0])
            dy = (xs[i][1] > xs[j][1]) - (xs[i][1] < xs[j][1])
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    assert int(row["n_conc"]) == nc
    assert int(row["n_disc"]) == nd
    from collections import Counter

    cx, cy = Counter(x for x, _ in xs), Counter(y for _, y in xs)
    assert int(row["tie_x_x2"]) == sum(n * (n - 1) for n in cx.values())
    assert int(row["tie_y_x2"]) == sum(n * (n - 1) for n in cy.values())
    assert row["n"] == len(xs)


def test_gini_matches_bruteforce(spark, sf_dir):
    """The grid-rank Gini sufficient statistics must equal the sorted
    per-row definition Σ rank·x (ranks 1..n, ties in value order)."""
    from mysql_cdc_table_spark.operators.round10 import agg_gini_coefficient

    row = agg_gini_coefficient(spark, sf_dir).collect()[0]
    vals = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("cast(floor(o_totalprice * 100) as long)")
        .collect()
    )
    assert row["n"] == len(vals)
    assert row["sum_cents"] == sum(vals)
    assert int(row["rank_weighted_sum"]) == sum(
        (i + 1) * v for i, v in enumerate(vals)
    )


def test_ks_two_sample_matches_bruteforce(spark, sf_dir):
    """The two-level-prefix KS statistic must equal the per-value ECDF
    definition computed in Python on the actual data."""
    from collections import Counter

    from mysql_cdc_table_spark.operators.round10 import agg_ks_two_sample

    row = agg_ks_two_sample(spark, sf_dir).collect()[0]
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type", "cast(floor(value * 1000) as long) vm")
        .collect()
    )
    types = sorted({r["event_type"] for r in e})[:2]
    ca = Counter(r["vm"] for r in e if r["event_type"] == types[0])
    cb = Counter(r["vm"] for r in e if r["event_type"] == types[1])
    n1, n2 = sum(ca.values()), sum(cb.values())
    assert (row["type_a"], row["type_b"]) == (types[0], types[1])
    assert (row["n1"], row["n2"]) == (n1, n2)
    cum1 = cum2 = 0
    best, at = -1, None
    for v in sorted(set(ca) | set(cb)):
        cum1 += ca.get(v, 0)
        cum2 += cb.get(v, 0)
        d = abs(cum1 * n2 - cum2 * n1)
        if d > best:
            best, at = d, v
    assert row["d_num"] == best
    assert row["vm_at_max"] == at


def test_fuzzy_blocked_matches_bruteforce(spark, sf_dir):
    """The distinct-names-with-multiplicities rewrite must equal the
    naive definition: all ROW pairs (distinct part keys) in the same
    block with 0 < levenshtein <= 2 — pair_weight counts row pairs,
    n_near_pairs counts distinct-NAME pairs."""
    from collections import Counter

    from mysql_cdc_table_spark.operators.round10 import join_fuzzy_blocked

    got = {
        r["block"]: r.asDict()
        for r in join_fuzzy_blocked(spark, sf_dir).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = Counter(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name")
        .collect()
    )
    by_block: dict = {}
    for name, cnt in names.items():
        by_block.setdefault(name.split(" ")[-1], []).append((name, cnt))
    want_blocks = 0
    for block, members in by_block.items():
        members.sort()
        pairs = []
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                d = lev(members[i][0], members[j][0])
                if 0 < d <= 2:
                    pairs.append((d, members[i][1] * members[j][1]))
        if not pairs:
            assert block not in got
            continue
        want_blocks += 1
        row = got[block]
        assert row["n_names"] == len(members)
        assert row["n_rows"] == sum(c for _, c in members)
        assert row["n_near_pairs"] == len(pairs)
        assert row["pair_weight"] == sum(w for _, w in pairs)
        assert row["sum_dist"] == sum(d for d, _ in pairs)
        assert row["min_dist"] == min(d for d, _ in pairs)
    assert want_blocks == len(got) and want_blocks > 0


def test_wilson_bounds_match_python_formula(spark, sf_dir):
    """The Wilson interval columns must equal the closed-form formula
    computed in plain Python IEEE doubles from the exact arm counts —
    proving the emitted bounds ARE Wilson bounds, not merely that two
    engines agree on some expression."""
    import math

    from mysql_cdc_table_spark.operators.round10 import (
        agg_ab_conversion_wilson,
    )

    for row in agg_ab_conversion_wilson(spark, sf_dir).collect():
        n, c = float(row["n_users"]), float(row["n_conv"])
        p = c / n
        z = 1.96
        denom = 1.0 + z * z / n
        center = p + z * z / (2.0 * n)
        rad = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        assert row["rate_e6"] == math.floor(1_000_000.0 * p)
        assert row["wilson_lo_e6"] == math.floor(
            1_000_000.0 * (center - rad) / denom
        )
        assert row["wilson_hi_e6"] == math.floor(
            1_000_000.0 * (center + rad) / denom
        )
        assert row["wilson_lo_e6"] <= row["rate_e6"] <= row["wilson_hi_e6"]
