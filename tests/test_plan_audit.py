"""Optimizer-property regression tests: the plans SCALE.md promises are
asserted here — pushdown, pruning, broadcasts, bounded shuffles."""

from __future__ import annotations

from mysql_cdc_table_spark.cdc.queries import cdc_latest_state
from mysql_cdc_table_spark.operators.joins import (
    join_theta_band,
    q3_shipping_priority,
    q5_regional_revenue,
)
from mysql_cdc_table_spark.operators.relational import (
    proj_computed,
    q1_pricing_summary,
)
from mysql_cdc_table_spark.plans.audit import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_no_cartesian,
    shuffle_count,
)

LINEITEM_WIDTH = 11


def test_q1_scan_pushdown_and_pruning(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert_filter_pushed(df, "l_shipdate")
    assert_columns_pruned(df, LINEITEM_WIDTH)
    # partial agg -> final agg -> sort: at most 2 shuffle exchanges
    assert shuffle_count(df) <= 2


def test_proj_reads_only_needed_columns(spark, sf_dir):
    assert_columns_pruned(proj_computed(spark, sf_dir), LINEITEM_WIDTH)


def test_q3_broadcasts_dims(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert_filter_pushed(df, "c_mktsegment")
    assert_filter_pushed(df, "l_shipdate")
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_q5_snowflake_all_dims_broadcast(spark, sf_dir):
    df = q5_regional_revenue(spark, sf_dir)
    assert_filter_pushed(df, "r_name")
    assert_broadcast_join(df, 4)
    assert_no_cartesian(df)


def test_theta_band_is_broadcast_not_cartesian(spark, sf_dir):
    df = join_theta_band(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_latest_state_single_shuffle(spark, sf_dir):
    """The latest-state window must cost exactly one hash shuffle
    (6-branch union is scan-parallel; rank+filter is partition-local)."""
    df = cdc_latest_state(spark, sf_dir)
    assert shuffle_count(df) <= 1


def test_block_pairs_broadcasts_block_counts(spark, sf_dir):
    """The hot-block cap's per-label count join must be a broadcast (the
    counts side is one row per label) — a shuffle join here would add a
    full-data exchange to every pair search."""
    from mysql_cdc_table_spark.functions.similarity import ann_block_pairs

    df = ann_block_pairs(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_kafka_envelope_decode_is_narrow(spark, sf_dir):
    """Kafka value decode is CAST + from_json + posexplode: zero shuffles
    — one task per Kafka partition, decode cost scales linearly."""
    from mysql_cdc_table_spark.cdc.queries import cdc_kafka_envelope_decode

    from mysql_cdc_table_spark.cdc.synthetic import synthetic_envelopes

    df = cdc_kafka_envelope_decode(spark, sf_dir)
    # the synthetic generator repartitions per union branch; the decode
    # stage itself (CAST + from_json + posexplode) must add ZERO shuffles
    # on top of its input
    assert shuffle_count(df) == shuffle_count(synthetic_envelopes(spark, sf_dir))


def test_knn_join_partial_topk_before_shuffle(spark, sf_dir):
    """The per-query top-k must be applied map-side (WindowGroupLimit
    Partial) so only <=k rows per qid reach the window shuffle, and the
    small query sample must broadcast."""
    from mysql_cdc_table_spark.functions.similarity import ann_knn_join
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = ann_knn_join(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert count_nodes(df, "Exchange") <= 2  # window shuffle (+AQE read)


def test_contamination_broadcasts_benchmark_set(spark, sf_dir):
    """The benchmark shingle vocabulary and per-doc hit counts must both
    ride broadcast joins — the corpus side never shuffles for the probe."""
    from mysql_cdc_table_spark.functions.text import text_contamination

    df = text_contamination(spark, sf_dir)
    assert_broadcast_join(df, 2)
    assert_no_cartesian(df)


def test_sessionize_single_user_partitioning(spark, sf_dir):
    """Both windows and the session rollup share one hash partitioning on
    user_id — a single shuffle end-to-end."""
    from mysql_cdc_table_spark.operators.analytics import sessionize_events
    from mysql_cdc_table_spark.plans.audit import shuffle_count

    assert shuffle_count(sessionize_events(spark, sf_dir)) <= 1


def test_retention_broadcasts_cohort_sizes(spark, sf_dir):
    from mysql_cdc_table_spark.operators.analytics import retention_cohorts

    df = retention_cohorts(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_pii_scrub_is_pure_scan_map(spark, sf_dir):
    """Redaction rides the scan: zero shuffles, no join."""
    from mysql_cdc_table_spark.functions.quality import text_pii_scrub

    df = text_pii_scrub(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert_no_cartesian(df)


def test_repetition_score_bounded_shuffles(spark, sf_dir):
    """Two gram aggs + per-doc reduce + doc_id join: all keyed on
    doc_id/gram — bounded exchange count, no cartesian."""
    from mysql_cdc_table_spark.functions.quality import text_repetition_score

    df = text_repetition_score(spark, sf_dir)
    assert shuffle_count(df) <= 5
    assert_no_cartesian(df)


def test_mix_equalize_broadcasts_floor(spark, sf_dir):
    """The stratum floor is a broadcast scalar; ranking is the only
    source-keyed exchange."""
    from mysql_cdc_table_spark.functions.quality import corpus_mix_equalize
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_mix_equalize(spark, sf_dir)
    # 1-row floor joined without a key -> BroadcastNestedLoopJoin (cheap:
    # one scalar row against the stream), never a CartesianProduct
    assert count_nodes(df, "BroadcastNestedLoopJoin") >= 1
    assert_no_cartesian(df)


def test_lsh_topk_broadcasts_query(spark, sf_dir):
    """Signature + probe filter ride the scan; the query row is
    broadcast; top-k is TakeOrdered (no global sort shuffle)."""
    from mysql_cdc_table_spark.functions.similarity import ann_lsh_rp_topk
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ann_lsh_rp_topk(spark, sf_dir)
    # the 1-row (qv, qb) side joins without a key -> BroadcastNestedLoopJoin
    assert count_nodes(df, "BroadcastNestedLoopJoin") >= 1
    assert_no_cartesian(df)
    assert shuffle_count(df) == 0


def test_q8_snowflake_dims_broadcast(spark, sf_dir):
    """q8's five dims (customer, both nations, region, supplier) must
    all broadcast; only the lineitem-orders fact-fact join may shuffle."""
    from mysql_cdc_table_spark.operators.tpch import q8_market_share

    df = q8_market_share(spark, sf_dir)
    assert_broadcast_join(df, 5)
    assert_no_cartesian(df)
    assert_filter_pushed(df, "o_orderdate")


def test_q9_part_filter_pushed_and_dims_broadcast(spark, sf_dir):
    """q9's part-name filter must reach the part scan; part, supplier
    and nation broadcast onto the lineitem stream — zero fact shuffles
    before the two-level aggregate."""
    from mysql_cdc_table_spark.operators.tpch import q9_product_profit

    df = q9_product_profit(spark, sf_dir)
    assert_broadcast_join(df, 3)
    assert_no_cartesian(df)


def test_q11_scalar_total_broadcast(spark, sf_dir):
    """q11's grand-total side is one row — it must broadcast onto the
    per-part aggregate, never shuffle it."""
    from mysql_cdc_table_spark.operators.tpch import q11_important_parts
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = q11_important_parts(spark, sf_dir)
    assert (
        count_nodes(df, "BroadcastHashJoin")
        + count_nodes(df, "BroadcastNestedLoopJoin")
        >= 1
    )
    assert_no_cartesian(df)


def test_q16_anti_join_broadcast(spark, sf_dir):
    """q16's NOT-IN supplier exclusion must plan as a broadcast anti
    join (the deficit-supplier list is tiny)."""
    from mysql_cdc_table_spark.operators.tpch import q16_supplier_part_counts
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = q16_supplier_part_counts(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert_broadcast_join(df, 2)  # part dim + anti join
    assert_no_cartesian(df)


def test_topk_per_group_partial_limit_before_shuffle(spark, sf_dir):
    """topk_per_group costs exactly ONE shuffle in both of its shapes
    (r15): on narrow inputs (fewer row groups than scheduler slots —
    every bench file) the scan is spread BY THE WINDOW KEY, so the
    spread exchange doubles as the window's distribution and the sort
    is parallel; on many-row-group inputs the spread is a no-op and the
    plan keeps the two-level WindowGroupLimit (map-side partial top-k
    below the hash exchange), which prunes before the shuffle."""
    from mysql_cdc_table_spark.catalog import scan_chunks
    from mysql_cdc_table_spark.operators.windows import topk_per_group
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = topk_per_group(spark, sf_dir)
    assert shuffle_count(df) == 1
    plan = formatted_plan(df)
    narrow = (
        scan_chunks(spark, sf_dir, "lineitem")
        < spark.sparkContext.defaultParallelism
    )
    if narrow:
        # spread shape: the one exchange IS the window distribution
        assert "REPARTITION_BY_NUM" in plan, plan
        assert count_nodes(df, "WindowGroupLimit") >= 1
    else:
        # natural-parallelism shape: partial top-k below the exchange
        assert count_nodes(df, "WindowGroupLimit") == 2
        assert plan.rindex("WindowGroupLimit") > plan.index("Exchange")


def test_knn_join_no_forced_broadcast_of_query_side(spark, sf_dir):
    """The knn-join query side grows with the corpus (1-in-50 sample):
    the default plan must NOT statically broadcast it — modeled here by
    disabling the auto-broadcast threshold (the big-data condition) and
    asserting the candidate join falls back to a shuffle join on the
    block key. With broadcast_queries=True (a fixed small probe set)
    the hint must force the broadcast back."""
    from mysql_cdc_table_spark.functions.similarity import ann_knn_join
    from mysql_cdc_table_spark.plans.audit import count_nodes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = ann_knn_join(spark, sf_dir)
        assert count_nodes(df, "BroadcastHashJoin") == 0, (
            "query side statically broadcast despite modeled big data"
        )
        assert_no_cartesian(df)
        forced = ann_knn_join(spark, sf_dir, broadcast_queries=True)
        assert count_nodes(forced, "BroadcastHashJoin") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lateral_topn_decorrelates_without_cartesian(spark, sf_dir):
    """The correlated LATERAL + LIMIT must decorrelate to a ranked
    equi-join — never a per-row nested loop or cartesian product."""
    from mysql_cdc_table_spark.operators.extras import join_lateral_topn

    df = join_lateral_topn(spark, sf_dir)
    assert_no_cartesian(df)


def test_pack_sequences_no_single_partition_window(spark, sf_dir):
    """corpus_pack_sequences must inherit shard_manifest's two-level
    prefix-sum shape: the doc-level window is hash-partitioned by bkt;
    only the 32-row bucket-offset table may cross one partition."""
    from mysql_cdc_table_spark.functions.quality import corpus_pack_sequences
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    plan = formatted_plan(corpus_pack_sequences(spark, sf_dir))
    assert "hashpartitioning(bkt" in plan, plan


def test_shard_manifest_no_single_partition_window(spark, sf_dir):
    """The global prefix sum must be two-level: no window may run on a
    single unpartitioned exchange (the plan has no `Exchange SinglePartition`
    feeding a Window over the full document set — only the 32-row bucket
    offset table is allowed through one)."""
    from mysql_cdc_table_spark.functions.quality import shard_manifest
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = shard_manifest(spark, sf_dir)
    plan = formatted_plan(df)
    # the only SinglePartition exchange permitted is the tiny bucket-total
    # window (input = one row per bucket); the document-level window must
    # be hash-partitioned by bkt
    assert "hashpartitioning(bkt" in plan, plan


def test_ohlc_is_one_hash_aggregate(spark, sf_dir):
    """ts_resample_ohlc must stay a plain map-side-combinable hash agg:
    exactly one shuffle (partial -> exchange -> final), no window/sort
    over the events fact table."""
    from mysql_cdc_table_spark.operators.round4 import ts_resample_ohlc
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = ts_resample_ohlc(spark, sf_dir)
    assert shuffle_count(df) <= 1
    assert "Window" not in formatted_plan(df)


def test_asof_nearest_single_sort_and_window(spark, sf_dir):
    """Backward (last-preceding) and forward (first-following) passes
    must merge into ONE Window operator over ONE exchange+sort of the
    union — a second Window/Sort would mean the forward pass
    re-partitioned. The only other allowed shuffle is the right side's
    (custkey, date) pre-dedup aggregate."""
    from mysql_cdc_table_spark.operators.round4 import join_asof_nearest
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = join_asof_nearest(spark, sf_dir)
    assert shuffle_count(df) <= 2
    plan = formatted_plan(df)
    # formatted plans name each node twice (tree + detail): count tree nodes
    assert plan.count("Window (") == 1, plan
    assert plan.count("Sort (") <= 1, plan


def test_agg_mode_windows_only_the_group_grid(spark, sf_dir):
    """agg_mode's window runs over the (status, priority) grid produced
    by the aggregation — the orders fact table itself is never
    window-sorted (hashpartitioning on the agg keys precedes it)."""
    from mysql_cdc_table_spark.operators.round4 import agg_mode
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    plan = formatted_plan(agg_mode(spark, sf_dir))
    assert "hashpartitioning(o_orderstatus" in plan, plan


def test_emb_centroids_one_aggregate_after_explode(spark, sf_dir):
    """emb_centroid_stats: posexplode fan-out is scan-parallel; the only
    shuffle is the (label, dim) hash aggregation with map-side
    partials."""
    from mysql_cdc_table_spark.operators.round4 import emb_centroid_stats
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = emb_centroid_stats(spark, sf_dir)
    assert shuffle_count(df) <= 1
    assert "partial" in formatted_plan(df).lower()


def test_interval_overlap_is_broadcast_bin_join_no_dedup(spark, sf_dir):
    """join_interval_overlap: the window side broadcasts (25 nations x a
    few bins), the pair set is attributed to one bin by predicate (no
    distinct/dedup exchange), and the only shuffle is the final
    per-window aggregate."""
    from mysql_cdc_table_spark.operators.round5 import join_interval_overlap
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = join_interval_overlap(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "HashAggregate" in plan
    from mysql_cdc_table_spark.plans.audit import shuffle_count

    assert shuffle_count(df) <= 1, plan  # only the final groupBy(n_name)


def test_interval_islands_one_sort_per_partition(spark, sf_dir):
    """window_interval_islands: the running-max and island-id windows
    share ONE exchange+sort on l_suppkey — a second Sort would mean the
    prefix-sum re-partitioned the fact table."""
    from mysql_cdc_table_spark.operators.round5 import window_interval_islands
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = window_interval_islands(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Sort (") <= 1, plan
    assert "hashpartitioning(l_suppkey" in plan, plan


def test_unigram_logprob_total_is_broadcast(spark, sf_dir):
    """text_unigram_logprob: the 1-row corpus total joins by broadcast;
    the term->count join is left to AQE (no forced broadcast of a
    vocab-sized table)."""
    from mysql_cdc_table_spark.operators.round5 import text_unigram_logprob
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    plan = formatted_plan(text_unigram_logprob(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_split_hash_is_projection_plus_one_agg(spark, sf_dir):
    """corpus_split_hash: the split label is a pure projection — the
    whole query is scan -> partial agg -> exchange -> final agg, with
    no join, window, or extra shuffle."""
    from mysql_cdc_table_spark.operators.round5 import corpus_split_hash
    from mysql_cdc_table_spark.plans.audit import formatted_plan, shuffle_count

    df = corpus_split_hash(spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 1, plan
    assert "Window" not in plan and "Join" not in plan, plan
    assert "partial" in plan.lower()


def test_interpolate_single_union_sort(spark, sf_dir):
    """ts_interpolate_linear: the four lasts collapse into exactly TWO
    Window operators (asc + desc orderings) over ONE user-partitioned
    union with at most two sorts — chained withColumn used to interleave
    projections that blocked CollapseWindow and ran FOUR window passes
    (7.0s vs 1.0s at sf0.1)."""
    from mysql_cdc_table_spark.operators.round5 import ts_interpolate_linear
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    plan = formatted_plan(ts_interpolate_linear(spark, sf_dir))
    assert "hashpartitioning(user_id" in plan, plan
    assert plan.count("Sort (") <= 2, plan
    assert plan.count("Window (") == 2, plan


def test_length_histogram_single_agg(spark, sf_dir):
    """corpus_length_histogram: scan -> partial agg -> exchange ->
    final agg; the CASE ladder stays a projection."""
    from mysql_cdc_table_spark.operators.round5 import corpus_length_histogram
    from mysql_cdc_table_spark.plans.audit import formatted_plan, shuffle_count

    df = corpus_length_histogram(spark, sf_dir)
    assert shuffle_count(df) <= 1
    assert "partial" in formatted_plan(df).lower()


def test_rate_of_change_one_window_partition(spark, sf_dir):
    """ts_rate_of_change: both lags share one user_id-partitioned
    window — a single exchange + sort over the events fact table."""
    from mysql_cdc_table_spark.operators.round5 import ts_rate_of_change
    from mysql_cdc_table_spark.plans.audit import formatted_plan, shuffle_count

    df = ts_rate_of_change(spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 1, plan
    assert plan.count("Window (") == 1, plan


# --- round 6 shapes ----------------------------------------------------------


def test_zscore_anomaly_single_fused_window(spark, sf_dir):
    """avg/stddev/count share ONE frame: CollapseWindow must fuse them
    into a single Window operator over one exchange+sort."""
    from mysql_cdc_table_spark.operators.round6 import window_zscore_anomaly
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = window_zscore_anomaly(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) == 1


def test_asof_forward_one_shuffle_one_window(spark, sf_dir):
    """The forward as-of keeps the union idiom's budget: one exchange
    per side feeding ONE Window pass — never a range join."""
    from mysql_cdc_table_spark.operators.round6 import join_asof_forward
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = join_asof_forward(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert_no_cartesian(df)
    # probe-side projection + orders pre-dedup agg + the union's keyed
    # partition: bounded, no per-row fan-out joins
    assert shuffle_count(df) <= 3


def test_ngram_novelty_bounded_shuffles(spark, sf_dir):
    """Gram relation -> distinct -> first-owner agg -> join back ->
    per-doc agg: every stage is a hash op on (g) or (doc_id); no
    cartesian, no window over the raw gram stream."""
    from mysql_cdc_table_spark.operators.round6 import corpus_ngram_novelty
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_ngram_novelty(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0
    assert shuffle_count(df) <= 5


def test_phrase_boilerplate_topk_over_aggregated_grid(spark, sf_dir):
    """The window ranks the AGGREGATED (source, phrase) grid, not raw
    occurrences — and Spark's rank-limit pushdown (WindowGroupLimit)
    must fire so each partition keeps only ~k rows per source before
    the final rank."""
    from mysql_cdc_table_spark.operators.round6 import (
        corpus_phrase_boilerplate,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_phrase_boilerplate(spark, sf_dir)
    assert count_nodes(df, "WindowGroupLimit") >= 1  # top-k pushdown
    assert shuffle_count(df) <= 3


def test_fn_datetime3_pure_projection(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round6 import fn_datetime3

    df = fn_datetime3(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert_columns_pruned(df, 6)  # orders is 6 wide; scan reads 2 cols


def test_cross_source_contamination_bounded_fanout(spark, sf_dir):
    """The pair relation joins the distinct (source, gram) relation to
    itself on gram — hash ops only, no cartesian, no window; totals
    broadcast."""
    from mysql_cdc_table_spark.operators.round6 import (
        corpus_cross_source_contamination,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_cross_source_contamination(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0
    assert_broadcast_join(df, 2)  # both per-source total joins


def test_knn_classify_rank_pushdown(spark, sf_dir):
    """Both windows (neighbour rank, vote rank) get the rank-limit
    pushdown; the tiny query side broadcasts (vec_id != qid is a
    non-equi condition, so Spark plans a BroadcastNestedLoopJoin of the
    tiny probe side — never a cartesian)."""
    from mysql_cdc_table_spark.operators.round6 import emb_knn_classify
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = emb_knn_classify(spark, sf_dir)
    assert count_nodes(df, "WindowGroupLimit") >= 2
    assert count_nodes(df, "BroadcastNestedLoopJoin") >= 1
    assert_no_cartesian(df)


def test_heavy_hitters_candidates_broadcast(spark, sf_dir):
    """Pass 2 counts ONLY the MG candidates: the candidate list and the
    n-total aggregate both BROADCAST to the word scan; the only hash
    shuffle carries ≤ partitions×K candidate words, never the
    vocabulary."""
    from mysql_cdc_table_spark.operators.round7 import agg_heavy_hitters_mg
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_heavy_hitters_mg(spark, sf_dir)
    assert_no_cartesian(df)
    assert_broadcast_join(df, 1)  # candidate list -> word scan
    # the 1-row n_total side rides a broadcast nested loop, not a hash join
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 1
    assert shuffle_count(df) <= 3


def test_ewma_one_sort_per_user_partition(spark, sf_dir):
    """The EWMA is one keyed window: exactly one exchange on user_id,
    one sort, one Window; the fold runs inside the projection."""
    from mysql_cdc_table_spark.operators.round7 import ts_ewma_window
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_ewma_window(spark, sf_dir)
    assert shuffle_count(df) == 1
    assert count_nodes(df, "Window") == 1
    assert_columns_pruned(df, 6)  # events is 6 wide; scan reads 4 cols


def test_holt_one_sort_per_user_partition(spark, sf_dir):
    """Holt smoothing shares the EWMA plan shape: one exchange on
    user_id, one Window; the struct fold runs inside the projection —
    no extra shuffle for the second (trend) recurrence."""
    from mysql_cdc_table_spark.operators.round7 import ts_holt_linear
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_holt_linear(spark, sf_dir)
    assert shuffle_count(df) == 1
    assert count_nodes(df, "Window") == 1
    assert_columns_pruned(df, 6)  # events is 6 wide; scan reads 4 cols


def test_rake_doc_local_no_cartesian(spark, sf_dir):
    """RAKE is document-local end-to-end: every join/agg keys on
    doc_id (or finer), no cartesian, no corpus-wide vocabulary state;
    the rank is a per-doc WindowGroupLimit."""
    from mysql_cdc_table_spark.operators.round7 import text_rake_keywords
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = text_rake_keywords(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "WindowGroupLimit") >= 1  # top-k pushdown
    assert_columns_pruned(df, 5)  # documents is 5 wide; scan reads 2


def test_cms_sketch_broadcast_fixed_state(spark, sf_dir):
    """CMS plan: the sketch (≤ d·w = 2048 cells) and the 1-row total
    both broadcast to the probe stage; no cartesian; the only
    vocabulary-sized shuffle is the exact-count companion the probe
    set is defined by."""
    from mysql_cdc_table_spark.operators.round7 import agg_count_min_sketch
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_count_min_sketch(spark, sf_dir)
    assert_no_cartesian(df)
    assert_broadcast_join(df, 1)  # sketch -> probes
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 1  # 1-row total


def test_emb_dim_variance_single_agg(spark, sf_dir):
    """One posexplode + one hash agg over the 64-dim grid; the rank
    window runs on that tiny grid, not the fact table."""
    from mysql_cdc_table_spark.operators.round7 import emb_dim_variance
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = emb_dim_variance(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 2  # dim agg + 64-row rank exchange


def test_cusum_one_sort_per_user_partition(spark, sf_dir):
    """CUSUM shares the EWMA/Holt plan shape: one exchange on user_id,
    one Window, fold in the projection."""
    from mysql_cdc_table_spark.operators.round7 import ts_cusum_drift
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_cusum_drift(spark, sf_dir)
    assert shuffle_count(df) == 1
    assert count_nodes(df, "Window") == 1


def test_weighted_quantiles_grid_window(spark, sf_dir):
    """The cumulative-weight window runs over the pre-aggregated
    (flag, cents) grid, never the fact rows; totals broadcast."""
    from mysql_cdc_table_spark.operators.round7 import agg_weighted_quantiles
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_weighted_quantiles(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 1
    assert_broadcast_join(df, 1)  # per-flag totals


def test_drawdown_two_windows_one_exchange(spark, sf_dir):
    """Running peak and per-user worst share the user_id exchange —
    no second shuffle for the full-partition max."""
    from mysql_cdc_table_spark.operators.round7 import window_drawdown_max

    df = window_drawdown_max(spark, sf_dir)
    assert_no_cartesian(df)
    assert shuffle_count(df) <= 2  # user window + final agg reuse


def test_url_parse_scan_side_expressions(spark, sf_dir):
    """parse_url runs in the scan projection; the only shuffle is the
    host aggregate; part scan prunes to the 4 consumed columns."""
    from mysql_cdc_table_spark.operators.round7 import fn_url_parse

    df = fn_url_parse(spark, sf_dir)
    assert_no_cartesian(df)
    assert shuffle_count(df) <= 1
    assert_columns_pruned(df, 6)  # part is 6 wide; scan reads 4


def test_bloom_fixed_state_broadcast(spark, sf_dir):
    """Bloom plan: the 64-slot filter broadcasts to both probe stages;
    the absent-probe bound rides a 1-row broadcast; no cartesian."""
    from mysql_cdc_table_spark.operators.round7 import agg_bloom_membership
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_bloom_membership(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 1  # fp_ok row


def test_bitmap_distinct_two_hash_aggs(spark, sf_dir):
    """Bitmap distinct: (status, bucket) bitmap agg then per-status
    sum — two keyed hash aggs, map-side-combinable, no window, no
    join; the shuffle carries 4KB bitmaps, never the id stream."""
    from mysql_cdc_table_spark.operators.round7 import agg_bitmap_distinct
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_bitmap_distinct(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0
    assert shuffle_count(df) <= 2


def test_autocorr_one_sort_all_lags(spark, sf_dir):
    """All three lag columns ride ONE window over one user_id
    exchange; the Pearson pieces are one hash agg."""
    from mysql_cdc_table_spark.operators.round7 import ts_autocorr_exact
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_autocorr_exact(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 2  # user sort + final agg


def test_vocab_overlap_bounded_fanout(spark, sf_dir):
    """Source-vocab Jaccard: the only non-broadcast join is the
    term-keyed self-join (fan-out bounded by sources²); sizes
    broadcast back; no cartesian."""
    from mysql_cdc_table_spark.operators.round7 import (
        corpus_source_vocab_overlap,
    )

    df = corpus_source_vocab_overlap(spark, sf_dir)
    assert_no_cartesian(df)
    assert_broadcast_join(df, 2)  # the two size grids


def test_interval_bucketed_join_is_equi(spark, sf_dir):
    """THE point of the bucketed interval join: the overlap pairs meet
    by an EQUI join on the bucket id (hash/sort-merge — partitionable
    at any scale), never a BroadcastNestedLoopJoin / cartesian the
    naive range join degenerates to when both sides are big."""
    from mysql_cdc_table_spark.operators.round7 import join_interval_bucketed
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = join_interval_bucketed(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 0
    # exactly one pair join; both sides exploded scan-side
    plan_joins = (
        count_nodes(df, "SortMergeJoin")
        + count_nodes(df, "ShuffledHashJoin")
        + count_nodes(df, "BroadcastHashJoin")
    )
    assert plan_joins == 1


def test_ks_drift_grid_window(spark, sf_dir):
    """KS: one cumulative window per (t1, t2) over the distinct-cents
    grid; pair dimension and totals broadcast; no cartesian."""
    from mysql_cdc_table_spark.operators.round7 import agg_ks_drift
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_ks_drift(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 1
    assert_broadcast_join(df, 3)  # pairs (×2 sides) + totals


def test_minhash_eval_lsh_bounded(spark, sf_dir):
    """The calibration joins key on doc ids off the LSH candidate set —
    no cartesian, no all-pairs anywhere."""
    from mysql_cdc_table_spark.operators.round7 import dedup_minhash_eval

    df = dedup_minhash_eval(spark, sf_dir)
    assert_no_cartesian(df)


def test_sma_crossover_one_exchange(spark, sf_dir):
    """Both SMA frames fuse into one Window; the lag (a different
    frame spec) stacks as a second Window on the SAME sort — the real
    guarantee is one user_id exchange."""
    from mysql_cdc_table_spark.operators.round7 import ts_sma_crossover
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_sma_crossover(spark, sf_dir)
    assert count_nodes(df, "Window") == 2  # frames + lag, shared sort
    assert shuffle_count(df) <= 2  # user sort + final agg


def test_rolling_mad_one_window(spark, sf_dir):
    """Rolling MAD: the frame collect + both sorted-array middle-sums
    run inside one Window + projection — no second shuffle for the
    deviation median."""
    from mysql_cdc_table_spark.operators.round7 import (
        window_rolling_mad_outlier,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = window_rolling_mad_outlier(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) == 1


def test_zipf_vocab_sized_window(spark, sf_dir):
    """Zipf curve: the rank/cumsum window runs over the VOCABULARY
    aggregate, never the token stream; one-row output."""
    from mysql_cdc_table_spark.operators.round7 import corpus_zipf_coverage
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_zipf_coverage(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert_no_cartesian(df)


def test_centroid_drift_grid_join(spark, sf_dir):
    """Centroid drift: one (label, half, dim) hash agg feeds a tiny
    grid self-join — no cartesian, the fact table explodes once."""
    from mysql_cdc_table_spark.operators.round7 import emb_centroid_drift

    df = emb_centroid_drift(spark, sf_dir)
    assert_no_cartesian(df)
    assert shuffle_count(df) <= 4


def test_gini_one_rank_window(spark, sf_dir):
    """Gini: one rank window per status partition + one hash agg."""
    from mysql_cdc_table_spark.operators.round7 import agg_gini_revenue
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_gini_revenue(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 2


def test_monotone_runs_shared_sort(spark, sf_dir):
    """Monotone runs: the lag and the cumulative island id are two
    frame specs stacked on ONE user sort (one exchange); two hash
    aggs follow."""
    from mysql_cdc_table_spark.operators.round7 import window_monotone_runs
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = window_monotone_runs(spark, sf_dir)
    assert count_nodes(df, "Window") == 2  # lag + running sum, shared sort
    assert shuffle_count(df) <= 3


def test_passage_dedup_single_passage_shuffle(spark, sf_dir):
    """One explode + one window over passage partitions + one per-doc
    agg: each passage instance crosses the wire once; no join back, no
    cartesian."""
    from mysql_cdc_table_spark.operators.round7 import corpus_passage_dedup
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_passage_dedup(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 2  # passage window + doc_id agg


def test_knn_ivf_probe_broadcast_no_cartesian(spark, sf_dir):
    """The IVF classifier's probe and query sides broadcast; candidate
    scoring is an equi join on cid (hash, not nested loop); only the
    exact-harness subtree keeps the documented BroadcastNestedLoopJoin."""
    from mysql_cdc_table_spark.operators.round7 import emb_knn_classify_ivf
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = emb_knn_classify_ivf(spark, sf_dir)
    assert_no_cartesian(df)
    # probe join + query join + agreement broadcast, at minimum
    assert_broadcast_join(df, 3)
    assert count_nodes(df, "WindowGroupLimit") >= 2  # both rank limits


def test_range_interval_single_window(spark, sf_dir):
    """Both interval-frame aggregates fuse into ONE Window operator on
    one user_id exchange — the frame is time-bounded, never a range
    join."""
    from mysql_cdc_table_spark.operators.round7 import window_range_interval
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = window_range_interval(spark, sf_dir)
    assert shuffle_count(df) == 1
    assert count_nodes(df, "Window") == 1


def test_hll_union_sketches_only_shuffle(spark, sf_dir):
    """Daily sketch agg -> union agg -> estimate: hash aggregates over
    KB-size sketch state; the exact-distinct companion joins on the
    tiny event_type key — no cartesian, bounded exchanges."""
    from mysql_cdc_table_spark.operators.round7 import agg_hll_union

    df = agg_hll_union(spark, sf_dir)
    assert_no_cartesian(df)
    assert shuffle_count(df) <= 5


def test_quality_rules_two_hash_aggs(spark, sf_dir):
    """(doc, word) agg -> per-doc agg -> per-source rollup: hash ops
    only, no window, no cartesian; per-doc state is four integers."""
    from mysql_cdc_table_spark.operators.round7 import corpus_quality_rules
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = corpus_quality_rules(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 0
    assert shuffle_count(df) <= 4


def test_asof_tolerance_one_union_one_window(spark, sf_dir):
    """The staleness cap is a row-local CASE over the backward as-of
    match — same one-union one-sort idiom as join_asof_orders, never a
    range join that fans probes across the tolerance window."""
    from mysql_cdc_table_spark.operators.round7 import join_asof_tolerance
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = join_asof_tolerance(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 3


def test_pipe_syntax_compiles_to_pushed_scan(spark, sf_dir):
    """The pipe dialect is surface syntax: Catalyst compiles it to the
    same pushed-filter scan + two-exchange aggregate as the nested
    SELECT form (q1's shape)."""
    from mysql_cdc_table_spark.operators.round7 import sql_pipe_syntax

    df = sql_pipe_syntax(spark, sf_dir)
    assert_filter_pushed(df, "l_shipdate")
    assert_columns_pruned(df, LINEITEM_WIDTH)
    assert shuffle_count(df) <= 2


def test_ivf_pruned_search_plan_and_candidate_fraction(spark, sf_dir, tmp_path):
    """The isolated production IVF path (bench entry 19, round-8):
    given a pre-staged index, the search must (a) join candidates on
    the cid EQUI key with the probe list and query set broadcast —
    never a corpus-wide nested loop; (b) score only ~n_probe/|cells|
    of the (query, corpus) pairs the exact classifier scores — the
    candidate fraction a pruning regression would move."""
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.functions.similarity import (
        ivf_pruned_search,
        kmeans_cells,
        trained_centroids,
    )
    from mysql_cdc_table_spark.operators._util import t
    from mysql_cdc_table_spark.functions.similarity import default_nprobe
    from mysql_cdc_table_spark.operators.round7 import KNN_IVF_K
    from mysql_cdc_table_spark.plans.audit import count_nodes

    e = t(spark, sf_dir, "embeddings")
    ec_live = e.join(kmeans_cells(spark, sf_dir), "vec_id")
    # stage like the bench does: the index is parquet, already built
    ec_path, c_path = str(tmp_path / "ec"), str(tmp_path / "cents")
    ec_live.write.parquet(ec_path)
    trained_centroids(ec_live).write.parquet(c_path)
    ec = spark.read.parquet(ec_path)
    cents = spark.read.parquet(c_path)
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    n_probe = default_nprobe(cents.count())
    df = ivf_pruned_search(ec, cents, q, n_probe, KNN_IVF_K)
    # the only nested loop is the tiny centroid-grid x query cross
    # (cells x queries rows); the corpus join is a broadcast EQUI join
    assert count_nodes(df, "BroadcastNestedLoopJoin") <= 1
    assert count_nodes(df, "CartesianProduct") == 0
    assert_broadcast_join(df, 2)  # probe list + query set

    # candidate fraction: scored pairs <= pruned share of exact pairs
    n_corpus = ec.count()
    n_cells = cents.count()
    n_q = q.count()
    scored = ivf_pruned_search(
        ec, cents, q, n_probe, k=1 << 30
    ).count()  # k unbounded -> every scored candidate pair survives
    exact_pairs = n_q * (n_corpus - 1)
    assert scored < exact_pairs  # strictly pruned
    # allow 2x slack over the ideal share for uneven k-means cells
    assert scored <= 2 * exact_pairs * n_probe / n_cells, (
        scored, exact_pairs, n_cells,
    )
    # and every query keeps its k results (pruning didn't drop queries)
    assert (
        ivf_pruned_search(ec, cents, q, n_probe, KNN_IVF_K)
        .groupBy("qid").count().filter(F.col("count") < KNN_IVF_K).count()
        == 0
    )


def test_round8_hash_sample_is_one_pass(spark, sf_dir):
    """Deterministic md5 sampling must stay one map-side pass + the
    grouped agg — no join, no extra shuffle beyond agg + final sort,
    and the scan reads only the 3 needed document columns."""
    from mysql_cdc_table_spark.operators.round8 import corpus_hash_sample

    df = corpus_hash_sample(spark, sf_dir)
    assert_columns_pruned(df, 5)  # documents is 5 wide; needs 3
    assert shuffle_count(df) <= 2  # agg exchange + orderBy range
    assert_no_cartesian(df)


def test_round8_chi2_broadcasts_marginals(spark, sf_dir):
    """The chi-square cross-tab joins three TINY marginal relations
    onto the cells — all broadcast, never a fact-fact shuffle; the
    only nested loop is the keyless 1-row N join."""
    from mysql_cdc_table_spark.operators.round8 import agg_chi2_independence
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = agg_chi2_independence(spark, sf_dir)
    assert_broadcast_join(df, 2)
    assert count_nodes(df, "BroadcastNestedLoopJoin") <= 1  # 1-row N
    assert count_nodes(df, "CartesianProduct") == 0


def test_round8_theil_sen_aggregates_before_fanout(spark, sf_dir):
    """Theil–Sen must fan out PAIRS of the daily grid, not of raw
    events: the self-join is an equi join on event_type (hash/SMJ,
    zero nested loop), and exactly one window ranks the slopes."""
    from mysql_cdc_table_spark.operators.round8 import ts_theil_sen_slope
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_theil_sen_slope(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 0
    assert count_nodes(df, "Window") == 1


def test_round8_entropy_broadcasts_totals(spark, sf_dir):
    from mysql_cdc_table_spark.operators.round8 import agg_entropy_decomp

    df = agg_entropy_decomp(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_round8_log2_histogram_single_agg(spark, sf_dir):
    """Exact log2 bucketing is a map-side expression: one agg exchange
    plus the final sort, scan pruned to the 2 needed event columns."""
    from mysql_cdc_table_spark.operators.round8 import agg_log2_histogram

    df = agg_log2_histogram(spark, sf_dir)
    assert_columns_pruned(df, 6)  # events is 6 wide; needs 2
    assert shuffle_count(df) <= 2
    assert_no_cartesian(df)


def test_round8_wma_single_window_single_shuffle(spark, sf_dir):
    """All four lags + row_number share ONE window spec: one hash
    exchange on user_id, one Window node, no join anywhere."""
    from mysql_cdc_table_spark.operators.round8 import (
        window_weighted_moving_avg,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = window_weighted_moving_avg(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert shuffle_count(df) <= 1
    assert_no_cartesian(df)


def test_round8_hashing_features_bounded_shuffles(spark, sf_dir):
    """Feature hashing: explode is map-side; the only shuffles are the
    two-phase distinct-count aggregation + final sort. No join — the
    feature space is closed, nothing to broadcast."""
    from mysql_cdc_table_spark.operators.round8 import text_hashing_features

    df = text_hashing_features(spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_no_cartesian(df)


def test_round8_quantize_error_stats_single_agg(spark, sf_dir):
    """The int8 error accounting is higher-order expressions over one
    scan + one grouped agg: ≤2 shuffles (agg + sort), no join."""
    from mysql_cdc_table_spark.operators.round8 import (
        emb_quantize_error_stats,
    )

    df = emb_quantize_error_stats(spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert_no_cartesian(df)


def test_round8_mann_kendall_aggregates_before_fanout(spark, sf_dir):
    """Mann–Kendall shares Theil–Sen's scale contract: the pair
    fan-out runs over the DAILY grid (equi self-join on event_type,
    zero nested loop), never over raw events."""
    from mysql_cdc_table_spark.operators.round8 import ts_mann_kendall
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = ts_mann_kendall(spark, sf_dir)
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 0


def test_round8_sql_parameterized_binds_to_pushed_literal_plan(spark, sf_dir):
    """Parameter binding must resolve to the literal plan: the bound
    predicate pushes to the parquet scan like any constant filter."""
    from mysql_cdc_table_spark.operators.round8 import sql_parameterized

    df = sql_parameterized(spark, sf_dir)
    assert_filter_pushed(df, "o_orderpriority")
    assert shuffle_count(df) <= 2


def test_round8_incremental_agg_is_one_pass_no_window(spark, sf_dir):
    """The IVM point, asserted: the delta-maintained aggregate costs
    ONE map-side-combinable aggregation over the changelog scan —
    zero Window nodes, zero joins — where the latest-state oracle
    needs the full per-key ranking."""
    from mysql_cdc_table_spark.operators.round8 import cdc_incremental_agg
    from mysql_cdc_table_spark.plans.audit import count_nodes

    df = cdc_incremental_agg(spark, sf_dir)
    assert count_nodes(df, "Window") == 0
    assert shuffle_count(df) <= 2  # agg exchange + final sort
    assert_no_cartesian(df)


def test_round8_mann_whitney_windows_the_grid_not_rows(spark, sf_dir):
    """MW-U's ranking runs over the DISTINCT-VALUE grid (post-
    aggregation), never the raw rows — and since round 9 in the
    range-bucketed two-level prefix-sum form: the grid-sized window is
    hash-partitioned by bkt (parallel), and the only single-partition
    window is the ≤_RANK_BUCKETS-row bucket-offset table."""
    from mysql_cdc_table_spark.operators.round8 import agg_mann_whitney_u
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = agg_mann_whitney_u(spark, sf_dir)
    assert count_nodes(df, "Window") == 2  # bucket-local + offset table
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    # the grid aggregation (partial+final HashAggregate on vm) must
    # appear BELOW the window in the plan — rows collapse before rank
    assert plan.index("HashAggregate") < plan.index("Window (")
    # the grid window is partitioned; offsets come back via broadcast
    assert "hashpartitioning(bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_round9_kruskal_two_level_prefix(spark, sf_dir):
    """Kruskal–Wallis shares the same scale contract: the k-sample
    grid ranking is a bkt-partitioned prefix sum plus a broadcast
    offset table — never an unpartitioned sort of the value grid."""
    from mysql_cdc_table_spark.operators.round8 import agg_kruskal_rank_sums
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = agg_kruskal_rank_sums(spark, sf_dir)
    assert count_nodes(df, "Window") == 2
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "hashpartitioning(bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_round9_spearman_reuses_two_level_rank(spark, sf_dir):
    """agg_spearman_corr ranks BOTH variables through the bucketed
    two-level prefix sum: its windows are bkt-partitioned (plus the
    constant-size offset tables), the rank tables come back via
    broadcast joins, and no raw event row is ever sorted."""
    from mysql_cdc_table_spark.operators.round9 import agg_spearman_corr
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = agg_spearman_corr(spark, sf_dir)
    assert count_nodes(df, "Window") == 4  # 2 grids x (local + offsets)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "hashpartitioning(bkt" in plan, plan
    # rows collapse to the joint grid before any rank join
    assert plan.index("HashAggregate") < plan.index("Window (")


def test_round9_bm25_topk_is_two_level(spark, sf_dir):
    """text_bm25_scores takes top-10 per term in the two-level form:
    the first row_number window is partitioned by (tok, bkt) — the
    global per-term window only ever sees the <=32*10 survivors."""
    from mysql_cdc_table_spark.operators.round9 import text_bm25_scores
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = text_bm25_scores(spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert plan.count("Window (") == 2  # bucket-level + survivor-level
    # Spark pushes the rank<=10 filters into WindowGroupLimit partials:
    # each task retains only its top-10 before the window shuffle
    assert "WindowGroupLimit" in plan, plan
    assert "hashpartitioning(tok" in plan, plan


def test_round9_diagnostics_stay_aggregate_shaped(spark, sf_dir):
    """The round-9 diagnostic family must never sort raw rows:
    Benford is map-side counts only (no Window, ≤2 shuffles); McNemar
    is one per-user hash aggregate + a 4-cell count (no Window);
    Ljung–Box's five lag columns ride windows PARTITIONED by
    event_type over the days grid (never unpartitioned)."""
    from mysql_cdc_table_spark.operators.round9 import (
        agg_benford_deviation,
        agg_mcnemar_paired,
        ts_ljung_box,
    )
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = agg_benford_deviation(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert shuffle_count(df) <= 4  # digit agg + 1-row total + sort

    df = agg_mcnemar_paired(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert shuffle_count(df) <= 2  # user agg + final singleton agg

    df = ts_ljung_box(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Window (") == 1  # five lags share one window
    assert "hashpartitioning(event_type" in plan, plan


def test_round9_cosine_histogram_quadratic_contract(spark, sf_dir):
    """emb_cosine_histogram's pair join is a BroadcastNestedLoopJoin BY
    CONSTRUCTION (theta a.vec_id < b.vec_id) — its safety is the
    content-addressed sample, so the contract to audit is that BOTH
    join inputs are the SAMPLED relation (the `% MOD` filter sits
    below the join, bounding the grid to (n/MOD)^2/2) and nothing
    after the join exceeds the <=201-bucket histogram (partial
    HashAggregate before the single agg shuffle)."""
    from mysql_cdc_table_spark.operators.round9 import emb_cosine_histogram
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = emb_cosine_histogram(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") >= 1, plan
    assert count_nodes(df, "CartesianProduct") == 0
    # the sample filter guards BOTH sides of the self-join
    assert plan.count("% 10) = 0") == 2, plan
    # histogram agg is map-side combined; only agg + sort shuffles remain
    assert count_nodes(df, "HashAggregate") == 2
    assert shuffle_count(df) <= 2

    # the production knob: sample_mod is a parameter, and the chosen
    # modulus is what actually reaches both filter legs
    df20 = emb_cosine_histogram(spark, sf_dir, sample_mod=20)
    assert formatted_plan(df20).count("% 20) = 0") == 2


def test_round9_changepoint_scans_days_grid_only(spark, sf_dir):
    """ts_changepoint_binseg is aggregate-then-scan: raw events
    collapse to the per-type days grid in a HashAggregate BEFORE any
    Window touches them, and every window is partitioned by
    event_type (never a global sort of raw rows)."""
    from mysql_cdc_table_spark.operators.round9 import ts_changepoint_binseg
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = ts_changepoint_binseg(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    # grid collapse precedes the prefix-sum windows (formatted-plan node
    # numbers grow leaf->root, so upstream = smaller number)
    import re as _re

    def _first_node(name: str) -> int:
        return min(int(n) for n in _re.findall(rf"\((\d+)\) {name}", plan))

    assert _first_node("HashAggregate") < _first_node("Window")
    assert "hashpartitioning(event_type" in plan, plan
    # prefix sums + totals + argmax rank — bounded window count, and
    # none of them unpartitioned
    assert plan.count("Window (") <= 3
    assert "hashpartitioning(1," not in plan  # no single-partition window


def test_round9_gno_gaps_is_windowless(spark, sf_dir):
    """cdc_binlog_gno_gaps accounts for every gno with hash joins only:
    zero Window nodes, the run counter is ONE anti-join (broadcast at
    this scale; hash-partitioned at any), and the final assembly is a
    1-row broadcast cross — no global sort anywhere."""
    from mysql_cdc_table_spark.operators.round9 import cdc_binlog_gno_gaps
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = cdc_binlog_gno_gaps(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_no_cartesian(df)
    assert "LeftAnti" in plan, plan
    assert plan.count("Sort (") == 0  # truly no sort, not just no window


def test_round9_term_enrichment_broadcast_only(spark, sf_dir):
    """corpus_term_enrichment's joins never shuffle the fact side:
    per-source counts and corpus df are broadcast hash joins, the
    1-row corpus total is a broadcast nested-loop cross, and no
    Window appears — the only shuffles are the bounded grid
    aggregations themselves."""
    from mysql_cdc_table_spark.operators.round9 import corpus_term_enrichment
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = corpus_term_enrichment(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_no_cartesian(df)
    assert count_nodes(df, "BroadcastHashJoin") == 2
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "ShuffledHashJoin") == 0


def test_round10_ks_and_gini_ride_two_level_rank(spark, sf_dir):
    """agg_ks_two_sample / agg_gini_coefficient collapse to the value
    grid BEFORE any window and rank it in the range-bucketed two-level
    form — hashpartitioning(bkt) present, no unpartitioned grid
    window, no cartesian."""
    from mysql_cdc_table_spark.operators.round10 import (
        agg_gini_coefficient,
        agg_ks_two_sample,
    )
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    from mysql_cdc_table_spark.plans.audit import count_nodes

    for fn in (agg_ks_two_sample, agg_gini_coefficient):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert_no_cartesian(df)
        assert "hashpartitioning(bkt" in plan, plan
        # the grid is checkpointed ONCE and every branch reuses it: the
        # final plan contains ZERO raw parquet scans (the fact is read
        # exactly once, at grid materialization — not once per branch;
        # the r09 verdict's watch item 1 made precise)
        assert count_nodes(df, "Scan parquet") == 0, plan
        assert "Scan ExistingRDD" in plan


def test_round10_kendall_grid_is_broadcast_pairs(spark, sf_dir):
    """agg_kendall_tau_grid's cell-pair join must be the broadcast of
    an AGGREGATED grid (bounded quadratic by construction), with zero
    windows and no sort-merge join anywhere."""
    from mysql_cdc_table_spark.operators.round10 import agg_kendall_tau_grid
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = agg_kendall_tau_grid(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "CartesianProduct") == 0
    # the theta pair join is broadcast nested-loop over the grid
    assert count_nodes(df, "BroadcastNestedLoopJoin") >= 1


def test_round10_dim_covariance_is_one_pass(spark, sf_dir):
    """emb_dim_covariance: zero joins, zero windows — one map-side
    aggregate over the scan, then a bounded stack."""
    from mysql_cdc_table_spark.operators.round10 import emb_dim_covariance
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = emb_dim_covariance(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert "Join" not in plan
    assert count_nodes(df, "HashAggregate") <= 2  # partial + final
    assert shuffle_count(df) <= 2  # singleton agg + output sort


def test_round10_profiles_broadcast_their_totals(spark, sf_dir):
    """ts_dow_seasonality / text_ttr_profile: the per-group totals join
    is a broadcast; no window; the only shuffles are the grid
    aggregations and the output sort."""
    from mysql_cdc_table_spark.operators.round10 import (
        text_ttr_profile,
        ts_dow_seasonality,
    )
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = ts_dow_seasonality(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)

    df = text_ttr_profile(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert shuffle_count(df) <= 3  # token grid + source agg + sort


def test_round10_wilson_is_two_aggregates_no_join(spark, sf_dir):
    """agg_ab_conversion_wilson: the whole readout is two hash
    aggregates (per-user conversion grid, 2-row arm rollup) and a
    driver-sized closed-form projection — zero joins, zero windows,
    shuffles = the two aggregates + the output sort."""
    from mysql_cdc_table_spark.operators.round10 import (
        agg_ab_conversion_wilson,
    )
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = agg_ab_conversion_wilson(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert "Join" not in plan
    assert shuffle_count(df) <= 3  # user grid + arm rollup + sort


def test_round10_fuzzy_join_is_distinct_names_first(spark, sf_dir):
    """join_fuzzy_blocked: the quadratic contract — the Levenshtein
    pair join's BOTH inputs are the aggregated distinct-names grid
    (vocab-bounded), never the raw corpus, and the fact table is
    scanned exactly once (the grid is checkpointed for its three
    consumers). No cartesian: candidates are block-equi-joined."""
    from mysql_cdc_table_spark.operators.round10 import join_fuzzy_blocked
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = join_fuzzy_blocked(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    assert "Window (" not in plan
    # one materialization of the names grid, zero residual fact scans
    assert count_nodes(df, "Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan
    # the pair join and the sizes join both carry aggregated inputs;
    # levenshtein is evaluated post-join on grid rows only
    assert "levenshtein" in plan


def test_round10_sql_udf_inlines_into_codegen(spark, sf_dir):
    """sql_udf_scalar: SQL-language UDFs (incl. the nested call) must
    be INLINED by Catalyst — zero Python evaluation nodes, zero extra
    plan structure vs hand-written expressions; the whole readout is
    one hash aggregate over the scan."""
    from mysql_cdc_table_spark.operators.round10 import sql_udf_scalar
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = sql_udf_scalar(spark, sf_dir)
    plan = formatted_plan(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert node not in plan, plan
    assert "Join" not in plan
    assert "Window (" not in plan
    assert shuffle_count(df) <= 2  # source agg + output sort


def test_round10_execute_immediate_pushes_bound_predicate(spark, sf_dir):
    """sql_execute_immediate: the USING-bound threshold must reach the
    parquet scan as a pushed filter — parameter binding through
    dynamic SQL must not defeat pushdown. One aggregate, no join."""
    from mysql_cdc_table_spark.operators.round10 import (
        sql_execute_immediate,
    )
    from mysql_cdc_table_spark.plans.audit import formatted_plan

    df = sql_execute_immediate(spark, sf_dir)
    plan = formatted_plan(df)
    assert "GreaterThan(o_totalprice,100000.0)" in plan, plan
    assert "Join" not in plan
    assert shuffle_count(df) <= 2  # rollup + output sort


def test_round10_late_markov_is_one_user_window(spark, sf_dir):
    """ts_markov_transitions: ONE window partitioned by user (the
    chain is user-local — hashpartitioning(user_id) must appear), the
    totals join is a broadcast over the alphabet grid, no cartesian,
    no sort-merge join."""
    from mysql_cdc_table_spark.operators.round10 import ts_markov_transitions
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = ts_markov_transitions(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    # the grid is checkpointed once for its two consumers: the final
    # plan re-reads the materialized grid (zero raw scans, zero window
    # re-runs) and the totals join is a broadcast
    assert count_nodes(df, "Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert count_nodes(df, "Window") == 0
    assert_broadcast_join(df, 1)
    assert count_nodes(df, "SortMergeJoin") == 0
    # the single user-partitioned window lives in the pre-checkpoint
    # lineage — assert it there
    from pyspark.sql import Window as W

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    from pyspark.sql import functions as F

    pre = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .count()
    )
    pre_plan = formatted_plan(pre)
    assert count_nodes(pre, "Window") == 1
    assert "hashpartitioning(user_id" in pre_plan, pre_plan


def test_round10_late_silhouette_broadcasts_centroids(spark, sf_dir):
    """emb_centroid_silhouette: the vector-to-centroid fan-out must be
    a BROADCAST of the labels x dims grid — never a shuffled or
    vector-pair join — and the plan carries zero windows; everything
    after the fan-out is hash aggregates."""
    from mysql_cdc_table_spark.operators.round10 import (
        emb_centroid_silhouette,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = emb_centroid_silhouette(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    assert "Window (" not in plan
    assert_broadcast_join(df, 1)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "ShuffledHashJoin") == 0


def test_aqe_skew_join_activates_at_runtime(spark):
    """The session enables AQE skew-join (session.py); this proves the
    mechanism actually fires: a deliberately skewed SMJ (75% of rows
    on one key, broadcast disabled) must come out of execution with
    SortMergeJoin(skew=true) and a skewed AQEShuffleRead — the runtime
    re-plan that replaces manual salting for most skew at scale
    (operators/skew.py documents salting as the explicit fallback).
    Thresholds are lowered only inside this test and restored."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            "16KB"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") % 4 != 0, 0)
            .otherwise(F.col("id") % 97)
            .cast("long")
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        right = spark.range(97).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_round10_late_ivm_join_view_is_delta_pass(spark, sf_dir):
    """cdc_ivm_join_view: the maintenance side must be ONE signed
    map-side pass broadcast-joined to the dim — zero windows (the
    ranked latest-state window exists only in the ORACLE), no
    cartesian, no sort-merge join."""
    from mysql_cdc_table_spark.operators.round10 import cdc_ivm_join_view
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = cdc_ivm_join_view(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_no_cartesian(df)
    assert_broadcast_join(df, 1)
    assert count_nodes(df, "SortMergeJoin") == 0


def test_round12_upsert_index_delta_is_windowless_broadcast(spark, sf_dir):
    """ann_ivf_upsert_topk's maintenance side: delta re-assignment is
    a broadcast argmin (centroid grid broadcast, no sort-merge join,
    no cartesian beyond the bounded broadcast fan-outs, zero windows)
    — the plan that keeps per-refresh cost ∝ delta at 100 TB. The
    partition filter of the persisted postings scan is asserted in
    test_round12's persisted-IVF audit."""
    from mysql_cdc_table_spark.operators.round12 import (
        ivf_maintained_postings,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = ivf_maintained_postings(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_broadcast_join(df, 1)  # touched-key anti join
    # the argmin is the bounded centroid fan-out: a broadcast
    # nested-loop over the cells x dims grid, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert count_nodes(df, "SortMergeJoin") == 0


def test_round12_maintained_lsh_carries_untouched_buckets(spark, sf_dir):
    """dedup_incremental_minhash_pairs: the stored pair sets must come
    back through an ANTI join against the (broadcast) touched-bucket
    set — no window, no sort-merge join, and the stored-pairs plane is
    scanned, not re-derived (a 'pairs' parquet scan appears in the
    plan)."""
    from mysql_cdc_table_spark.functions.dedup import (
        dedup_incremental_minhash_pairs,
    )
    from mysql_cdc_table_spark.plans.audit import count_nodes, formatted_plan

    df = dedup_incremental_minhash_pairs(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window (" not in plan
    assert_no_cartesian(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "/pairs" in plan  # the stored pair plane is read, not rebuilt
    # the only shuffle joins allowed are the within-bucket candidate
    # joins and the cap join — all keyed on the (band, bucket) pair;
    # a doc_id- or pair-keyed shuffle join would mean the maintenance
    # is re-joining the corpus
    import re as _re

    for m in _re.finditer(r"SortMergeJoin \[([^\]]*)\]", plan):
        assert "band" in m.group(1) and "bucket" in m.group(1), m.group(0)
