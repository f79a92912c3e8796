"""Query-operator registry.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (ANSI SQL for the DuckDB oracle; a key
present in QUERIES but absent from ORACLES gets the driver's weaker
rows-only check). ``all_queries()`` / ``all_oracles()`` merge every
registered module — this is what ``__spark_entry__.py`` serves.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# ORDER MATTERS: the driver verifies the first ~50 registry keys per
# round. Rounds 1+2 turned 93/97 driver-seen keys green (r1: relational
# basics; r2: CDC + LLM-pipeline surface); their rows stand. Round 3
# executes the recorded rotation: the 45 keys that have NEVER been in a
# driver window come first (in _ROUND3_WINDOW order), then 5 re-verify
# slots for keys whose implementation changes this round, then
# everything else in module order.
#
# Round-4 rule (window discipline, keep honest): any round-3 key that
# comes up red in CORRECTNESS_r03 stays in the window for round 4;
# otherwise the window is free for brand-new keys.
_MODULES = (
    "mysql_cdc_table_spark.cdc.queries",
    "mysql_cdc_table_spark.functions.dedup",
    "mysql_cdc_table_spark.functions.similarity",
    "mysql_cdc_table_spark.functions.text",
    "mysql_cdc_table_spark.functions.multimodal",
    "mysql_cdc_table_spark.functions.udfs",
    "mysql_cdc_table_spark.streaming.batch_windows",
    "mysql_cdc_table_spark.functions.pipeline",
    "mysql_cdc_table_spark.operators.scalars",
    "mysql_cdc_table_spark.functions.quality",
    "mysql_cdc_table_spark.operators.extras",
    "mysql_cdc_table_spark.operators.analytics",
    "mysql_cdc_table_spark.operators.tpch",
    "mysql_cdc_table_spark.operators.relational",
    "mysql_cdc_table_spark.operators.joins",
    "mysql_cdc_table_spark.operators.aggregates",
    "mysql_cdc_table_spark.operators.windows",
    "mysql_cdc_table_spark.operators.late",
)

# The driver-window front: every registry key with no CORRECTNESS_r01/r02
# row (45 keys, registry-order within their blocks), then 5 re-verify
# slots for operators modified in round 3 (their green r2 rows would
# otherwise mask a regression introduced by this round's changes).
_ROUND3_WINDOW = (
    # -- never driver-seen: scalars/extras stragglers
    "fn_json", "fn_array2", "fn_string2", "fn_bitwise", "fn_regex",
    "fn_try_ops", "explode_outer_tokens",
    # -- never driver-seen: corpus quality/curation module
    "text_pii_scrub", "text_repetition_score", "corpus_mix_equalize",
    "shard_manifest", "corpus_mix_temperature",
    # -- never driver-seen: agg/join/window/set/sql stragglers
    "agg_collect_sorted", "agg_histogram", "agg_string_agg", "agg_stats2",
    "join_salted", "set_union_distinct", "set_intersect_all",
    "window_nth_ignore_nulls", "sql_entrypoint_views",
    # -- never driver-seen: analytics + pipeline compositions
    "retention_cohorts", "sessionize_events", "corpus_prep_pipeline",
    "ts_gap_fill", "funnel_conversion", "cdc_compacted_state",
    # -- never driver-seen: TPC-H adaptations
    "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
    "q7_nation_volume", "q10_returned_items", "q12_priority_by_status",
    "q13_customer_distribution", "q14_promo_share", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume",
    "q19_disjunctive_bands", "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    # -- never driver-seen: late module (full value-hash oracles for the
    #    real-binlog reader and the integer-LSH ANN tier)
    "cdc_mysql_binlog_roundtrip", "cdc_binlog_latest_state",
    "ann_lsh_rp_topk", "ann_ivf_pq_topk",
    # -- re-verify: implementations change in round 3
    "ann_knn_join",          # AQE-gated join strategy for the query side
    "dedup_cluster_resolve", # convergence guard on the CC iteration cap
    "cdc_packed_typed_roundtrip",  # GEOMETRY/WKB added to the codec matrix
    # -- round-3-new (2 of 5 fit; q11/q16/q20 register out-of-window,
    #    rotation candidates for round 4 alongside any red r3 key)
    "q8_market_share",
    "q9_product_profit",
)

# Registered during round 3 AFTER the window filled — out-of-window by
# design, locally green at sf0.01 AND sf0.1, first in line for the
# round-4 rotation.
ROUND3_LATE_KEYS = (
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_promo_part_suppliers",
    "fn_variant",
    "corpus_pack_sequences",
    "join_lateral_topn",
    "unpivot_metrics",
)


def _rotate(out: dict) -> dict:
    """Reorder a merged registry dict so _ROUND3_WINDOW keys come first."""
    front = {k: out[k] for k in _ROUND3_WINDOW if k in out}
    rest = {k: v for k, v in out.items() if k not in front}
    return {**front, **rest}


def _load() -> list:
    import importlib

    mods = []
    for name in _MODULES:
        try:
            mods.append(importlib.import_module(name))
        except ModuleNotFoundError:
            continue  # module not built yet; registry grows as milestones land
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _load():
        dup = set(out) & set(getattr(mod, "QUERIES", {}))
        if dup:
            raise ValueError(f"duplicate query keys {dup} in {mod.__name__}")
        out.update(getattr(mod, "QUERIES", {}))
    return _rotate(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _load():
        out.update(getattr(mod, "ORACLES", {}))
    return _rotate(out)
