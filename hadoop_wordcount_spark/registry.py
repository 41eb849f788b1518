"""Query registry.

Every implemented operator registers here with a name, a callable
``(spark, sf_dir) -> DataFrame`` and (where ANSI-SQL-expressible) a
DuckDB oracle SQL string over the pre-registered table views
(``region nation customer supplier part orders lineitem events
documents embeddings``). ``__spark_entry__.py`` re-exports these for
the driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Verification-priority order. The driver's correctness harness walks
# ``queries()`` in iteration order under a budget (each round checks
# ~50 entries), so queries that most need a hard-signal row this round
# must iterate FIRST. Round 5 rotation (per round-4 verdict item 1):
# the 29 round-5 queries first (they have NO driver row yet — a first
# hash-matched row outranks refreshing an old green one), then the 43
# queries whose last green driver row is r01/r02 — the streaming,
# window/lag, sink, scalar/map/array, multimodal, and join families.
# Under the ~50-row round budget that covers all new + ~21 stale; the
# stale tail (~22, ordered oldest-family-first) rolls to round 6's
# rotation. Families are
# interleaved (streaming entries spread out, not a contiguous block)
# so a bursty host steal-window cannot contaminate a whole family at
# once (see DEVNOTES on the r04 alphabetical-block anomaly).
_PRIORITY: list[str] = [
    # -- new in round 5 (need first driver rows) ----------------------
    "contrastive_hard_negatives",
    "embedding_abtt",
    "tpch_q12_like",
    "bpe_merges_train",
    "audio_frame_energy",
    "event_anomaly_mad",
    "discount_elasticity",
    "semdedup_prune",
    "source_token_mi",
    "kl_divergence_sources",
    "orders_forecast_ma",
    "dsir_importance_weight",
    "embedding_power_iteration",
    "bigram_triangle_count",
    "basket_part_pairs",
    "tpch_q8_like",
    "tpch_q9_like",
    "tpch_q17_like",
    "tpch_q14_like",
    "tpch_q16_like",
    "tpch_q2_like",
    "tpch_q4_like",
    "dedup_containment",
    "collocations_pmi",
    "quality_gopher_rules",
    "mixture_temperature_weights",
    "embedding_cell_stats",
    "tpch_q7_like",
    "tpch_q11_like",
    "vocab_coverage",
    "winnowing_fingerprint",
    "lang_mix_by_source",
    "context_length_yield",
    "event_cooccurrence_lift",
    "orders_rfm_segments",
    "tpch_q19_like",
    "tpch_q15_like",
    "grouping_sets_mix",
    "words_except_all",
    "words_intersect_all",
    "dedup_threshold_sweep",
    "perplexity_bucket_report",
    "python_stream_source",
    "ngram_entropy",
    "zipf_fit",
    "dedup_graph_degree_report",
    "sql_recursive_cte",
    "batch_session_window",
    "event_xml_roundtrip",
    "orders_abc_pareto",
    "tpch_q13_like",
    "tpch_q22_like",
    # -- stale: last green row r01/r02 (43 queries, full rotation) ----
    "streaming_event_counts",
    "window_topk_orders",
    "sink_roundtrip_csv",
    "scalar_functions_mix",
    "join_orders_customer",
    "multimodal_meta",
    "streaming_sliding_windows",
    "rank_dense_ntile",
    "sink_roundtrip_json",
    "map_ops_mix",
    "join_multi",
    "multimodal_decode",
    "streaming_session_windows",
    "running_event_value",
    "sink_partitioned_parquet",
    "array_ops_mix",
    "broadcast_join_parts",
    "multimodal_resize",
    "streaming_stream_join",
    "lag_event_gap",
    "sink_roundtrip_orc",
    "event_props_json",
    "semi_join_customers",
    "frame_sample",
    "streaming_wordcount",
    "asof_last_error",
    "unpivot_status",
    "event_props_struct",
    "anti_join_customers",
    "value_percentiles",
    "batch_sessionize",
    "salted_aggregation",
    "outer_join_nations",
    "stats_aggregates",
    "range_join_lineitem",
    "value_histogram",
    "skew_salted_join",
    "orders_by_month",
    "merge_upsert",
    "grouping_rollup",
    "sql_tpch_q3",
    "cube_agg",
    "pivot_status",
    # -- last green r03/r04 follows (fresh enough); registration order
    # fills the remainder ---------------------------------------------
]


def load_all() -> None:
    """Import every operator module so its queries register, then
    reorder the registry into verification-priority order."""
    # Imports are side-effecting (decorator registration).
    from hadoop_wordcount_spark.operators import (  # noqa: F401
        corpus,
        dedup,
        graph,
        multimodal,
        pandas_ops,
        relational,
        sampling,
        similarity,
        sinks,
        text_analysis,
        wordcount,
    )
    from hadoop_wordcount_spark.sources import pydatasource  # noqa: F401
    from hadoop_wordcount_spark.streaming import stream_queries  # noqa: F401

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)
