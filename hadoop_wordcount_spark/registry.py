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
# must iterate FIRST. Interleaving also spreads families out
# (streaming entries are never a contiguous block) so a bursty host
# steal-window cannot contaminate a whole family at once (see
# DEVNOTES on the r04 alphabetical-block anomaly).
_PRIORITY: list[str] = [
    # -- Round-8 verification head, exactly the 50-row driver budget.
    # The r7 verdict's #1 directive: (a) the 27 round-7 additions with
    # no official driver row yet (all judge-verified green in the r7
    # session — any failure here is a regression), then (b) the 7
    # round-8 additions (never driver-checked), then (c) 16 of the
    # oldest-rowed entries (last green row r03), families interleaved
    # so a bursty host steal-window cannot contaminate a whole family
    # at once (see DEVNOTES on the r04 alphabetical-block anomaly).
    # 27 + 7 + 16 = 50 = one round budget. Rows-only entries live in
    # _ROWS_ONLY_TAIL at the very end — a driver slot spent on an
    # `err: no_oracle` row is a wasted slot (r7 verdict #5).
    # (a) round-7 additions, judge-verified, no driver row yet:
    "tpch_q1_like",
    "interval_overlap_skew",
    "eval_holdout_exact_k",
    "embedding_mrl_truncation",
    "padding_waste_report",
    "state_store_read",
    "sql_listagg_nation_top",
    "sql_group_by_all_report",
    "events_ohlc_hourly",
    "orders_priority_transpose",
    "sql_unpivot_clause",
    "bitmap_exact_distinct",
    "sketch_theta_source_overlap",
    "lang_source_crosstab",
    "insert_overwrite_dynamic_partitions",
    "user_engagement_ewma",
    "heavy_hitters_parts",
    "events_locf_impute",
    "shipmonth_price_percentiles",
    "hll_distinct_users",
    "heavy_hitters_incremental",
    "binary_asset_ingest",
    "pandas_api_orders_report",
    "sql_scripting_threshold_report",
    "event_csv_roundtrip",
    "sink_roundtrip_avro",
    "utf8_ingest_hygiene",
    # (b) round-8 additions — never driver-checked (same principle as
    # the (a) block: entries with NO ledger row outrank re-checks).
    # The GK-bound twin is the r7 verdict #5 ask; the other three
    # bracket twins extend the same pattern to every rows-only entry;
    # writer_v2_lifecycle is the verdict #7 V2-catalog unlock;
    # temporal_split_audit is the round-8 coverage addition:
    "value_percentiles_bounds",
    "writer_v2_lifecycle",
    "temporal_split_audit",
    "approx_distinct_words_bounds",
    "profile_table_sketch_bounds",
    "sim_search_lsh_bounds",
    "streaming_outer_join_watermark",
    # (b2) later round-8 additions, never driver-checked (never-
    # checked entries outrank re-checks, so these displace five of
    # the (c) re-check slots they were originally parked behind):
    "streaming_join_window_pipeline",
    "streaming_foreach_batch_jdbc",
    "pii_scrub_report",
    "unicode_nfc_audit",
    "event_value_autocorr",
    "feature_hash_collisions",
    "orders_seasonality_index",
    "value_ks_drift",
    "kwic_concordance",
    "docs_mixture_reweight",
    "kmeans_lloyd_step",
    "orders_repeat_survival",
    "pareto_skyline_customers",
    "events_entropy_rate",
    "tokenizer_fertility_by_lang",
    "lineitem_regr_family",
    "python_stream_sink",
    "events_changepoint_cusum",
    "value_decile_bins",
    "bigram_khop_reach",
    "events_anova_f",
    "chi_square_independence",
    "word_burstiness_dispersion",
    "lineitem_weighted_median",
    "values_benford_audit",
    "supplier_herfindahl_by_type",
    "orders_yoy_growth",
    "events_gini_user_activity",
    "nation_revenue_share_report",
    "orders_customer_acquisition",
    "embedding_dim_variance",
    # (b2) now fills the head: 27 + 7 + 31 > 50, so the oldest-rowed
    # re-checks start the overshoot tail. Never-checked entries
    # always outrank re-checks.
    # -- immediately after the 50-slot head: the r03-rowed entries
    # displaced by the (b2) block (covered on any budget overshoot),
    # then r04 follows via registration order ------------------------
    "word_count",
    "streaming_dedup",
    "bigram_logprob",
    "bucketed_join",
    "pipeline_curate",
    "python_datasource_scan",
    "bm25_topk",
    "events_resample",
    "decontaminate_vs_eval",
    "udtf_split_sentences",
    "top_k_words",
    "streaming_foreach_batch",
    "inverted_index",
    "colocated_join",
    "pack_sequences",
    "map_in_arrow_scale",
    "topk_words_per_doc",
    "events_rollup_multires",
    "zorder_layout",
    "streaming_quality_gate",
    "unigram_logprob",
    "join_wordcount_docs",
    "distinct_words",
    "doc_chunk_windows",
    "event_props_variant",
    "funnel_conversion",
    "grep_filter",
    "outlier_filter_p99",
    "pipeline_train_corpus",
    "repeated_spans",
    "repeated_spans_verified",
    "sql_pipe_q6",
    "text_source_wordcount",
    "trailing_window_sum",
    "union_corpora",
    "value_percentiles_exact",
    "wc_tokens",
    "window_dedup_latest",
    "word_count_sorted",
    "words_except",
    "words_intersect",
]

# Rows-only entries (no ANSI oracle by design — GK sketch, LSH
# recall-bounded, HLL-sketch profile). Their assurance comes from
# pytest error/recall bounds, not driver slots; a driver row for them
# can only ever read `err: no_oracle`. Permanently last in iteration
# order (r7 verdict #5).
_ROWS_ONLY_TAIL: list[str] = [
    "value_percentiles",
    "approx_distinct_words",
    "sim_search_lsh",
    "profile_table_sketch",
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
        sketches,
        text_analysis,
        wordcount,
    )
    from hadoop_wordcount_spark.sources import pydatasource  # noqa: F401
    from hadoop_wordcount_spark.streaming import stream_queries  # noqa: F401

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update(
        {
            n: f
            for n, f in QUERIES.items()
            if n not in ordered and n not in _ROWS_ONLY_TAIL
        }
    )
    ordered.update({n: QUERIES[n] for n in _ROWS_ONLY_TAIL if n in QUERIES})
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)
