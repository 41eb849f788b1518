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
# ``queries()`` in iteration order under a budget (round 1 stopped at
# exactly 50 entries), so queries that most need a hard-signal row this
# round must iterate FIRST: everything CORRECTNESS_r01 never reached
# (the relational tail, TPC-H-style queries, sinks, similarity search,
# streaming), then queries whose implementation changed this round,
# then everything already proven green in round 1.
_PRIORITY: list[str] = [
    # -- round-1 unchecked (driver truncation at 50) ------------------
    "running_event_value",
    "lag_event_gap",
    "event_props_json",
    "scalar_functions_mix",
    "asof_last_error",
    "rank_dense_ntile",
    "batch_sessionize",
    "map_ops_mix",
    "unpivot_status",
    "value_percentiles",
    "colocated_join",
    "event_props_struct",
    "salted_aggregation",
    "stats_aggregates",
    "value_histogram",
    "sql_tpch_q3",
    "tpch_q5_like",
    "tpch_q18_like",
    "outer_join_nations",
    "sim_search_topk",
    "embedding_norms",
    "sim_search_lsh",
    "knn_block_join",
    "array_ops_mix",
    "embedding_centroids",
    "sink_roundtrip_csv",
    "sink_roundtrip_json",
    "sink_partitioned_parquet",
    "sink_roundtrip_orc",
    "streaming_event_counts",
    "streaming_sliding_windows",
    "streaming_session_windows",
    "streaming_dedup",
    "streaming_stateful_counter",
    "streaming_stream_join",
    "streaming_wordcount",
    # -- changed this round (re-verify) -------------------------------
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "pipeline_curate",
    "group_zscore_pandas",
    "doc_rolling_hash",
    "dedup_minhash",
    # -- new this round ------------------------------------------------
    "repeated_spans",
    "skew_salted_join",
    "bucketed_join",
    "ann_ivf_search",
    "dataset_split",
    "stratified_sample",
    "merge_upsert",
    "udtf_split_sentences",
    "events_resample",
    "trailing_window_sum",
    "streaming_foreach_batch",
    "pipeline_train_corpus",
]


def load_all() -> None:
    """Import every operator module so its queries register, then
    reorder the registry into verification-priority order."""
    # Imports are side-effecting (decorator registration).
    from hadoop_wordcount_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pandas_ops,
        relational,
        sampling,
        similarity,
        sinks,
        text_analysis,
        wordcount,
    )
    from hadoop_wordcount_spark.streaming import stream_queries  # noqa: F401

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)
