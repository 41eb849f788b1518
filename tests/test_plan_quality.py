"""Physical-plan assertions — the 100 TB readiness gate.

Correctness says the operator works on 60k rows; these tests pin the
*plan shape* that keeps it working at 1000 executors x 100 TB:
filters/projections pushed into the parquet scan, dim joins
broadcast, aggregates split partial/final, top-k via ordered limit,
no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.plans.inspect import (
    assert_in_plan,
    assert_not_in_plan,
    formatted_plan,
)
from hadoop_wordcount_spark.sources.tables import load_table

registry.load_all()


def test_parquet_filter_pushdown(spark, sf_dir):
    """agg_multi's shipdate predicate must reach the scan as a
    PushedFilter, and the scan must read only the 8 needed columns."""
    df = registry.QUERIES["agg_multi"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0], (
        "scan must prune unused columns:\n" + plan
    )


def test_column_pruning_grep(spark, sf_dir):
    """grep_filter projects 3 columns + text predicate; the parquet
    ReadSchema must not include the full table."""
    df = registry.QUERIES["grep_filter"](spark, sf_dir)
    plan = formatted_plan(df)
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "n_chars" not in read_schema, plan


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("join_orders_customer", "join_multi", "broadcast_join_parts",
                 "semi_join_customers"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_in_plan(df, "BroadcastHashJoin")
        assert_not_in_plan(df, "CartesianProduct")


def test_wordcount_partial_aggregation(spark, sf_dir):
    """The map-side combine the reference lacks: partial + final
    HashAggregate around exactly one exchange."""
    df = registry.QUERIES["word_count"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_count" in plan, plan
    assert "hashpartitioning(word" in plan, plan


def test_topk_is_ordered_limit_not_global_sort(spark, sf_dir):
    """top_k_words must plan as TakeOrderedAndProject (per-partition
    k-heap), never a full global sort feeding a limit. Same property
    for event_path_mining's top-20 (its only full-data exchange must
    be the per-user window, not a global sort)."""
    for name in ("top_k_words", "event_path_mining"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_in_plan(df, "TakeOrderedAndProject")


def test_no_cartesian_in_pair_joins(spark, sf_dir):
    """Blocked pair generation (dedup/knn) must stay equi-join —
    a cartesian product here is the n² trap at scale."""
    for name in ("dedup_ngram_jaccard", "knn_block_join", "dedup_minhash_banded",
                 "dedup_ngram_jaccard_lsh",
                 "dedup_simhash_pairs", "repeated_spans_verified",
                 "decontaminate_vs_eval", "bm25_topk", "unigram_logprob",
                 "dedup_incremental", "dedup_embedding_pq"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_not_in_plan(df, "CartesianProduct")


def test_text_path_stays_jvm_side(spark, sf_dir):
    """Text analysis must stay JVM-side: no Python eval nodes anywhere
    in the hot path. (Higher-order array functions evaluate outside
    whole-stage codegen but still in the JVM — that's expected.)"""
    for name in ("text_stats", "lang_id_heuristic", "quality_score",
                 "doc_fingerprint", "word_count"):
        df = registry.QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path:\n{plan}"
        assert "ArrowEvalPython" not in plan, f"{name} fell off the JVM path:\n{plan}"


def test_codegen_in_relational_path(spark, sf_dir):
    """Pure-relational plans (no HOFs) must be whole-stage codegen'd
    (formatted explain marks codegen spans with 'codegen id').
    AQE defers codegen marking to the final plan, so toggle it off
    just for the static inspection."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("agg_multi", "join_orders_customer", "window_topk_orders"):
            df = registry.QUERIES[name](spark, sf_dir)
            assert "codegen id" in formatted_plan(df), name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_window_group_limit_pushdown(spark, sf_dir):
    """Top-k-per-group must push the limit below the shuffle
    (WindowGroupLimit on the map side) — at scale this is the
    difference between shuffling k rows per group and all rows."""
    df = registry.QUERIES["window_topk_orders"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_partition_pruning_on_partitioned_sink(spark, sf_dir):
    """The lang='en' read after a partitionBy('lang') write must prune
    partitions at the source, not post-filter."""
    registry.QUERIES["sink_partitioned_parquet"](spark, sf_dir).collect()
    import os

    from hadoop_wordcount_spark.operators.sinks import _tmp

    path = _tmp("documents_by_lang", sf_dir)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(lang", plan
    assert "lang#" not in plan.split("ReadSchema: ")[1].split("\n")[0]


def test_exchange_reuse_no_double_scan(spark, sf_dir):
    """Self-join pipelines (minhash banding) must not recompute the
    expensive shingle+signature projection per reference: the
    featurized base is cached, so every reference reads the
    InMemoryRelation instead of re-scanning/re-deriving."""
    df = registry.QUERIES["dedup_minhash_banded"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert plan.split("\n\n")[0].count("InMemoryTableScan") >= 3, plan


def test_colocated_join_adds_no_exchange(spark, sf_dir):
    """Both sides pre-partitioned on the join key: the SortMergeJoin
    must consume the explicit repartitions directly — exactly the two
    user exchanges feed the join, none inserted by the planner."""
    df = registry.QUERIES["colocated_join"](spark, sf_dir)
    plan = formatted_plan(df)
    join_input = plan.split("SortMergeJoin")[0]
    assert join_input.count("Exchange") <= 3, plan  # 2 repartitions (+agg above)
    assert "REPARTITION_BY_NUM" in plan, plan


def test_topk_per_doc_reuses_group_shuffle(spark, sf_dir):
    """groupBy(doc_id, word) then window over doc_id: the window must
    reuse the aggregation's hash partitioning — one Exchange total."""
    df = registry.QUERIES["topk_words_per_doc"](spark, sf_dir)
    tree = formatted_plan(df).split("\n\n")[0]  # tree section only
    assert tree.count("Exchange") == 1, tree


def test_tfidf_and_q5_broadcasts(spark, sf_dir):
    """tfidf's document-frequency table and Q5's dimension tables must
    broadcast — the fact sides never reshuffle for these joins."""
    for name in ("tfidf", "tpch_q5_like"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_in_plan(df, "BroadcastHashJoin")
        assert_not_in_plan(df, "CartesianProduct")


def test_bucketed_join_adds_no_exchange(spark, sf_dir):
    """Persisted bucketBy(8, key) on both sides: the SortMergeJoin
    reads the bucket layout directly — zero Exchange below the join
    (the only exchange in the plan is the final aggregation's)."""
    df = registry.QUERIES["bucketed_join"](spark, sf_dir)
    tree = formatted_plan(df).split("\n\n")[0]
    join_input = tree.split("SortMergeJoin")[1]
    assert "Exchange" not in join_input, tree
    assert "SortMergeJoin" in tree, tree


def test_skew_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """The salted join must shuffle on (event_type, salt) — the whole
    point is the composite key spreading hot keys — and must not
    degrade to broadcast."""
    df = registry.QUERIES["skew_salted_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "hashpartitioning(event_type" in plan, plan
    assert "salt" in plan.split("hashpartitioning(event_type")[1].split(")")[0], plan


def test_repeated_spans_no_cartesian_and_pruned_scan(spark, sf_dir):
    """Window-key equi-join (never all-pairs) and a scan pruned to
    (doc_id, text)."""
    df = registry.QUERIES["repeated_spans"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "doc_id" in read_schema and "text" in read_schema, plan
    assert "n_chars" not in read_schema, plan


def test_stratified_sample_is_scan_level_filter(spark, sf_dir):
    """Deterministic hash sampling must be a pure scan+filter+project:
    zero exchanges, scan pruned to the 3 output columns."""
    df = registry.QUERIES["stratified_sample"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange" not in plan.split("\n\n")[0], plan
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" not in read_schema, plan


def test_merge_upsert_single_key_join(spark, sf_dir):
    """The CDC merge must stay an equi-join on the primary key — no
    cartesian, no nested loop."""
    df = registry.QUERIES["merge_upsert"](spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct")
    assert_not_in_plan(df, "BroadcastNestedLoopJoin")


# --- round-5 queries: plan pins for their docstring scale claims ----------


def test_q14_pushdown_and_broadcast(spark, sf_dir):
    """tpch_q14_like: the one-month shipdate window must reach the
    lineitem scan as PushedFilters; part joins by broadcast."""
    df = registry.QUERIES["tpch_q14_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_derived_pushdown_no_fact_sort(spark, sf_dir):
    """tpch_q4_like (round-13 plan): the EXISTS runs as an equi-join
    against the half-year orders slice — never a cartesian and never
    the SMJ that sorts the lineitem stream (the adjudicated alpha~1.7
    256x defect) — and the transitive bound the rewrite derives
    (l_shipdate > window_start + 60d) must reach the lineitem scan
    as a pushed GreaterThan filter."""
    df = registry.QUERIES["tpch_q4_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert "GreaterThan(l_shipdate" in plan, plan


def test_q16_two_phase_distinct(spark, sf_dir):
    """tpch_q16_like: COUNT(DISTINCT) expands to the two-aggregate
    plan (dedup shuffle + count), with partial aggregation."""
    df = registry.QUERIES["tpch_q16_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 3, plan


def test_q2_argmin_is_aggregate_not_window(spark, sf_dir):
    """tpch_q2_like: the per-part argmin must be a hash aggregate with
    map-side partials (min(struct)), not a window sort."""
    df = registry.QUERIES["tpch_q2_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial_min" in plan, plan
    assert "Window" not in plan, plan


def test_shuffle_free_scan_reports(spark, sf_dir):
    """quality_gopher_rules / winnowing_fingerprint claim zero
    shuffles: no Exchange may appear in either plan."""
    for name in ("quality_gopher_rules", "winnowing_fingerprint"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_not_in_plan(df, "Exchange")


def test_vocab_cut_is_ordered_limit(spark, sf_dir):
    """vocab_coverage's top-1000 cut must be TakeOrderedAndProject,
    not a global sort."""
    df = registry.QUERIES["vocab_coverage"](spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_cooccurrence_join_is_equi(spark, sf_dir):
    """event_cooccurrence_lift's pair stage must join on the slot key
    (hash/sort-merge equi-join); only the tiny broadcast marginals may
    be nested-loop."""
    df = registry.QUERIES["event_cooccurrence_lift"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_new_pair_family_no_cartesian(spark, sf_dir):
    """Round-5 continuation pair/joins: SemDeDup's in-cell pair join,
    the basket pair join, the triangle joins, and DSIR's frequency
    joins must all stay equi-join — BroadcastNestedLoop is allowed
    only against 1-row scalar aggregates (crossJoin(broadcast(agg))),
    never between data-sized sides."""
    for name in ("semdedup_prune", "basket_part_pairs",
                 "bigram_triangle_count", "dsir_importance_weight",
                 "embedding_power_iteration", "dedup_embedding_pq"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_not_in_plan(df, "CartesianProduct")


def test_q8_q9_dims_broadcast(spark, sf_dir):
    """Q8/Q9: every dimension side broadcasts; the only shuffled join
    is the fact chain on the order key."""
    for name in ("tpch_q8_like", "tpch_q9_like"):
        df = registry.QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert plan.count("BroadcastHashJoin") >= 3, (name, plan)
        assert "CartesianProduct" not in plan, name


def test_q17_decorrelated_avg_is_partial_agg(spark, sf_dir):
    """Q17's per-part average must decorrelate into a partial/final
    aggregate keyed on the part key, not a window sort."""
    df = registry.QUERIES["tpch_q17_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial_avg" in plan, plan
    assert "Window" not in plan, plan


def test_basket_pairs_topk_is_ordered_limit(spark, sf_dir):
    """basket_part_pairs' final top-20 must compile to
    TakeOrderedAndProject, not a global sort."""
    df = registry.QUERIES["basket_part_pairs"](spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_shuffle_hash_join_strategy_pinned(spark, sf_dir):
    """The shuffle_hash hint must produce ShuffledHashJoin (not SMJ,
    not broadcast) with no Sort below the join."""
    df = registry.QUERIES["shuffle_hash_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_aqe_skew_join_split_fires(spark, sf_dir, tmp_path_factory):
    """`aqe_skew_join` must actually trigger AQE's OptimizeSkewedJoin
    under test-scale thresholds: the executed SortMergeJoin carries
    `skew=true` (the hot partition was split across reducers at
    runtime). Two test-scale accommodations, both cluster-realistic:
    the skew thresholds shrink to the data (defaults are 256MB-sized)
    and lineitem is rewritten as a multi-file parquet directory —
    skew splits are per-MAPPER, and the driver's single-row-group
    file yields exactly one effective mapper, which is unsplittable
    by construction (a real 100 TB table has thousands of mappers)."""
    import os
    import shutil

    skew_dir = str(tmp_path_factory.mktemp("skewsf"))
    load_table(spark, sf_dir, "lineitem").repartition(12).write.parquet(
        os.path.join(skew_dir, "lineitem.parquet")
    )
    shutil.copy(
        os.path.join(sf_dir, "part.parquet"),
        os.path.join(skew_dir, "part.parquet"),
    )
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8192",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4096",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = registry.QUERIES["aqe_skew_join"](spark, skew_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q6_pure_pushdown_scan(spark, sf_dir):
    """Q6 is the pushdown acid test: every predicate reaches the
    parquet scan, no join, no wide shuffle — partial agg over the
    scan, single-row final."""
    df = registry.QUERIES["tpch_q6_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters:" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0], plan
    assert "Join" not in plan, plan
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in read_schema, plan


def test_q21_exists_shapes_decorrelate(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS must plan as LeftSemi / LeftAnti
    equi-joins (never per-row subqueries or a cartesian), and the
    top-20 must be a TakeOrderedAndProject k-heap."""
    df = registry.QUERIES["tpch_q21_like"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_lateral_topn_decorrelates(spark, sf_dir):
    """The correlated LATERAL ... ORDER BY ... LIMIT must decorrelate
    into WindowGroupLimit + a hash join — never a per-outer-row
    nested-loop re-execution."""
    df = registry.QUERIES["lateral_topn_orders"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sql_udf_inlines_no_python_eval(spark, sf_dir):
    """Declarative SQL UDFs must inline into the plan: no Python eval
    node, partial aggregation intact."""
    df = registry.QUERIES["sql_udf_pricing"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "partial_" in plan, plan


def test_interval_lookup_broadcast_hash_not_bnlj(spark, sf_dir):
    """The point-in-interval lookup must plan as a broadcast HASH join
    on the coarse day key with the range bounds as residual filters —
    a bare non-equi join would degrade to BroadcastNestedLoopJoin."""
    df = registry.QUERIES["interval_event_lookup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_overlap_is_equi_join(spark, sf_dir):
    """The interval self-join must ride the (type, bucket) equi-keys —
    never a cartesian/nested-loop product of the interval table."""
    df = registry.QUERIES["interval_overlap_pairs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rebalance_hint_in_write_plan(spark, sf_dir):
    """aqe_rebalance_write's write-side relation must carry the AQE
    RebalancePartitions operator (runtime split/coalesce of skewed
    shuffle outputs), not a plain repartition."""
    from hadoop_wordcount_spark.operators.sinks import _rebalance_input

    df = _rebalance_input(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in opt, opt


def test_analyze_table_stats_recorded_and_broadcast(spark, sf_dir):
    """Catalog statistics surface: ANALYZE TABLE COMPUTE STATISTICS
    (table + FOR COLUMNS) must land rowCount/ndv in the catalog, and
    a hint-free join against the analyzed small table must still pick
    BroadcastHashJoin — at 100 TB the optimizer only knows which side
    is broadcastable from exactly these stats."""
    import os
    import tempfile

    from hadoop_wordcount_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS hwcs_stats_nation")
    # external location under /tmp: a managed table would land in
    # ./spark-warehouse (committed-scratch hazard) and a fresh
    # session's in-memory catalog trips LOCATION_ALREADY_EXISTS on
    # the leftover dir.
    path = os.path.join(
        tempfile.gettempdir(), "hwcs_sinks", "stats_nation"
    )
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "path", path
    ).saveAsTable("hwcs_stats_nation")
    spark.sql("ANALYZE TABLE hwcs_stats_nation COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE hwcs_stats_nation COMPUTE STATISTICS "
        "FOR COLUMNS n_nationkey"
    )
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED hwcs_stats_nation").collect()
    }
    assert "Statistics" in desc and "rows" in desc["Statistics"]
    cstat = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(
            "DESCRIBE TABLE EXTENDED hwcs_stats_nation n_nationkey"
        ).collect()
    }
    assert cstat.get("distinct_count") == "25"

    cust = load_table(spark, sf_dir, "customer")
    joined = cust.join(
        spark.table("hwcs_stats_nation"),
        cust.c_nationkey == F.col("n_nationkey"),
    )
    assert "BroadcastHashJoin" in formatted_plan(joined)


def test_topic_terms_word_marginal_not_broadcast_pinned(spark, sf_dir):
    """cluster_topic_terms: the global-word marginal is
    vocabulary-sized (1e8+ tokens on a web corpus) and must NOT be
    pinned into a broadcast hint — it attaches by shuffle equi-join
    on `word` (the plan's one SortMergeJoin); only the K-row
    cell-size marginal and the 1-row total may broadcast (r8 verdict
    #3). AQE downgrading the SMJ at runtime is fine — the pin is on
    the STATIC plan, where a hint would force broadcast regardless
    of size."""
    df = registry.QUERIES["cluster_topic_terms"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_naive_bayes_vocab_join_not_broadcast_pinned(spark, sf_dir):
    """naive_bayes_langid: the token-likelihood table is
    vocabulary-sized and must attach to the eval token stream by
    shuffle equi-join on (class, token) — never a pinned broadcast
    (the cluster_topic_terms word-marginal rule). Only the
    |classes|-row meta table broadcasts."""
    df = registry.QUERIES["naive_bayes_langid"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_ddsketch_census_is_partial_agg_and_window_free(spark, sf_dir):
    """ddsketch_quantiles: the bucket census must partial-aggregate
    map-side (the sketch's mergeability IS the partial agg), and the
    cumulative walk must not introduce a Window. The registered query
    checkpoints the census (r14), which hides the census stage from
    its final explain — pin the partial agg on the un-checkpointed
    census stage (the psi_feature_drift precedent)."""
    from hadoop_wordcount_spark.operators.sketches import _dd_bucket_census

    census_plan = formatted_plan(_dd_bucket_census(spark, sf_dir))
    assert census_plan.count("HashAggregate") >= 2, census_plan
    assert "Window" not in census_plan, census_plan
    df = registry.QUERIES["ddsketch_quantiles"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan


def test_psi_binning_is_codegen_not_hof(spark, sf_dir):
    """psi_feature_drift: the PER-ROW decile binning must be a
    codegen'd CASE chain (the bootstrap_ci_poisson lesson: HOFs
    evaluate interpreted per element). The one permitted lambda is
    the 9-element edge-rounding transform on the 1-ROW decile
    aggregate — so the CASE chain must exist and no Window may."""
    from hadoop_wordcount_spark.operators.relational import _psi_bin_counts

    # The registered query checkpoints the bin census (r13), which
    # hides the binning stage from its final explain — pin the CASE
    # chain on the un-checkpointed census stage instead.
    census_plan = formatted_plan(_psi_bin_counts(spark, sf_dir))
    assert "CASE WHEN" in census_plan, census_plan
    assert "Window" not in census_plan
    df = registry.QUERIES["psi_feature_drift"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan


def test_weighted_reservoir_is_take_ordered(spark, sf_dir):
    """weighted_reservoir_sample: the top-k must be
    TakeOrderedAndProject (per-partition k-heaps) — never a global
    Sort + Limit."""
    df = registry.QUERIES["weighted_reservoir_sample"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_referential_integrity_mixed_join_strategies(spark, sf_dir):
    """referential_integrity_audit: the fixed dims (nation, region)
    are broadcast-pinned; the SF-scaling parents carry no hint (at
    test SFs the planner may still size them under the broadcast
    threshold — that is a size decision, not a pin, so it is not
    asserted away). Hard pins: every edge is an equi join (no
    cartesian, no nested loop) and the plan stays window-free."""
    df = registry.QUERIES["referential_integrity_audit"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" not in plan
