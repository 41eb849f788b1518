"""Regenerate PLANS.md: formatted physical plans of the headline
queries, so plan properties (pushdown, broadcast, partial agg,
WindowGroupLimit, single-exchange pipelines) are reviewable without
running Spark. Usage: python tools/dump_plans.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.plans.inspect import formatted_plan
from hadoop_wordcount_spark.session import get_spark

HEADLINE = [
    ("word_count", "the reference's computation: partial+final HashAggregate "
     "around one hash exchange (the combiner MapReduce lacked)"),
    ("agg_multi", "TPC-H Q1 shape: filter + 6-column projection pushed into "
     "the parquet scan"),
    ("join_orders_customer", "fact-to-dim broadcast join: fact side never shuffles"),
    ("window_topk_orders", "top-k per group: WindowGroupLimit below AND above "
     "the exchange — k rows per group shuffle, not all rows"),
    ("topk_words_per_doc", "agg + ranking window sharing ONE exchange (documents "
     "repartitioned before explode)"),
    ("colocated_join", "pre-partitioned SortMergeJoin: planner inserts no "
     "exchange of its own"),
    ("dedup_minhash_banded", "native MinHash-LSH: cached featurization, "
     "band-key equi-join, candidates re-join shingles"),
    ("sim_search_topk", "brute-force cosine: TakeOrderedAndProject k-heap, "
     "query vector as plan literal"),
    ("bucketed_join", "persisted bucketBy(8) tables: SortMergeJoin with zero "
     "exchanges below the join — the shuffle paid once at write time"),
    ("skew_salted_join", "salted shuffle join: hashpartitioning(event_type, "
     "salt) spreads each hot key over 16 reducer slots"),
    ("repeated_spans", "windowed Karp-Rabin: integer window keys explode "
     "JVM-side, equi-join on the 62-bit key, never all-pairs"),
    ("stratified_sample", "deterministic hash sampling: pure scan-level "
     "filter, zero exchanges, pruned ReadSchema"),
    ("merge_upsert", "CDC merge: one full-outer shuffle join on the primary "
     "key + COALESCE projection"),
    ("funnel_conversion", "ordered funnel: three chained windows + closing "
     "agg over ONE user_id exchange"),
    ("decontaminate_vs_eval", "contamination sweep: broadcast eval-shingle "
     "set, train side never shuffles before the per-doc agg"),
    ("bm25_topk", "BM25: term filter at the scan, broadcast df/stats, "
     "TakeOrderedAndProject k-heap"),
    ("window_dedup_latest", "latest-per-key compaction: WindowGroupLimit keeps "
     "one row per key before the window sort"),
    ("zorder_layout", "Morton clustering key: 16 codegen'd bit ops, stats agg "
     "bounded by chunk count"),
    ("dedup_embedding_pq", "embedding near-dup, IVF cell AND full PQ-code "
     "tuple blocks: broadcast codebooks, equi-join on (cid, code tuple) — "
     "never all-pairs (replaced dedup_embedding_cosine_ivf, demoted r10)"),
    ("corpus_mixture_sample", "temperature-flattened source mixing: broadcast "
     "per-source thresholds over a scan-level md5 filter; bodies never "
     "shuffle"),
    ("dedup_incremental", "new-batch x corpus banded join: candidates scale "
     "with batch size; shared cached signature base"),
    ("tpch_q19_like", "disjunctive cross-side predicates: per-side OR-covers "
     "pushed below the broadcast join, residual evaluated after it"),
    ("tpch_q2_like", "per-part min-cost supplier: map-side struct-argmin "
     "aggregate (partial_min), no window sort, two broadcast dims"),
    ("quality_gopher_rules", "composite quality gate: pure projection, zero "
     "exchanges — runs inside any ingest scan"),
    ("event_cooccurrence_lift", "basket lift: slot-keyed equi-join pair stage "
     "(never all-pairs), broadcast marginals"),
    ("sql_recursive_cte", "Spark 4 WITH RECURSIVE: UnionLoop fixpoint over a "
     "200-row broadcast edge table; frontier rows drive per-iteration cost"),
    ("bpe_merges_train", "unrolled BPE trainer: corpus-sized work is ONE word "
     "count; each merge round is a vocab-sized pair agg + 1-row "
     "TakeOrdered winner broadcast into the next round's replace"),
    ("semdedup_prune", "SemDeDup: shared IVF quantizer cells, in-cell "
     "equi-join pair stage, DISTINCT dominated side, cell-sized rollup"),
    ("embedding_power_iteration", "power iteration: the d^2-cell moment "
     "matrix is the only corpus-sized agg (map-side partials); each "
     "iteration is a broadcast matrix-vector product"),
    ("dsir_importance_weight", "DSIR: two vocab-sized freq aggs broadcast "
     "back onto the token stream; scalars attach via "
     "crossJoin(broadcast(agg)) — no driver round trip"),
    ("tpch_q8_like", "Q8 market share: six broadcast dims around one "
     "order-key fact shuffle; numerator and denominator fold into one "
     "conditional partial agg"),
    ("audio_frame_energy", "audio RMS: numpy-vectorized mapInPandas over "
     "Arrow batches, shuffle-free, one output row per payload"),
    ("heavy_hitters_cms", "Count-Min sketch: explode(4 structs) partial-aggs "
     "map-side into the FIXED 4x256 grid; heavy hitters look up min over "
     "a broadcast of the 1024-row counter table"),
    ("kmv_source_overlap", "KMV bottom-k sketches: distinct (source, hash) "
     "shuffle + per-source rank; the pairwise stage combines 64-long "
     "arrays — shingle text never moves"),
    ("cluster_topic_terms", "cross-modal cluster labeling: token stream "
     "joins the IVF inverted file on the shared id, (cid, word) agg, "
     "marginals attach by broadcast"),
    ("dpp_partition_pruned_join", "Dynamic Partition Pruning: the "
     "month-partitioned fact scan carries a dynamicpruning subquery — "
     "only the dimension-selected directories are read"),
    ("cdc_apply_changes", "CDC apply: rank-1 window on the (ts, event_id) "
     "change order — one key shuffle, no snapshot join, tombstones drop "
     "keys in the same pass"),
    ("cogroup_merge_asof", "cogrouped applyInPandas: both streams co-"
     "shuffled once on user_id, FlatMapCoGroupsInPandas runs the "
     "per-user merge_asof kernel over Arrow"),
    ("bloom_semi_join_audit", "portable Bloom pre-filter: <= m-row "
     "position set broadcast onto the fact probe, count-k gate — the "
     "fact side never shuffles"),
    ("expectations_report", "data-quality gate: six independent "
     "scalar-count checks unioned; the referential check is a "
     "broadcast LEFT ANTI join"),
    ("hll_distinct_users", "native HLL rollup: partial_hll_sketch_agg "
     "map-side, ALL row merges |types| sketch payloads — user ids "
     "never shuffle"),
    ("heavy_hitters_incremental", "sketch-state lifecycle: per-day "
     "approx_top_k_accumulate partials, one combine over O(days) "
     "binary states, explode + TakeOrdered re-rank"),
    ("events_locf_impute", "LOCF gap fill: (type, hour) partial+final "
     "agg collapses events; sequence() grid + last_value IGNORE NULLS "
     "window runs over timespan-bounded rows only"),
    ("shipmonth_price_percentiles", "ordered-set aggregates: ONE "
     "cohort-key exchange into a sort-based percentile agg over exact "
     "cents — bounded-but-numerous cells, no global sort"),
    ("kmeans_lloyd_step", "K-way argmin unrolled into ONE projection "
     "(no join, no row blowup) feeding a K-key partial+final agg"),
    ("pareto_skyline_customers", "two-phase distributed skyline: "
     "bucket-max grid prune (broadcast), then the exact dominance "
     "anti-join only on the pruned frontier band"),
    ("value_ks_drift", "binned two-sample KS: one fact-grain cell agg, "
     "CDF windows + max-gap agg all on the bounded cell table"),
    ("python_stream_sink", "streaming Python DataSource write: "
     "pass-through plan into per-micro-batch rename-only commits"),
    ("events_changepoint_cusum", "integer-scaled CUSUM: bounded hourly "
     "series, partitioned windows, argmax row_number — one fact shuffle"),
]


def main() -> None:
    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=32)
    sf = "/root/testdata/sf0.01"
    registry.load_all()
    out = [
        "# PLANS — formatted physical plans of headline queries\n",
        "Generated by `python tools/dump_plans.py` (sf0.01, "
        "shuffle.partitions=32, AQE on — `isFinalPlan=false` is pre-execution "
        "AQE state). The properties called out per plan are asserted in "
        "`tests/test_plan_quality.py`.\n",
    ]
    for name, note in HEADLINE:
        plan = formatted_plan(registry.QUERIES[name](spark, sf)).strip()
        lines = plan.splitlines()
        # Unrolled-iteration plans (BPE, power iteration) repeat the
        # same stage shape per round and run to thousands of lines;
        # keep the tree + first operator details, note the rest.
        if len(lines) > 400:
            plan = "\n".join(lines[:400]) + (
                f"\n... [truncated: {len(lines) - 400} more lines — "
                "later unrolled rounds repeat the stage shape above]"
            )
        out.append(f"## {name}\n\n{note}.\n\n```\n{plan}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
