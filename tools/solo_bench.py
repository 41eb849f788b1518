"""Solo query benchmark: run named queries N times under bench.py's
exact cold protocol (clearCache + IVF-memo reset before every run;
shared stages pre-built untimed), print per-run seconds and the min.

This is the A/B harness the optimization rounds use to adjudicate a
single change without paying a full 344-query sweep (and without the
sweep's susceptibility to host-steal bursts: interleave the two
variants in ONE session and compare mins).

Usage:
    python tools/solo_bench.py q1 q2 ... [--runs 3] [--plan-dir DIR]

Env (same as bench.py): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
`--plan-dir DIR` additionally writes DIR/<query>.txt with the
formatted physical plan (captured once, before the timed runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.session import get_spark

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Mirror bench.py's shared-stage protocol so solo numbers are the same
# marginal-work quantity the sweep reports.
_BANDED = {
    "dedup_minhash_banded", "source_overlap_matrix", "dedup_clusters",
    "dedup_cluster_representatives", "dedup_threshold_sweep",
    "dedup_graph_degree_report", "dedup_containment", "dedup_incremental",
    "dedup_ngram_jaccard_lsh", "pipeline_curate", "pipeline_train_corpus",
    "dedup_edit_verify",
    "minhash_estimator_calibration", "dedup_cluster_purity",
}
_IVF = {
    "ann_ivf_search", "embedding_cell_stats", "contrastive_hard_negatives",
    "cluster_topic_terms", "semdedup_prune", "dedup_embedding_pq",
}


def _prebuild(spark, name: str) -> None:
    if name in _BANDED:
        from hadoop_wordcount_spark.operators.dedup import _banded_verified_pairs

        _banded_verified_pairs(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    elif name in _IVF:
        from hadoop_wordcount_spark.operators.similarity import ivf_assignments

        cells, _cent = ivf_assignments(spark, SF_DIR)
        cells.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="hwcs-solo-bench")
    # Same JVM warmers as bench.py so run 1 measures the engine.
    for warm in ("word_count",):
        registry.QUERIES[warm](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    from hadoop_wordcount_spark.operators.similarity import reset_ivf_memo

    for name in args.queries:
        fn = registry.QUERIES[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            spark.catalog.clearCache()
            reset_ivf_memo()
            _prebuild(spark, name)
            from hadoop_wordcount_spark.plans.inspect import formatted_plan

            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(formatted_plan(fn(spark, SF_DIR)))
        runs = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            reset_ivf_memo()
            _prebuild(spark, name)
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"name": name, "runs": runs, "min": min(runs)}),
              flush=True)


if __name__ == "__main__":
    main()
