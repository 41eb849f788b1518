"""Benchmark harness: run every registered query at the bench scale
factor and print ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is fully materialized via a count-ish action
(``df.write.format("noop")``) so the measured time includes the whole
plan execution, not just plan construction.

Per-query timings are COLD: ``spark.catalog.clearCache()`` runs
before every query. Plan-keyed ``.cache()`` stages shared across
queries (the banded verified-pair stage; the trained IVF quantizer)
are PRE-BUILT untimed before each of their consumers and reported
once as their own ``shared_stages`` lines — so consumer timings are
marginal work, stable run-over-run, and the build cost appears
exactly once instead of being charged to whichever consumer runs
first (or to all of them). Cold + ``shared_stages`` is the SOLE
published protocol: the former warm pass reported eviction-order
artifacts (the accumulated 269-query cache landed a shared build on
whichever consumer ran first alphabetically, e.g. a 44.9 s "warm"
row for a 1.9 s query) and was dropped per the r7 verdict.

Host-steal canary: a fixed CPU-bound probe pair (pure-Python spin +
``word_count`` at sf0.01) is timed before, midway through, and after
the sweep and published under ``canary`` — round-over-round tail
comparisons should first normalize by the canary ratio. The r7
driver tail ran a near-uniform 1.38x slower than r6 across unrelated
families (hypervisor steal), which was only diagnosable indirectly;
the canary makes it attributable at a glance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.session import get_spark

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CANARY_SF_DIR = "/root/testdata/sf0.01"


def _canary_probe(spark) -> dict[str, float]:
    """Fixed CPU-bound probe: a pure-Python spin (measures raw host
    CPU / hypervisor steal, no JVM involved) and word_count at sf0.01
    (measures the Spark task path). Constant work by construction —
    any round-over-round drift in these numbers is the HOST, not the
    queries, so tail comparisons divide by the canary ratio first."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    py_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    registry.QUERIES["word_count"](spark, CANARY_SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    wc_s = time.perf_counter() - t0
    return {
        "python_spin_s": round(py_s, 3),
        "word_count_sf001_s": round(wc_s, 3),
    }


def main() -> None:
    spark = get_spark(app_name="hwcs-bench")
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}

    # Warm the JVM/codegen once so query timings measure the engine,
    # not first-call classloading — one warmer per engine family with
    # meaningful one-time setup: relational codegen (word_count), the
    # Python data source path (~10s one-time worker spawn +
    # registration), the Arrow/pandas worker pool, the streaming
    # state-store machinery, and the ML-pipeline classes. Each query
    # still pays its own per-run cost inside the timed loop below.
    for warm in (
        "word_count",
        "python_datasource_scan",
        "group_zscore_pandas",
        "streaming_wordcount",
        "sim_search_lsh",
    ):
        registry.QUERIES[warm](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    # Shared cached stages, benched as their OWN lines. Several
    # queries deliberately share a cached stage (the banded
    # MinHash verified-pair set; the trained IVF quantizer memo).
    # Charging that build to whichever consumer happens to run first
    # produced phantom 6x round-over-round swings (r5 verdict #4), and
    # charging it to EVERY consumer (plain cold mode) reports build
    # cost n_consumers times. Instead: in cold mode each consumer
    # still starts from a cleared cache, but its shared stage is
    # PRE-BUILT (untimed) right before it, so per-consumer numbers are
    # marginal work — stable across runs — and the build itself is
    # reported once under "shared_stages".
    def _build_banded_pairs() -> None:
        from hadoop_wordcount_spark.operators.dedup import _banded_verified_pairs

        _banded_verified_pairs(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    def _build_ivf() -> None:
        from hadoop_wordcount_spark.operators.similarity import ivf_assignments

        cells, _cent = ivf_assignments(spark, SF_DIR)
        cells.write.format("noop").mode("overwrite").save()

    shared_stages = {
        "banded_pairs": (
            _build_banded_pairs,
            {
                "dedup_minhash_banded",
                "source_overlap_matrix",
                "dedup_clusters",
                "dedup_cluster_representatives",
                "dedup_threshold_sweep",
                "dedup_graph_degree_report",
                "dedup_containment",
                "dedup_incremental",
                "dedup_ngram_jaccard_lsh",
                "pipeline_curate",
                "dedup_edit_verify",
                "minhash_estimator_calibration",
                "dedup_cluster_purity",
            },
        ),
        "ivf_quantizer": (
            _build_ivf,
            {
                "ann_ivf_search",
                "dedup_embedding_cosine_ivf",
                "embedding_cell_stats",
                "contrastive_hard_negatives",
                "cluster_topic_terms",
                "semdedup_prune",
                "dedup_embedding_pq",
            },
        ),
    }
    stage_of = {
        q: stage for stage, (_, qs) in shared_stages.items() for q in qs
    }
    stage_times: dict[str, float] = {}

    names = sorted(registry.QUERIES)
    midpoint = len(names) // 2
    canary = {"start": _canary_probe(spark)}

    t_total = time.perf_counter()
    for idx, name in enumerate(names):
        if idx == midpoint:
            t_pause = time.perf_counter()
            canary["mid"] = _canary_probe(spark)
            # Canary time is excluded from the published total.
            t_total += time.perf_counter() - t_pause
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        # Also drop the trained-IVF memo — cold means cold.
        from hadoop_wordcount_spark.operators.similarity import reset_ivf_memo

        reset_ivf_memo()
        stage = stage_of.get(name)
        if stage is not None:
            t0 = time.perf_counter()
            try:
                shared_stages[stage][0]()
                # Report the build cost once: the median build is
                # the honest number, but first-build suffices and
                # keeps one line per stage — keep the FIRST.
                stage_times.setdefault(
                    stage, round(time.perf_counter() - t0, 3)
                )
            except Exception as exc:
                failures.setdefault(
                    f"shared:{stage}", f"{type(exc).__name__}: {exc}"[:200]
                )
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, keep benching the rest
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    total = round(time.perf_counter() - t_total, 3)
    canary["end"] = _canary_probe(spark)

    out = {
        "metric": "total_wall_clock_all_queries",
        "value": total,
        "unit": "sec",
        "mode": "cold",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "canary": canary,
    }
    if stage_times:
        out["shared_stages"] = stage_times

    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
