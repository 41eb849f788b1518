"""Scaling probe: replicate the sf0.1 documents corpus Nx into /tmp
and measure flagship queries at growing scale, writing SCALING.md.

This is the 'would it still work at 1000x' smoke: wall-clock should
grow ~linearly with corpus size for the scan-bound operators (the
plans shuffle O(distinct keys) / O(candidates), not O(rows)).

Usage: python tools/scale_probe.py [factors...]   (default 1 4 16)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_wordcount_spark.operators.wordcount import word_count
from hadoop_wordcount_spark.operators.text_analysis import norm_text
from hadoop_wordcount_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scale-probe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_n = docs.count()
    rows = ["# SCALING — replication probe over documents (sf0.1 base)", "",
            f"Base corpus: {base_n} docs. Each step replicates it Nx with "
            "re-keyed doc_ids (distinct-key cardinality grows with N too).",
            "For the repeated_spans probe every token additionally gets a "
            "replica-unique interleave so true span density stays constant "
            "per replica — the probe measures the operator's scaling, not "
            "the planted quadratic duplication replication would create.",
            "", "| replication | docs | word_count s | dedup_exact s | "
            "text_stats-agg s | repeated_spans s |", "|---|---|---|---|---|---|"]
    for n in factors:
        reps = spark.range(n).select(F.col("id").alias("rep"))
        corpus = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep") * base_n).alias("doc_id"),
            # visible-per-replica suffix keeps fingerprints distinct across reps
            F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        )
        path = os.path.join(tempfile.gettempdir(), f"hwcs_scale_{n}x")
        corpus.write.mode("overwrite").parquet(path)
        big = spark.read.parquet(path)
        n_docs = big.count()

        t0 = time.perf_counter()
        word_count(big, text_col="text").write.format("noop").mode("overwrite").save()
        t_wc = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        big.select(F.md5(norm_text(F.col("text"))).alias("fp")).groupBy("fp").count() \
            .write.format("noop").mode("overwrite").save()
        t_dd = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        big.select(
            F.size(F.filter(F.split("text", " ", -1), lambda w: w != "")).alias("nt")
        ).agg(F.sum("nt"), F.avg("nt")).write.format("noop").mode("overwrite").save()
        t_ts = round(time.perf_counter() - t0, 2)

        # repeated_spans: replica-unique interleave token after every
        # space keeps 10-token windows from matching ACROSS replicas,
        # so shared-span density per replica is constant and wall-clock
        # should scale ~linearly with rows.
        from hadoop_wordcount_spark import registry

        registry.load_all()
        span_dir = os.path.join(tempfile.gettempdir(), f"hwcs_scale_spans_{n}x")
        spans_corpus = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep") * base_n).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), F.lit(" "),
                F.concat(F.lit(" q"), F.col("rep").cast("string"), F.lit("z ")),
            ).alias("text"),
        )
        spans_corpus.write.mode("overwrite").parquet(
            os.path.join(span_dir, "documents.parquet")
        )
        t0 = time.perf_counter()
        registry.QUERIES["repeated_spans"](spark, span_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        t_rs = round(time.perf_counter() - t0, 2)

        rows.append(f"| {n}x | {n_docs} | {t_wc} | {t_dd} | {t_ts} | {t_rs} |")
        print(f"{n}x: docs={n_docs} wc={t_wc}s dedup={t_dd}s stats={t_ts}s spans={t_rs}s")

    rows += ["", "Linear-ish growth here means the plans are scan-bound with "
             "bounded shuffles — the property that carries to a real cluster, "
             "where the same plan splits across executors instead of threads."]
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.md"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print("SCALING.md written")


if __name__ == "__main__":
    main()
