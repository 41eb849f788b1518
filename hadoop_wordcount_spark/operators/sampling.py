"""Deterministic sampling & dataset splitting.

LLM training-data pipelines need REPRODUCIBLE sampling: the same
document must land in the same split/sample on every run, on any
cluster layout, with no RNG state. The standard trick is hash-bucket
sampling — bucket = first bytes of a cryptographic hash of the stable
key — which is deterministic, uniformly distributed, stable under
repartitioning, and composable (a 10% sample of a 50% split is a
fixed 5% of the corpus forever).

Both engines compare the same lowercase-hex md5 prefix against the
same literal thresholds, so every query here is exactly
oracle-checkable — no seeded-RNG parity problems (`rand(seed)` is
partition-layout-dependent in Spark and engine-specific everywhere).

Scale: the hash is a per-row projection (no shuffle, no state); the
selection predicate sits directly above the scan, so Catalyst prunes
columns and the filter pipelines into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table

# 256 hash buckets from the first two lowercase-hex md5 chars of the
# stable key. Split boundaries: train = [00, cc) -> 204/256 ~ 79.7%,
# val = [cc, e6) -> 26/256 ~ 10.2%, test = [e6, ff] -> 26/256 ~ 10.2%.
_TRAIN_HI = "cc"
_VAL_HI = "e6"


def hash_bucket(key) -> "F.Column":
    """First-2-hex-chars md5 bucket of the key's string form —
    deterministic, engine-portable (md5 hex is lowercase in both
    Spark and DuckDB)."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


_BUCKET_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


@query(
    "dataset_split",
    oracle=f"""
        SELECT CASE WHEN {_BUCKET_SQL} < '{_TRAIN_HI}' THEN 'train'
                    WHEN {_BUCKET_SQL} < '{_VAL_HI}' THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY 1
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by md5 hash
    bucket of doc_id: membership is a pure function of the key, so
    the split is identical on every run and every cluster layout —
    and adding documents later never moves an existing one across
    splits (the property seeded `randomSplit` cannot give you)."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN_HI, "train").when(b < _VAL_HI, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


@query(
    "stratified_sample",
    oracle=f"""
        SELECT lang, doc_id, n_chars
        FROM documents
        WHERE {_BUCKET_SQL} < CASE lang WHEN 'en' THEN '1a' ELSE '80' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates via hash
    buckets — 'en' keeps 26/256 ~ 10%, every other language 128/256 =
    50% (the downsample-the-majority-language move of corpus
    balancing). Exactly reproducible row set, unlike `sampleBy`,
    whose seeded output depends on partition layout. The predicate is
    a scan-level filter: no shuffle, no state, prunes to 3 columns."""
    d = load_table(spark, sf_dir, "documents")
    rate_hi = F.when(F.col("lang") == "en", "1a").otherwise("80")
    return d.filter(hash_bucket(F.col("doc_id")) < rate_hi).select(
        "lang", "doc_id", "n_chars"
    )
