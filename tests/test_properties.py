"""Property-based checks (SURVEY.md §5.3): invariants that hold for
ANY input, cross-checked against a pure-Python StringTokenizer model.
Kept to few hypothesis examples — each example is a Spark job."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_wordcount_spark.operators.wordcount import word_count

# Text lines over a small alphabet incl. space runs, tabs, unicode.
line_st = st.text(alphabet=" \tabAB,é世", max_size=40)
corpus_st = st.lists(line_st, min_size=0, max_size=12)


def python_model(lines: list[str]) -> Counter:
    """The reference semantics, modeled directly: StringTokenizer
    (line, " ") == split on single spaces, drop empties."""
    c: Counter = Counter()
    for line in lines:
        c.update(tok for tok in line.split(" ") if tok)
    return c


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st)
def test_word_count_matches_python_model(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines] or [("",)], "value string")
    if not lines:
        df = df.limit(0)
    got = {r["word"]: r["count"] for r in word_count(df).collect()}
    assert got == dict(python_model(lines))


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st)
def test_count_sum_equals_token_total(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines] or [("",)], "value string")
    if not lines:
        df = df.limit(0)
    counts = word_count(df)
    total = counts.agg(F.sum("count")).head()[0] or 0
    assert total == sum(python_model(lines).values())


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st, st.integers(min_value=1, max_value=5))
def test_partitioning_invariance(spark, lines, n_parts):
    """Counts must not depend on physical partitioning — the
    distributed-correctness property."""
    df = spark.createDataFrame([(ln,) for ln in lines] or [("",)], "value string")
    if not lines:
        df = df.limit(0)
    a = {(r["word"], r["count"]) for r in word_count(df).collect()}
    b = {
        (r["word"], r["count"])
        for r in word_count(df.repartition(n_parts)).collect()
    }
    assert a == b


def test_dedup_exact_idempotent(spark, sf_dir):
    """Running exact dedup on already-deduped docs is a no-op."""
    from hadoop_wordcount_spark.operators.dedup import q_dedup_exact

    first = q_dedup_exact(spark, sf_dir)
    assert first.filter(F.col("n_copies") > 1).count() >= 0
    kept = first.select(F.col("keep_doc_id").alias("doc_id"))
    from hadoop_wordcount_spark.operators.text_analysis import norm_text
    from hadoop_wordcount_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").join(kept, "doc_id", "left_semi")
    again = (
        docs.select(F.md5(norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .count()
    )
    assert again.filter(F.col("count") > 1).count() == 0


def test_minhash_recall_on_high_shingle_jaccard(spark, sf_dir):
    """LSH recall: pairs with exact 3-shingle Jaccard >= 0.8 (ground
    truth via all-pairs scan — affordable at test scale only) must
    appear among the banded-minhash pairs. With 4 bands of 2,
    P(miss | s=0.8) = (1-0.8^2)^4 ≈ 1.7%, so allow 10% slack."""
    from hadoop_wordcount_spark import registry
    from hadoop_wordcount_spark.operators.text_analysis import norm_text
    from hadoop_wordcount_spark.operators.wordcount import tokens_col
    from hadoop_wordcount_spark.sources.tables import load_table

    registry.load_all()
    d = load_table(spark, sf_dir, "documents")
    tk = tokens_col(norm_text(F.col("text")))
    n = F.size(tk)
    shingles = F.when(n < 3, F.array(F.array_join(tk, " "))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.array_join(F.slice(tk, i, 3), " "),
            )
        )
    )
    s = d.select("doc_id", shingles.alias("sh"))
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b")
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["dedup_minhash_banded"](spark, sf_dir).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    missed = exact - banded
    assert len(missed) <= max(1, len(exact) // 10), (
        f"banded LSH missed {len(missed)}/{len(exact)} high-sim pairs"
    )


def test_approx_sketches_close_to_exact(spark, sf_dir):
    """approx_count_distinct (HLL) and percentile_approx (GK) have no
    SQL oracle; bound their error against exact computations."""
    from hadoop_wordcount_spark import registry

    registry.load_all()
    approx = registry.QUERIES["approx_distinct_words"](spark, sf_dir).head()[
        "n_words_approx"
    ]
    exact = registry.QUERIES["distinct_words"](spark, sf_dir).head()["n_words"]
    assert abs(approx - exact) / exact < 0.05

    import duckdb
    from tests.oracle_utils import duckdb_conn

    con = duckdb_conn(sf_dir)
    exact_p = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT event_type, quantile_cont(value, 0.5), quantile_cont(value, 0.95)"
            " FROM events GROUP BY 1"
        ).fetchall()
    }
    con.close()
    for r in registry.QUERIES["value_percentiles"](spark, sf_dir).collect():
        p50, p95 = exact_p[r["event_type"]]
        assert abs(r["p50"] - p50) <= 0.05 * max(abs(p50), 1)
        assert abs(r["p95"] - p95) <= 0.05 * max(abs(p95), 1)


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=2 of K=8 cells scans ~1/4 of the data; the
    query's own cell is always probed (distance 0 to its assigned
    centroid region), so near neighbors — which cluster with the
    query by construction of k-means — should mostly be found.
    Require recall@10 >= 0.8 at test scale (observed: 1.0)."""
    from hadoop_wordcount_spark import registry

    registry.load_all()
    ivf = {
        r["vec_id"]
        for r in registry.QUERIES["ann_ivf_search"](spark, sf_dir).collect()
    }
    exact = {
        r["vec_id"]
        for r in registry.QUERIES["sim_search_topk"](spark, sf_dir).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.8
