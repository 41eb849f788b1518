"""Round-10 pins: the dedup_embedding_cosine_ivf demotion (r9 verdict
#4 option b) and the dedup_edit_verify pre-filter trim (r9 verdict
#5)."""

from __future__ import annotations

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.operators.dedup import (
    IVF_COSINE_ORACLE,
    q_dedup_embedding_cosine_ivf,
)
from tests.conftest import SF_SMALL
from tests.oracle_utils import compare_query

registry.load_all()


def test_ivf_cosine_demoted_but_oracle_green(spark):
    """Deregistered in round 10 (exact within-cell scoring has no
    scale-safe IVF operating point — measured ladder last-step alpha
    1.66 vs the 1.5 design bar; `dedup_embedding_pq` is the
    registered representative at 0.69). Still hash-matches its ANSI
    oracle — the shared quantizer and cosine-scoring stages this
    function exercises are the same ones the PQ path builds on,
    exactly mirroring the round-6 `labelblocked_embedding_cosine`
    precedent."""
    assert "dedup_embedding_cosine_ivf" not in registry.QUERIES
    assert "dedup_embedding_cosine_ivf" not in registry.ORACLES
    assert "dedup_embedding_pq" in registry.ORACLES
    err = compare_query(
        spark,
        SF_SMALL,
        "dedup_embedding_cosine_ivf",
        q_dedup_embedding_cosine_ivf,
        IVF_COSINE_ORACLE,
    )
    assert err is None, err


def test_srp_pairs_unique_and_scores_exact(spark):
    """First-colliding-band ownership must emit every candidate pair
    exactly once (no pair-level distinct anywhere in the plan), and
    the reported cosine must agree with direct computation."""
    import math

    from pyspark.sql import functions as F

    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["dedup_embedding_srp"](
        spark, SF_SMALL
    ).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    if not rows:
        return
    top = rows[0]
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF_SMALL, "embeddings")
        .filter(F.col("vec_id").isin([top["vec_a"], top["vec_b"]]))
        .collect()
    }
    va, vb = emb[top["vec_a"]], emb[top["vec_b"]]
    dot = sum(float(x) * float(y) for x, y in zip(va, vb))
    na = math.sqrt(sum(float(x) ** 2 for x in va))
    nb = math.sqrt(sum(float(x) ** 2 for x in vb))
    assert abs(top["cos_sim"] - round(dot / (na * nb), 4)) <= 1e-3


def test_new_round10_queries_no_cartesian(spark, sf_dir):
    from tests.test_plan_quality import assert_not_in_plan

    for name in ("dedup_embedding_srp", "rake_keywords",
                 "ranker_agreement_topk", "label_margin_audit"):
        df = registry.QUERIES[name](spark, sf_dir)
        assert_not_in_plan(df, "CartesianProduct")
