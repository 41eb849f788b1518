"""Round-11 pins: the Arrow-kernel rewrites (SRP projection, MinHash
featurization) must stay BIT-IDENTICAL to the in-plan formulations
they replaced, the ann_recall_report fixed-K64 re-pin (r10 verdict
#1), the bootstrap sqrt(B) blocking invariant (r10 verdict #3), and
the shuffle-free k-means assignment's argmin semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.functions import srp as srp_mod
from hadoop_wordcount_spark.operators.dedup import _docs, _minhash_base
from hadoop_wordcount_spark.operators.text_analysis import norm_text
from hadoop_wordcount_spark.operators.wordcount import tokens_col
from tests.conftest import SF_SMALL

registry.load_all()


def test_srp_kernel_matches_hof_formulation(spark):
    """The Arrow SRP kernel's band keys must equal the reference
    interpreted-HOF formulation bit-for-bit (sequential per-dim
    accumulation — same IEEE op sequence, no reassociation). Guards
    the kernel against drift (e.g. a numpy call that reassociates)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    planes = srp_mod._srp_planes()
    bb = srp_mod._SRP_BAND_BITS
    n_bands = srp_mod._SRP_BITS // bb
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select("vec_id", v.alias("v"))

    def fold_dot(row):
        hv = F.array(*[F.lit(x) for x in row])
        return F.aggregate(
            F.zip_with(F.col("v"), hv, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = [
        F.when(F.round(fold_dot(row), 6) >= 0, 1).otherwise(0)
        for row in planes
    ]
    keys = [
        sum((bits[b * bb + i] * (1 << i)) for i in range(bb)).cast("long")
        for b in range(n_bands)
    ]
    ref = e.select("vec_id", F.array(*keys).alias("ks_ref"))
    got, nb = srp_mod.srp_spark_side(emb)
    assert nb == n_bands
    j = got.join(ref, "vec_id")
    assert j.count() == emb.count()
    assert j.filter(F.col("ks") != F.col("ks_ref")).count() == 0


def test_minhash_kernel_matches_inplan_formulation(spark):
    """The Arrow MinHash featurization (shingles + double-md5 + 8-hex
    slice mins — pure string math) must equal the in-plan HOF
    formulation exactly: same first-occurrence shingle order, same
    digest prefixes, same k-outer/j-inner signature layout."""
    d = _docs(spark, SF_SMALL)
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

    def _dig(k):
        prefix = f"{k}:"
        return F.transform(
            F.col("shingles"), lambda s: F.md5(F.concat(F.lit(prefix), s))
        )

    digs = F.array(_dig(0), _dig(1))

    def _slice_min(k, j):
        lo = 1 + 8 * j
        return F.array_min(
            F.transform(
                F.element_at("digs", k + 1), lambda h: F.substring(h, lo, 8)
            )
        )

    sig = F.array(*[_slice_min(k, j) for k in range(2) for j in range(4)])
    ref = (
        d.select("doc_id", shingles.alias("shingles"))
        .select("doc_id", "shingles", digs.alias("digs"))
        .select(
            "doc_id",
            F.col("shingles").alias("sh_ref"),
            sig.alias("sig_ref"),
        )
    )
    got = _minhash_base(spark, SF_SMALL)
    j = got.join(ref, "doc_id")
    assert j.count() == d.count()
    assert (
        j.filter(
            (F.col("shingles") != F.col("sh_ref"))
            | (F.col("sig") != F.col("sig_ref"))
        ).count()
        == 0
    )


def test_ann_recall_pinned_k_independent_of_module_default(spark):
    """ann_recall_report's quantizer size is pinned (r10 verdict #1):
    patching the module IVF_K (the ladder's sqrt-n dial) must not
    change the recall report's output, and the pinned K must be 64 in
    both the query constant and the oracle text."""
    from hadoop_wordcount_spark.operators import similarity

    assert similarity.ANN_RECALL_K == 64
    assert f"vec_id < {similarity.ANN_RECALL_K}" in registry.ORACLES[
        "ann_recall_report"
    ]
    base = registry.QUERIES["ann_recall_report"](spark, SF_SMALL).collect()
    old_k = similarity.IVF_K
    similarity.IVF_K = 13
    try:
        patched = registry.QUERIES["ann_recall_report"](
            spark, SF_SMALL
        ).collect()
    finally:
        similarity.IVF_K = old_k
    assert sorted(map(tuple, base)) == sorted(map(tuple, patched))


def test_ivf_arraymin_assignment_matches_groupby_argmin(spark):
    """The shuffle-free Arrow argmin assignment kernel (sequential
    per-dim accumulation, half-away 4dp quantization, strict-< scan
    in ascending-cid order) must pick the same (d2, cid) argmin as
    the r10 crossJoin+groupBy+min(struct) formulation — same
    quantized distances, same cid tiebreak."""
    from hadoop_wordcount_spark.operators.similarity import (
        _ivf_d2,
        ivf_assignments,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    inverted, cent = ivf_assignments(spark, SF_SMALL)
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    best = F.struct(
        _ivf_d2(F.col("v"), F.col("cv")).alias("d2"),
        F.col("cid").alias("cid"),
    )
    ref = (
        vecs.crossJoin(F.broadcast(cent))
        .select("vec_id", best.alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid_ref"))
    )
    j = inverted.join(ref, "vec_id")
    assert j.count() == emb.count()
    assert j.filter(F.col("cid") != F.col("cid_ref")).count() == 0


def test_bootstrap_block_invariant():
    """sqrt(B) blocking: the explode factor times the per-row column
    block must cover exactly the B resamples."""
    from hadoop_wordcount_spark.operators import relational as R

    assert R._BS_BLOCK * R._BS_BLOCK == R._BS_B


def test_bootstrap_blocked_means_stream_invariants(spark):
    """The sqrt(B)-blocked means stream (`_bs_blocked_means`) must
    cover the B resamples exactly: _BS_B mean_b rows per event_type,
    produced as _BS_BLOCK aggregate cells per type unpivoted
    _BS_BLOCK-wide — asserted on RESULTS, not optimized-plan text
    (plan strings proved brittle against Spark/codegen formatting,
    r11 ADVICE)."""
    from hadoop_wordcount_spark.operators import relational as R

    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    per = R._bs_blocked_means(e)
    counts = per.groupBy("event_type").count().collect()
    assert counts, "no event types"
    assert all(r["count"] == R._BS_B for r in counts), counts
    # The registered query consumes this exact stream (no drifted
    # copy): its CI bounds must bracket correctly per type and the
    # row set must be one row per event_type.
    df = registry.QUERIES["bootstrap_ci_poisson"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == len(counts)
    assert all(r["ci_lo"] <= r["ci_hi"] for r in rows), rows
