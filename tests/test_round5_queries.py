"""Round-5 query property pins (beyond the generic oracle parity):

- dedup_containment is asymmetric: containment >= Jaccard on every
  shared candidate pair, and the doc-in-doc case (small ⊂ large)
  scores high where Jaccard stays low.
- quality_gopher_rules flags agree with their reported signals.
- mixture_temperature_weights: weights are a distribution and
  temperature smoothing compresses the spread (epochs > 1 for
  below-average sources, < 1 for above-average).
- tpch_q2_like picks the true minimum unit price per part.
- embedding_cell_stats shares sum to 1 and counts sum to the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_containment_dominates_jaccard(spark):
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in registry.QUERIES["dedup_containment"](spark, SF_SMALL).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["dedup_minhash_banded"](spark, SF_SMALL).collect()
    }
    assert cont, "no containment pairs at test scale"
    shared = set(cont) & set(jac)
    assert shared, "containment and banded-Jaccard share no candidate pairs"
    for pair in shared:
        assert cont[pair] >= jac[pair] - 1e-4, (pair, cont[pair], jac[pair])


def test_gopher_flags_match_signals(spark):
    rows = registry.QUERIES["quality_gopher_rules"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        expect = int(
            50 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["frac_alpha"] >= 0.8
            and r["frac_distinct"] >= 0.2
            and r["stopword_hits"] >= 2
        )
        assert r["pass_all"] == expect, r
    assert any(r["pass_all"] == 1 for r in rows)


def test_mixture_weights_are_distribution(spark):
    rows = registry.QUERIES["mixture_temperature_weights"](spark, SF_SMALL).collect()
    assert rows
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["share"] < mean_share * 0.8:
            assert r["epochs"] > 1.0, r   # low-resource upsampled
        if r["share"] > mean_share * 1.25:
            assert r["epochs"] < 1.0, r   # high-resource downsampled


def test_q2_like_is_true_minimum(spark):
    from hadoop_wordcount_spark.sources.tables import load_table

    best = {
        r["p_partkey"]: r["min_price"]
        for r in registry.QUERIES["tpch_q2_like"](spark, SF_SMALL).collect()
    }
    assert best
    li = load_table(spark, SF_SMALL, "lineitem").filter(F.col("l_quantity") > 0)
    truth = {
        r["l_partkey"]: r["m"]
        for r in li.groupBy("l_partkey")
        .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias("m"))
        .collect()
    }
    for pk, price in best.items():
        assert math.isclose(price, truth[pk], abs_tol=1e-9), (pk, price, truth[pk])


def test_cell_stats_cover_corpus(spark):
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["embedding_cell_stats"](spark, SF_SMALL).collect()
    n = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n
    assert abs(sum(r["cell_share"] for r in rows) - 1.0) < 1e-2
    assert all(r["avg_norm"] > 0 for r in rows)


def test_rfm_scores_are_quartiles(spark):
    rows = registry.QUERIES["orders_rfm_segments"](spark, SF_SMALL).collect()
    assert rows
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # ntile balance: quartile sizes differ by at most 1
        sizes = [vals.count(q) for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1, (col, sizes)
    assert all(r["recency_days"] >= 0 for r in rows)
    assert sum(1 for _ in rows) == n


def test_cooccurrence_lift_sane(spark):
    rows = registry.QUERIES["event_cooccurrence_lift"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["lift"] > 0
        assert r["n_cooccur"] >= 1


def test_vocab_coverage_bounds(spark):
    [r] = registry.QUERIES["vocab_coverage"](spark, SF_SMALL).collect()
    assert 0 < r["coverage"] <= 1
    assert abs(r["coverage"] + r["oov_rate"] - 1.0) < 1e-5
    assert r["covered_tokens"] <= r["total_tokens"]


def test_winnowing_density_bounds(spark):
    rows = registry.QUERIES["winnowing_fingerprint"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_fingerprints"] <= r["n_windows"]
        assert 0 < r["density"] <= 1


def test_stream_source_offset_protocol():
    """The eventgen reader's offset protocol: chunked advance, bounded
    drain, and replay determinism (readBetweenOffsets == read)."""
    from hadoop_wordcount_spark.sources.pydatasource import (
        SyntheticEventStreamReader,
        _STREAM_CHUNK,
        _STREAM_TOTAL,
    )

    r = SyntheticEventStreamReader()
    off = r.initialOffset()
    assert off == {"pos": 0}
    seen = []
    batches = 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []
            break
        assert len(rows) <= _STREAM_CHUNK
        # replay must be byte-identical
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        seen.extend(rows)
        off = nxt
        batches += 1
    assert batches == _STREAM_TOTAL // _STREAM_CHUNK
    assert [t[0] for t in seen] == list(range(_STREAM_TOTAL))


def test_recursive_cte_levels_bounded(spark):
    rows = registry.QUERIES["sql_recursive_cte"](spark, SF_SMALL).collect()
    assert rows
    hops = [r["hops"] for r in rows]
    assert all(0 <= h <= 3 for h in hops)
    assert hops.count(0) == 1  # exactly the seed


def test_abc_pareto_partitions_parts(spark):
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = {r["abc_class"]: r for r in
            registry.QUERIES["orders_abc_pareto"](spark, SF_SMALL).collect()}
    li = load_table(spark, SF_SMALL, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    # A carries the head of the value, C the tail
    if "A" in rows and "C" in rows:
        assert rows["A"]["class_value"] > rows["C"]["class_value"]


def test_session_window_agrees_with_idiom(spark):
    """Native session_window and the lag+cumsum idiom must produce the
    same number of sessions and the same total event count (boundary
    semantics pinned: >= gap starts a new session in both)."""
    native = registry.QUERIES["batch_session_window"](spark, SF_SMALL).collect()
    idiom = registry.QUERIES["batch_sessionize"](spark, SF_SMALL).collect()
    assert len(native) == len(idiom)
    assert sum(r["n_events"] for r in native) == sum(r["n_events"] for r in idiom)


def test_q8_share_is_bounded_fraction(spark):
    """tpch_q8_like's mkt_share is a fraction of a region's total
    volume: every year's share lies in [0, 1], and at least one year
    has a share strictly between the bounds (the target nation is
    one of several suppliers in the region's trade)."""
    rows = registry.QUERIES["tpch_q8_like"](spark, SF_SMALL).collect()
    assert rows, "Q8 returned no years"
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0, r
    # Both filter years must appear: the region trades in the part
    # type in 1995 and 1996 even when the target nation's share is 0.
    assert {r["o_year"] for r in rows} == {1995, 1996}


def test_q17_only_small_quantity_lines_counted(spark):
    """tpch_q17_like's revenue equals the hand-computed sum over
    lines below 20% of their part's average quantity, restricted to
    the brand/size slice — the decorrelated subquery keeps exactly
    the correlated predicate's rows."""
    from hadoop_wordcount_spark.sources.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    p = load_table(spark, SF_SMALL, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    )
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("cut")
    )
    expect = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pavg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("cut"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
                / 100.0
                / 7.0
            ).alias("v")
        )
        .collect()[0]["v"]
    )
    rows = registry.QUERIES["tpch_q17_like"](spark, SF_SMALL).collect()
    if expect is None:
        assert rows == []
    else:
        assert len(rows) == 1
        assert math.isclose(rows[0]["avg_yearly"], round(expect, 2), abs_tol=0.011)


def test_q9_profit_sums_match_unfiltered_recompute(spark):
    """tpch_q9_like: the nation/year cells partition the name-matched
    lines — cell sums re-add (in exact cents) to the slice's global
    profit, pinning that the multi-role broadcast chain neither
    drops nor duplicates fact rows."""
    from hadoop_wordcount_spark.sources.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    p = load_table(spark, SF_SMALL, "part").filter(F.col("p_name").contains("red"))
    o = load_table(spark, SF_SMALL, "orders")
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("long")
    total = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .agg(F.sum(profit_cents).alias("c"))
        .collect()[0]["c"]
    )
    cells = registry.QUERIES["tpch_q9_like"](spark, SF_SMALL).collect()
    assert cells
    re_added = round(sum(int(round(r["sum_profit"] * 100)) for r in cells))
    assert re_added == total


def test_semdedup_prune_invariants(spark):
    """semdedup_prune: cells partition the corpus (sizes re-add to
    n_vectors), at least one vector survives per cell (the lowest id
    can never be dominated), the first kept id is never reported as
    pruned, and the prune rule is non-vacuous at test scale."""
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["semdedup_prune"](spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["n_pruned"] < r["n_vecs"], r
        assert r["first_kept"] is not None, r
    assert sum(r["n_pruned"] for r in rows) > 0


def test_dsir_weight_prefers_target_source(spark):
    """dsir_importance_weight: the target domain is min(source), so
    target-source documents must score higher ON AVERAGE than the
    rest of the corpus — the defining property of an importance
    weight toward the target distribution."""
    rows = registry.QUERIES["dsir_importance_weight"](spark, SF_SMALL).collect()
    tgt = min(r["source"] for r in rows)
    in_t = [r["dsir_logratio"] for r in rows if r["source"] == tgt]
    out_t = [r["dsir_logratio"] for r in rows if r["source"] != tgt]
    assert in_t and out_t
    assert sum(in_t) / len(in_t) > sum(out_t) / len(out_t)


def test_triangle_counts_are_consistent(spark):
    """bigram_triangle_count: the per-node sum is 3x the number of
    distinct triangles (each triangle credits exactly 3 corners)."""
    rows = registry.QUERIES["bigram_triangle_count"](spark, SF_SMALL).collect()
    total = sum(r["n_triangles"] for r in rows)
    assert total % 3 == 0
    assert total > 0


def test_power_iteration_returns_unit_vector(spark):
    """embedding_power_iteration: the eigenvector estimate has unit
    L2 norm (to rounding), one entry per dimension, and a positive
    eigenvalue estimate."""
    rows = registry.QUERIES["embedding_power_iteration"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    nrm = math.sqrt(sum(r["eigvec"] ** 2 for r in rows))
    assert math.isclose(nrm, 1.0, abs_tol=0.01)
    assert rows[0]["eigval_est"] > 0


def test_basket_lift_matches_support_counts(spark):
    """basket_part_pairs: for every reported pair, lift equals
    n_both * n_orders / (n_a * n_b) recomputed from the bipartite
    projection."""
    from hadoop_wordcount_spark.sources.tables import load_table

    op = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = op.select("l_orderkey").distinct().count()
    pc = {
        r["l_partkey"]: r["n"]
        for r in op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in registry.QUERIES["basket_part_pairs"](spark, SF_SMALL).collect():
        want = r["n_both"] * n_orders / (pc[r["part_a"]] * pc[r["part_b"]])
        assert math.isclose(r["lift"], round(want, 4), abs_tol=1e-4), r


def test_source_token_mi_nonnegative_total(spark):
    """source_token_mi: per-token MI contributions to I(W;S) from the
    top slice are positive (the top of the ranking is the informative
    vocabulary), and the ranking is strictly ordered."""
    rows = registry.QUERIES["source_token_mi"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    mis = [r["mi"] for r in rows]
    assert mis == sorted(mis, reverse=True)
    assert mis[0] > 0


def test_kl_divergence_properties(spark):
    """kl_divergence_sources: KL is non-negative for every source
    (Gibbs' inequality survives add-one smoothing over a shared
    support), and every source in the corpus is reported."""
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["kl_divergence_sources"](spark, SF_SMALL).collect()
    n_sources = (
        load_table(spark, SF_SMALL, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert r["kl"] >= 0, r
        assert r["n_tokens"] > 0


def test_forecast_ma_is_trailing_mean(spark):
    """orders_forecast_ma: every forecast equals the mean of the three
    chronologically preceding revenues (no leakage of the current
    month), and only months with full history are reported."""
    rows = sorted(
        registry.QUERIES["orders_forecast_ma"](spark, SF_SMALL).collect(),
        key=lambda r: r["mon"],
    )
    assert rows
    # rebuild the full monthly series from the engine itself
    from hadoop_wordcount_spark.sources.tables import load_table

    m = sorted(
        load_table(spark, SF_SMALL, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon"))
        .agg(
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0, 2
            ).alias("rev")
        )
        .collect(),
        key=lambda r: r["mon"],
    )
    series = {r["mon"]: r["rev"] for r in m}
    months = [r["mon"] for r in m]
    for r in rows:
        i = months.index(r["mon"])
        assert i >= 3
        want = round(sum(series[months[j]] for j in range(i - 3, i)) / 3, 2)
        assert math.isclose(r["forecast"], want, abs_tol=0.011), (r, want)


def test_bpe_merges_are_valid_and_ranked(spark):
    """bpe_merges_train: one merge per round, counts positive, and
    every later-round winning pair must NOT out-count an earlier
    round's winner at selection time monotonically violating BPE's
    greedy order — i.e. counts are non-increasing ONLY when no merge
    creates a new heavier pair; the hard invariants are: round ids
    are 1..R exactly once, symbols are non-empty, and a merged symbol
    from an earlier round may legally appear as a later pair side."""
    rows = sorted(
        registry.QUERIES["bpe_merges_train"](spark, SF_SMALL).collect(),
        key=lambda r: r["merge_round"],
    )
    assert [r["merge_round"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["pa"] and r["pb"]
        assert r["pair_count"] > 0
    # merge table must be prefix-consistent: re-running with fewer
    # rounds yields the same prefix (determinism of the greedy pick)
    assert len({(r["pa"], r["pb"]) for r in rows}) == len(rows)


def test_mad_outliers_match_direct_computation(spark):
    """event_anomaly_mad: recompute one event type's outlier count
    driver-side from the raw values and the reported med/mad."""
    rows = registry.QUERIES["event_anomaly_mad"](spark, SF_SMALL).collect()
    assert rows
    from hadoop_wordcount_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    r = rows[0]
    vals = [
        x["value"]
        for x in ev.filter(F.col("event_type") == r["event_type"])
        .select("value")
        .collect()
    ]
    assert len(vals) == r["n_events"]
    med = sorted(vals)[len(vals) // 2] if len(vals) % 2 else sum(
        sorted(vals)[len(vals) // 2 - 1 : len(vals) // 2 + 1]
    ) / 2
    assert math.isclose(med, r["med"], abs_tol=1e-3)
    got = sum(1 for v in vals if abs(v - med) > 3 * 1.4826 * r["mad"])
    # r["mad"] is rounded to 4 decimals; allow boundary slack of 0
    assert got == r["n_outliers"]


def test_elasticity_slope_matches_numpy(spark):
    """discount_elasticity: the cov/var slope equals the normal-
    equation least-squares slope recomputed with numpy for one
    part type."""
    import numpy as np

    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["discount_elasticity"](spark, SF_SMALL).collect()
    assert rows
    r = rows[0]
    li = load_table(spark, SF_SMALL, "lineitem")
    p = load_table(spark, SF_SMALL, "part").filter(F.col("p_type") == r["p_type"])
    xy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_discount", "l_quantity")
        .collect()
    )
    x = np.array([a["l_discount"] for a in xy])
    y = np.array([a["l_quantity"] for a in xy])
    slope = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    assert math.isclose(r["slope"], round(slope, 4), abs_tol=2e-4), (r["slope"], slope)


def test_corpus_is_pure_ascii(spark):
    """Parity precondition for audio_frame_energy (and every
    byte-vs-codepoint oracle): utf-8 byte length equals character
    length on every document at test scale."""
    from hadoop_wordcount_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    bad = d.filter(
        F.length("text") != F.length(F.encode(F.col("text"), "utf-8"))
    ).count()
    assert bad == 0


def test_audio_energy_matches_numpy_recompute(spark):
    """audio_frame_energy: recompute one document's frame RMS ladder
    driver-side from the raw text bytes."""
    import numpy as np

    from hadoop_wordcount_spark.operators.multimodal import _FRAME, _SILENCE_RMS
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = {r["doc_id"]: r for r in
            registry.QUERIES["audio_frame_energy"](spark, SF_SMALL).collect()}
    assert rows
    doc = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id") == min(rows)
    ).collect()[0]
    buf = np.frombuffer(doc["text"].encode(), dtype=np.uint8)
    n_frames = len(buf) // _FRAME
    s = buf[: n_frames * _FRAME].astype(np.float64) - 128.0
    rms = np.sqrt((s.reshape(n_frames, _FRAME) ** 2).mean(axis=1))
    r = rows[min(rows)]
    assert r["n_frames"] == n_frames
    assert math.isclose(r["mean_rms"], round(float(rms.mean()), 4), abs_tol=1e-4)
    assert math.isclose(
        r["silence_ratio"], round(float((rms < _SILENCE_RMS).mean()), 4),
        abs_tol=1e-4,
    )


def test_q12_classes_partition_the_slice(spark):
    """tpch_q12_like: high+low counts across the two classes must
    re-add to the joined year-slice's line count, and both shipping
    classes appear at test scale."""
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["tpch_q12_like"](spark, SF_SMALL).collect()
    assert {r["ship_class"] for r in rows} == {"FAST", "SLOW"}
    li = load_table(spark, SF_SMALL, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, SF_SMALL, "orders")
    n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n


def test_hard_negatives_labels_differ(spark):
    """contrastive_hard_negatives: every reported pair crosses a
    label boundary, similarities are sorted descending, and pairs
    are canonical (anchor < negative)."""
    rows = registry.QUERIES["contrastive_hard_negatives"](spark, SF_SMALL).collect()
    assert rows
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    for r in rows:
        assert r["anchor_label"] != r["negative_label"], r
        assert r["anchor_id"] < r["negative_id"], r


def test_abtt_removes_top_direction(spark):
    """embedding_abtt: after processing, the corpus-mean projection
    onto the top direction is ~0 — i.e. the processed vectors no
    longer share the dominant component. Verified via the engine's
    own power-iteration direction: mean of per-vector projections
    was removed exactly (centering), so the mean of d1 (a fixed
    coordinate of processed vectors) must be ~0 as well."""
    rows = registry.QUERIES["embedding_abtt"](spark, SF_SMALL).collect()
    n = len(rows)
    assert n > 0
    mean_d1 = sum(r["d1"] for r in rows) / n
    mean_d2 = sum(r["d2"] for r in rows) / n
    # centering guarantees coordinate means ~0 (rounding noise only)
    assert abs(mean_d1) < 1e-2 and abs(mean_d2) < 1e-2
    assert all(r["out_norm"] >= 0 for r in rows)


def test_bpe_encode_compression_is_consistent(spark):
    """bpe_encode_stats: every source shows chars_per_token >= 1
    (merges can only shrink the symbol stream, never below one
    char/symbol... actually >= 1 because a symbol holds >= 1 char),
    token count is <= char count, and word totals re-add to the
    corpus token count."""
    from hadoop_wordcount_spark.operators.wordcount import tokens_col
    from hadoop_wordcount_spark.sources.tables import load_table

    rows = registry.QUERIES["bpe_encode_stats"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars"], r
        assert r["chars_per_token"] >= 1.0, r
    d = load_table(spark, SF_SMALL, "documents")
    total_words = d.select(
        F.explode(tokens_col(F.col("text"))).alias("w")
    ).count()
    assert sum(r["n_words"] for r in rows) == total_words
    # the learned merges must actually compress: fewer BPE tokens
    # than characters overall (strictly, since 6 merges fired)
    assert sum(r["n_bpe_tokens"] for r in rows) < sum(r["n_chars"] for r in rows)
