"""Sketch quality bounds + plan pins for the sketch/layout operators
(heavy_hitters_cms, kmv_source_overlap, weighted_sample_bernoulli,
dpp_partition_pruned_join)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.operators.wordcount import tokens_col
from hadoop_wordcount_spark.plans.inspect import formatted_plan
from hadoop_wordcount_spark.sources.tables import load_table

registry.load_all()


def test_cms_one_sided_error(spark, sf_dir):
    """Count-Min's defining guarantee: estimate >= exact, always."""
    rows = registry.QUERIES["heavy_hitters_cms"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_count, r
        assert r.overestimate == r.cms_estimate - r.exact_count


def test_cms_counter_lookup_broadcasts(spark, sf_dir):
    """The 4x256 counter grid must join as the broadcast side."""
    plan = formatted_plan(registry.QUERIES["heavy_hitters_cms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def _exact_shingle_sets(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tk = F.col("tk")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tk, i),
                F.element_at(tk, i + 1),
                F.element_at(tk, i + 2),
            ),
        )
    )
    rows = (
        d.select("source", tokens_col(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= 3)
        .select("source", F.explode(shingles).alias("s"))
        .distinct()
        .collect()
    )
    sets: dict[str, set] = {}
    for r in rows:
        sets.setdefault(r.source, set()).add(r.s)
    return sets

def test_kmv_estimates_track_exact(spark, sf_dir):
    """KMV Jaccard estimate within the minwise-estimator error band of
    the exact per-pair Jaccard, and the union-DV estimate within a
    2x band of the exact distinct-shingle union (k=64 => ~12.5%
    relative sd; the bands are several sigmas wide)."""
    sets = _exact_shingle_sets(spark, sf_dir)
    est = {
        (r.src_a, r.src_b): r
        for r in registry.QUERIES["kmv_source_overlap"](spark, sf_dir).collect()
    }
    assert est, "no source pairs"
    for (a, b), r in est.items():
        sa, sb = sets[a], sets[b]
        exact_j = len(sa & sb) / len(sa | sb)
        assert 0.0 <= r.jaccard_est <= 1.0
        # 5 sigma of sqrt(J(1-J)/k) capped below by a floor of 0.15
        tol = max(0.15, 5 * math.sqrt(max(exact_j * (1 - exact_j), 0.01) / 64))
        assert abs(r.jaccard_est - exact_j) <= tol, (a, b, r.jaccard_est, exact_j)
        exact_u = len(sa | sb)
        assert 0.4 * exact_u <= r.union_dv_est <= 2.5 * exact_u, (
            a, b, r.union_dv_est, exact_u,
        )


def test_weighted_sample_realized_tracks_expected(spark, sf_dir):
    """Corpus-wide realized sample count lands inside a generous
    binomial band around the analytic expectation."""
    rows = registry.QUERIES["weighted_sample_bernoulli"](spark, sf_dir).collect()
    n_sampled = sum(r.n_sampled for r in rows)
    expected = sum(r.expected_sampled for r in rows)
    assert expected > 0
    sd = math.sqrt(expected)  # binomial sd upper bound for small p
    assert abs(n_sampled - expected) <= 6 * sd + 3, (n_sampled, expected)


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The month-partitioned fact scan must carry a dynamicpruning
    partition filter — the runtime-pruned plan, not a full scan."""
    df = registry.QUERIES["dpp_partition_pruned_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan, plan


def test_cluster_topic_terms_plan(spark, sf_dir):
    """Marginals must attach by broadcast; the only corpus-sized
    exchanges are the id join and the (cid, word) agg — and the
    crossJoin is against a broadcast single-row total, never a
    CartesianProduct."""
    df = registry.QUERIES["cluster_topic_terms"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_curriculum_phases_are_balanced(spark, sf_dir):
    """ntile(10) must cut near-equal phases; every phase reports a
    non-negative shard skew bounded by its population."""
    rows = registry.QUERIES["curriculum_shards"](spark, sf_dir).collect()
    assert len(rows) == 10
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r.shard_skew <= r.n_docs


def test_kmv_distinct_error_bounded(spark, sf_dir):
    """Estimator within 4 sigma (~50%) of exact for sketch-sized
    sources, exact below k."""
    rows = registry.QUERIES["kmv_distinct_per_source"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_exact < 64:
            assert r.kmv_est == float(r.n_exact)
            assert r.rel_err == 0.0
        else:
            assert r.rel_err <= 0.5, (r.source, r.n_exact, r.kmv_est)


def test_observed_scan_metrics_fire(spark, sf_dir):
    """observe() metrics must equal the result's own totals."""
    from hadoop_wordcount_spark.operators import relational

    rows = registry.QUERIES["observed_scan"](spark, sf_dir).collect()
    m = relational.LAST_OBSERVATION.get
    assert m["rows_scanned"] == sum(r.n_docs for r in rows)
    assert m["chars_scanned"] == sum(r.n_chars for r in rows)


def test_null_semantics_plans_null_aware_anti_join(spark, sf_dir):
    """The NOT IN branch must compile to Spark's null-aware anti
    join, and the three counts must satisfy the 3VL ordering:
    not_in == 0 < not_exists, null_safe <= not_exists."""
    df = registry.QUERIES["null_semantics_audit"](spark, sf_dir)
    plan = formatted_plan(df)
    # Catalyst rewrites all three anti-semijoin forms to LeftAnti
    # hash joins (the NOT IN variant carrying the null-aware
    # condition); pin that none degraded to a nested loop.
    assert plan.count("LeftAnti") >= 3, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    row = df.collect()[0]
    assert row.not_in_count == 0
    assert row.not_exists_count > 0
    assert row.null_safe_count <= row.not_exists_count


def test_budget_allocation_sums_exactly(spark, sf_dir):
    """Largest-remainder invariant: allocations sum EXACTLY to the
    budget and never deviate from the floor quota by more than 1."""
    rows = registry.QUERIES["budget_largest_remainder"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == 1_000_000
    for r in rows:
        assert r.alloc in (r.base_alloc, r.base_alloc + 1)


# ---------------------------------------------------------------------------
# Round-8: estimation-regime boundary crossings (r7 verdict #8).
# The oracle contracts for the native sketch queries rest on staying
# in the EXACT regime at test SFs (pins above/in test_round7_fixes).
# These tests cross the boundary deliberately — synthetic cardinality
# far past capacity — and assert the documented error band, so the
# "what happens at 100 TB" claim in the docstrings is itself tested.
# ---------------------------------------------------------------------------


def test_hll_estimation_regime_error_band(spark):
    """DataSketches HLL at lgK=14 past the coupon regime: RSE is
    1.04/sqrt(2^14) ~ 0.81%. 100k distinct is ~200x the exact bound;
    assert the estimate lands within ~3.7 sigma (3%). Deterministic:
    spark.range + the sketch's fixed hash seed."""
    n = 100_000
    est = (
        spark.range(n)
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("id", F.lit(14))
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert abs(est - n) / n < 0.03, f"HLL estimate {est} vs {n}"


def test_theta_estimation_regime_error_band(spark):
    """Theta at lgK=14 past nominal capacity samples at theta<1; RSE
    ~ 1/sqrt(16384) ~ 0.78%. Single-sketch estimate, union of two
    100k sets (true 150k), and intersection (true 50k) must all land
    within a few sigma. Set algebra error compounds — the
    intersection gets the widest band (5%)."""
    n = 100_000
    est = (
        spark.range(n)
        .agg(
            F.theta_sketch_estimate(
                F.theta_sketch_agg("id", F.lit(14))
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert abs(est - n) / n < 0.03, f"theta estimate {est} vs {n}"

    a = spark.range(0, 100_000).agg(
        F.theta_sketch_agg("id", F.lit(14)).alias("sk_a")
    )
    b = spark.range(50_000, 150_000).agg(
        F.theta_sketch_agg("id", F.lit(14)).alias("sk_b")
    )
    r = (
        a.crossJoin(b)
        .select(
            F.theta_sketch_estimate(
                F.theta_union("sk_a", "sk_b", F.lit(14))
            ).alias("u"),
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("i"),
        )
        .collect()[0]
    )
    assert abs(r.u - 150_000) / 150_000 < 0.04, f"union {r.u}"
    assert abs(r.i - 50_000) / 50_000 < 0.05, f"intersection {r.i}"


def test_approx_top_k_estimation_regime_error_band(spark):
    """Frequent-items past maxItemsTracked (50k distinct noise keys
    vs capacity 8192, evictions guaranteed): the documented
    guarantee is (a) any key with true count > eps*n survives, and
    (b) reported counts overestimate by at most ~3.5*n/M. Heavy key:
    10k of 260k rows >> 3.5*260k/8192 ~ 111."""
    heavy = spark.range(10_000).select(F.lit(999_999).alias("k"))
    noise = spark.range(250_000).select((F.col("id") % 50_000).alias("k"))
    n_total = 260_000
    bound = 3.5 * n_total / 8192
    rows = (
        heavy.unionAll(noise)
        .agg(F.expr("approx_top_k(k, 10, 8192)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select("e.item", "e.count")
        .collect()
    )
    hh = [r for r in rows if r.item == 999_999]
    assert hh, f"heavy hitter evicted: {rows[:5]}"
    est = hh[0]["count"]
    assert 10_000 - bound <= est <= 10_000 + bound, (
        f"heavy-hitter estimate {est} outside +-{bound:.0f} of 10000"
    )
