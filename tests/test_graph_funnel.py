"""Semantic pins for funnel_conversion and pagerank_bigram."""

from __future__ import annotations

from hadoop_wordcount_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_funnel_stage_order_and_reached(spark):
    """Stages must be causally ordered (t1 < t2 < t3 where present)
    and the reached label must match the deepest non-null stage."""
    rows = registry.QUERIES["funnel_conversion"](spark, SF_SMALL).collect()
    assert rows
    deepest = {"none": 0, "view": 1, "click": 2, "purchase": 3}
    seen_depths = set()
    for r in rows:
        t1, t2, t3 = r["first_view"], r["first_click"], r["first_purchase"]
        if t2 is not None:
            assert t1 is not None and t2 > t1
        if t3 is not None:
            assert t2 is not None and t3 > t2
        depth = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        assert deepest[r["reached"]] == depth
        seen_depths.add(depth)
    assert max(seen_depths) == 3, "fixture should contain full conversions"


def test_funnel_single_shuffle(spark):
    """Three chained windows + the closing agg must share ONE
    user_id exchange — the operator's headline scale property."""
    df = registry.QUERIES["funnel_conversion"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_pagerank_is_a_probability_ish_vector(spark):
    """Ranks positive; total mass <= 1 (dangling leak) and >= the
    undamped floor; frequent connector words outrank rare ones."""
    rows = registry.QUERIES["pagerank_bigram"](spark, SF_SMALL).collect()
    assert len(rows) > 10
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] > 0 for r in rows)
    assert total <= 1.0001  # 1.0 up to per-word 1e-6 rounding
    assert total >= 0.15  # (1-d) base mass survives even total leakage
    ranked = sorted(rows, key=lambda r: -r["pagerank"])
    # The word-soup fixture's transition graph is near-uniform, so the
    # spread is small — but the ordering must still be a strict signal,
    # not a constant vector.
    median = ranked[len(ranked) // 2]["pagerank"]
    assert ranked[0]["pagerank"] > median > ranked[-1]["pagerank"]
