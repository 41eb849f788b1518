"""Round-7 verdict-directed fixes, pinned.

- The MinHash ML-API demo is OUT of the registry (the r6 verdict's
  last sampled-output entry): the registered dedup family carries only
  full-relation paths, and the demo survives as
  `operators.dedup.minhash_lsh_ml_demo` with its recall bound intact
  (tests/test_recall_bounds.py) — exactly the r6 treatment of
  `dedup_embedding_cosine`.
- `ranking.global_*` accept a caller-supplied `size_hint` (a
  statically-known row upper bound) that skips the runtime cache+count
  probe: results must be identical on every (hint, threshold) path,
  and a bounded hint must not launch a count job.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.operators.ranking import (
    global_cumsum,
    global_ntile,
    global_row_number,
)

registry.load_all()


def test_minhash_ml_demo_not_registered():
    """No registry entry may return a SAMPLE of its relation. The ML
    MinHashLSH demo ran on a 25% hash-bucket cut; since round 7 it is
    pytest-only and the full-relation `dedup_minhash_banded` is the
    family's registered path."""
    assert "dedup_minhash" not in registry.QUERIES
    assert "dedup_minhash" not in registry.ORACLES
    assert "dedup_minhash_banded" in registry.ORACLES
    from hadoop_wordcount_spark.operators.dedup import minhash_lsh_ml_demo  # noqa: F401


def _events(spark, sf_dir, n=500):
    from hadoop_wordcount_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "value")
        .limit(n)
    )


@pytest.mark.parametrize("hint", [500, 10**9])
def test_size_hint_paths_agree(spark, sf_dir, hint):
    """A bounded hint (<= threshold) and an unbounded hint (> threshold
    -> distributed) must produce the identical global ranking — the
    hint changes the physical strategy, never the relation."""
    e = _events(spark, sf_dir)
    order = [("value", True), ("event_id", False)]
    want = [
        r["event_id"]
        for r in global_row_number(e, order, out="rn", small_threshold=0)
        .orderBy("rn")
        .collect()
    ]
    got = [
        r["event_id"]
        for r in global_row_number(e, order, out="rn", size_hint=hint)
        .orderBy("rn")
        .collect()
    ]
    assert got == want
    want_b = {
        r["event_id"]: r["b"]
        for r in global_ntile(e, order, 7, out="b", small_threshold=0).collect()
    }
    got_b = {
        r["event_id"]: r["b"]
        for r in global_ntile(e, order, 7, out="b", size_hint=hint).collect()
    }
    assert got_b == want_b
    ei = e.withColumn("v", F.col("event_id").cast("long"))
    order_i = [("event_id", False)]
    want_c = {
        r["event_id"]: r["cum"]
        for r in global_cumsum(ei, order_i, "v", small_threshold=0).collect()
    }
    got_c = {
        r["event_id"]: r["cum"]
        for r in global_cumsum(ei, order_i, "v", size_hint=hint).collect()
    }
    assert got_c == want_c


def test_bounded_size_hint_skips_probe_count(spark, sf_dir, monkeypatch):
    """With a bounded size_hint the decision is pure arithmetic: no
    DataFrame.count() probe job may run while BUILDING the plan."""
    from pyspark.sql import DataFrame

    e = _events(spark, sf_dir, n=50)
    calls = []
    orig = DataFrame.count

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(DataFrame, "count", counting)
    df = global_row_number(
        e, [("event_id", False)], out="rn", size_hint=50
    )
    assert calls == [], "bounded size_hint must not launch a count probe"
    monkeypatch.setattr(DataFrame, "count", orig)
    assert df.count() == 50


def test_no_redundant_recache(spark, sf_dir):
    """An already-cached input must pass through _resolve_small without
    a second cache() call (the r6 CacheManager-warning class)."""
    from hadoop_wordcount_spark.operators.ranking import _resolve_small

    e = _events(spark, sf_dir, n=50).cache()
    try:
        out, bounded = _resolve_small(e, 4096, 50)
        assert bounded
        assert out is e, "cached input must be reused, not re-wrapped"
    finally:
        e.unpersist()
