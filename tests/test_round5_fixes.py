"""Round-5 fix pins.

- dedup_ngram_jaccard gained a vocabulary-size gate: small vocab uses
  the bitmask popcount encoding; past _BITMASK_VOCAB_MAX it switches
  to sorted xxhash64 arrays (row width tracks doc length, not global
  vocabulary). Both paths must produce identical pairs/scores.
- session driver-memory default is derived from host RAM instead of a
  fixed 48g (advice: fixed big default OOM-kills small hosts).
"""

from __future__ import annotations

from hadoop_wordcount_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_ngram_jaccard_hash_array_path_matches_bitmask(spark, monkeypatch):
    """Force the large-vocab fallback and compare against the default
    (bitmask) path: same pairs, same rounded scores."""
    from hadoop_wordcount_spark.operators import dedup

    fn = registry.QUERIES["dedup_ngram_jaccard"]
    bitmask = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in fn(spark, SF_SMALL).collect()
    }
    monkeypatch.setattr(dedup, "_BITMASK_VOCAB_MAX", 0)
    hashed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in fn(spark, SF_SMALL).collect()
    }
    assert bitmask == hashed
    assert bitmask  # non-vacuous: the corpus has >=1 near-dup pair


def test_corpus_mixture_sample_reports_zeroed_sources(spark, tmp_path):
    """A source that samples to zero docs must still appear in the
    mixture report with n_docs=0 — 'fully dropped' and 'not present'
    are different facts."""
    import hashlib

    import pandas as pd

    # Source 'big' rate = sqrt(1/4) = 0.5 → thr_hex '8000'. Pick four
    # 'big' doc_ids whose md5 4-hex prefix is >= '8000' so the
    # realized sample is empty; 'tiny' keeps its single doc (rate 1).
    big_ids = [
        i for i in range(1000)
        if hashlib.md5(str(i).encode()).hexdigest()[:4] >= "8000"
    ][:4]
    rows = [(i, "w x y z", "en", "big", 7) for i in big_ids]
    tiny_id = next(
        i for i in range(1000)
        if hashlib.md5(str(i).encode()).hexdigest()[:4] < "8000"
    )
    rows.append((tiny_id, "a b c", "en", "tiny", 5))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in registry.QUERIES["corpus_mixture_sample"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["big"] == (0, 0)
    assert out["tiny"] == (1, 3)


def test_events_ltz_parquet_is_session_tz_independent(spark, tmp_path):
    """An instant-adjusted (isAdjustedToUTC=true) events file must
    normalize to the same (ts NTZ, ts_ns) under any session timezone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_wordcount_spark.sources.tables import _load_events

    micros = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([micros], pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        row = _load_events(spark, str(tmp_path)).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert row["ts_ns"] == micros * 1000
    assert row["ts"].isoformat() == "2023-11-14T22:13:20.123456"


def test_events_unknown_ts_dtype_raises(spark, tmp_path):
    import pandas as pd

    from hadoop_wordcount_spark.sources.tables import _load_events

    pd.DataFrame({"event_id": [1], "ts": ["not-a-time"]}).to_parquet(
        tmp_path / "events.parquet"
    )
    try:
        _load_events(spark, str(tmp_path))
        raise AssertionError("expected TypeError")
    except TypeError as exc:
        assert "unsupported parquet dtype" in str(exc)


def test_driver_memory_default_is_host_bounded():
    from hadoop_wordcount_spark.session import _default_driver_memory

    val = _default_driver_memory()
    assert val.endswith("g")
    gib = int(val[:-1])
    with open("/proc/meminfo") as fh:
        mem_gib = int(fh.readline().split()[1]) / (1024 * 1024)
    assert 2 <= gib <= min(48, max(2, int(mem_gib * 0.4)))
