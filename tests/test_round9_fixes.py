"""Round-9 fixes (ADVICE r8).

1. `JsonlDirStreamWriter.commit()` must sweep prior-attempt
   batch-{id}-part-*.jsonl files it did not just publish, so a
   replayed micro-batch that runs with FEWER partitions than the
   failed attempt cannot leave orphan high-pid files that
   double-count on readback.
2. `values_benford_audit` must gate on the integer cents (>= 1), not
   `value > 0`, so a value in (0, 0.005) can never produce digit 0
   and a 1/0 benford_share.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


def _touch(path: str, text: str = "x\n") -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def test_stream_sink_commit_sweeps_prior_attempt_orphans(tmp_path):
    from hadoop_wordcount_spark.sources.pydatasource import (
        JsonlDirStreamWriter,
        _JsonlStreamCommit,
    )

    d = str(tmp_path)
    w = JsonlDirStreamWriter({"path": d})
    # Simulate a failed prior attempt of batch 3 that ran with 4
    # partitions and published all 4 files before the driver died
    # pre-checkpoint-ack.
    for pid in range(4):
        _touch(os.path.join(d, f"batch-00003-part-{pid:05d}.jsonl"))
    # Another batch's output must NOT be touched by the sweep.
    _touch(os.path.join(d, "batch-00002-part-00000.jsonl"))
    # The replay runs with only 2 partitions.
    msgs = []
    for pid in range(2):
        tmp = os.path.join(d, f"_tmp-replay{pid}.jsonl")
        _touch(tmp, f"row{pid}\n")
        msgs.append(_JsonlStreamCommit(tmp, pid))
    w.commit(msgs, 3)
    left = sorted(os.listdir(d))
    assert left == [
        "batch-00002-part-00000.jsonl",
        "batch-00003-part-00000.jsonl",
        "batch-00003-part-00001.jsonl",
    ]
    # The published files carry the replay's contents.
    with open(os.path.join(d, "batch-00003-part-00001.jsonl")) as f:
        assert f.read() == "row1\n"


def test_stream_sink_commit_same_partition_count_untouched(tmp_path):
    from hadoop_wordcount_spark.sources.pydatasource import (
        JsonlDirStreamWriter,
        _JsonlStreamCommit,
    )

    d = str(tmp_path)
    w = JsonlDirStreamWriter({"path": d})
    msgs = []
    for pid in range(3):
        tmp = os.path.join(d, f"_tmp-a{pid}.jsonl")
        _touch(tmp)
        msgs.append(_JsonlStreamCommit(tmp, pid))
    w.commit(msgs, 7)
    assert sorted(os.listdir(d)) == [
        f"batch-00007-part-{p:05d}.jsonl" for p in range(3)
    ]


def test_benford_digits_in_1_to_9_even_with_subcent_values(spark, tmp_path):
    """A value in (0, 0.005) rounds to 0 cents; the query must drop
    it rather than emit digit 0 (which would divide by zero in
    benford_share)."""
    from hadoop_wordcount_spark.operators.relational import (
        q_values_benford_audit,
    )
    from hadoop_wordcount_spark.sources.tables import load_table

    base = load_table(spark, SF_SMALL, "events").drop("ts_ns")
    # Clone three rows and doctor their `value` into (0, 0.005) —
    # each rounds to 0 cents and must be dropped, not become digit 0.
    sub = (
        base.limit(3)
        .withColumn("value", F.lit(0.0049) / (F.monotonically_increasing_id() + 1))
    )
    doctored = base.unionByName(sub)
    out_dir = os.path.join(str(tmp_path), "events_doctored")
    # Persist a doctored events table dir so the query reads it like
    # any sf dir.
    doctored.write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    res = q_values_benford_audit(spark, out_dir).collect()
    digits = {r["digit"] for r in res}
    assert digits <= set(range(1, 10)) and 0 not in digits
    for r in res:
        assert r["benford_share"] is not None
        assert r["benford_share"] > 0


def test_benford_matches_oracle_at_small_sf(spark):
    from hadoop_wordcount_spark import registry
    from tests.oracle_utils import compare_query

    registry.load_all()
    name = "values_benford_audit"
    err = compare_query(
        spark, SF_SMALL, name, registry.QUERIES[name], registry.ORACLES[name]
    )
    assert err is None, err


def test_semdedup_cell_cap_parity_with_small_cap(spark, monkeypatch):
    """Force multi-sub-bucket cells by shrinking the cap to 8 and
    assert Spark/DuckDB still agree — this exercises the bucket
    boundary where DuckDB's rounding CAST(double AS BIGINT) diverged
    from Spark's truncating cast (caught in r9; `//` fixed it)."""
    from hadoop_wordcount_spark.operators import dedup
    from tests.oracle_utils import compare_query

    monkeypatch.setattr(dedup, "_SEMDEDUP_CELL_CAP", 8)
    oracle = dedup._semdedup_oracle()
    err = compare_query(
        spark, SF_SMALL, "semdedup_prune_cap8", dedup.q_semdedup_prune, oracle
    )
    assert err is None, err


def test_simhash_manku_banding_full_recall(spark):
    """The Manku block-combination candidate stage must recover
    EXACTLY the brute-force Hamming<=3 pair set — banding is an
    optimization, never a semantics change."""
    import pyspark.sql.functions as F

    from hadoop_wordcount_spark.operators.dedup import (
        _simhash_table,
        q_dedup_simhash_pairs,
    )

    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q_dedup_simhash_pairs(spark, SF_SMALL).collect()
    }
    sh = _simhash_table(spark, SF_SMALL)
    a = sh.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    brute = {
        (r["da"], r["db"]): r["h"]
        for r in a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", ham.alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute
