"""Watermark / late-data semantics (SURVEY.md §7 hard part #4):
no DuckDB oracle can express this, so it's asserted directly by
replaying events in two out-of-order micro-batches through a
checkpointed streaming query.

Expected behavior: in append mode a tumbling window is emitted once
its end falls behind the watermark, and events arriving later than
(max seen ts - delay) for an already-closed window are DROPPED."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


def _write_batch(spark, path: str, rows: list[tuple[str, str]]) -> None:
    pdf = pd.DataFrame(rows, columns=["ts", "k"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("append").parquet(path)


def _run_pass(spark, src: str, ckpt: str, collected: list) -> None:
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("win.start").alias("ws"), "k", "n")
    )

    def sink(batch_df, _epoch):
        collected.extend(
            (r["ws"], r["k"], r["n"]) for r in batch_df.collect()
        )

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_late_data_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted: list = []

    # Batch 1: hour-10 window (2 events) + an hour-12 event that
    # pushes the watermark to 12:30-0:10 = 12:20 > 11:00, closing
    # the hour-10 and hour-11 windows.
    _write_batch(
        spark,
        src,
        [
            ("2024-01-01 10:05:00", "a"),
            ("2024-01-01 10:45:00", "a"),
            ("2024-01-01 12:30:00", "a"),
        ],
    )
    _run_pass(spark, src, ckpt, emitted)
    hour10 = 1704103200  # 2024-01-01 10:00:00 UTC
    assert (hour10, "a", 2) in emitted, emitted

    # Batch 2: one LATE event into the already-emitted hour-10 window
    # (must be dropped — no correction, no re-emit) and one fresh
    # hour-13 event + hour-15 event to close hour-13.
    before = list(emitted)
    _write_batch(
        spark,
        src,
        [
            ("2024-01-01 10:20:00", "a"),  # late: watermark is 12:20
            ("2024-01-01 13:10:00", "a"),
            ("2024-01-01 15:00:00", "a"),
        ],
    )
    _run_pass(spark, src, ckpt, emitted)
    new = [e for e in emitted if e not in before]
    # hour-10 never re-emitted, late row vanished:
    assert all(ws != hour10 for ws, _, _ in new), new
    hour13 = 1704114000
    assert (hour13, "a", 1) in new, new


def test_streaming_batch_equivalence(spark, sf_dir):
    """One availableNow pass over the full fixture must equal the
    batch aggregation — the streaming/batch unification contract."""
    from hadoop_wordcount_spark import registry

    registry.load_all()
    stream_rows = {
        (r["window_start_s"], r["event_type"], r["n"])
        for r in registry.QUERIES["streaming_event_counts"](spark, sf_dir)
        .select("window_start_s", "event_type", "n")
        .collect()
    }
    from hadoop_wordcount_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start").cast("timestamp")).alias("ws"),
            "event_type",
            "n",
        )
    )
    batch_rows = {(r["ws"], r["event_type"], r["n"]) for r in batch.collect()}
    assert stream_rows == batch_rows

def test_transform_with_state_gate(spark, sf_dir):
    """transformWithStateInPandas is environment-gated: this
    container's protobuf is broken (its Python state server needs
    it), so the helper must raise the documented NotImplementedError
    BEFORE starting a stream — or, on a fixed install, run and settle
    to the batch aggregate."""
    from hadoop_wordcount_spark.streaming import stream_queries

    try:
        from google.protobuf import descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    if not have_protobuf:
        import pytest

        with pytest.raises(NotImplementedError, match="protobuf"):
            stream_queries.transform_with_state_stats(spark, sf_dir)
    else:
        rows = stream_queries.transform_with_state_stats(spark, sf_dir).collect()
        assert {r["event_type"] for r in rows} == {
            "signup", "click", "view", "purchase", "error"
        }
