"""The distributed global-ranking primitives must agree EXACTLY with
their single-partition window equivalents, and the rewritten
consumers must carry the range-exchange plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.operators.ranking import (
    global_cumsum,
    global_ntile,
    global_row_number,
)
from hadoop_wordcount_spark.plans.inspect import formatted_plan
from hadoop_wordcount_spark.sources.tables import load_table

registry.load_all()


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )


def test_global_row_number_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    order = [F.desc("value"), F.asc("event_id")]
    got = {
        r.event_id: r.rn
        for r in global_row_number(e, order, out="rn", small_threshold=0).collect()
    }
    want = {
        r.event_id: r.rn
        for r in e.select(
            "event_id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == want


def test_global_ntile_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    for buckets in (4, 10, 7):
        order = [F.asc("value"), F.asc("event_id")]
        got = {
            r.event_id: r.b
            for r in global_ntile(e, order, buckets, out="b", small_threshold=0).collect()
        }
        want = {
            r.event_id: r.b
            for r in e.select(
                "event_id",
                F.ntile(buckets).over(Window.orderBy(*order)).alias("b"),
            ).collect()
        }
        assert got == want, f"ntile({buckets}) diverged"


def test_global_cumsum_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    order = [F.desc("cents"), F.asc("event_id")]
    got = {
        r.event_id: r.cum
        for r in global_cumsum(e, order, "cents", out="cum", small_threshold=0).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.event_id: r.cum
        for r in e.select(
            "event_id", F.sum("cents").over(w).alias("cum")
        ).collect()
    }
    assert got == want


def test_distributed_rank_plan_shape(spark, sf_dir):
    """Past the size threshold the primitives must range-partition
    (the parallel path); at test scale the registry consumers take
    the adaptive small-input window, and the hybrid retrieval's list
    cuts must be TakeOrderedAndProject k-heaps either way."""
    e = _events(spark, sf_dir)
    plan = formatted_plan(
        global_ntile(
            e, [F.asc("value"), F.asc("event_id")], 10, small_threshold=0
        )
    )
    assert "rangepartitioning" in plan, plan
    plan = formatted_plan(registry.QUERIES["hybrid_retrieval_rrf"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
