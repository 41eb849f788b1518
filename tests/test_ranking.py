"""The global-ranking primitives (bounded broadcast count-ahead AND
distributed range-exchange paths) must agree EXACTLY with their
single-partition window equivalents, stay window-free on the bounded
path, and the rewritten consumers must carry the range-exchange plan
shape."""

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


def _window_cols(order):
    return [F.desc(n) if d else F.asc(n) for n, d in order]


def test_global_row_number_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    order = [("value", True), ("event_id", False)]
    want = {
        r.event_id: r.rn
        for r in e.select(
            "event_id",
            F.row_number().over(Window.orderBy(*_window_cols(order))).alias("rn"),
        ).collect()
    }
    for thr in (0, 10**9):  # distributed path, then bounded path
        got = {
            r.event_id: r.rn
            for r in global_row_number(
                e, order, out="rn", small_threshold=thr
            ).collect()
        }
        assert got == want, f"small_threshold={thr} diverged"


def test_global_ntile_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    order = [("value", False), ("event_id", False)]
    for buckets in (4, 10, 7):
        want = {
            r.event_id: r.b
            for r in e.select(
                "event_id",
                F.ntile(buckets)
                .over(Window.orderBy(*_window_cols(order)))
                .alias("b"),
            ).collect()
        }
        for thr in (0, 10**9):
            got = {
                r.event_id: r.b
                for r in global_ntile(
                    e, order, buckets, out="b", small_threshold=thr
                ).collect()
            }
            assert got == want, f"ntile({buckets}) thr={thr} diverged"


def test_global_cumsum_matches_window(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    order = [("cents", True), ("event_id", False)]
    w = Window.orderBy(*_window_cols(order)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.event_id: r.cum
        for r in e.select("event_id", F.sum("cents").over(w).alias("cum")).collect()
    }
    for thr in (0, 10**9):
        got = {
            r.event_id: r.cum
            for r in global_cumsum(
                e, order, "cents", out="cum", small_threshold=thr
            ).collect()
        }
        assert got == want, f"small_threshold={thr} diverged"


def test_bounded_path_is_window_free(spark, sf_dir):
    """The bounded path must contain NO window node at all (it is the
    fix for the 'No Partition Defined for Window' single-partition
    plan — Catalyst folds constant partition keys, so the only safe
    form is no window), and no shuffle of the data rows either: its
    only exchange is the key-array partial aggregate."""
    e = _events(spark, sf_dir)
    order = [("value", True), ("event_id", False)]
    for df in (
        global_row_number(e, order, small_threshold=10**9),
        global_ntile(e, order, 4, small_threshold=10**9),
        global_cumsum(
            e.withColumn("c", F.lit(1).cast("long")),
            order,
            "c",
            small_threshold=10**9,
        ),
    ):
        plan = formatted_plan(df)
        assert "Window" not in plan, plan
        assert "rangepartitioning" not in plan, plan


def test_distributed_rank_plan_shape(spark, sf_dir):
    """Past the size threshold the primitives must range-partition
    (the parallel path) and keep every Window node partitioned; the
    hybrid retrieval's list cuts must be TakeOrderedAndProject k-heaps
    either way."""
    e = _events(spark, sf_dir)
    plan = formatted_plan(
        global_ntile(e, [("value", False), ("event_id", False)], 10, small_threshold=0)
    )
    assert "rangepartitioning" in plan, plan
    plan = formatted_plan(registry.QUERIES["hybrid_retrieval_rrf"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_ranking_property_random_orders(spark):
    """Property check on synthetic data: both paths of all three
    primitives agree with the window forms under duplicate-heavy
    order keys (total order restored by the id tiebreak) and mixed
    asc/desc directions."""
    import random

    rng = random.Random(20260814)
    rows = [
        (i, rng.randint(0, 9), rng.randint(-50, 50))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "val"])
    for order in (
        [("grp", False), ("id", False)],
        [("val", True), ("grp", False), ("id", False)],
        [("grp", True), ("val", False), ("id", True)],
    ):
        wcols = [F.desc(n) if d else F.asc(n) for n, d in order]
        want_rn = {
            r.id: r.rn
            for r in df.select(
                "id", F.row_number().over(Window.orderBy(*wcols)).alias("rn")
            ).collect()
        }
        w = Window.orderBy(*wcols).rowsBetween(Window.unboundedPreceding, 0)
        want_cum = {
            r.id: r.cum
            for r in df.select("id", F.sum("val").over(w).alias("cum")).collect()
        }
        for thr in (0, 10**9):
            got_rn = {
                r.id: r.rn
                for r in global_row_number(
                    df, order, out="rn", small_threshold=thr
                ).collect()
            }
            assert got_rn == want_rn, (order, thr)
            got_cum = {
                r.id: r.cum
                for r in global_cumsum(
                    df, order, "val", out="cum", small_threshold=thr
                ).collect()
            }
            assert got_cum == want_cum, (order, thr)
        for buckets in (3, 7):
            want_b = {
                r.id: r.b
                for r in df.select(
                    "id", F.ntile(buckets).over(Window.orderBy(*wcols)).alias("b")
                ).collect()
            }
            for thr in (0, 10**9):
                got_b = {
                    r.id: r.b
                    for r in global_ntile(
                        df, order, buckets, out="b", small_threshold=thr
                    ).collect()
                }
                assert got_b == want_b, (order, buckets, thr)
