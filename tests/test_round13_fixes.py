"""Round-13 pins: the TPC-H q4 rewrite's derived-transitive-bound
trick and matched-rows distinct aggregation must be EXACTLY the
correlated-EXISTS semantics (the naive left-semi formulation the
rewrite replaced after its solo 256x rung read alpha ~1.69), across
date windows other than the registered one — guarding the bound
derivation itself, not just the fixed query the oracle already pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_wordcount_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _naive_exists(spark, start: str, end: str, lag_days: int):
    """The spec: orders in [start, end) with EXISTS(line shipped more
    than lag_days after the order date) — as a left-semi join, the
    direct decorrelation of the correlated subquery."""
    o = load_table(spark, SF_SMALL, "orders").filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp_ntz"))
    )
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {lag_days} DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _rewrite_shape(spark, start: str, end: str, lag_days: int):
    """The shipped q4 plan shape, parameterized: derived bound
    l_shipdate > start + lag pushed to the lineitem scan, inner SHJ
    on the filtered orders slice, distinct-orders agg over matches."""
    o = load_table(spark, SF_SMALL, "orders").filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp_ntz"))
    )
    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(
            F.col("l_shipdate")
            > F.lit(start).cast("timestamp_ntz")
            + F.expr(f"INTERVAL {lag_days} DAYS")
        )
    )
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {lag_days} DAYS")
    )
    return (
        li.join(o.hint("shuffle_hash"), cond)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("_nl"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@pytest.mark.parametrize(
    "start,end,lag",
    [
        ("1996-01-01", "1996-07-01", 60),  # the registered window
        ("1995-03-01", "1995-04-01", 1),   # tight window, minimal lag
        ("1995-01-01", "2002-01-01", 120), # whole span, long lag
        ("1997-11-15", "1998-02-01", 30),  # year-boundary window
    ],
)
def test_q4_rewrite_equals_exists_semantics(spark, start, end, lag):
    got = sorted(
        tuple(r) for r in _rewrite_shape(spark, start, end, lag).collect()
    )
    want = sorted(
        tuple(r) for r in _naive_exists(spark, start, end, lag).collect()
    )
    assert got == want
    # The spec side must be non-trivial for the window to prove
    # anything (all four windows select matching orders at sf0.001).
    assert sum(c for _, c in want) > 0


def test_q9_hint_is_semantics_free(spark):
    """The q9 SHJ hint changes the physical join only — results are
    identical with the hint stripped (unhinted formulation inlined
    here; the registered query is the hinted one)."""
    from hadoop_wordcount_spark.operators.relational import _t

    li = _t(spark, SF_SMALL, "lineitem")
    p = _t(spark, SF_SMALL, "part").filter(F.col("p_name").contains("red"))
    s = _t(spark, SF_SMALL, "supplier")
    o = _t(spark, SF_SMALL, "orders")
    n = _t(spark, SF_SMALL, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    unhinted = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.round(profit * 100, 0).cast("long")) / 100.0, 2
            ).alias("sum_profit")
        )
    )
    from hadoop_wordcount_spark import registry

    registry.load_all()
    got = sorted(
        tuple(r) for r in registry.QUERIES["tpch_q9_like"](spark, SF_SMALL).collect()
    )
    want = sorted(tuple(r) for r in unhinted.collect())
    assert got == want and len(got) > 0
