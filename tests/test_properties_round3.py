"""Property-based checks for round-3 operators, cross-checked against
pure-Python models (same strategy as test_properties.py — few
examples, each is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_wordcount_spark.operators.corpus import pack_offsets
from hadoop_wordcount_spark.operators.relational import funnel_stages, zorder_key


# ---------- zorder_key vs Python bit model ----------

def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=20))
def test_zorder_key_matches_bit_model(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y)


# ---------- pack_offsets invariants for any corpus ----------

docs_st = st.lists(
    st.tuples(st.sampled_from(["en", "de"]), st.integers(1, 40)),
    min_size=1,
    max_size=15,
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs_st)
def test_pack_offsets_tile_each_shard(spark, docs):
    rows = [(i, lang, n) for i, (lang, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = sorted(
        pack_offsets(df, 16).collect(), key=lambda r: (r["lang"], r["doc_id"])
    )
    expect: dict[str, int] = {}
    for r in out:
        off = expect.get(r["lang"], 0)
        assert r["start_off"] == off
        assert r["first_block"] == off // 16
        last_tok = max(off + r["n_tokens"] - 1, off)
        assert r["last_block"] == last_tok // 16
        assert r["spans_boundary"] == (r["first_block"] != r["last_block"])
        expect[r["lang"]] = off + r["n_tokens"]


# ---------- funnel_stages vs Python model ----------

events_st = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(0, 50),  # ts_s
    ),
    min_size=1,
    max_size=30,
)


def _py_funnel(events):
    out = {}
    for uid in {e[0] for e in events}:
        evs = [(t, ty) for (u, ty, t) in events if u == uid]
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        t2 = (
            min((t for t, ty in evs if ty == "click" and t > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((t for t, ty in evs if ty == "purchase" and t > t2), default=None)
            if t2 is not None
            else None
        )
        reached = (
            "purchase" if t3 is not None
            else "click" if t2 is not None
            else "view" if t1 is not None
            else "none"
        )
        out[uid] = (t1, t2, t3, reached)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(events_st)
def test_funnel_matches_python_model(spark, events):
    df = spark.createDataFrame(
        [(u, ty, t) for (u, ty, t) in events],
        "user_id long, event_type string, ts_s long",
    )
    got = {
        r["user_id"]: (
            r["first_view"], r["first_click"], r["first_purchase"], r["reached"]
        )
        for r in funnel_stages(df).collect()
    }
    assert got == _py_funnel(events)
