"""Property-based checks for round-8 exact-integer operators,
cross-checked against pure-Python models (same strategy as
test_properties.py — few examples, each is a Spark job)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_wordcount_spark import registry

registry.load_all()


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    df = pd.DataFrame(
        [(i, pd.Timestamp(ts), u, et, v, "{}") for i, ts, u, et, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


values_st = st.lists(
    st.tuples(
        st.sampled_from(["click", "view"]),
        st.integers(min_value=1, max_value=49000),  # cents
    ),
    min_size=4,
    max_size=60,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=values_st)
def test_decile_bins_match_python_model(spark, tmp_path_factory, data):
    """value_decile_bins vs a pure-Python binned-CDF model: for any
    value multiset, the reported decile bin is the smallest bin whose
    cumulative count reaches d/10 of the total — the integer
    threshold semantics, independent of engine."""
    tmp = tmp_path_factory.mktemp("decileprop")
    rows = [
        (i, "2024-01-01 00:00:00", i % 5, et, cents / 100.0)
        for i, (et, cents) in enumerate(data)
    ]
    sf_dir = _write_events(tmp, rows)
    pdf = registry.QUERIES["value_decile_bins"](spark, sf_dir).toPandas()
    for _, r in pdf.iterrows():
        vals = sorted(
            min(int(c // 500), 99) for et, c in data if et == r["event_type"]
        )
        t = len(vals)
        for d in (1, 3, 5, 7, 9):
            # model: smallest bin with 10*cum >= d*t
            cum = 0
            expect = None
            from collections import Counter

            cnt = Counter(vals)
            for b in sorted(cnt):
                cum += cnt[b]
                if 10 * cum >= d * t:
                    expect = b
                    break
            assert r[f"d{d}"] == expect, (r["event_type"], d, vals)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=30), min_size=2, max_size=24
    )
)
def test_cusum_changepoint_matches_python_model(
    spark, tmp_path_factory, counts
):
    """events_changepoint_cusum vs a pure-Python integer CUSUM: for
    any hourly count series, the argmax of |running sum of
    n*x - total| (ties -> earliest bucket) must match exactly —
    the integer-scaling contract that makes the oracle engine-proof."""
    tmp = tmp_path_factory.mktemp("cusumprop")
    rows = []
    eid = 0
    for hour, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, f"2024-01-01 {hour:02d}:30:00", eid % 3, "click", 1.0)
            )
            eid += 1
    sf_dir = _write_events(tmp, rows)
    row = (
        registry.QUERIES["events_changepoint_cusum"](spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    n = len(counts)
    total = sum(counts)
    best = None  # (abs_cusum, hour)
    run = 0
    for hour, x in enumerate(counts):
        run += n * x - total
        key = (-abs(run), hour)
        if best is None or key < best[0]:
            best = (key, hour, abs(run))
    assert row["n_buckets"] == n
    assert row["changepoint_epoch_s"] == 1704067200 + best[1] * 3600
    assert abs(row["max_abs_cusum"] - round(best[2] / n, 4)) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    activity=st.lists(
        st.integers(min_value=1, max_value=20), min_size=2, max_size=20
    )
)
def test_gini_matches_python_model(spark, tmp_path_factory, activity):
    """events_gini_user_activity vs the textbook rank-formula Gini on
    any per-user activity multiset."""
    tmp = tmp_path_factory.mktemp("giniprop")
    rows = []
    eid = 0
    for user, c in enumerate(activity):
        for _ in range(c):
            rows.append(
                (eid, "2024-01-01 05:00:00", user, "click", 1.0)
            )
            eid += 1
    sf_dir = _write_events(tmp, rows)
    row = (
        registry.QUERIES["events_gini_user_activity"](spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    xs = sorted(activity)
    n, t = len(xs), sum(xs)
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2.0 * ix / (n * t) - (n + 1.0) / n
    assert row["n_users"] == n and row["n_events"] == t
    assert abs(row["gini"] - round(gini, 4)) < 1e-9
