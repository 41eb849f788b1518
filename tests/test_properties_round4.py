"""Property-based checks for round-4 operators, cross-checked against
pure-Python models (same strategy as test_properties.py — few
examples, each is a Spark job)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_wordcount_spark import registry

registry.load_all()


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    pd.DataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


# ---------- corpus_mixture_sample vs Python threshold model ----------

mixture_st = st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]), st.integers(0, 500)),
    min_size=3,
    max_size=30,
    unique_by=lambda t: t[1],
)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(mixture_st)
def test_mixture_sample_matches_python_model(spark, tmp_path_factory, data):
    """The sampled row SET (hence every reported budget) must equal the
    pure-Python md5-threshold model — the reproducibility contract."""
    tmp = tmp_path_factory.mktemp("mix")
    rows = [(i, f"w{i} text here", "en", src) for src, i in data]
    path = _write_docs(tmp, rows)

    sizes: dict[str, int] = {}
    for src, _ in data:
        sizes[src] = sizes.get(src, 0) + 1
    n_min = min(sizes.values())

    def kept(doc_id, src):
        t = math.floor(math.sqrt(n_min / sizes[src]) * 65536)
        thr = "g" if t >= 65536 else format(t, "04x")
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:4] < thr

    # Round-4 advice fix: EVERY source appears in the report, zero
    # budgets included (a source sampling to 0 docs reports n_docs=0
    # instead of silently vanishing).
    expect: dict[str, int] = {s: 0 for s in sizes}
    for src, i in data:
        if kept(i, src):
            expect[src] += 1

    got = {
        r["source"]: r["n_docs"]
        for r in registry.QUERIES["corpus_mixture_sample"](spark, path).collect()
    }
    assert got == expect


# ---------- event_path_mining vs Python n-gram model ----------

paths_st = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
    min_size=3,
    max_size=40,
)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(paths_st)
def test_event_path_mining_matches_python_model(spark, tmp_path_factory, events):
    """Top-20 3-step paths must equal the Python model: per-user
    ordered trigrams counted globally, (n desc, path asc) top-20."""
    tmp = tmp_path_factory.mktemp("paths")
    pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i), u, et, 1.0, "{}")
            for i, (u, et) in enumerate(events)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp / "events.parquet")

    seqs: dict[int, list[str]] = {}
    for i, (u, et) in enumerate(events):  # ts strictly increasing with i
        seqs.setdefault(u, []).append(et)
    counts: dict[str, int] = {}
    for s in seqs.values():
        for i in range(len(s) - 2):
            p = " > ".join(s[i : i + 3])
            counts[p] = counts.get(p, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        (r["path"], r["n"])
        for r in registry.QUERIES["event_path_mining"](spark, str(tmp)).collect()
    ]
    assert got == expect


# ---------- 60-bit SimHash pair recall on planted near-duplicates ----------

def test_simhash_pairs_recall_planted_near_dups(spark, tmp_path_factory):
    """Every planted pair within Hamming<=3 MUST be recalled (the
    4x15-bit pigeonhole band guarantee), with the hamming value
    matching a pure-Python 60-bit model. The twin is found by a
    deterministic search over single-token substitutions in a
    400-token doc (vote margins widen with doc length, so some
    substitution lands within Hamming 3 — the model itself tells us
    which)."""

    def py_simhash(text):
        votes = [0] * 60
        # mirror norm_text: lowercase + whitespace collapse + trim
        for w in set(" ".join(text.lower().split()).split()):
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(60) if votes[b] > 0)

    toks = [f"tok{i}" for i in range(400)]
    base = " ".join(toks)
    h1 = py_simhash(base)
    twin, ham = None, None
    for k in range(50):
        cand = " ".join(toks[:-1] + [f"alt{k}"])
        h = bin(h1 ^ py_simhash(cand)).count("1")
        if h <= 3:
            twin, ham = cand, h
            break
    assert twin is not None, "no single-token twin within Hamming 3 in 50 tries"

    tmp = tmp_path_factory.mktemp("simhash")
    path = _write_docs(
        tmp,
        [
            (1, base, "en", "s"),
            (2, twin, "en", "s"),
            (3, " ".join(f"other{i}" for i in range(400)), "en", "s"),
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in registry.QUERIES["dedup_simhash_pairs"](spark, path).collect()
    }
    assert got.get((1, 2)) == ham  # guaranteed recall + exact sketch parity
    # the unrelated doc must never pair with either twin
    assert (1, 3) not in got and (2, 3) not in got
