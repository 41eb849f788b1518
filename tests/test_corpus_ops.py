"""Semantic pins for the corpus-assembly operators (corpus.py) —
properties the DuckDB oracle hash-match cannot express directly."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.operators import corpus
from tests.conftest import SF_SMALL

registry.load_all()


def test_pack_sequences_offsets_are_contiguous(spark):
    """Within each lang shard, doc start offsets must tile the token
    stream exactly: each doc starts where the previous one ended."""
    rows = (
        registry.QUERIES["pack_sequences"](spark, SF_SMALL)
        .orderBy("lang", "doc_id")
        .collect()
    )
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in by_lang.items():
        expect = 0
        for r in docs:
            assert r["start_off"] == expect, (lang, r["doc_id"])
            assert r["first_block"] == r["start_off"] // corpus._BLOCK
            expect += r["n_tokens"]


def test_pack_sequences_boundary_flag(spark):
    """spans_boundary iff the doc's tokens cross a block edge."""
    for r in registry.QUERIES["pack_sequences"](spark, SF_SMALL).collect():
        crosses = r["first_block"] != (
            max(r["start_off"] + r["n_tokens"] - 1, r["start_off"]) // corpus._BLOCK
        )
        assert r["spans_boundary"] == crosses


def test_doc_chunk_windows_cover_every_token(spark):
    """Chunks at stride S with width W >= S cover the whole doc; the
    stride-aligned reconstruction (first S tokens of every chunk +
    the tail of the last) equals the original token stream."""
    doc = (
        registry.QUERIES["doc_chunk_windows"](spark, SF_SMALL)
        .filter(F.col("doc_id") == 7)
        .orderBy("chunk_idx")
        .collect()
    )
    assert doc
    toks = [
        w
        for w in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter(F.col("doc_id") == 7)
        .head()["text"]
        .split(" ")
        if w
    ]
    rebuilt: list[str] = []
    for r in doc:
        ct = r["chunk_text"].split(" ")
        assert len(ct) == r["chunk_len"] <= corpus._CHUNK
        assert r["start_tok"] == r["chunk_idx"] * corpus._STRIDE
        rebuilt.extend(ct[: corpus._STRIDE] if r is not doc[-1] else ct)
    # overlap region of the final chunk duplicates the previous ones
    assert rebuilt[-len(toks):] == toks[-len(rebuilt[-len(toks):]):]
    assert rebuilt[: len(toks)] == toks


def test_decontaminate_excludes_eval_docs(spark):
    """Output must contain only train-side docs (bucket >= _EVAL_HI),
    and every hit count must be positive."""
    rows = registry.QUERIES["decontaminate_vs_eval"](spark, SF_SMALL).collect()
    assert rows, "word-soup fixture should have chance 5-gram overlap"
    for r in rows:
        b = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2]
        assert b >= corpus._EVAL_HI, f"eval doc {r['doc_id']} leaked into output"
        assert r["n_hits"] >= 1


def test_inverted_index_df_matches_direct_count(spark):
    """df for a common word equals the direct distinct-doc count and
    the posting list is sorted, capped, and consistent with df."""
    rows = {
        r["word"]: r
        for r in registry.QUERIES["inverted_index"](spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    direct = sum(1 for d in docs if "the" in [w for w in d["text"].split(" ") if w])
    r = rows["the"]
    assert r["df"] == direct
    ids = [int(x) for x in r["postings"].split(",")]
    assert ids == sorted(ids)
    assert len(ids) == min(r["df"], corpus._POSTING_CAP)


def test_bm25_ranking_is_bounded_and_sorted(spark):
    rows = registry.QUERIES["bm25_topk"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= corpus._TOPK
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
