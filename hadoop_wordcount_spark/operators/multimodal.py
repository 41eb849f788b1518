"""Multimodal columns: opaque binary payloads + typed metadata.

North-star surface: image/audio/video travel as ``binary`` columns
with metadata; decode / feature-extract run as Arrow-batched Pandas
UDFs over ``mapInPandas``. The container has no image/audio codecs,
so the decode kernel is a clearly-marked deterministic stub — the
Spark-side plumbing (schema, batching, partition flow) is real and
is what matters at 100 TB: payloads never pass through Python row
at a time, only as Arrow record batches.

The testdata has no binary table, so payloads are derived from
``documents.text`` (utf-8 encode) — a stand-in with the same plan
shape as a real blob column read from parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table


def decode_image(payload: bytes) -> "object":
    """Decode an image payload. STUB: no codec libraries in this
    environment — a real deployment plugs Pillow/libvips here."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this container"
    )


def fake_image_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode_image metadata extraction:
    (width, height, format) derived from payload bytes only, so the
    pipeline is testable and oracle-checkable without codecs."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, "png" if n % 2 == 0 else "jpeg")


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata (the canonical
    multimodal row layout: id, payload binary, media_type, byte_len)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("byte_len"),
    )


@query(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               sha256(text) AS payload_sha256
        FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: byte length + content hash —
    JVM-side only; payload bytes never reach Python."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("payload_sha256"),
    )


@query(
    "multimodal_decode",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
               CASE WHEN octet_length(encode(text)) % 2 = 0
                    THEN 'png' ELSE 'jpeg' END AS fmt
        FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract stage: mapInPandas over Arrow
    batches of (doc_id, payload). The kernel is the deterministic
    stub (fake_image_meta) standing in for a real codec; everything
    around it — Arrow batch shape, output schema, partition-parallel
    execution — is the production plumbing."""
    payloads = with_payload(load_table(spark, sf_dir, "documents"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized over the Arrow batch (mirrors fake_image_meta;
            # a real codec would loop here, this stub need not).
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 640 + 1).astype("int64"),
                    "height": (n % 480 + 1).astype("int64"),
                    "fmt": (n % 2).map({0: "png", 1: "jpeg"}),
                }
            )

    return payloads.mapInPandas(
        decode_batches, schema="doc_id long, width long, height long, fmt string"
    )


@query(
    "frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                   unnest(range(0, least(octet_length(encode(text)) // 64, 8)))
                       AS frame_no
            FROM documents)
        SELECT doc_id, frame_no,
               CAST(frame_no * 64 AS BIGINT) AS frame_offset
        FROM f
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: explode each payload
    into up to 8 evenly-spaced frame offsets (64-byte 'frames' on the
    stand-in payload). The real pipeline swaps the offset arithmetic
    for container parsing; the explode + per-frame-row plan shape is
    identical and shuffle-free."""
    payloads = with_payload(load_table(spark, sf_dir, "documents"))
    n_frames = F.least(F.floor(F.col("byte_len") / 64), F.lit(8)).cast("int")
    return (
        payloads.filter(n_frames > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
        )
        .select(
            "doc_id",
            F.col("frame_no").cast("long").alias("frame_no"),
            (F.col("frame_no") * 64).cast("long").alias("frame_offset"),
        )
    )


@query(
    "multimodal_resize",
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   octet_length(encode(text)) % 640 + 1 AS w,
                   octet_length(encode(text)) % 480 + 1 AS h
            FROM documents)
        SELECT doc_id,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(CASE WHEN w >= h THEN 256
                         ELSE (w * 256) // h END AS BIGINT) AS out_w,
               CAST(CASE WHEN h >= w THEN 256
                         ELSE (h * 256) // w END AS BIGINT) AS out_h
        FROM meta
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage: aspect-preserving fit into a 256x256 box
    (longest side scaled to 256) per payload, computed in a
    mapInPandas kernel over Arrow batches (the slot where a real
    resampler runs — stubbed to the dimension arithmetic since no
    codec ships here). Same production plumbing as multimodal_decode:
    batch in, batch out, shuffle-free."""
    payloads = with_payload(load_table(spark, sf_dir, "documents"))

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 640 + 1).astype("int64")
            h = (n % 480 + 1).astype("int64")
            out_w = w.where(w >= h, (w * 256) // h).where(w < h, 256)
            out_h = h.where(h >= w, (h * 256) // w).where(h < w, 256)
            # fit-in-box: the longest side becomes 256, the other
            # scales by the same ratio (integer floor division).
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": w, "height": h,
                 "out_w": out_w.astype("int64"), "out_h": out_h.astype("int64")}
            )

    return payloads.mapInPandas(
        resize_batches,
        schema="doc_id long, width long, height long, out_w long, out_h long",
    )


_FRAME = 64          # samples per analysis frame
_SILENCE_RMS = 35.0  # frames below this RMS count as 'silence'


@query(
    "audio_frame_energy",
    oracle=f"""
        WITH ch AS (
            SELECT doc_id, unnest(string_split(text, '')) AS c,
                   generate_subscripts(string_split(text, ''), 1) AS pos
            FROM documents),
        samp AS (
            SELECT doc_id, (pos - 1) // {_FRAME} AS frame_no,
                   ord(c) - 128 AS s
            FROM ch),
        fr AS (
            SELECT doc_id, frame_no,
                   sqrt(sum(s * s) * 1.0 / count(*)) AS rms
            FROM samp GROUP BY doc_id, frame_no
            HAVING count(*) = {_FRAME})
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_frames,
               round(avg(rms), 4) AS mean_rms,
               round(sum(CASE WHEN rms < {_SILENCE_RMS} THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS silence_ratio
        FROM fr GROUP BY doc_id
    """,
)
def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: per-frame RMS energy + silence ratio
    over the opaque payload, the speech/music pre-filter of an audio
    training pipeline (silence-heavy clips get dropped or trimmed
    before transcription). Payload bytes are framed at {_FRAME}
    samples (trailing partial frame dropped), each byte read as a
    centered 8-bit PCM sample (b - 128) — the deterministic stand-in
    for a real audio decoder, same contract as the image stubs: the
    kernel body swaps out, the Arrow plumbing is production-shaped.

    Plan: mapInPandas over Arrow batches — numpy-vectorized
    reshape+RMS per batch, payloads never cross to Python row by
    row; shuffle-free (one output row per input row, computed
    in-partition). Parity: the corpus is pure ASCII (pinned by
    test), so the oracle's per-character code points equal the
    utf-8 payload bytes; frame sums of squares are exact integers,
    sqrt/avg of identical doubles round stably at 4."""
    payloads = with_payload(load_table(spark, sf_dir, "documents"))

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_id, out_n, out_rms, out_sil = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                n_frames = len(buf) // _FRAME
                if n_frames == 0:
                    continue
                s = buf[: n_frames * _FRAME].astype(np.float64) - 128.0
                frames = s.reshape(n_frames, _FRAME)
                rms = np.sqrt((frames * frames).mean(axis=1))
                out_id.append(doc_id)
                out_n.append(n_frames)
                out_rms.append(round(float(rms.mean()), 4))
                out_sil.append(round(float((rms < _SILENCE_RMS).mean()), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "n_frames": pd.Series(out_n, dtype="int64"),
                    "mean_rms": pd.Series(out_rms, dtype="float64"),
                    "silence_ratio": pd.Series(out_sil, dtype="float64"),
                }
            )

    return payloads.mapInPandas(
        energy_batches,
        schema="doc_id long, n_frames long, mean_rms double, silence_ratio double",
    )
