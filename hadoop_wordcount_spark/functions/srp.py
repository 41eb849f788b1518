"""Signed-random-projection (hyperplane LSH) primitives.

Charikar STOC'02: each hyperplane's sign bit agrees between two
vectors with probability 1 - angle/pi, so banding sign bits gives a
cosine-LSH candidate stage. Shared by the dedup operator
(`dedup_embedding_srp`), the multiprobe searcher
(`sim_search_srp_multiprobe`), and the recall eval
(`ann_recall_report`) — one module so the sketch scheme cannot
diverge between its consumers, and so no operator module has to
import another operator module at load time (the oracle builders run
at decoration time, which made cross-operator imports circular).

Hyperplane components are md5-derived uniforms computed ONCE here and
injected as identical double literals into both engines — no
cross-engine RNG to reconcile. `tools/scale_probe.py` monkeypatches
_SRP_BITS/_SRP_BAND_BITS on THIS module during ladders (bits-per-band
~ log2 n is the scale dial).
"""

from __future__ import annotations

from hadoop_wordcount_spark.functions.rounding import round_half_away

_SRP_BITS = 32
_SRP_BAND_BITS = 8  # 4 bands x 8 bits = 256 buckets/band at test SFs
_SRP_DIM = 64

def _srp_planes() -> list[list[float]]:
    import hashlib

    planes = []
    for j in range(_SRP_BITS):
        row = []
        for dd in range(_SRP_DIM):
            hx = hashlib.md5(f"srp:{j}:{dd}".encode()).hexdigest()[:8]
            row.append(int(hx, 16) / 16**8 - 0.5)
        planes.append(row)
    return planes


def _srp_ctes(prefix: str = "") -> str:
    """Shared DuckDB CTE chain behind every SRP oracle: double-cast
    vectors -> hyperplane VALUES -> sign bits -> band keys. ONE
    template (the `_minhash_cte` discipline) so a sketch-scheme
    change cannot diverge between the dedup, multiprobe-search, and
    recall-eval oracles. ``prefix`` namespaces the CTEs when composed
    next to another chain (e.g. the IVF k-means CTEs)."""
    planes = _srp_planes()
    n_bands = _SRP_BITS // _SRP_BAND_BITS
    q = prefix
    hv_rows = ",\n            ".join(
        f"({j}, [{', '.join(repr(x) for x in row)}])"
        for j, row in enumerate(planes)
    )
    key_cols = ", ".join(
        "CAST(sum(CASE WHEN j // {bb} = {b} THEN bit * (1 << (j % {bb})) "
        "ELSE 0 END) AS BIGINT) AS k{b}".format(b=b, bb=_SRP_BAND_BITS)
        for b in range(n_bands)
    )
    return f"""{q}e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        {q}h(j, hv) AS (VALUES
            {hv_rows}),
        {q}bits AS (
            SELECT {q}e.vec_id, {q}h.j,
                   CASE WHEN round(list_sum(list_transform(
                            range(1, len({q}e.v) + 1),
                            i -> {q}e.v[i] * {q}h.hv[i])),
                            6) >= 0 THEN 1 ELSE 0 END AS bit
            FROM {q}e CROSS JOIN {q}h),
        {q}keys AS (
            SELECT vec_id, {key_cols}
            FROM {q}bits GROUP BY vec_id)"""


def _srp_multiprobe_body(prefix: str = "") -> str:
    """The multiprobe candidate+rescore tail over a `_srp_ctes(prefix)`
    chain — shared by the registered query's oracle and the
    `ann_recall_report` composition. Yields CTEs `{prefix}q`,
    `{prefix}cand`, `{prefix}scored`."""
    n_bands = _SRP_BITS // _SRP_BAND_BITS
    p = prefix
    probe_hit = " OR ".join(
        f"bit_count(xor(s.k{b}, q.k{b})) <= 1" for b in range(n_bands)
    )
    return f"""{p}q AS (SELECT * FROM {p}keys WHERE vec_id = 0),
        {p}qv AS (SELECT v FROM {p}e WHERE vec_id = 0),
        {p}cand AS (
            SELECT s.vec_id FROM {p}keys s, {p}q q
            WHERE s.vec_id <> q.vec_id AND ({probe_hit})),
        {p}scored AS (
            SELECT c.vec_id,
                   round(list_sum(list_transform(range(1, len(e.v) + 1),
                                  i -> e.v[i] * qv.v[i]))
                         / (greatest(sqrt(list_sum(list_transform(e.v,
                                          x -> x * x))), 1e-12)
                            * greatest(sqrt(list_sum(list_transform(qv.v,
                                            x -> x * x))), 1e-12)),
                         4) AS cos_sim
            FROM {p}cand c
            JOIN {p}e e ON e.vec_id = c.vec_id CROSS JOIN {p}qv qv)"""


def srp_spark_side(emb_df, carry_embedding: bool = False):
    """Spark-side shared projection: (DataFrame with ``vec_id`` and
    ``ks`` (array of n_bands long band keys), n_bands). The dominant
    linear stage of every SRP consumer, so it runs as an
    ARROW-VECTORIZED mapInPandas kernel: per batch, each hyperplane
    dot accumulates SEQUENTIALLY over dimensions with elementwise
    numpy FMA steps — acc = acc + E[:, i] * P[j, i], i ascending —
    which is the exact left-fold order of the previous
    ``aggregate(zip_with(...))`` formulation and of the oracle's
    ``list_sum`` (elementwise IEEE mult/add, no reassociation, no
    BLAS blocking), so the 6dp-rounded sign bits are engine-identical
    (verified bit-exact against the HOF formulation on 128k vectors
    at the 48-bit ladder dial). Two JVM-side formulations were
    measured first and rejected: the interpreted HOF fold (lambda
    dispatch per element — ~5x slower), and a codegen'd scalar
    multiply-add chain (beats the HOF at 32 bits but blows the JVM
    64KB method limit at the ladder's wider band dials and falls
    back to an even slower interpreted tree). The 6dp quantization
    uses `round_half_away` — DuckDB round()'s half-away-from-zero on
    the double's true value (and Spark F.round's on exact .5
    boundaries; see functions/rounding.py for the shortest-repr
    pseudo-half caveat) — rather than np.round's half-even, so a dot
    landing exactly on a .5e-6 boundary cannot flip the sign bit
    against the DuckDB oracle (r11 ADVICE). Reads the band dials through the module at call time so
    the scale probe's monkeypatch applies."""
    from pyspark.sql import functions as F

    planes = _srp_planes()
    bits = _SRP_BITS
    bb = _SRP_BAND_BITS
    n_bands = bits // bb

    def project(batches):
        import numpy as np
        import pandas as pd

        plane_mat = [[float(x) for x in row] for row in planes]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n, dim = emb.shape
            if dim != len(plane_mat[0]):
                # Hyperplanes are drawn at _SRP_DIM, and downstream
                # rescorers (dedup.py pair_dot) unroll dots over the
                # same constant — a different table dim must fail
                # loudly here, not emit NULL cosines silently.
                raise ValueError(
                    f"embedding dim {dim} != SRP plane dim "
                    f"{len(plane_mat[0])} (_SRP_DIM)"
                )
            keys = np.zeros((n, n_bands), dtype=np.int64)
            for j in range(bits):
                acc = np.zeros(n, dtype=np.float64)
                row = plane_mat[j]
                for i in range(dim):
                    # Sequential accumulation — the fold order pledge.
                    acc = acc + emb[:, i] * row[i]
                bit = (round_half_away(acc, 6) >= 0).astype(np.int64)
                keys[:, j // bb] |= bit << (j % bb)
            cols = {"vec_id": pdf["vec_id"], "ks": list(keys)}
            if carry_embedding:
                cols["embedding"] = pdf["embedding"]
            yield pd.DataFrame(cols)

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("ks", ArrayType(LongType())),
        ]
    )
    if carry_embedding:
        # Pass the raw vector through the kernel (Arrow round-trip,
        # zero extra shuffle) for consumers whose downstream join
        # wants the vectors IN the band-shuffled rows — the
        # dedup_embedding_srp pair stage, where re-attaching vectors
        # to the candidate-pair stream by id costs two corpus-pair
        # exchanges (measured dominant at 256x).
        out_schema = out_schema.add(emb_df.schema["embedding"])
    out = emb_df.select("vec_id", "embedding").mapInPandas(
        project, out_schema
    )
    return out, n_bands
