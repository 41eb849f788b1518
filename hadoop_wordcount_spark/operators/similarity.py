"""Similarity search over embedding columns.

Absent from the reference; mandated by the north star. Two tiers:

- brute-force cosine top-k: exact baseline, one scan, k-heap
  (TakeOrderedAndProject) — O(n·d) per query, no shuffle of vectors.
- LSH-bucketed ANN (BucketedRandomProjectionLSH): the scale path —
  candidate generation via random-hyperplane buckets, then exact
  re-scoring of candidates only.

At 100 TB an IVF layout is the production variant: k-means coarse
centroids as a partitioning column so each query probes a few
partitions (partition pruning on the centroid id); the bucketed-LSH
op here has the same plan shape (bucket equi-join + rescore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_wordcount_spark.functions.rounding import round_half_away
from hadoop_wordcount_spark.functions.vectors import cosine, l2_norm
from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def brute_force_topk(
    emb: DataFrame, query_vec, k: int = TOP_K, exclude_id: int | None = None
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector ships as a literal in the plan (the broadcast
    degenerate case); each partition keeps a k-heap so only k rows
    per partition reach the driver."""
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        "vec_id", F.round(cosine(F.col("embedding"), qcol), 4).alias("cos_sim")
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


@query(
    "sim_search_topk",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT vec_id,
                   round(list_dot_product(embedding, (SELECT qv FROM q)) /
                         (sqrt(list_dot_product(embedding, embedding)) *
                          sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))), 4)
                       AS cos_sim
            FROM embeddings WHERE vec_id <> {QUERY_VEC_ID})
        SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
    """,
)
def q_sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K} for the vec_id=0 query vector."""
    emb = _emb(spark, sf_dir)
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .head()[0]
    )
    return brute_force_topk(emb, qv, TOP_K, exclude_id=QUERY_VEC_ID)


@query(
    "embedding_norms",
    oracle="""
        SELECT label,
               count(*) AS n,
               round(avg(sqrt(list_dot_product(embedding, embedding))), 4) AS avg_norm
        FROM embeddings GROUP BY label
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean L2 norm — array-aggregate smoke over the
    embedding column (the 'is my vector column sane' health check)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", l2_norm(F.col("embedding")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


@query("sim_search_lsh")  # approximate (LSH) — rows-only driver check
def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via BucketedRandomProjectionLSH (seed=42): approx top-k
    neighbors of the vec_id=0 vector. Candidate set comes from
    hyperplane buckets, then exact euclidean re-scoring — the
    sub-linear scale path. pytest checks recall vs brute force."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = _emb(spark, sf_dir).select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(emb)
    key = emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()["features"]
    nn = model.approxNearestNeighbors(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), key, TOP_K, distCol="dist"
    )
    return nn.select("vec_id", F.round("dist", 4).alias("euclid_dist"))


@query(
    "sim_search_lsh_bounds",
    oracle=f"SELECT CAST({TOP_K} AS BIGINT) AS k, true AS recall_ok",
)
def q_sim_search_lsh_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled bracket twin of the rows-only `sim_search_lsh` (the
    `value_percentiles_bounds` pattern): recall@{TOP_K} of the LSH
    result against the exact euclidean top-{TOP_K} must hold the 0.8
    floor the pytest bound pins (deterministic: seed=42 LSH on fixed
    data). The driver's hash compare now fails if the LSH operating
    point ever degrades, instead of relying on pytest alone. Cost:
    the LSH query itself + one exact brute-force pass (k-heap, no
    shuffle of vectors) + a {TOP_K}x{TOP_K} id join."""
    lsh_ids = q_sim_search_lsh(spark, sf_dir).select("vec_id")
    emb = _emb(spark, sf_dir)
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .head()[0]
    )
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            qcol,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact_ids = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", d2.alias("d2"))
        .orderBy(F.asc("d2"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    hits = lsh_ids.join(F.broadcast(exact_ids), "vec_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return hits.select(
        F.lit(TOP_K).cast("long").alias("k"),
        (F.col("n_hits") >= F.lit(int(0.8 * TOP_K))).alias("recall_ok"),
    )


@query(
    "knn_block_join",
    oracle="""
        WITH probes AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
        scored AS (
            SELECT p.vec_id AS probe_id, e.vec_id AS cand_id,
                   round(list_dot_product(p.embedding, e.embedding) /
                         (sqrt(list_dot_product(p.embedding, p.embedding)) *
                          sqrt(list_dot_product(e.embedding, e.embedding))), 4) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY round(list_dot_product(p.embedding, e.embedding) /
                                (sqrt(list_dot_product(p.embedding, p.embedding)) *
                                 sqrt(list_dot_product(e.embedding, e.embedding))), 4) DESC,
                                e.vec_id) AS rn
            FROM probes p JOIN embeddings e
              ON p.label = e.label AND p.vec_id <> e.vec_id)
        SELECT probe_id, cand_id, cos_sim FROM scored WHERE rn <= 5
    """,
)
def q_knn_block_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-NN join: 20 probe vectors x same-label candidates,
    top-5 each by cosine. The label acts as the IVF-style coarse
    partition — the join is an equi-join on the block key followed by
    a per-probe window top-k, never a cartesian product."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        F.col("label").alias("probe_label"),
    )
    from pyspark.sql import Window

    sim = cosine(F.col("probe_emb"), F.col("embedding"))
    joined = (
        F.broadcast(probes)
        .join(
            emb,
            (F.col("probe_label") == F.col("label"))
            & (F.col("probe_id") != F.col("vec_id")),
        )
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(sim, 4).alias("cos_sim"),
        )
    )
    # Rank on the ROUNDED similarity (with unique tiebreak) so the
    # selected top-5 set is identical across engines even when raw
    # doubles differ in the last ulp.
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "cand_id", "cos_sim")
    )


@query(
    "array_ops_mix",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               round(embedding[1], 4) AS first_val,
               round(embedding[64], 4) AS last_val,
               round(list_sum(list_transform(embedding[1:8],
                     x -> CAST(x AS DOUBLE))) / 8, 4) AS head_mean
        FROM embeddings WHERE vec_id < 50
    """,
)
def q_array_ops_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function coverage: size / element_at / slice /
    aggregate over the embedding column — all codegen'd, no UDF."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 50)
    head = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1), 4).alias("first_val"),
        F.round(F.element_at("embedding", 64), 4).alias("last_val"),
        F.round(head / 8, 4).alias("head_mean"),
    )


@query(
    "embedding_centroids",
    oracle="""
        WITH e AS (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
        SELECT label, CAST(pos AS INT) AS pos,
               round(avg(CAST(val AS DOUBLE)), 4) AS centroid_val
        FROM e WHERE pos <= 8 GROUP BY label, pos
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise centroid (first 8 dims checked) — the
    training step of an IVF coarse quantizer: posexplode → group by
    (label, dim) → mean. One shuffle keyed on (label, pos); at 100 TB
    the partial averages combine map-side so the exchange carries
    |labels| x dims rows, independent of corpus size."""
    emb = _emb(spark, sf_dir)
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).filter(F.col("pos0") < 8)
    return exploded.groupBy(
        "label", (F.col("pos0") + 1).cast("int").alias("pos")
    ).agg(F.round(F.avg(F.col("val").cast("double")), 4).alias("centroid_val"))


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        s AS (
            SELECT vec_id, v,
                   greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
                       AS sc
            FROM v),
        q AS (
            SELECT vec_id, sc, v,
                   list_transform(v, x -> CAST(round(x * 127 / sc, 0) AS INT))
                       AS qv
            FROM s)
        SELECT vec_id, round(sc, 6) AS scale,
               qv[1] AS q1, qv[2] AS q2, qv[3] AS q3, qv[4] AS q4,
               round(list_sum(list_transform(range(1, len(v) + 1),
                     i -> (v[i] - qv[i] * sc / 127) * (v[i] - qv[i] * sc / 127)))
                     / len(v), 8) AS mse
        FROM q
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage move that
    makes a 100 TB embedding store 4x smaller (and ANN memory-bound
    instead of IO-bound): scale = max|x|, q_i = round(x_i*127/scale),
    reported with the per-vector reconstruction MSE (the quality
    metric that decides whether int8 is acceptable for your recall
    target). Emits the scale, the first 4 quantized values (schema-
    stable spot-check), and the MSE.

    Shuffle-free scan-level projection — at 100 TB this runs at IO
    speed. Engine parity: /, *, abs, and round are IEEE-identical on
    bit-identical inputs in both engines, so the quantized INTEGERS
    match exactly; the MSE accumulates the same values in the same
    array order and is rounded to 8 decimals (error terms are exact
    squares of identical doubles, so the fold streams are
    bit-identical too)."""
    emb = _emb(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    d = emb.select("vec_id", v.alias("v"))
    sc = F.greatest(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
    )
    d = d.select("vec_id", "v", sc.alias("sc"))
    qv = F.transform(
        "v", lambda x: F.round(x * 127 / F.col("sc"), 0).cast("int")
    )
    d = d.select("vec_id", "v", "sc", qv.alias("qv"))
    err = F.zip_with(
        "v",
        "qv",
        lambda x, qi: (x - qi * F.col("sc") / 127) * (x - qi * F.col("sc") / 127),
    )
    mse = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.size("v")
    return d.select(
        "vec_id",
        F.round("sc", 6).alias("scale"),
        F.element_at("qv", 1).alias("q1"),
        F.element_at("qv", 2).alias("q2"),
        F.element_at("qv", 3).alias("q3"),
        F.element_at("qv", 4).alias("q4"),
        F.round(mse, 8).alias("mse"),
    )


# --- IVF (inverted-file) ANN -----------------------------------------------
IVF_K = 8        # coarse centroids
IVF_ITERS = 3    # fixed k-means rounds (deterministic)
IVF_NPROBE = 2   # cells probed per query
# The fixed-K production regime `ann_recall_report` registers (r10
# verdict #1): K pinned in BOTH the query and its oracle, independent
# of the module default and of the ladder's sqrt-n dial — train-once /
# fixed-codebook is the deployment shape (SemDeDup / IVF-PQ), and the
# fixed-K ladder measures linear (lsq alpha 0.85) where the sqrt-K
# regime is superlinear by design.
ANN_RECALL_K = 64


def _ivf_assign_ctes(k: int | None = None) -> tuple[str, str]:
    """(CTE chain, final-centroid CTE name) for the unrolled
    long-format k-means quantizer in DuckDB SQL, mirroring
    `ivf_assignments` exactly: same init (vec_id < K), same round-4
    quantization of distances and centroid means, same (distance, cid)
    tiebreak. The final inverted file is CTE ``a{IVF_ITERS}``. Shared
    by the `ann_ivf_search` oracle and the IVF-blocked dedup oracle in
    `operators/dedup.py` so both engines always train the identical
    quantizer. ``k`` overrides the module default (the fixed-K
    production regime `ann_recall_report` registers)."""
    kk = IVF_K if k is None else k
    sql = f"""ev AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings),
        c0 AS (SELECT vec_id AS cid, pos, val AS cval FROM ev WHERE vec_id < {kk})"""
    prev = "c0"
    for i in range(IVF_ITERS + 1):
        sql += f""",
        a{i} AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round(sum((e.val - c.cval) * (e.val - c.cval)), 4),
                                    c.cid) AS rn
                FROM ev e JOIN {prev} c ON e.pos = c.pos
                GROUP BY e.vec_id, c.cid) WHERE rn = 1)"""
        if i < IVF_ITERS:
            sql += f""",
        c{i + 1} AS (
            SELECT a.cid, e.pos, round(avg(e.val), 4) AS cval
            FROM ev e JOIN a{i} a USING (vec_id) GROUP BY a.cid, e.pos)"""
            prev = f"c{i + 1}"
    return sql, prev


def _ivf_oracle() -> str:
    """Unrolled k-means + cell-pruned search in DuckDB SQL — the
    quantizer CTEs come from `_ivf_assign_ctes` (shared with the
    IVF-blocked dedup oracle)."""
    ctes, prev = _ivf_assign_ctes()
    sql = f"""
        WITH {ctes},
        probe AS (SELECT pos, val FROM ev WHERE vec_id = {QUERY_VEC_ID}),
        pc AS (
            SELECT cid FROM (
                SELECT c.cid,
                       row_number() OVER (
                           ORDER BY round(sum((p.val - c.cval) * (p.val - c.cval)), 4),
                                    c.cid) AS rn
                FROM probe p JOIN {prev} c ON p.pos = c.pos
                GROUP BY c.cid) WHERE rn <= {IVF_NPROBE}),
        cand AS (
            SELECT vec_id FROM a{IVF_ITERS}
            WHERE cid IN (SELECT cid FROM pc) AND vec_id <> {QUERY_VEC_ID})
        SELECT e.vec_id,
               round(list_dot_product(e.embedding, q.qv) /
                     (sqrt(list_dot_product(e.embedding, e.embedding)) *
                      sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
        FROM embeddings e
        JOIN cand USING (vec_id),
             (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        ORDER BY cos_sim DESC, e.vec_id LIMIT {TOP_K}"""
    return sql


def _ivf_d2(a, b) -> "F.Column":
    """Squared L2 distance, quantized to 4 decimals so double-summation
    ulp noise cannot flip an assignment across engines."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )


PQ_M = 4        # subspaces
PQ_SUBDIM = 16  # dims per subspace (embedding dim 64 / PQ_M)
PQ_K = 4        # codewords per subspace
PQ_ITERS = 2    # fixed k-means rounds per subspace (deterministic)


def _pq_ctes(prefix: str = "") -> tuple[str, str]:
    """(CTE chain, final-codebook CTE name) for the unrolled
    ALL-subspace PQ k-means in DuckDB SQL. `prefix` renames every CTE
    (``{prefix}ev``, ``{prefix}a0``, ...) so the chain can compose
    with `_ivf_assign_ctes` (which owns the bare ``ev``/``a{i}``
    names) inside one WITH — the `dedup_embedding_pq` oracle needs
    BOTH quantizers. Final per-subspace assignment is
    ``{prefix}a{PQ_ITERS}``."""
    p = prefix
    sql = f"""{p}ev AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val,
                   (generate_subscripts(embedding, 1) - 1) // {PQ_SUBDIM} AS m
            FROM embeddings),
        {p}c0 AS (SELECT m, vec_id AS cid, pos, val AS cval
               FROM {p}ev WHERE vec_id < {PQ_K})"""
    prev = f"{p}c0"
    for i in range(PQ_ITERS + 1):
        sql += f""",
        {p}a{i} AS (
            SELECT vec_id, m, cid FROM (
                SELECT e.vec_id, e.m, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id, e.m
                           ORDER BY round(sum((e.val - c.cval) * (e.val - c.cval)), 4),
                                    c.cid) AS rn
                FROM {p}ev e JOIN {prev} c ON e.m = c.m AND e.pos = c.pos
                GROUP BY e.vec_id, e.m, c.cid) WHERE rn = 1)"""
        if i < PQ_ITERS:
            sql += f""",
        {p}c{i + 1} AS (
            SELECT a.m, a.cid, e.pos, round(avg(e.val), 4) AS cval
            FROM {p}ev e JOIN {p}a{i} a ON e.vec_id = a.vec_id AND e.m = a.m
            GROUP BY a.m, a.cid, e.pos)"""
            prev = f"{p}c{i + 1}"
    return sql, prev



# Trained-quantizer memo: (applicationId, sf_dir, K) -> (inverted
# file, centroids). See ivf_assignments' docstring.
_IVF_MEMO: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def reset_ivf_memo() -> None:
    """Drop memoized quantizers (bench cold mode; tests that patch
    IVF_K mid-session already miss on the K component of the key)."""
    _IVF_MEMO.clear()


def ivf_assignments(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Train the IVF coarse quantizer (fixed-round k-means,
    deterministic init = vec_id < K) entirely in DataFrame ops and
    return ``(inverted_file, centroids)`` — ``inverted_file`` is
    (vec_id, cid), ``centroids`` is (cid, cv: array<double>).
    ``k`` overrides the module default (the fixed-K production
    regime `ann_recall_report` registers).

    Shared by `ann_ivf_search` (cell-pruned query answering) and
    `dedup_embedding_cosine_ivf` (cell-blocked pair generation); both
    oracles train the identical quantizer via `_ivf_assign_ctes`.

    Scale shape per stage, at 100 TB:
    - assignment: SHUFFLE-FREE — an Arrow-vectorized kernel closes
      over the K x d centroid table (dimension-sized, the .head()
      bounded-pull class) and emits one (vec_id, cid) row per vector:
      sequential per-dim accumulation at 4dp, strict-< argmin in
      ascending-cid order == min(struct(d2, cid)) exactly (see the
      in-function comment for the determinism argument and the r10/
      r11 formulations this replaced and why).
    - update: groupBy(cid, pos) mean with map-side partials; the
      exchange carries K x d rows regardless of corpus size. Each
      round's centroid table is localCheckpoint-ed (it is tiny) so the
      iterative lineage stays flat — same discipline as dedup_clusters.
    Distances and centroid means are quantized to 4 decimals on BOTH
    engines so double-summation ulp noise cannot flip an assignment;
    ties break on cid.

    The trained pair is MEMOIZED per (session, sf_dir, K): five
    queries (ann_ivf_search, dedup_embedding_cosine_ivf,
    knn_block_join, embedding_cell_stats, semdedup_prune) share one
    quantizer, and at 100 TB you train it once and reuse it — the
    memo is that design in-process. `reset_ivf_memo()` drops it
    (bench cold mode calls this so per-query costs stay honest);
    keying on applicationId makes entries from a stopped session
    unreachable rather than stale."""
    kk = IVF_K if k is None else k
    memo_key = (spark.sparkContext.applicationId, sf_dir, kk)
    hit = _IVF_MEMO.get(memo_key)
    if hit is not None:
        return hit
    emb = _emb(spark, sf_dir)
    # Cache the double-cast vectors: every k-means round (assign +
    # update) and the final assignment re-read them — one scan, not 8.
    # Same logical plan across callers → one shared cache entry.
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).cache()
    cent = vecs.filter(F.col("vec_id") < kk).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    ).localCheckpoint()

    def assign(cent_df: DataFrame, include_vec: bool = False) -> DataFrame:
        # Arrow-vectorized argmin kernel (the srp_spark_side
        # discipline): the K x d centroid table — dimension-sized by
        # construction, the same bounded-pull class as the query
        # vector's .head() — rides the closure; each vector's K
        # quantized distances accumulate SEQUENTIALLY over dims
        # (acc = acc + (v_i - c_i)^2, i ascending — the exact
        # left-fold order of `_ivf_d2`'s aggregate(zip_with(...)) and
        # of the oracle's GROUP BY sum at 4dp), and the argmin scans
        # centroids in ascending cid with a STRICT less-than, so ties
        # keep the lowest cid — exactly min(struct(d2, cid)). Zero
        # intermediate rows, zero exchanges; the r10 plan's
        # |V| x K distance-row blowup (and the r11-interim
        # transform+array_min variant's K x d interpreted lambda
        # evals per row) both measured as the recall rung's dominant
        # cost at K=64. The 4dp quantization uses round_half_away —
        # DuckDB round()'s half-away on the double's true value,
        # agreeing with Spark F.round on exact .5 boundaries (see
        # functions/rounding.py for the pseudo-half caveat) — so a
        # d2 on an exact .5e-4 boundary cannot flip an assignment
        # against the DuckDB oracle (r11 ADVICE); the pytest pin
        # (test_round11_fixes) holds the kernel bit-identical to the
        # DataFrame argmin formulation.
        #
        # K ceiling: the centroid table rides the closure and the
        # kernel runs a Python-level K x d loop of numpy passes, so
        # driver shipping and per-batch work grow linearly in K. Fine
        # through the ladder's sqrt-n dialed K (~2.4k at 256x, ~300KB
        # closure); past K ~ 10^4 prefer re-formulating assignment as
        # a broadcast join + min(struct(d2, cid)) aggregation (the
        # r10 plan) whose exchange the planner can size.
        crows = cent_df.orderBy("cid").collect()
        cents = [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in crows]

        def assign_kernel(batches):
            import numpy as np
            import pandas as pd

            cid_arr = [c for c, _ in cents]
            cvecs = [v for _, v in cents]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                emb = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                n, dim = emb.shape
                best_d2 = None
                best_cid = None
                for k in range(len(cents)):
                    cv = cvecs[k]
                    acc = np.zeros(n, dtype=np.float64)
                    for i in range(dim):
                        diff = emb[:, i] - cv[i]
                        acc = acc + diff * diff
                    d2 = round_half_away(acc, 4)
                    if best_d2 is None:
                        best_d2 = d2
                        best_cid = np.full(n, cid_arr[k], dtype=np.int64)
                    else:
                        better = d2 < best_d2
                        best_d2 = np.where(better, d2, best_d2)
                        best_cid = np.where(better, cid_arr[k], best_cid)
                out = {"vec_id": pdf["vec_id"], "cid": best_cid}
                if include_vec:
                    out["v"] = pdf["v"]
                yield pd.DataFrame(out)

        schema = (
            "vec_id bigint, cid bigint, v array<double>"
            if include_vec
            else "vec_id bigint, cid bigint"
        )
        return vecs.mapInPandas(assign_kernel, schema)

    for _ in range(IVF_ITERS):
        # include_vec carries each vector through the assignment kernel
        # so the centroid update aggregates the kernel output directly —
        # the former vecs.join(assigned, "vec_id") paid a join (and its
        # exchanges) per k-means round for rows the kernel already held
        # (r13; guide §2.4 remove shuffles outright). Same rows reach
        # the same F.avg groups, so centroids are unchanged.
        assigned = assign(cent, include_vec=True)
        # No per-round checkpoint: assign() collect()s the centroid
        # table into the kernel closure, which both materializes it
        # (one job) and cuts the lineage — an eager localCheckpoint
        # here was a second job per round doing the same work (r13).
        cent = (
            assigned
            .select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 4).alias("cval"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv")
            )
        )
    # The FINAL centroid table is read by every memo consumer (and by
    # the final assignment's collect below) — checkpoint it once so
    # consumers scan K rows instead of replaying the last k-means round.
    cent = cent.localCheckpoint()
    # Materialize the inverted file once (it is |V| (id, cid) rows —
    # tiny next to the vectors) so every memo consumer starts from the
    # same flat-lineage table instead of replaying the final assign.
    result = (assign(cent).localCheckpoint(), cent)
    _IVF_MEMO[memo_key] = result
    return result


@query("ann_ivf_search", oracle=_ivf_oracle())
def q_ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF ANN: train a coarse quantizer and build the
    inverted file (`ivf_assignments` — see its docstring for the
    per-stage 100 TB cost shape), then answer the query by probing
    only the {NPROBE} nearest cells and exact-rescoring candidates
    with cosine.

    Search stage at scale: centroid ranking is driver-free
    (orderBy-limit over K rows); candidates come from an equi-join on
    cid — the classic IVF recall/cost dial (nprobe/K of the data
    scanned, here 1/4). The planner sees plain joins/agg — AQE
    right-sizes every exchange."""
    return _ivf_search(spark, sf_dir)


def _ivf_search(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """The IVF search pipeline at quantizer size ``k`` (module
    default when None). Shared by `ann_ivf_search` (default-K) and
    `ann_recall_report` (the pinned fixed-K production regime)."""
    emb = _emb(spark, sf_dir)
    inverted_file, cent = ivf_assignments(spark, sf_dir, k)

    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()[0]
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    top_cells = (
        cent.select("cid", _ivf_d2(F.col("cv"), qcol).alias("d2"))
        .orderBy("d2", "cid")
        .limit(IVF_NPROBE)
        .select("cid")
    )
    cand = inverted_file.join(F.broadcast(top_cells), "cid").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    return (
        emb.join(cand.select("vec_id"), "vec_id")
        .select("vec_id", F.round(cosine(F.col("embedding"), qcol), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _cell_stats_oracle() -> str:
    ctes, _prev = _ivf_assign_ctes()
    return f"""
        WITH {ctes},
        norms AS (
            SELECT vec_id,
                   sqrt(list_dot_product(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings),
        tot AS (SELECT count(*) AS n FROM embeddings)
        SELECT a.cid, count(*) AS n_vecs,
               round(count(*) * 1.0 / tot.n, 4) AS cell_share,
               round(avg(n.nrm), 4) AS avg_norm
        FROM a{IVF_ITERS} a JOIN norms n USING (vec_id) CROSS JOIN tot
        GROUP BY a.cid, tot.n
    """


@query("embedding_cell_stats", oracle=_cell_stats_oracle())
def q_embedding_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-population audit: per quantizer cell, member count,
    share of the corpus, and mean vector norm — the balance report
    that decides whether an ANN index is usable (one mega-cell means
    `ann_ivf_search`/`dedup_embedding_cosine_ivf` degrade toward
    brute force within it; empty cells waste nprobe budget). Standard
    operational telemetry for IVF indexes.

    Reuses the exact `ivf_assignments` quantizer (shared cached
    vector scan + identical DuckDB CTE training), so the audit
    describes precisely the index the search queries use. Plan: the
    k-means stages as documented on `ivf_assignments`, then one
    K-row aggregate — scale cost is the quantizer's, the audit
    itself is free."""
    from hadoop_wordcount_spark.functions.vectors import l2_norm

    emb = _emb(spark, sf_dir)
    cells, _cent = ivf_assignments(spark, sf_dir)
    norms = emb.select(
        "vec_id",
        l2_norm(F.transform("embedding", lambda x: x.cast("double"))).alias("nrm"),
    )
    tot = emb.agg(F.count(F.lit(1)).alias("n"))
    return (
        cells.join(norms, "vec_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("cid", "n")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
        .select(
            "cid",
            "n_vecs",
            F.round(F.col("n_vecs") / F.col("n"), 4).alias("cell_share"),
            "avg_norm",
        )
    )


_PI_ITERS = 3


def _power_iteration_oracle() -> str:
    """Unrolled power iteration in DuckDB: second-moment matrix M,
    then _PI_ITERS matrix-vector products with round-6 quantization
    after every product AND every normalization — the same
    fixed-point pinning as the k-means oracle, so both engines feed
    bit-identical vectors into each next step."""
    steps = []
    prev = "x0"
    for k in range(1, _PI_ITERS + 1):
        steps.append(f"""
        y{k} AS (
            SELECT m.i AS pos, round(sum(m.v * {prev}.xv), 6) AS yv
            FROM m JOIN {prev} ON m.j = {prev}.pos GROUP BY m.i),
        n{k} AS (SELECT sqrt(sum(yv * yv)) AS nrm FROM y{k}),
        x{k} AS (SELECT pos, round(yv / nrm, 6) AS xv
                 FROM y{k} CROSS JOIN n{k})""")
        prev = f"x{k}"
    return f"""
        WITH ev AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings),
        m AS (
            SELECT a.pos AS i, b.pos AS j, round(avg(a.val * b.val), 6) AS v
            FROM ev a JOIN ev b USING (vec_id) GROUP BY a.pos, b.pos),
        x0 AS (SELECT DISTINCT pos, CAST(1.0 AS DOUBLE) AS xv FROM ev),{",".join(steps)}
        SELECT CAST({prev}.pos AS INT) AS pos,
               round({prev}.xv, 4) AS eigvec,
               round(n{_PI_ITERS}.nrm, 4) AS eigval_est
        FROM {prev} CROSS JOIN n{_PI_ITERS}
    """


@query("embedding_power_iteration", oracle=_power_iteration_oracle())
def q_embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal direction of the embedding cloud by POWER ITERATION
    over the second-moment matrix M = E[v vᵀ] — the distributed
    linear-algebra primitive behind PCA whitening, spectral outlier
    detection, and low-rank compression of a 100 TB embedding store.
    Fixed _PI_ITERS matrix-vector rounds (unrolled into one DAG, like
    the engine's k-means and PageRank), all-ones start vector,
    round-6 quantization after every product/normalization so the
    DuckDB oracle replays the identical fixed-point trajectory.
    Output: the d-dimensional unit eigenvector estimate and the
    Rayleigh-norm eigenvalue estimate.

    Plan: the ONLY corpus-sized stage is building M — a self-join of
    the exploded (vec_id, pos, val) stream on vec_id (row-local:
    co-partitioned by construction, d² output per vector) feeding a
    (i, j)-keyed average whose partials combine map-side, so the
    exchange carries d² rows regardless of corpus size. Every
    iteration afterwards is a d²-row x d-row broadcast join — driver
    never touches data. At d=64 M is 4096 cells; d² stays
    broadcast-sized through d ~ 2000."""
    emb = _emb(spark, sf_dir)
    ev = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val0")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val0").cast("double").alias("val"),
    )
    a = ev.select("vec_id", F.col("pos").alias("i"), F.col("val").alias("va"))
    b = ev.select(
        F.col("vec_id").alias("vid2"), F.col("pos").alias("j"),
        F.col("val").alias("vb"),
    )
    # Lineage discipline (r13): each round's x references y twice (via
    # the norm and directly), so a fully lazy unroll re-plans the
    # corpus-sized moment matrix ~2^k times (guide §7.3, huge plans).
    # Materialize M once (d² rows — the one corpus-sized aggregate) and
    # each round's d-row product; every iteration is then a tiny job
    # over the checkpointed M and the final plan is linear in
    # _PI_ITERS. Same aggregates, bit-identical trajectory.
    m = (
        a.join(b, F.col("vec_id") == F.col("vid2"))
        .groupBy("i", "j")
        .agg(F.round(F.avg(F.col("va") * F.col("vb")), 6).alias("v"))
        .localCheckpoint(eager=True)
    )
    x = ev.select("pos").distinct().select("pos", F.lit(1.0).alias("xv"))
    nrm = None
    for _ in range(_PI_ITERS):
        y = (
            m.join(F.broadcast(x), m.j == x.pos)
            .groupBy(F.col("i").alias("pos"))
            .agg(F.round(F.sum(F.col("v") * F.col("xv")), 6).alias("yv"))
            .localCheckpoint(eager=True)
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("yv") * F.col("yv"))).alias("nrm"))
        x = y.crossJoin(F.broadcast(nrm)).select(
            "pos", F.round(F.col("yv") / F.col("nrm"), 6).alias("xv")
        )
    return x.crossJoin(F.broadcast(nrm)).select(
        F.col("pos").cast("int").alias("pos"),
        F.round("xv", 4).alias("eigvec"),
        F.round("nrm", 4).alias("eigval_est"),
    )


def _hard_negatives_oracle() -> str:
    """Same-cell cross-label pairs via the shared quantizer CTEs,
    top-20 by cosine."""
    from hadoop_wordcount_spark.operators.dedup import _ivf_cosine_oracle  # noqa: F401

    ctes, _ = _ivf_assign_ctes()
    return f"""
        WITH {ctes},
        side AS (
            SELECT e.vec_id, e.label, e.embedding, c.cid
            FROM embeddings e JOIN a{IVF_ITERS} c USING (vec_id))
        SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
               a.label AS anchor_label, b.label AS negative_label,
               round(list_dot_product(a.embedding, b.embedding) /
                     (sqrt(list_dot_product(a.embedding, a.embedding)) *
                      sqrt(list_dot_product(b.embedding, b.embedding))), 4)
                   AS cos_sim
        FROM side a JOIN side b
          ON a.cid = b.cid AND a.vec_id < b.vec_id AND a.label <> b.label
        ORDER BY cos_sim DESC, anchor_id, negative_id LIMIT 20
    """


@query("contrastive_hard_negatives", oracle=_hard_negatives_oracle())
def q_contrastive_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: the most
    cosine-similar vector PAIRS whose labels DIFFER — exactly the
    negatives that make an embedding model learn (easy negatives are
    already far; hard ones sit across the decision boundary).
    Candidates come from the shared (memoized) IVF quantizer cells,
    the same blocking every other ANN op here uses: a hard negative
    is by definition close, and close vectors co-quantize.

    Plan: equi-join on the cell id with the label-mismatch predicate
    as a join residual — never all-pairs; norms hoisted per side, one
    dot product per candidate; TakeOrderedAndProject keeps 20 rows.
    Same Theta(n^1.5) envelope (K ~ sqrt(n)) as the IVF dedup — and
    the quantizer itself is amortized across all six consumers by
    the memo."""
    from hadoop_wordcount_spark.functions.vectors import dot, l2_norm

    emb = _emb(spark, sf_dir)
    cells, _cent = ivf_assignments(spark, sf_dir)
    side = emb.join(cells, "vec_id").select(
        "vec_id", "label", "cid", "embedding",
        l2_norm(F.col("embedding")).alias("norm"),
    )
    a = side.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("cid").alias("cid_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = side.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("cid").alias("cid_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    sim = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        a.join(
            b,
            (F.col("cid_a") == F.col("cid_b"))
            & (F.col("anchor_id") < F.col("negative_id"))
            & (F.col("anchor_label") != F.col("negative_label")),
        )
        .select(
            "anchor_id", "negative_id", "anchor_label", "negative_label",
            F.round(sim, 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "anchor_id", "negative_id")
        .limit(20)
    )


def _abtt_oracle() -> str:
    """All-but-the-Top in DuckDB: the power-iteration CTE chain (same
    fixed-point pinning as `embedding_power_iteration`) supplies the
    top direction; vectors are then mean-centered and their
    projection onto it removed."""
    # Reuse the full power-iteration chain (ev, m, x0..x3, n1..n3).
    pi = _power_iteration_oracle()
    chain = pi.split("SELECT CAST(")[0].rstrip().rstrip(",")
    return f"""{chain},
        mu AS (SELECT pos, avg(val) AS mu FROM ev GROUP BY pos),
        centered AS (
            SELECT e.vec_id, e.pos, e.val - mu.mu AS cv
            FROM ev e JOIN mu USING (pos)),
        proj AS (
            SELECT c.vec_id, round(sum(c.cv * x{_PI_ITERS}.xv), 6) AS p
            FROM centered c JOIN x{_PI_ITERS} ON c.pos = x{_PI_ITERS}.pos
            GROUP BY c.vec_id),
        out AS (
            SELECT c.vec_id, c.pos,
                   c.cv - proj.p * x{_PI_ITERS}.xv AS ov
            FROM centered c
            JOIN proj USING (vec_id)
            JOIN x{_PI_ITERS} ON c.pos = x{_PI_ITERS}.pos)
        SELECT vec_id,
               round(sum(CASE WHEN pos = 1 THEN ov END), 4) + 0.0 AS d1,
               round(sum(CASE WHEN pos = 2 THEN ov END), 4) + 0.0 AS d2,
               round(sqrt(sum(ov * ov)), 4) AS out_norm
        FROM out GROUP BY vec_id
    """


@query("embedding_abtt", oracle=_abtt_oracle())
def q_embedding_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-Top embedding post-processing (Mu & Viswanath
    2018 — public): subtract the corpus mean, then remove each
    vector's projection onto the top principal direction — the
    two-line fix that makes off-the-shelf embeddings markedly more
    isotropic (the dominant direction encodes frequency, not
    meaning). The top direction comes from the SAME unrolled power
    iteration as `embedding_power_iteration` (shared fixed-point
    trajectory), composing two of the engine's linear-algebra
    stages. Output per vector: first two processed dims + the
    processed norm.

    Plan: the d²-cell moment matrix and the d-cell mean are the only
    corpus-sized aggregates (map-side partials); the direction is a
    d-row broadcast; projection and removal are per-(vec, pos)
    projections with one groupBy(vec_id) close. Nothing driver-side;
    the quantized (round-6) projection keeps both engines on the
    identical trajectory."""
    emb = _emb(spark, sf_dir)
    ev = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val0")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val0").cast("double").alias("val"),
    )
    # -- power iteration (same construction as embedding_power_iteration)
    a = ev.select("vec_id", F.col("pos").alias("i"), F.col("val").alias("va"))
    b = ev.select(
        F.col("vec_id").alias("vid2"), F.col("pos").alias("j"),
        F.col("val").alias("vb"),
    )
    # Same lineage discipline as embedding_power_iteration (r13): the
    # moment matrix (d² rows) and each round's d-row product are
    # checkpointed so the unrolled loop plans linearly, not 2^k.
    m = (
        a.join(b, F.col("vec_id") == F.col("vid2"))
        .groupBy("i", "j")
        .agg(F.round(F.avg(F.col("va") * F.col("vb")), 6).alias("v"))
        .localCheckpoint(eager=True)
    )
    x = ev.select("pos").distinct().select("pos", F.lit(1.0).alias("xv"))
    for _ in range(_PI_ITERS):
        y = (
            m.join(F.broadcast(x), m.j == x.pos)
            .groupBy(F.col("i").alias("pos"))
            .agg(F.round(F.sum(F.col("v") * F.col("xv")), 6).alias("yv"))
            .localCheckpoint(eager=True)
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("yv") * F.col("yv"))).alias("nrm"))
        x = y.crossJoin(F.broadcast(nrm)).select(
            "pos", F.round(F.col("yv") / F.col("nrm"), 6).alias("xv")
        )
    # -- mean-center, project out the top direction
    mu = ev.groupBy("pos").agg(F.avg("val").alias("mu"))
    centered = ev.join(F.broadcast(mu), "pos").select(
        "vec_id", "pos", (F.col("val") - F.col("mu")).alias("cv")
    )
    proj = (
        centered.join(F.broadcast(x), "pos")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("cv") * F.col("xv")), 6).alias("p"))
    )
    out = (
        centered.join(F.broadcast(proj), "vec_id")
        .join(F.broadcast(x), "pos")
        .select(
            "vec_id", "pos",
            (F.col("cv") - F.col("p") * F.col("xv")).alias("ov"),
        )
    )
    # `+ 0.0` normalizes IEEE negative zero (-0.0 formats differently
    # from 0.0 and breaks the order-insensitive value hash).
    return out.groupBy("vec_id").agg(
        (F.round(F.sum(F.when(F.col("pos") == 1, F.col("ov"))), 4) + F.lit(0.0))
        .alias("d1"),
        (F.round(F.sum(F.when(F.col("pos") == 2, F.col("ov"))), 4) + F.lit(0.0))
        .alias("d2"),
        F.round(F.sqrt(F.sum(F.col("ov") * F.col("ov"))), 4).alias("out_norm"),
    )


def _cluster_topic_oracle() -> str:
    ctes, _ = _ivf_assign_ctes()
    return f"""
        WITH {ctes},
        tok AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              w -> w <> '')) AS word
            FROM documents),
        cw AS (
            SELECT a.cid, t.word, count(*) AS c_cw
            FROM tok t JOIN a{IVF_ITERS} a ON t.doc_id = a.vec_id
            GROUP BY a.cid, t.word),
        nc AS (SELECT cid, CAST(sum(c_cw) AS BIGINT) AS n_c FROM cw GROUP BY cid),
        gw AS (SELECT word, CAST(sum(c_cw) AS BIGINT) AS c_w FROM cw GROUP BY word),
        tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_tot FROM gw),
        scored AS (
            SELECT cw.cid, cw.word, cw.c_cw,
                   round(ln(CAST(cw.c_cw * n_tot AS DOUBLE)
                            / (n_c * c_w)), 4) AS log_lift
            FROM cw JOIN nc USING (cid) JOIN gw USING (word) CROSS JOIN tot
            WHERE cw.c_cw >= 5)
        SELECT cid, word, c_cw, log_lift, rank FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY cid
                       ORDER BY log_lift DESC, word) AS rank
            FROM scored) WHERE rank <= 5
    """


@query("cluster_topic_terms", oracle=_cluster_topic_oracle())
def q_cluster_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label embedding clusters with their characteristic TOKENS — the
    cross-modal join (embeddings' IVF cells x documents' text) that
    turns anonymous k-means cells into a human-readable topic report.

    Score is log-lift: ln(P(word|cell) / P(word)), computed as ONE
    log over a single division of integer products (the
    `collocations_pmi` numerics discipline), so both engines see
    bit-identical doubles. Top-5 terms per cell by (lift, word) with
    a support floor of 5.

    Plan: token stream joins the memoized IVF inverted file on the
    shared id (one shuffle each side), then groupBy(cid, word); the
    cell-size marginal (K rows) broadcasts, while the global-word
    marginal is VOCABULARY-sized and attaches by shuffle equi-join on
    `word` (AQE may downgrade it to broadcast at runtime when it
    measures small). At 100 TB: the only corpus-sized exchanges are
    the id join, the (cid, word) aggregation, and the word-marginal
    join — all map-side combined or equi-keyed; no stage is pairwise
    in documents or vectors, and nothing unbounded is pinned into a
    broadcast.

    Reference: WordCount.java:30-42 counts tokens globally; this is
    the same aggregation conditioned on a learned partition of a
    SECOND modality — pure extension surface.
    """
    from hadoop_wordcount_spark.operators.wordcount import tokens_col
    from pyspark.sql.window import Window

    inv, _cent = ivf_assignments(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("word"))
    cw = (
        tok.join(inv, tok.doc_id == inv.vec_id)
        .groupBy("cid", "word")
        .agg(F.count(F.lit(1)).alias("c_cw"))
    )
    nc = cw.groupBy("cid").agg(F.sum("c_cw").cast("long").alias("n_c"))
    gw = cw.groupBy("word").agg(F.sum("c_cw").cast("long").alias("c_w"))
    tot = gw.agg(F.sum("c_w").cast("long").alias("n_tot"))
    # nc is K rows (cell count, ~1e5 even at 100 TB with K ~ sqrt(n))
    # and tot is 1 row — both broadcast. gw is VOCABULARY-sized: a
    # web-scale corpus has 1e8+ distinct tokens, which does not fit
    # in a broadcast, so the word marginal attaches by shuffle
    # equi-join on `word` and AQE may locally downgrade it to
    # broadcast when the measured size allows (r8 verdict #3).
    scored = (
        cw.filter(F.col("c_cw") >= 5)
        .join(F.broadcast(nc), "cid")
        .join(gw, "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "cid",
            "word",
            "c_cw",
            F.round(
                F.log(
                    (F.col("c_cw") * F.col("n_tot")).cast("double")
                    / (F.col("n_c") * F.col("c_w"))
                ),
                4,
            ).alias("log_lift"),
        )
    )
    w = Window.partitionBy("cid").orderBy(F.desc("log_lift"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("cid", "word", "c_cw", "log_lift", "rank")
    )


@query(
    "embedding_drift_by_source",
    oracle="""
        WITH ev AS (
            SELECT e.vec_id, d.source,
                   e.vec_id % 2 AS batch,
                   generate_subscripts(e.embedding, 1) AS pos,
                   CAST(unnest(e.embedding) AS DOUBLE) AS val
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        cent AS (
            SELECT source, batch, pos, round(avg(val), 4) AS c
            FROM ev GROUP BY source, batch, pos),
        pairs AS (
            SELECT a.source, a.pos, a.c AS c0, b.c AS c1
            FROM cent a JOIN cent b
              ON a.source = b.source AND a.pos = b.pos
             AND a.batch = 0 AND b.batch = 1)
        SELECT source,
               round(sum(c0 * c1) / (sqrt(sum(c0 * c0)) * sqrt(sum(c1 * c1))),
                     4) AS centroid_cosine,
               round(sqrt(sum((c0 - c1) * (c0 - c1))), 4) AS centroid_l2
        FROM pairs GROUP BY source
    """,
)
def q_embedding_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: batch-over-batch centroid movement.

    Split each source's vectors into two deterministic batches
    (vec_id parity — stand-in for encoder-version or ingest-date),
    compute per-batch centroids, and report cosine + L2 between them
    per source: cosine near 1 = the encoder/corpus is stable; a drop
    is the retrain/redrift alarm before any downstream ANN index
    degrades. Centroid means are quantized to 4 decimals on BOTH
    engines before the distance math (the IVF quantizer's ulp
    discipline), so the report is hash-exact.

    Scale: one cross-modal id join (embeddings x documents source),
    one (source, batch, pos) mean with map-side partials — exchange
    bounded by sources x 2 x d, not vectors — then a d-sized join per
    source. The monitoring query you schedule hourly at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _emb(spark, sf_dir)
    ev = (
        emb.join(d, emb.vec_id == d.doc_id)
        .select(
            "source",
            (F.col("vec_id") % 2).alias("batch"),
            F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "pos0", "val"
            ),
        )
        .select("source", "batch", (F.col("pos0") + 1).alias("pos"), "val")
    )
    cent = ev.groupBy("source", "batch", "pos").agg(
        F.round(F.avg("val"), 4).alias("c")
    )
    a = cent.filter(F.col("batch") == 0).select(
        "source", "pos", F.col("c").alias("c0")
    )
    b = cent.filter(F.col("batch") == 1).select(
        "source", "pos", F.col("c").alias("c1")
    )
    return (
        a.join(b, ["source", "pos"])
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("c0") * F.col("c1"))
                / (
                    F.sqrt(F.sum(F.col("c0") * F.col("c0")))
                    * F.sqrt(F.sum(F.col("c1") * F.col("c1")))
                ),
                4,
            ).alias("centroid_cosine"),
            F.round(
                F.sqrt(F.sum((F.col("c0") - F.col("c1")) ** 2)), 4
            ).alias("centroid_l2"),
        )
    )


# --- Product quantization (PQ) ---------------------------------------------
def _pq_oracle() -> str:
    """Unrolled ALL-subspace k-means + encode in DuckDB SQL — the PQ
    twin of `_ivf_assign_ctes`: same deterministic init (vec_id <
    K as seed codewords, per subspace), same round-4 quantization of
    distances and centroid means, same (d2, cid) tiebreak, so both
    engines train identical codebooks."""
    chain, prev = _pq_ctes()
    sql = f"""
        WITH {chain},
        recon AS (
            SELECT e.vec_id,
                   round(sum((e.val - c.cval) * (e.val - c.cval))
                         / {PQ_M * PQ_SUBDIM}, 6) AS mse
            FROM ev e
            JOIN a{PQ_ITERS} a ON e.vec_id = a.vec_id AND e.m = a.m
            JOIN {prev} c ON c.m = a.m AND c.cid = a.cid AND c.pos = e.pos
            GROUP BY e.vec_id)
        SELECT a.vec_id,
               CAST(max(CASE WHEN m = 0 THEN cid END) AS INT) AS code0,
               CAST(max(CASE WHEN m = 1 THEN cid END) AS INT) AS code1,
               CAST(max(CASE WHEN m = 2 THEN cid END) AS INT) AS code2,
               CAST(max(CASE WHEN m = 3 THEN cid END) AS INT) AS code3,
               max(r.mse) AS recon_mse
        FROM a{PQ_ITERS} a JOIN recon r USING (vec_id)
        GROUP BY a.vec_id"""
    return sql


def _pq_train(spark: SparkSession, sf_dir: str):
    """Train the PQ codebooks and final assignments: returns
    ``(ev, assign, c)`` — the cached long-format components
    (vec_id, pos, val, m), the final (vec_id, m, cid) codes, and the
    final (m, cid, pos, cval) codebook. Shared by `pq_encode_stats`
    and `pq_adc_search`; the DuckDB side of the same training is
    `_pq_oracle`'s CTE chain."""
    emb = _emb(spark, sf_dir)
    ev = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("val"),
        (F.col("pos0") / PQ_SUBDIM).cast("int").alias("m"),
    ).cache()
    c = ev.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), "pos", F.col("val").alias("cval")
    ).localCheckpoint(eager=False)
    assign = None
    for i in range(PQ_ITERS + 1):
        d2 = (
            ev.join(F.broadcast(c), ["m", "pos"])
            .groupBy("vec_id", "m", "cid")
            .agg(
                F.round(
                    F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                    4,
                ).alias("d2")
            )
        )
        assign = (
            d2.groupBy("vec_id", "m")
            .agg(F.min(F.struct("d2", "cid")).alias("s"))
            .select("vec_id", "m", F.col("s.cid").alias("cid"))
        )
        if i < PQ_ITERS:
            c = (
                ev.join(assign, ["vec_id", "m"])
                .groupBy("m", "cid", "pos")
                .agg(F.round(F.avg("val"), 4).alias("cval"))
                .localCheckpoint(eager=False)
            )
    # NOTE (r13): checkpointing the final assignment was tried and
    # reverted — ReuseExchange already dedupes the two consumer
    # subtrees of the encode query within one plan, and the extra
    # storage pass measured ~0.4s SLOWER on the single-consumer ADC
    # search. Lazy plans + exchange reuse win here.
    return ev, assign, c


@query("pq_encode_stats", oracle=_pq_oracle())
def q_pq_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: train per-subspace codebooks (PQ_M=4
    subspaces x PQ_K=4 codewords, fixed-round k-means, deterministic
    seed-vector init) and ENCODE every vector as its 4 codeword ids,
    with per-vector reconstruction MSE — the compression layer under
    IVF-PQ indexes (Jegou et al., PAMI'11): a 64-float vector becomes
    4 small ints, and recall tuning reads exactly this MSE
    distribution.

    Plan (all subspaces trained in ONE chain, long format): posexplode
    tags each component with its subspace m; every k-means round is a
    (m, pos)-keyed join against the K x d codebook (dimension-sized —
    broadcast) + a map-side-partial argmin via min(struct(d2, cid))
    grouped on (vec_id, m) — the shuffle carries one partial per
    (vector, subspace), never the |V| x K distance rows; centroid
    updates exchange K x d rows regardless of corpus size and are
    localCheckpoint-ed so the iterative lineage stays flat (the
    `ivf_assignments` discipline, `similarity.py:402`). Distances and
    means quantize at 4 decimals on both engines; ties break on cid —
    codebooks are bit-identical, so the oracle checks the exact CODES,
    not just error statistics."""
    ev, assign, c = _pq_train(spark, sf_dir)
    recon = (
        ev.join(assign, ["vec_id", "m"])
        .join(F.broadcast(c), ["m", "cid", "pos"])
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
                / (PQ_M * PQ_SUBDIM),
                6,
            ).alias("recon_mse")
        )
    )
    codes = assign.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == mi, F.col("cid")))
            .cast("int")
            .alias(f"code{mi}")
            for mi in range(PQ_M)
        ]
    )
    return codes.join(recon, "vec_id").select(
        "vec_id", "code0", "code1", "code2", "code3", "recon_mse"
    )


def _pq_adc_oracle() -> str:
    """ADC search in DuckDB over the identical trained codebooks:
    subspace distance table from the query subvectors, summed along
    each database vector's codes."""
    base = _pq_oracle()
    # Reuse the training CTE chain up to the final assignment/codebook
    # (everything before the ", recon AS" tail of the encode oracle).
    ctes = base.split(",\n        recon AS")[0]
    return f"""{ctes},
        qv AS (SELECT m, pos, val FROM ev WHERE vec_id = {QUERY_VEC_ID}),
        dt AS (
            SELECT c.m, c.cid,
                   round(sum((q.val - c.cval) * (q.val - c.cval)), 4) AS d2
            FROM c{PQ_ITERS} c JOIN qv q ON c.m = q.m AND c.pos = q.pos
            GROUP BY c.m, c.cid),
        approx AS (
            SELECT a.vec_id, round(sum(dt.d2), 4) AS adc_d2
            FROM a{PQ_ITERS} a JOIN dt ON a.m = dt.m AND a.cid = dt.cid
            WHERE a.vec_id <> {QUERY_VEC_ID}
            GROUP BY a.vec_id),
        exact AS (
            SELECT e.vec_id,
                   round(sum((e.val - q2.val) * (e.val - q2.val)), 4) AS exact_d2
            FROM ev e JOIN (SELECT pos, val FROM ev
                            WHERE vec_id = {QUERY_VEC_ID}) q2 USING (pos)
            WHERE e.vec_id <> {QUERY_VEC_ID}
            GROUP BY e.vec_id)
        SELECT a.vec_id, a.adc_d2, x.exact_d2
        FROM approx a JOIN exact x USING (vec_id)
        ORDER BY a.adc_d2, a.vec_id LIMIT {TOP_K}"""


@query("pq_adc_search", oracle=_pq_adc_oracle())
def q_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) search: answer a nearest-neighbor
    query against the COMPRESSED corpus — the query stays exact, each
    database vector is its 4 codeword ids, and the approximate
    distance is a sum of 4 lookups into a (M x K)-entry per-query
    distance table (Jegou et al., PAMI'11). Completes the IVF-PQ
    stack next to `ann_ivf_search` (cell pruning) and
    `pq_encode_stats` (encoding): top-10 by ADC distance, with the
    exact squared L2 alongside so the compression error is visible
    per hit.

    Plan at 100 TB: the distance table is M x K = 16 rows — computed
    from the broadcast codebook and broadcast again; the scan side
    touches only the CODES table (4 small ints per vector, the 16x
    compressed store — this is the point of PQ: the full vectors
    never stream through the search), sums 4 joined lookups
    map-side, and the top-10 is a TakeOrderedAndProject k-heap. The
    exact-distance column joins from the raw vectors for the
    REPORTED 10 rows' audit only; a production path would drop it or
    rescore only the shortlist, exactly like ann_ivf_search's
    rescoring stage. Distances quantize at 4 decimals on both
    engines; (adc_d2, vec_id) is a total order."""
    ev, assign, c = _pq_train(spark, sf_dir)
    qv = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "m", "pos", F.col("val").alias("qval")
    )
    dt = (
        c.join(F.broadcast(qv), ["m", "pos"])
        .groupBy("m", "cid")
        .agg(
            F.round(
                F.sum((F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval"))),
                4,
            ).alias("d2")
        )
    )
    approx = (
        assign.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(dt), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d2"), 4).alias("adc_d2"))
    )
    q2 = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "pos", F.col("val").alias("qval")
    )
    exact = (
        ev.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q2), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval"))),
                4,
            ).alias("exact_d2")
        )
    )
    return (
        approx.join(exact, "vec_id")
        .orderBy("adc_d2", "vec_id")
        .limit(TOP_K)
        .select("vec_id", "adc_d2", "exact_d2")
    )


@query(
    "embedding_mrl_truncation",
    oracle="""
        WITH per_vec AS (
            SELECT label,
                   sqrt(list_dot_product(embedding[1:16], embedding[1:16])
                        / list_dot_product(embedding, embedding))
                       AS retention
            FROM embeddings
            WHERE list_dot_product(embedding, embedding) > 0)
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(avg(retention), 4) AS avg_retention,
               round(min(retention), 4) AS min_retention,
               CAST(count(*) FILTER (WHERE retention >= 0.45) AS BIGINT)
                   AS n_ge_045
        FROM per_vec GROUP BY label ORDER BY label
    """,
)
def q_embedding_mrl_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: how much of each vector's
    L2 energy survives keeping only the first 16 of 64 dimensions —
    the decision report before swapping full embeddings for truncated
    ones in a recall-tolerant stage (coarse ANN routing, dedup
    pre-filters). MRL-trained encoders front-load information, so
    retention near sqrt(16/64) = 0.5 means the embedding is NOT
    matryoshka-ordered (energy is uniform across dims) and truncation
    costs real recall; retention >> 0.5 licenses the 4x
    storage/bandwidth cut. Reported per label: mean/min retention and
    how many vectors clear 0.45.

    Scale: pure per-row array arithmetic (slice + two dot products)
    above the scan, then one 10-group aggregate — zero joins, zero
    Python, fully codegen'd; the same plan at 100 TB is
    scan-throughput-bound. Retention is ROUNDED before the per-group
    min so the argmin row choice cannot straddle an engine ulp.
    Cross-engine: slice(1,16) == DuckDB embedding[1:16] (both
    1-indexed inclusive heads); float32 sums drift below the 4dp
    rounding at d=64."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 16)
    from hadoop_wordcount_spark.functions.vectors import dot

    full_e = dot(F.col("embedding"), F.col("embedding"))
    ret = F.sqrt(dot(head, head) / full_e)
    per = emb.filter(full_e > 0).select("label", ret.alias("retention"))
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("retention"), 4).alias("avg_retention"),
            F.round(F.min("retention"), 4).alias("min_retention"),
            F.sum(
                F.when(F.col("retention") >= 0.45, 1).otherwise(0)
            ).cast("long").alias("n_ge_045"),
        )
        .orderBy("label")
    )


_KMEANS_K = 8


@query(
    "kmeans_lloyd_step",
    oracle=f"""
        WITH c AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < {_KMEANS_K}),
        sc AS (
            SELECT e.vec_id, c.cid,
                   list_dot_product(c.cv, c.cv)
                   - 2 * list_dot_product(e.embedding::DOUBLE[], c.cv) AS s,
                   list_dot_product(e.embedding::DOUBLE[],
                                    e.embedding::DOUBLE[])             AS xx,
                   e.embedding[1] AS x0
            FROM embeddings e CROSS JOIN c),
        best AS (
            SELECT vec_id, cid, s, xx, x0,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s, cid) AS rn
            FROM sc)
        SELECT cid AS cluster_id,
               CAST(count(*) AS BIGINT)   AS n_assigned,
               round(avg(xx + s), 4)      AS avg_d2,
               round(avg(x0), 4)          AS new_c0
        FROM best WHERE rn = 1 GROUP BY cid
    """,
)
def q_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding column —
    the iterative-ML workhorse (IVF coarse quantizers, semantic
    cluster maps, `semdedup_prune`'s cells all start here), expressed
    as a SINGLE declarative pass: assignment is an argmin over K
    score expressions unrolled into a codegen'd projection, update is
    a K-key aggregation. A full k-means run is this plan iterated
    with the centroid literals swapped between passes; one step is
    the unit the oracle can check exactly.

    Exact cross-engine argmin: for fixed x, argmin_c ||x-c||^2 =
    argmin_c (c.c - 2 x.c), so both engines evaluate THE SAME
    left-to-right dot-product accumulations in double (Spark
    zip_with/aggregate; DuckDB list_dot_product) — bit-identical
    scores, ties broken on centroid id. Reported avg_d2 adds back
    x.x per row before averaging (same formula both sides).

    Plan: the K initial centroids (vec_id < K) are a
    dimension-bounded driver pull (the sanctioned broadcast-literal
    pattern, similarity.py's query-vector precedent) baked into ONE
    projection computing all K scores + array_min argmin — so there
    is NO K-times row blowup, NO join: scan -> project -> K-key
    partial+final agg. At 100 TB each task streams its vectors once,
    emits K partial centroids; the shuffle carries K rows per task.
    Larger K moves the unroll into a broadcast join against a
    centroid table (`ann_ivf_search`'s layout) — same semantics,
    documented trade."""
    emb = _emb(spark, sf_dir)
    cents = (
        emb.filter(F.col("vec_id") < _KMEANS_K)
        .select("vec_id", "embedding")
        .head(_KMEANS_K)
    )
    scored = []
    for row in sorted(cents, key=lambda r: r["vec_id"]):
        cv = [float(v) for v in row["embedding"]]
        cc = 0.0
        for v in cv:
            cc += v * v
        xc = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(v) for v in cv]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored.append(
            F.struct(
                (F.lit(cc) - 2.0 * xc).alias("s"),
                F.lit(int(row["vec_id"])).alias("cid"),
            )
        )
    xx = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    best = emb.select(
        F.array_min(F.array(*scored)).alias("best"),
        xx.alias("xx"),
        F.get("embedding", 0).cast("double").alias("x0"),
    )
    return best.groupBy(F.col("best.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(F.avg(F.col("xx") + F.col("best.s")), 4).alias("avg_d2"),
        F.round(F.avg("x0"), 4).alias("new_c0"),
    )


@query(
    "embedding_dim_variance",
    oracle="""
        WITH comp AS (
            SELECT i.i AS dim, e.embedding[i.i + 1]::DOUBLE AS v
            FROM embeddings e
            CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
        stats AS (
            SELECT dim, count(*) AS n, avg(v) AS mu,
                   var_samp(v) AS s2
            FROM comp GROUP BY dim)
        SELECT dim,
               CAST(n AS BIGINT)  AS n_vectors,
               round(mu, 4)       AS mean_val,
               round(s2, 4)       AS variance
        FROM stats
        ORDER BY s2 DESC, dim
        LIMIT 10
    """,
)
def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking of the embedding space — the
    dead/dominant-dimension diagnostic: dimensions with near-zero
    variance carry no information (prune or re-train the projector),
    while a few dominant dimensions signal anisotropy
    (`embedding_abtt` then removes them). Top-10 by variance.

    Implementation: posexplode turns each vector into (dim, value)
    rows — 64x row expansion but each row is 12 bytes, and the
    per-dim moment agg combines map-side into 64 cells; the
    alternative (64 separate agg expressions) breaks codegen limits
    at high d. The oracle mirrors with a range() unnest join.

    FP note: var_samp over per-dim doubles is summation-order
    sensitive in principle; at 4dp with |v| <= ~1 and thousands of
    rows the divergence (~1e-13 relative) is far below rounding
    sensitivity — same contract as the corr/covar queries.

    Plan: scan -> posexplode -> (dim) partial+final agg -> top-10
    k-heap. At 100 TB: one pass, 64-cell shuffle; d scales the
    explode factor linearly, never the shuffle width."""
    emb = _emb(spark, sf_dir)
    comp = emb.select(
        F.posexplode("embedding").alias("dim", "raw")
    ).select("dim", F.col("raw").cast("double").alias("v"))
    stats = comp.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("mu"),
        F.var_samp("v").alias("s2"),
    )
    return (
        stats.orderBy(F.desc("s2"), F.asc("dim"))
        .limit(10)
        .select(
            "dim",
            F.col("n").cast("long").alias("n_vectors"),
            F.round("mu", 4).alias("mean_val"),
            F.round("s2", 4).alias("variance"),
        )
    )


_CB_BETA = 0.999


@query(
    "class_balance_weights",
    oracle=f"""
        WITH per AS (
            SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label),
        eff AS (
            SELECT label, n_vecs,
                   round((1.0 - pow({_CB_BETA}, n_vecs)) / (1.0 - {_CB_BETA}),
                         4) AS effective_n
            FROM per),
        raw AS (
            SELECT label, n_vecs, effective_n,
                   round(1.0 / effective_n, 8) AS w_raw
            FROM eff),
        tot AS (SELECT round(sum(w_raw), 8) AS s, count(*) AS k FROM raw)
        SELECT r.label, CAST(r.n_vecs AS BIGINT) AS n_vecs, r.effective_n,
               round(r.w_raw * t.k / t.s, 6) AS weight
        FROM raw r, tot t
    """,
)
def q_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced loss weights from the effective number of
    samples (Cui et al., CVPR 2019 — public): per label,
    E_n = (1 - beta^n) / (1 - beta) with beta=0.999, weight
    proportional to 1/E_n and normalized to sum to the class count.
    The canonical re-weighting for long-tailed training data — a
    labeled-corpus pipeline computes exactly this table before
    sampling (`mixture_temperature_weights` is the unlabeled/domain
    twin; this is the supervised one).

    Exactness: E_n rounds at 4dp on both engines before the
    reciprocal; w_raw AND its total both round at 8dp before the
    normalization divide, so neither engine's SUMMATION ORDER can
    shift the 6dp weight (DuckDB scans sequentially, Spark sums
    partition partials — r9 ADVICE). Remaining cross-engine risk is
    libm pow ulp noise under the 4dp round — the `bigram_logprob`
    ln/log10 tolerance class.

    Plan: one label-keyed count (map-side combined), a |labels|-row
    projection, and a 1-row total broadcast back — scan + one agg at
    any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    per = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    eff = per.select(
        "label",
        "n_vecs",
        F.round(
            (F.lit(1.0) - F.pow(F.lit(_CB_BETA), F.col("n_vecs")))
            / (1.0 - _CB_BETA),
            4,
        ).alias("effective_n"),
    )
    raw = eff.withColumn(
        "w_raw", F.round(F.lit(1.0) / F.col("effective_n"), 8)
    )
    tot = raw.agg(
        F.round(F.sum("w_raw"), 8).alias("s"),
        F.count(F.lit(1)).alias("k"),
    )
    return raw.crossJoin(F.broadcast(tot)).select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        "effective_n",
        F.round(F.col("w_raw") * F.col("k") / F.col("s"), 6).alias("weight"),
    )


@query(
    "label_margin_audit",
    oracle="""
        WITH e AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        expl AS (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings),
        cpos AS (
            SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6) AS cv
            FROM expl GROUP BY label, pos),
        cent AS (
            SELECT label AS clabel, list(cv ORDER BY pos) AS cvec
            FROM cpos GROUP BY label),
        scored AS (
            SELECT e.vec_id, e.label, cent.clabel,
                   round(list_sum(list_transform(range(1, len(e.v) + 1),
                                  i -> e.v[i] * cent.cvec[i]))
                         / (greatest(sqrt(list_sum(list_transform(e.v,
                                          x -> x * x))), 1e-12)
                            * greatest(sqrt(list_sum(list_transform(cent.cvec,
                                            x -> x * x))), 1e-12)), 6)
                       AS cos6
            FROM e CROSS JOIN cent),
        own AS (
            SELECT vec_id, label, cos6 AS own_cos FROM scored
            WHERE label = clabel),
        rival AS (
            SELECT vec_id, clabel AS rival_label, cos6 AS rival_cos
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY vec_id
                      ORDER BY cos6 DESC, clabel) AS rn
                  FROM scored WHERE label <> clabel)
            WHERE rn = 1)
        SELECT o.vec_id, CAST(o.label AS INT) AS label,
               CAST(r.rival_label AS INT) AS rival_label,
               round(o.own_cos, 4) AS own_cos,
               round(r.rival_cos, 4) AS rival_cos,
               round(o.own_cos - r.rival_cos, 4) AS margin
        FROM own o JOIN rival r USING (vec_id)
        ORDER BY margin ASC, o.vec_id LIMIT 20
    """,
)
def q_label_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise / hard-example mining via nearest-centroid margin
    (the confident-learning heuristic, Northcutt et al. 2021): per
    vector, cosine to its OWN label centroid minus cosine to the
    closest OTHER label's centroid; the 20 lowest margins are the
    prime mislabel candidates a labeled-corpus pipeline sends to
    re-annotation (negative margin = another class's centroid fits
    better than its own). `contrastive_hard_negatives` mines hard
    PAIRS for training; this audits the LABELS themselves.

    Determinism: centroids round at 6dp per (label, dim) — the
    `embedding_centroids` discipline — so both engines score against
    bit-identical centroid vectors; dot products fold in array index
    order (`embedding_quantize_int8` precedent), cosines round at
    6dp before the rival argmax (row_number with label tiebreak),
    margins at 4dp before the global bottom-20 cut (vec_id
    tiebreak).

    Plan: centroid training is one (label, dim)-keyed partial agg
    (|labels| x d cells); scoring cross-joins each vector against
    the BROADCAST |labels|-row centroid table — per-vector cost
    O(|labels| * d), linear in the corpus; the rival argmax is a
    |labels|-row max folded map-side via the window over per-vector
    groups; bottom-20 is a TakeOrderedAndProject k-heap. No
    vector-vector pair stage anywhere — this scales where
    pairwise audits can't."""
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    expl = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    cpos = expl.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("cv")
    )
    cent = cpos.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s.cv,
        ).alias("cvec")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _norm(a):
        return F.greatest(F.sqrt(_dot(a, a)), F.lit(1e-12))

    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(
            _dot(F.col("v"), F.col("cvec"))
            / (_norm(F.col("v")) * _norm(F.col("cvec"))),
            6,
        ).alias("cos6"),
    )
    # r13: own-cos and rival-argmax in ONE conditional aggregate over
    # the scored stream — the former filter+window / filter+join pair
    # executed the |labels|-per-vector cosine scoring twice and paid a
    # window sort (checkpointing `scored` instead would store a
    # corpus x |labels| table — wrong at 100 TB). min(struct(-cos6,
    # clabel)) IS row_number()=1 of (cos6 DESC, clabel ASC): cos6 is
    # already 6dp-rounded, negation is exact, ties break on clabel.
    per_vec = scored.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("cos6"))
        ).alias("own_cos"),
        F.min(
            F.when(
                # cos6.isNotNull guard (r13 advice): struct-field NULLs
                # sort SMALLEST in min(), so a NULL cosine (zero-norm
                # degeneracy) would win the rival argmax that the old
                # row_number-over-desc form ordered LAST. No NULLs
                # exist in the fixtures (norms are clamped >= 1e-12),
                # so this is oracle-neutral hardening.
                (F.col("clabel") != F.col("label"))
                & F.col("cos6").isNotNull(),
                F.struct(
                    (-F.col("cos6")).alias("ns"),
                    F.col("clabel").alias("c"),
                ),
            )
        ).alias("rv"),
    )
    return (
        per_vec.filter(
            F.col("own_cos").isNotNull() & F.col("rv").isNotNull()
        )
        .select(
            "vec_id",
            "label",
            "own_cos",
            F.col("rv.c").alias("rival_label"),
            (-F.col("rv.ns")).alias("rival_cos"),
        )
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.col("rival_label").cast("int").alias("rival_label"),
            F.round("own_cos", 4).alias("own_cos"),
            F.round("rival_cos", 4).alias("rival_cos"),
            F.round(F.col("own_cos") - F.col("rival_cos"), 4).alias(
                "margin"
            ),
        )
        .orderBy(F.asc("margin"), F.asc("vec_id"))
        .limit(20)
    )


def _ann_recall_oracle() -> str:
    """Composes three chains: brute-force ground truth, the IVF
    search tail (same text as `_ivf_oracle`, trained at the PINNED
    ANN_RECALL_K — the fixed-K production regime, not the module
    default), and the s-prefixed SRP multiprobe chain from
    `dedup._srp_ctes`/`_srp_multiprobe_body`."""
    from hadoop_wordcount_spark.functions.srp import (
        _srp_ctes,
        _srp_multiprobe_body,
    )

    ctes, prev = _ivf_assign_ctes(ANN_RECALL_K)
    return f"""
        WITH {ctes},
        {_srp_ctes("s")},
        {_srp_multiprobe_body("s")},
        qv AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID}),
        bf AS (
            SELECT e.vec_id,
                   round(list_dot_product(e.embedding, q.qv) /
                         (sqrt(list_dot_product(e.embedding, e.embedding)) *
                          sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
            FROM embeddings e CROSS JOIN qv q
            WHERE e.vec_id <> {QUERY_VEC_ID}),
        bf10 AS (SELECT vec_id FROM bf
                 ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}),
        probe AS (SELECT pos, val FROM ev WHERE vec_id = {QUERY_VEC_ID}),
        pc AS (
            SELECT cid FROM (
                SELECT c.cid,
                       row_number() OVER (
                           ORDER BY round(sum((p.val - c.cval)
                                              * (p.val - c.cval)), 4),
                                    c.cid) AS rn
                FROM probe p JOIN {prev} c ON p.pos = c.pos
                GROUP BY c.cid) WHERE rn <= {IVF_NPROBE}),
        icand AS (
            SELECT vec_id FROM a{IVF_ITERS}
            WHERE cid IN (SELECT cid FROM pc)
              AND vec_id <> {QUERY_VEC_ID}),
        ivf10 AS (
            SELECT b.vec_id FROM bf b JOIN icand USING (vec_id)
            ORDER BY b.cos_sim DESC, b.vec_id LIMIT {TOP_K}),
        mp10 AS (SELECT vec_id FROM sscored
                 ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}),
        hits AS (
            SELECT 'ivf' AS method,
                   (SELECT count(*) FROM ivf10 JOIN bf10 USING (vec_id))
                       AS n_hits
            UNION ALL
            SELECT 'srp_multiprobe',
                   (SELECT count(*) FROM mp10 JOIN bf10 USING (vec_id)))
        SELECT method, CAST(n_hits AS BIGINT) AS n_hits,
               round(n_hits / {TOP_K}.0, 4) AS recall_at_10
        FROM hits ORDER BY method
    """


@query("ann_recall_report", oracle=_ann_recall_oracle())
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluating retrieval harness: recall@{TOP_K} of the two
    approximate searchers — trained-IVF (`ann_ivf_search`) and
    training-free multiprobe SRP-LSH (`sim_search_srp_multiprobe`) —
    against the brute-force ground truth (`sim_search_topk`), in ONE
    query. This is the eval every ANN deployment runs after any
    reindex/requantize: is recall still above the bar, and which
    method degraded? Both method pipelines and the ground truth run
    in-engine; no separate eval harness, no collected arrays.

    Determinism: all three rankings inherit their queries' 4dp-round
    + vec_id tiebreak discipline, so the three top-{TOP_K} sets —
    and hence the integer hit counts — are engine-identical; recall
    is an integer ratio.

    Plan at 100 TB: ground truth is the one genuinely linear scan
    (brute-force top-k heap — the eval cost you pay by definition);
    each method contributes its own bounded candidate stage; the
    report is a 2-row spine. Evaluate on a SAMPLED query set in
    production — same plan, query spine instead of one fixed id.

    The IVF arm runs at the PINNED fixed ANN_RECALL_K=64 (query and
    oracle alike, r10 verdict #1 — the `dedup_embedding_pq@K64`
    precedent): train-once / fixed-codebook is the production
    deployment regime and its ladder is linear (lsq alpha 0.85),
    where the sqrt-n-K ladder dial is Θ(n^1.5) by design. The
    quantizer is the shared `ivf_assignments` memo keyed on K, so a
    session evaluating the index it serves trains k-means once."""
    from hadoop_wordcount_spark.operators.dedup import (
        q_sim_search_srp_multiprobe,
    )

    bf = q_sim_search_topk(spark, sf_dir).select("vec_id")
    ivf = _ivf_search(spark, sf_dir, ANN_RECALL_K).select("vec_id")
    mp = q_sim_search_srp_multiprobe(spark, sf_dir).select("vec_id")
    union = ivf.withColumn("method", F.lit("ivf")).unionByName(
        mp.withColumn("method", F.lit("srp_multiprobe"))
    )
    hits = (
        union.join(bf, "vec_id")
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    spine = spark.createDataFrame(
        [("ivf",), ("srp_multiprobe",)], "method string"
    )
    return (
        spine.join(hits, "method", "left")
        .select(
            "method",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("long")
            .alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / float(TOP_K), 4
            ).alias("recall_at_10"),
        )
        .orderBy("method")
    )
