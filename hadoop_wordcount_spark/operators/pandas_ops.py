"""Sanctioned Python escape hatches: Pandas UDF / applyInPandas.

The reference's Mapper/Reducer classes are its UDF surface — user
code slotted into framework extension points (``MapClass.java:11``,
``ReduceClass.java:10``). The modern analog is ``applyInPandas``
(grouped map — the Reducer shape) and ``pandas_udf`` (the Mapper
shape), both Arrow-batched. Everything else in this engine is
built-in expressions; these two queries exist to cover the extension
point with the *right* escape hatch (vectorized Arrow, never
row-at-a-time Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table


@query(
    "group_zscore_pandas",
    oracle="""
        SELECT event_id, event_type,
               round((value - avg(value) OVER (PARTITION BY event_type))
                     / stddev_samp(value) OVER (PARTITION BY event_type), 2) AS z
        FROM events
    """,
)
def q_group_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas — the grouped-map Reducer
    analog: each event_type group arrives as one Arrow-backed pandas
    DataFrame. (Catalyst could do this with window functions — see
    the oracle — but this query deliberately exercises the UDAF
    extension point.) At scale: one shuffle on the group key, Python
    workers process groups in parallel, Arrow keeps serde off the
    per-row path."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            # stddev_samp of a single row is NULL in SQL; pandas would
            # yield NaN (ddof=1 → 0/0), which Arrow ships as a NaN
            # double, not a NULL — match the SQL semantics explicitly.
            pdf["z"] = None
            return pdf[["event_id", "event_type", "z"]]
        std = pdf["value"].std(ddof=1)
        # round(2) JVM-free here is fine: 2-decimal granularity makes the
        # numpy-vs-SQL ulp differences in mean/std numerically irrelevant,
        # and .round on a boundary-free grid cannot diverge from SQL ROUND.
        pdf["z"] = ((pdf["value"] - pdf["value"].mean()) / std).round(2)
        return pdf[["event_id", "event_type", "z"]]

    return e.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, z double"
    )


@query(
    "pandas_udf_scale",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
        FROM lineitem WHERE l_orderkey % 500 = 0
    """,
)
def q_pandas_udf_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized Mapper analog) computing
    the charged amount. Production guidance stays: built-ins beat
    this by staying JVM-side — the query exists to pin the pattern
    and its exact-parity semantics."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)

    @F.pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    # Round JVM-side: numpy's .round is banker's rounding and disagrees
    # with SQL ROUND (half-up) on .xxxx5 boundaries.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round(2): the two engines' products can differ in the last ulp
        # (numpy vs DuckDB multiply pipelines); 2-decimal granularity makes a
        # boundary flip numerically negligible at any tested SF.
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 2).alias("charged"),
    )


@query(
    "map_in_arrow_scale",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_band,
               round(l_extendedprice * (1 - l_discount), 2) AS disc_price
        FROM lineitem WHERE l_orderkey % 500 = 1
    """,
)
def q_map_in_arrow_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-level sanctioned escape hatch: the
    function sees raw ``pyarrow.RecordBatch``es, no pandas
    materialization at all. This is the right hatch when the Python
    side is itself Arrow-native (Arrow-backed ML feature libraries,
    Arrow Flight shipping, zero-copy hand-off to C extensions):
    one less conversion than mapInPandas, identical distribution
    story (per-partition, no shuffle).

    Completes the Python extension-point family: pandas_udf (scalar),
    applyInPandas (grouped), mapInPandas (batch iterator),
    UDTF (tabular), applyInPandasWithState /
    transformWithStateInPandas (stateful streaming), mapInArrow
    (raw Arrow). Rounding happens JVM-side after the hatch, per the
    module's parity conventions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )

    def bands(batches):
        for b in batches:
            t = pa.Table.from_batches([b])
            price = t.column("l_extendedprice")
            disc = t.column("l_discount")
            band = pc.cast(pc.floor(pc.divide(price, pa.scalar(1000.0))), pa.int64())
            dp = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
            out = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_linenumber": t.column("l_linenumber"),
                    "price_band": band,
                    "disc_price": dp,
                }
            )
            yield from out.to_batches()

    mapped = li.mapInArrow(
        bands,
        schema="l_orderkey long, l_linenumber int, price_band long, disc_price double",
    )
    return mapped.select(
        "l_orderkey",
        "l_linenumber",
        "price_band",
        F.round("disc_price", 2).alias("disc_price"),
    )


@query(
    "udtf_split_sentences",
    oracle="""
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, '. '), 1) - 1 AS INT)
                   AS pos,
               unnest(string_split(text, '. ')) AS sentence
        FROM documents
    """,
)
def q_udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 4 API):
    one input row -> N output rows, here sentence segmentation with
    ordinal positions. Completes the Python extension-point trio
    (scalar pandas_udf / grouped applyInPandas / tabular UDTF).

    This is deliberately the API-coverage demo: a '. ' split is
    expressible with built-in explode (and the hot-path queries do
    exactly that); a real UDTF earns its cost when the row-expansion
    logic needs a Python library (parsers, tokenizers). Lateral
    correlation keeps it distributed — the UDTF runs per-partition
    beside the scan, no shuffle; only the Python-worker hop makes it
    slower than the built-in path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                # Match the oracle's unnest(string_split(NULL, ...)):
                # NULL input expands to ZERO rows, not a ('', 0) row.
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence "
        "FROM udtf_docs_in d, LATERAL split_sentences(d.text) s"
    )


@query(
    "cogroup_merge_asof",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
            FROM events WHERE event_type = 'purchase'),
        c AS (
            SELECT user_id, epoch_ns(ts) // 1000 AS us
            FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
               CAST(COALESCE((p.us - max(c.us)) // 1000000, -1) AS BIGINT)
                   AS gap_s
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.us <= p.us
        GROUP BY p.event_id, p.user_id, p.us
    """,
)
def q_cogroup_merge_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — per-user merge_asof of two streams.

    The third grouped-Python extension point (after grouped
    applyInPandas and applyInPandasWithState): TWO DataFrames
    co-shuffled on the key arrive as a pandas pair per group, here
    purchases x clicks per user, answered with `pd.merge_asof`
    (backward, exact-match allowed) — "seconds since the last click"
    attribution for every purchase, -1 when no click precedes it.
    The SQL oracle is the correlated max-<= aggregation; the
    cogroup form exists because real attribution kernels (sessioned
    lookback windows, multi-column nearest matches) outgrow SQL fast
    while staying two sorted per-user arrays in pandas.

    Scale: both sides shuffle ONCE on a deterministic hash BUCKET of
    user_id (co-partitioned, no join product); the kernel is
    O(n log n) in the per-bucket slice via the int64 microsecond key —
    timestamps never round-trip through Python datetimes
    (`lag_event_gap`'s exactness discipline).

    Bucketed cogroup (r13): cogrouping directly on user_id invoked the
    Python kernel once per user — at sf0.1 that is 1,500 pandas
    round-trips for 40k rows (~6 ms of per-group overhead each, ~9 s
    total; optimization guide §4: amortize per-task work). The
    cogroup key is now `pmod(xxhash64(user_id), B)` with
    B = 4 x shuffle partitions, and `pd.merge_asof(..., by="user_id")`
    performs the per-user as-of matching INSIDE each bucket — the
    same vectorized kernel, ~B invocations instead of |users|. The
    bucket count tracks the deployment (shuffle partitions are sized
    to the cluster/AQE), the key is deterministic under task retries
    (guide §2.5), and per-user semantics are unchanged: a user's
    purchases only ever match that user's clicks, wherever the bucket
    boundary falls.
    """
    # The conf can be non-numeric on managed deployments (e.g.
    # "auto"); fall back to the cluster's default parallelism rather
    # than raising (r13 advice). Bucket count never changes results —
    # per-user semantics hold wherever the bucket boundary falls.
    try:
        n_buckets = 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_buckets = 4 * max(spark.sparkContext.defaultParallelism, 50)
    e = load_table(spark, sf_dir, "events").withColumn(
        "us", F.expr("ts_ns div 1000")
    )
    b = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("b")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        b, "event_id", "user_id", "us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(b, "user_id", "us")

    return purchases.groupBy("b").cogroup(
        clicks.groupBy("b")
    ).applyInPandas(
        asof_kernel, schema="event_id long, user_id long, gap_s long"
    )


def asof_kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """The per-bucket as-of kernel behind `cogroup_merge_asof` —
    module-level (r13 advice) so tests exercise the PRODUCTION kernel
    (the planted per-user-isolation test formerly re-implemented a
    private copy that could drift), and so executors import it rather
    than unpickling a closure. `by="user_id"` carries the per-user
    isolation inside each hash bucket."""
    if left.empty:
        return pd.DataFrame(columns=["event_id", "user_id", "gap_s"])
    left = left.sort_values("us")
    if right.empty:
        left["gap_s"] = -1
        return left[["event_id", "user_id", "gap_s"]]
    m = pd.merge_asof(
        left,
        right[["user_id", "us"]]
        .sort_values("us")
        .rename(columns={"us": "click_us"}),
        left_on="us",
        right_on="click_us",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    gap = (m["us"] - m["click_us"]) // 1_000_000
    m["gap_s"] = gap.fillna(-1).astype("int64")
    return m[["event_id", "user_id", "gap_s"]]


@query(
    "grouped_agg_trimmed_mean",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events)
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_events,
               round(avg(CASE WHEN rn > CAST(floor(n * 0.1) AS BIGINT)
                               AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
                              THEN value END), 2) AS trimmed_mean,
               round(avg(value), 2) AS plain_mean
        FROM r GROUP BY event_type
    """,
)
def q_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the vectorized UDAF extension point.

    A 10%-trimmed mean per event_type: the robust statistic Spark has
    no built-in for, expressed as a true aggregate function (one
    Arrow-shipped pd.Series per group in, one scalar out) usable
    anywhere an aggregate is — groupBy().agg here. This closes the
    grouped-Python matrix: scalar pandas_udf, grouped-map
    applyInPandas, GROUPED_AGG (this), cogrouped applyInPandas,
    mapInPandas/mapInArrow, UDTF, applyInPandasWithState.

    Trim rule pinned cross-engine: drop the floor(n*0.1) smallest and
    largest VALUES (a sorted-multiset slice — tie order is
    irrelevant), average the rest; the oracle reproduces it with a
    rank window. round(2) absorbs numpy-pairwise vs SQL-sequential
    summation ulps (`group_zscore_pandas`'s precedent).

    Scale: one shuffle on the group key; each group streams to a
    Python worker as Arrow batches. The plain mean rides along for
    the outlier-sensitivity contrast (the report's actual point).
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values()
        k = int(len(s) * 0.1)
        inner = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
        return float(inner.mean())

    # A GROUPED_AGG pandas UDF cannot share one agg with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — run it in its own
    # aggregation and join the JVM stats on the (tiny) group key.
    robust = e.groupBy("event_type").agg(
        F.round(trimmed_mean(F.col("value")), 2).alias("trimmed_mean")
    )
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 2).alias("plain_mean"),
    )
    return plain.join(F.broadcast(robust), "event_type").select(
        "event_type", "n_events", "trimmed_mean", "plain_mean"
    )


@query(
    "udtf_polymorphic_split",
    oracle="""
        WITH t AS (
            SELECT lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN len(toks) >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_3,
               min(toks[1]) AS min_tok0
        FROM t GROUP BY lang
    """,
)
def q_udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is not
    declared statically — the ``analyze`` static method computes it
    at plan time from the call's constant arguments (here k=3 ⇒
    columns tok0..tok2). This is the API for table functions whose
    shape depends on their arguments (dynamic unpivots, configurable
    feature extractors): one registration serves every k, and
    Catalyst sees concrete per-call schemas so downstream resolution
    and pruning work exactly as with a static UDTF. Same distribution
    story as `udtf_split_sentences`: lateral-correlated,
    per-partition beside the scan, no shuffle — only the aggregate
    shuffles (|langs| groups)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"tok{i}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text, k: int):
            toks = [] if text is None else [t for t in text.split(" ") if t]
            yield tuple(toks[i] if i < len(toks) else None for i in range(k))

    spark.udtf.register("split_fixed", SplitFixed)
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    d.createOrReplaceTempView("udtf_poly_in")
    rows = spark.sql(
        "SELECT d.lang, s.tok0, s.tok2 "
        "FROM udtf_poly_in d, LATERAL split_fixed(d.text, 3) s"
    )
    return rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("tok2").isNotNull(), 1).otherwise(0)).alias(
            "n_with_3"
        ),
        F.min("tok0").alias("min_tok0"),
    )


@query(
    "group_apply_arrow",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total,
               CAST(max(n_chars) AS BIGINT) AS chars_max,
               CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM documents GROUP BY lang
    """,
)
def q_group_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow (Spark 4) — the Arrow-NATIVE grouped-map
    extension point: the kernel receives each group as a raw
    ``pyarrow.Table`` and answers with one, no pandas
    materialization on either edge. Completes the grouped-Python
    matrix alongside applyInPandas (pandas groups), GROUPED_AGG
    (vectorized UDAF) and cogrouped applyInPandas: this is the hatch
    for Arrow-compute / Rust-via-Arrow / zero-copy C++ kernels where
    pandas conversion is pure overhead. Distribution identical to
    applyInPandas: one shuffle on the group key, kernel runs
    per-group on executors; group size bounds worker memory (|docs
    per lang| here — for unbounded groups pre-aggregate first)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": [t["lang"][0].as_py()],
                "n_docs": [t.num_rows],
                "chars_total": [pc.sum(t["n_chars"]).as_py()],
                "chars_max": [pc.max(t["n_chars"]).as_py()],
                "first_doc": [pc.min(t["doc_id"]).as_py()],
            }
        )

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return d.groupBy("lang").applyInArrow(
        stats,
        schema="lang string, n_docs long, chars_total long, "
        "chars_max long, first_doc long",
    )


@query(
    "pandas_api_orders_report",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     / 100.0, 2) AS revenue,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders GROUP BY o_orderstatus
    """,
)
def q_pandas_api_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-API-on-Spark surface (`pyspark.pandas`): the same
    per-status order rollup a data scientist writes in pandas idiom —
    `groupby(...).agg(count / sum / nunique)` — executed by Catalyst.
    `DataFrame.pandas_api()` wraps the relation zero-copy (no
    collect, no Arrow transfer; it IS the same logical plan), the ps
    groupby compiles to a hash aggregate, and `.to_spark()` unwraps.

    Included because it's a real migration path users arrive on; the
    100 TB notes are the pitfalls, not the power: (a) never let ps
    attach its default sequential index (a global window over the
    whole relation — wrap existing DataFrames or pass index_col;
    this query wraps), (b) `nunique` is a real two-level distinct
    shuffle, same cost as COUNT(DISTINCT) — no pandas magic, and
    (c) anything that materializes an index order (`sort_index`,
    positional `iloc`) forces global sorts that plain groupBy never
    pays. Money discipline on exact cents as everywhere.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    pdf = o.pandas_api()
    g = (
        pdf.groupby("o_orderstatus")
        .agg(
            n_orders=("o_custkey", "count"),
            cents=("cents", "sum"),
            n_customers=("o_custkey", "nunique"),
        )
        .reset_index()
    )
    return g.to_spark().select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.col("n_customers").cast("long").alias("n_customers"),
    )
