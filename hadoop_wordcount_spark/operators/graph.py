"""Graph analytics over corpus-derived graphs: PageRank on the word
transition (bigram) graph.

Absent from the reference (no joins at all, let alone iteration);
complements `dedup_clusters` (the engine's other iterative operator)
with the weighted-propagation family: PageRank-style scoring is how
link/citation/co-occurrence importance is computed over corpus-scale
graphs.

The iteration count is FIXED (unrolled into the plan), which makes
the whole computation one declarative DAG — and therefore exactly
reproducible by a chained-CTE DuckDB oracle, giving a full hash-check
on an 'iterative' algorithm without recursion in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_wordcount_spark.operators.wordcount import tokens_col
from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table

_DAMP = 0.85
_ITERS = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _oracle_pagerank() -> str:
    """Chained-CTE DuckDB twin: r0 uniform, then _ITERS unrolled
    propagation steps (same damping, same dangling-mass convention)."""
    iters = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""
        c{i} AS (
            SELECT en.dst AS word, sum({prev}.r * en.w) AS inflow
            FROM en JOIN {prev} ON en.src = {prev}.word GROUP BY en.dst),
        r{i} AS (
            SELECT n.word,
                   CAST({1 - _DAMP} AS DOUBLE) / nn.n
                   + CAST({_DAMP} AS DOUBLE) * coalesce(c{i}.inflow, 0) AS r
            FROM nodes n CROSS JOIN nn LEFT JOIN c{i} ON n.word = c{i}.word)"""
        )
        prev = f"r{i}"
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w <> '') AS tk
            FROM documents),
        bi AS (
            SELECT unnest(list_transform(range(1, len(tk)),
                       i -> tk[i] || ' ' || tk[i + 1])) AS p
            FROM tok WHERE len(tk) >= 2),
        edges AS (
            SELECT string_split(p, ' ')[1] AS src,
                   string_split(p, ' ')[2] AS dst,
                   count(*) AS cnt
            FROM bi GROUP BY 1, 2),
        outw AS (SELECT src, sum(cnt) AS ow FROM edges GROUP BY src),
        en AS (
            SELECT e.src, e.dst, e.cnt * CAST(1 AS DOUBLE) / o.ow AS w
            FROM edges e JOIN outw o USING (src)),
        nodes AS (SELECT DISTINCT unnest(tk) AS word FROM tok),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT word, CAST(1 AS DOUBLE) / nn.n AS r
               FROM nodes CROSS JOIN nn),{",".join(iters)}
        SELECT word, round(r, 4) AS pagerank FROM {prev}
    """


@query("pagerank_bigram", oracle=_oracle_pagerank())
def q_pagerank_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the word-transition graph: nodes are tokens,
    edge (src, dst) weighted by bigram count normalized per source
    (a random-surfer Markov chain over the corpus's word order);
    damping 0.85, uniform init, {_ITERS} fixed iterations unrolled
    into ONE declarative plan. Dangling nodes (words never followed
    by anything) leak their mass — the standard simplification, and
    the oracle applies the identical convention, so the check is
    exact to 4 decimals (coarse enough that order-dependent double
    partial-sum ulp noise cannot flip a rounding boundary — the same
    granularity convention as the other double aggregates).

    Scale shape: the edge list aggregates once (vocabulary² bound,
    heavily skew-concentrated in practice — head-word skew is the
    `salted_aggregation` pattern); each iteration is one
    edges-to-ranks equi-join + one groupBy(dst) — O(edges) shuffle
    per iteration, the textbook distributed PageRank step. Ranks and
    normalized edges are cached: the unrolled plan references them
    every iteration, and the cache turns those into memory scans. At
    web scale you'd loop with localCheckpoint like `dedup_clusters`
    instead of unrolling — both patterns are in this engine."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", tokens_col(F.col("text")).alias("tk"))
    bi = tok.filter(F.size("tk") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.concat(
                    F.element_at("tk", i), F.lit(" "), F.element_at("tk", i + 1)
                ),
            )
        ).alias("p")
    )
    sp = F.split("p", " ")
    edges = (
        bi.select(sp.getItem(0).alias("src"), sp.getItem(1).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    outw = edges.groupBy("src").agg(F.sum("cnt").alias("ow"))
    en = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("cnt").cast("double") / F.col("ow")).alias("w"))
        .cache()
    )
    nodes = (
        tok.select(F.explode("tk").alias("word")).distinct().cache()
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "word", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            en.join(ranks.select(F.col("word").alias("src"), "r"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w")).alias("inflow"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes.word == contrib.dst, "left")
            .select(
                "word",
                "n",
                (
                    F.lit(1 - _DAMP) / F.col("n")
                    + F.lit(_DAMP) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("word", F.round("r", 4).alias("pagerank"))
