"""Sink coverage: CSV / JSON / partitioned-parquet write→read round
trips, plus save-mode semantics.

Reference surface: one tab-KV text sink with an existence guard
(O9/O10, ``WordCount.java:35,39``) — reproduced verbatim in
``cli.py``. These queries cover the modern sink matrix and prove the
written artifacts read back bit-identically (the oracle compares the
round trip against the source table directly).

100 TB notes: partitioned parquet (partitionBy) is the production
sink — downstream scans prune partitions; writer parallelism is the
upstream partition count (never coalesce(1) outside final small
exports).

SIDE EFFECTS: each sink query writes under ``$TMPDIR/hwcs_sinks/<sf>/``
(mode=overwrite, per-scale-factor paths) as part of proving the round
trip — calling one mutates that scratch directory and nothing else.
``bucketed_join`` (relational.py) follows the same convention under
``/tmp/spark_graft_buckets/``. These are the registry's only
side-effecting queries besides the CLI's explicit output dir.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_wordcount_spark.registry import query
from hadoop_wordcount_spark.sources.tables import load_table


def _tmp(name: str, sf_dir: str) -> str:
    """Per-SF path: a plan constructed for one scale factor must not be
    clobbered by a later run at another before it is collected."""
    sf = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), "hwcs_sinks", sf, name)


@query("sink_roundtrip_csv", oracle="SELECT * FROM nation")
def q_sink_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read back with explicit schema.
    Output must equal the source table exactly."""
    n = load_table(spark, sf_dir, "nation")
    path = _tmp("nation_csv", sf_dir)
    n.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(n.schema).option("header", "true").csv(path)


@query("sink_roundtrip_json", oracle="SELECT r_regionkey, r_name FROM region")
def q_sink_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → JSON lines → read back with explicit schema."""
    r = load_table(spark, sf_dir, "region")
    path = _tmp("region_json", sf_dir)
    r.write.mode("overwrite").json(path)
    return spark.read.schema(r.schema).json(path).select("r_regionkey", "r_name")


@query(
    "sink_partitioned_parquet",
    oracle="SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
)
def q_sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → parquet partitioned by lang → read back filtered to
    one partition. The read's lang='en' predicate prunes directories
    (PartitionFilters), the scan never touches other languages — the
    layout that makes 100 TB corpora queryable."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _tmp("documents_by_lang", sf_dir)
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.select(
        "doc_id", F.col("lang").cast("string").alias("lang"), "n_chars"
    )


@query(
    "sink_roundtrip_orc",
    oracle="SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal FROM supplier",
)
def q_sink_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → ORC (zstd) → read back. ORC is Spark's second
    built-in columnar format (vectorized reader, predicate pushdown);
    zstd shows codec selection at the sink."""
    s = load_table(spark, sf_dir, "supplier")
    path = _tmp("supplier_orc", sf_dir)
    s.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    return back.select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("bal")
    )


@query(
    "dpp_partition_pruned_join",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
                   AS revenue
        FROM orders
        WHERE strftime(o_orderdate, '%Y') = '1998'
        GROUP BY 1
    """,
)
def q_dpp_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Partition Pruning over a month-partitioned fact layout.

    orders is laid out hive-partitioned by o_month (the write happens
    once per sf into the sinks tmp area), then joined to a dimension
    whose filter (year = 1998) only becomes a partition predicate AT
    RUNTIME: Catalyst injects a `dynamicpruning` subquery into the
    fact scan, so only the 12 month-directories of 1998 are read —
    the other ~68 months' files are skipped at the source, not
    filtered after a full scan. `test_plan_quality` pins the
    dynamicpruning expression in the scan's PartitionFilters.

    At 100 TB this is THE mechanism that makes star-schema joins
    feasible: the dimension filter prunes fact partitions before any
    fact I/O, composing with AQE and broadcast joins for free — the
    declarative replacement for hand-maintained date predicates."""
    # Project to the columns the report reads BEFORE laying out the
    # fact (r13; guide §2.3 project early): the month-partitioned
    # write carried all 9 orders columns where the join+aggregate
    # below reads only (o_totalprice, o_month) — ~4x the bytes
    # written, re-listed and re-read for no consumer. The DPP
    # demonstration (dynamicpruning on the month PartitionFilter) is
    # unchanged.
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    )
    path = _tmp("orders_by_month", sf_dir)
    o.write.mode("overwrite").partitionBy("o_month").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        fact.select("o_month")
        .distinct()
        .withColumn("o_year", F.substring("o_month", 1, 4))
        .filter(F.col("o_year") == "1998")
        .select("o_month")
    )
    return (
        fact.join(dim, "o_month")
        .groupBy("o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .select(
            F.col("o_month").cast("string").alias("o_month"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "union_schema_evolution",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
                   AS chars_total
        FROM documents GROUP BY source
    """,
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet snapshots: batch v1 was written
    before the `n_chars` column existed; batch v2 carries it. Two
    reconciliation surfaces in one query, both standard at 100 TB:

    * **scan-level**: `mergeSchema=true` multi-path parquet read —
      the footer schemas union at planning time, v1 rows surface
      NULL `n_chars` (exactly how a years-long partitioned table
      with schema drift reads as one relation);
    * **DataFrame-level**: `unionByName(allowMissingColumns=True)`
      over the per-batch reads — the API twin for when the branches
      come from different pipelines rather than one scan.

    The query reads via the scan-level path (one multi-file scan, no
    shuffle until the aggregate) and pins the DataFrame-level union
    to the same relation count inline. The oracle reconstructs the
    evolved union from the source table (even doc_ids were the
    pre-evolution batch)."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "source")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", "n_chars"
    )
    p1 = _tmp("evolve_v1", sf_dir)
    p2 = _tmp("evolve_v2", sf_dir)
    v1.write.mode("overwrite").parquet(p1)
    v2.write.mode("overwrite").parquet(p2)
    merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    # The DataFrame-level twin must describe the same relation.
    r1, r2 = spark.read.parquet(p1), spark.read.parquet(p2)
    by_name = r1.unionByName(r2, allowMissingColumns=True)
    assert len(by_name.columns) == len(merged.columns)
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0)).alias(
            "n_missing"
        ),
        F.sum("n_chars").alias("chars_total"),
    )


@query(
    "file_lineage_report",
    oracle="""
        SELECT CAST(o_orderstatus AS VARCHAR) AS o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1 AS BIGINT) AS n_files
        FROM orders GROUP BY o_orderstatus
    """,
)
def q_file_lineage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level file lineage via the `_metadata` hidden column
    (Spark's metadata struct: file_path/file_size/file_modification
    _time — selected on demand, never materialized otherwise), over a
    layout written with the small-files discipline: `repartition(
    partition_col)` BEFORE `partitionBy(partition_col)` puts each
    partition value on exactly ONE task, so each Hive directory holds
    exactly ONE file — without it, every upstream task writes a file
    into every partition directory it touches, and a 1000-task stage
    over 365 partitions emits 365,000 files (the classic metadata
    explosion that kills 100 TB table listings). The report proves
    both surfaces at once: per-status row counts ride the partition
    column; n_files = countDistinct(_metadata.file_path) == 1 pins
    the one-file-per-partition layout as a *data* assertion the
    oracle checks, not a filesystem probe."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    path = _tmp("lineage_orders", sf_dir)
    o.repartition("o_orderstatus").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path).select(
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
        F.col("_metadata.file_path").alias("fp"),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("fp").alias("n_files"),
    )


@query(
    "csv_malformed_audit",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bad,
               CAST(sum(CASE WHEN o_orderkey % 13 <> 0
                             THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                             END) AS BIGINT) AS good_cents
        FROM orders
    """,
)
def q_csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-ingest handling: PERMISSIVE CSV parsing with
    `columnNameOfCorruptRecord`. Every 13th order is serialized as an
    unparsable line ("X<key>,bad" — the key column fails the LONG
    conversion); the read keeps those ROWS, nulls their typed
    columns, and lands the raw line in `_corrupt_record` — dirty
    input becomes auditable data instead of either a job kill
    (FAILFAST) or silent loss (DROPMALFORMED). At 100 TB this is the
    only sane default: quarantine-and-count first, decide later; the
    corrupt-record column also IS the quarantine export. The report
    is the one-row reconciliation: total rows in = parsed + corrupt,
    plus the integer-cents sum over the clean rows only."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    line = F.when(
        F.col("o_orderkey") % 13 == 0,
        F.concat(F.lit("X"), F.col("o_orderkey"), F.lit(",bad")),
    ).otherwise(F.concat(F.col("o_orderkey"), F.lit(","), cents))
    path = _tmp("malformed_csv", sf_dir)
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    parsed = (
        spark.read.schema("o_orderkey LONG, cents LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        ).alias("n_bad"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("cents"))).alias(
            "good_cents"
        ),
    )


def _rebalance_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side relation for `aqe_rebalance_write`, exposed for
    the plan test: REBALANCE(l_returnflag) on a 3-value key whose
    groups are wildly uneven."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    return li.hint("rebalance", "l_returnflag")


@query(
    "aqe_rebalance_write",
    oracle="""
        SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents_total
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_aqe_rebalance_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE-rebalanced write: the REBALANCE(cols) hint asks AQE to
    even out partition sizes at runtime — small shuffle outputs
    coalesce, oversized ones SPLIT (unlike repartition(col), which
    pins one task per value and reintroduces skew whenever one key
    dominates, and unlike a fixed repartition(n), which can't react
    to actual sizes). This is the production answer to skewed-write
    file sizing at 100 TB: target-size output files regardless of key
    distribution, chosen from runtime statistics, not guesses. The
    written files reload and reconcile exactly against the source
    (per-flag counts + integer-cents totals);
    `tests/test_plan_quality.py` pins RebalancePartitions in the
    write plan."""
    path = _tmp("rebalance_li", sf_dir)
    _rebalance_input(spark, sf_dir).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy(
        F.col("l_returnflag").cast("string").alias("l_returnflag")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents_total"),
    )


@query(
    "insert_overwrite_dynamic_partitions",
    oracle="""
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS mon,
                   o_orderstatus, o_totalprice
            FROM orders),
        seed AS (
            SELECT mon, count(*) AS n_orders,
                   round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         / 100.0, 2) AS rev,
                   'full' AS src
            FROM m GROUP BY mon),
        rebuilt AS (
            SELECT mon, count(*) AS n_orders,
                   round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         / 100.0, 2) AS rev,
                   'final_only' AS src
            FROM m WHERE o_orderstatus = 'F' AND mon >= '1999-01'
            GROUP BY mon)
        SELECT * FROM rebuilt
        UNION ALL
        SELECT * FROM seed
        WHERE mon NOT IN (SELECT mon FROM rebuilt)
    """,
)
def q_insert_overwrite_dynamic_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic-partition INSERT OVERWRITE — the incremental
    re-materialization pattern: a partitioned reporting table is
    seeded once over all months, then a later pass recomputes ONLY
    the partitions it produces rows for (here: months >= 1999-01,
    final-status orders only), leaving every other partition's files
    untouched.

    `spark.sql.sources.partitionOverwriteMode=dynamic` is the whole
    mechanism: OVERWRITE deletes just the partitions present in the
    incoming result, not the table. At 100 TB this is how a daily
    pipeline replaces yesterday's partitions in an hourly-bucketed
    corpus without rewriting (or even listing) years of history —
    the write cost tracks the delta, and concurrent readers of
    untouched months never see a missing file. Months where the
    rebuild has no rows (no 'F' orders) retain their seed row — the
    oracle's NOT IN mirrors exactly that file-level semantic.

    The catalog side (external partitioned `saveAsTable`, re-read
    via `spark.table`) complements `bucketed_join`'s persisted
    bucket layout and the path-based `sink_*` roundtrips.
    """
    import re as _re

    tag = _re.sub(r"[^A-Za-z0-9]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    tbl = f"hwcs_dyn_orders_{tag}"
    path = _tmp(f"orders_dyn_{tag}", sf_dir)
    o = load_table(spark, sf_dir, "orders")
    monthly = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        "o_orderstatus",
        "o_totalprice",
    )
    seed = (
        monthly.groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                / 100.0,
                2,
            ).alias("rev"),
        )
        .select("n_orders", "rev", F.lit("full").alias("src"), "mon")
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        seed.write.mode("overwrite")
        .option("path", path)
        .partitionBy("mon")
        .saveAsTable(tbl)
    )
    monthly.createOrReplaceTempView(f"{tbl}_src")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.sql(f"""
            INSERT OVERWRITE TABLE {tbl} PARTITION (mon)
            SELECT count(*) AS n_orders,
                   round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         / 100.0, 2) AS rev,
                   'final_only' AS src,
                   mon
            FROM {tbl}_src
            WHERE o_orderstatus = 'F' AND mon >= '1999-01'
            GROUP BY mon
        """)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.table(tbl).select("mon", "n_orders", "rev", "src")


@query(
    "binary_asset_ingest",
    oracle="""
        SELECT lang, source,
               CAST(1 AS BIGINT) AS n_files,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(length(text) + 1) AS BIGINT) AS n_bytes
        FROM documents GROUP BY lang, source
    """,
)
def q_binary_asset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-asset ingestion via the `binaryFile` source — the Spark
    surface a multimodal pipeline uses to pull image/audio/document
    FILES into BinaryType rows (content + path/length metadata),
    with recursiveFileLookup + pathGlobFilter doing the directory
    walk engine-side.

    The fixture is self-made so the oracle stays exact: documents are
    laid out one text FILE per (lang, source) corpus — repartition on
    the partition keys puts each group on exactly one task, so
    partitionBy writes exactly one part file per value pair (pinned
    in the output's n_files). The binaryFile read-back then proves
    content fidelity in-engine: per file, decoded byte length and
    line count must equal what the source relation says that corpus
    serializes to (ASCII corpus: bytes == chars + one newline per
    row; the write sorts by doc_id within groups, making file bytes
    deterministic, though this report is order-insensitive anyway).

    Scale: binaryFile scans parallelize over files; each row carries
    its whole payload, so the 100 TB discipline is files ~ tens of
    MB (webdataset-style shards), never millions of tiny objects
    (driver listing) and never GB blobs (row > task memory). The
    lang/source path layout keeps partition pruning available via
    pathGlobFilter — the asset-side analog of hive partitioning.
    """
    d = load_table(spark, sf_dir, "documents")
    path = _tmp("doc_assets", sf_dir)
    (
        d.select("lang", "source", "doc_id", F.col("text").alias("value"))
        .repartition("lang", "source")
        .sortWithinPartitions("doc_id")
        .select("lang", "source", "value")
        .write.mode("overwrite")
        .partitionBy("lang", "source")
        .text(path)
    )
    back = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "false")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    txt = F.decode(F.col("content"), "UTF-8")
    return (
        back.select(
            F.regexp_extract("path", r"lang=([^/]+)", 1).alias("lang"),
            F.regexp_extract("path", r"source=([^/]+)", 1).alias("source"),
            F.col("length").alias("n_bytes_file"),
            (F.size(F.split(txt, "\n")) - 1).alias("n_lines_file"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_lines_file").alias("n_lines"),
            F.sum("n_bytes_file").alias("n_bytes"),
        )
    )


@query(
    "sink_roundtrip_avro",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def q_sink_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → Avro (deflate) → read back. Avro is the ROW-oriented
    interchange format of the sink matrix (vs columnar parquet/ORC):
    schema'd, splittable, append-friendly — what Kafka payloads and
    streaming hand-offs speak, chosen when whole-row write/forward
    throughput beats columnar scan pruning.

    Environment note this query proves rather than stubs: pip
    pyspark 4.1 ships the Avro classes inside spark-sql but not the
    service-registration jar, so `format("avro")` fails while the
    fully-qualified class name works — `sources.lakehouse.
    avro_format()` resolves whichever spelling the runtime supports
    (and raises the jar hint only when the classes are truly
    absent). At 100 TB avro sinks shard like any file sink; the
    columnar formats stay the ANALYTICS layout — avro is for
    interchange, not scans."""
    from hadoop_wordcount_spark.sources.lakehouse import avro_format

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = _tmp("nation_avro", sf_dir)
    fmt = avro_format(spark)
    n.write.mode("overwrite").format(fmt).option(
        "compression", "deflate"
    ).save(path)
    return spark.read.format(fmt).load(path)


@query(
    "writer_v2_lifecycle",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders GROUP BY o_orderpriority
    """,
)
def q_writer_v2_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameWriterV2 lifecycle against a REAL V2 catalog — the
    round-7 gate ("needs Delta/Iceberg jars") shrunk by an
    environment find: Spark's own JDBCTableCatalog backed by the
    Derby jars it BUNDLES for the Hive metastore is a fully V2
    catalog, no extra jars. Exercises createOrReplace() (priority
    groups '1'/'2'), append() (the rest), overwrite(lit(True))
    (truncate-and-replace with the full recomputed aggregate), then
    reads the table back through the catalog — the oracle is the
    plain GROUP BY the final overwrite wrote. overwritePartitions()
    alone stays gated: JDBC tables are unpartitioned, so dynamic
    partition overwrite is structurally inapplicable (probe:
    UNSUPPORTED_FEATURE.TABLE_OPERATION "does not support dynamic
    overwrite"); its v1 equivalent is covered by
    insert_overwrite_dynamic_partitions.

    Scale: jdbc:derby:memory is the single-JVM stand-in; on a
    cluster the SAME writeTo() code targets a shared catalog
    (Postgres/MySQL JDBC, or Iceberg/Delta where
    overwritePartitions() lights up). The aggregate crossing into
    the catalog is |priorities| rows — the fact table never leaves
    Spark."""
    from hadoop_wordcount_spark.sources.lakehouse import jdbc_catalog

    cat = jdbc_catalog(spark)
    sf = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # Per-SF TABLE names inside ONE shared Derby database: Spark
    # caches the catalog instance per session at first use, so a
    # per-SF *URL* would silently keep pointing at the first SF's
    # database (and foreachBatch clones resolve the catalog fresh,
    # splitting reads from writes). One DB + per-SF tables is immune.
    tbl = f"{cat}.ns.orders_priority_agg_{sf}"

    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "total_cents"
        ),
    )
    head = agg.filter(F.col("o_orderpriority") < F.lit("3"))
    tail = agg.filter(F.col("o_orderpriority") >= F.lit("3"))
    head.writeTo(tbl).createOrReplace()
    tail.writeTo(tbl).append()
    # Truncate-and-replace with the recomputed full aggregate: the
    # V2 overwrite path (SupportsTruncate) — NOT a re-read of the
    # table being overwritten (self-overwrite is undefined).
    agg.writeTo(tbl).overwrite(F.lit(True))
    return spark.table(tbl)


@query(
    "jdbc_pushdown_read",
    oracle="""
        SELECT CAST(n_regionkey AS INT) AS n_regionkey,
               CAST(count(*) AS BIGINT) AS n_nations,
               min(n_name) AS first_name
        FROM nation WHERE n_regionkey >= 2
        GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def q_jdbc_pushdown_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC V2 READ path with predicate pushdown: land the nation dim
    in the bundled-Derby JDBC catalog (idempotent createOrReplace —
    the `writer_v2_lifecycle` write side), then read it back THROUGH
    the catalog with a filter — Spark's V2 JDBC scan compiles the
    predicate into the remote WHERE clause (PushedFilters in the
    scan, pinned by pytest), so only qualifying rows ever cross the
    wire. The serving-store round trip every pipeline with an
    operational database does: warehouse → JDBC table → filtered
    read-back, with the database doing the filtering.

    Determinism: pure integer keys and counts plus min(name) —
    nothing floating anywhere; output column names are re-aliased
    lowercase because Derby stores identifiers uppercase.

    Scale: the dim is dimension-sized by design (this is the
    serving-store pattern, not a fact-export path); pushdown means
    the JDBC source ships the WHERE (and, with pushDownAggregate,
    the GROUP BY) to the database instead of scanning the table into
    the cluster."""
    from hadoop_wordcount_spark.sources.lakehouse import jdbc_catalog
    from hadoop_wordcount_spark.sources.tables import load_table

    cat = jdbc_catalog(spark)
    # Per-SF table name like every other JDBC-catalog sink (the
    # orders_priority_agg_{sf} convention): nation is SF-invariant
    # today, but an untagged name would cross-contaminate the shared
    # Derby catalog the moment the pattern is copied for a scaling
    # table or run concurrently across sf_dirs.
    sf = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tbl = f"{cat}.ns.nation_pd_{sf}"
    n = load_table(spark, sf_dir, "nation")
    n.writeTo(tbl).createOrReplace()
    t = spark.table(tbl).filter(F.col("n_regionkey") >= 2)
    return (
        t.groupBy(F.col("n_regionkey").cast("int").alias("n_regionkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )
