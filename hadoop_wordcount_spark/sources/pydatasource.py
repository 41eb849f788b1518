"""Spark 4 Python DataSource API: a deterministic synthetic source.

The reference reads only text files via TextInputFormat
(``WordCount.java:34-38``); this engine's other sources cover
parquet/csv/json/orc. This module exercises the MODERN extension
point — ``pyspark.sql.datasource.DataSource`` — by implementing a
partitioned synthetic generator source ('docgen'), the Spark-4-native
way to plug any external system (REST APIs, bespoke formats, queues)
into the DataFrame planner: the reader declares real InputPartitions,
so the scan parallelizes like any file source.

The generated content is a pure function of (n, parts) — doc ids
0..n-1, each row tagged with the partition that produced it — so the
scan is fully DuckDB-oracle-checkable (range() reproduces it), unlike
typical side-effecting sources. Rows DO cross the Python boundary
(the API's contract); use it for systems without a JVM connector, not
for data that parquet can hold — the same slow-path honesty as the
pandas_ops escape hatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from hadoop_wordcount_spark.registry import query

_N = 1000
_PARTS = 8
_STEP = (_N + _PARTS - 1) // _PARTS


class _DocRange(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


class SyntheticDocReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", _N))
        self.parts = int(options.get("parts", _PARTS))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _DocRange(p, p * step, min(self.n, (p + 1) * step))
            for p in range(self.parts)
            if p * step < self.n
        ]

    def read(self, partition: _DocRange):
        for i in range(partition.start, partition.end):
            yield (i, partition.part_id)


class SyntheticDocSource(DataSource):
    """format name 'docgen'; options: n (rows), parts (partitions)."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return "doc_id BIGINT, part_id INT"

    def reader(self, schema) -> SyntheticDocReader:
        return SyntheticDocReader(self.options)


_registered: set[str] = set()


def _ensure_registered(spark: SparkSession) -> None:
    key = spark.sparkContext.applicationId
    if key not in _registered:
        spark.dataSource.register(SyntheticDocSource)
        _registered.add(key)


@query(
    "python_datasource_scan",
    oracle=f"""
        WITH g AS (
            SELECT range AS doc_id,
                   CAST(range // {_STEP} AS INT) AS part_id
            FROM range(0, {_N}))
        SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(doc_id) AS min_id,
               max(doc_id) AS max_id,
               CAST(count(DISTINCT part_id) AS BIGINT) AS n_parts
        FROM g GROUP BY bucket
    """,
)
def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the 'docgen' Python data source ({_N} rows over {_PARTS}
    planned InputPartitions) and aggregate per md5 bucket — proving
    the custom source's rows, schema, AND partition planning flow
    through the normal DataFrame pipeline (the per-bucket distinct
    part_id count checks that every bucket drew from multiple
    partitions, i.e. the scan really was parallel).

    The oracle reproduces the generator arithmetic with range() —
    a Python data source whose content is a pure function of its
    options is hash-checkable like any table. sf_dir is unused: this
    query checks an extension point, not a dataset."""
    _ensure_registered(spark)
    df = (
        spark.read.format("docgen")
        .option("n", str(_N))
        .option("parts", str(_PARTS))
        .load()
    )
    return df.groupBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.countDistinct("part_id").alias("n_parts"),
    )


# --- Spark 4 Python STREAMING data source (SimpleDataSourceStreamReader) ---

_STREAM_TOTAL = 2000
_STREAM_CHUNK = 500


class SyntheticEventStreamReader:
    """SimpleDataSourceStreamReader for 'eventgen': a bounded,
    deterministic event stream. Offsets are plain dicts
    ({"pos": int}); each micro-batch advances by _STREAM_CHUNK until
    _STREAM_TOTAL, after which latest == current and the stream is
    drained. Content is a pure function of the row index, so replays
    (readBetweenOffsets) are exact and the settled result is
    oracle-checkable."""

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _rows(start: int, end: int):
        # A LIST, not a generator: the prefetching driver-side cache
        # pickles the returned batch (generators are unpicklable).
        return [(i, i % 10, float((i * 7) % 100)) for i in range(start, end)]

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + _STREAM_CHUNK, _STREAM_TOTAL)
        # iter(list): the API wants an ITERATOR here; the prefetcher
        # materializes it into a picklable cache itself.
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventStreamSource(DataSource):
    """format name 'eventgen' (streaming): deterministic bounded
    event stream for exercising the Spark 4 Python streaming source
    API end to end."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id BIGINT, bucket INT, value DOUBLE"

    def simpleStreamReader(self, schema):
        return SyntheticEventStreamReader()


_stream_registered: set[str] = set()


def _ensure_stream_registered(spark: SparkSession) -> None:
    key = spark.sparkContext.applicationId
    if key not in _stream_registered:
        spark.dataSource.register(SyntheticEventStreamSource)
        _stream_registered.add(key)


@query(
    "python_stream_source",
    oracle=f"""
        WITH g AS (
            SELECT range AS event_id,
                   CAST(range % 10 AS INT) AS bucket,
                   CAST((range * 7) % 100 AS DOUBLE) AS value
            FROM range(0, {_STREAM_TOTAL}))
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value,
               min(event_id) AS min_id, max(event_id) AS max_id
        FROM g GROUP BY bucket
    """,
)
def q_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python data source (Spark 4
    `SimpleDataSourceStreamReader`): readStream over the 'eventgen'
    source — 2000 deterministic events arriving in 500-row
    micro-batch chunks via the offset protocol (initialOffset /
    read(start) / readBetweenOffsets for replay) — aggregated per
    bucket in complete mode and drained with an availableNow pass.
    The batch twin (`python_datasource_scan`) proved custom PLANNED
    partitions; this proves the streaming half of the same extension
    point: offset tracking, micro-batch advance, and
    replay-determinism, settled to the same hash-checkable aggregate
    a batch engine computes.

    At scale this is the pattern for queue-like systems with no JVM
    connector (REST feeds, vendor SDKs): rows cross the Python
    boundary (slow path, like every Python source), but state and
    aggregation stay JVM-side. sf_dir is unused: this checks an
    extension point, not a dataset."""
    import uuid

    _ensure_stream_registered(spark)
    events = spark.readStream.format("eventgen").load()
    agg = events.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    # availableNow snapshots the offset after ONE read() call and
    # would drain a single chunk; a continuous trigger +
    # processAllAvailable() drains until offsets stop advancing —
    # which they do, at _STREAM_TOTAL (bounded stream). Same settled
    # semantics as run_to_memory, different drain protocol.
    name = f"mem_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# --- Spark 4 Python DataSource WRITER ('jsonldir' format) -----------------
#
# The write-side twin of the reader above: a custom batch sink that
# lands one JSON-lines file per task under options['path'], with the
# full two-phase commit protocol — tasks write side files and return
# WriterCommitMessages; the driver's commit() publishes them by
# atomic rename (abort() removes the side files). That is exactly the
# job-commit discipline a real external sink (object store, queue,
# bespoke format) needs to stay exactly-once under task retries.


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str):
        self.tmp_path = tmp_path
        self.final_path = final_path


class JsonlDirWriter(DataSourceWriter):
    """One JSONL file per task with driver-side two-phase commit.

    ASSUMES A SHARED FILESYSTEM between driver and executors: tasks
    write `_tmp-*.jsonl` side files with local `open()` and the
    driver's `commit()` publishes them with `os.replace` on the same
    paths — correct in local mode (and on NFS-style shared mounts);
    a multi-node object-store deployment would instead publish via
    the store's rename/multipart-commit API inside each task and make
    commit() a manifest write. "Exactly-once" here is exactly-once
    over PUBLISHED files: a task that dies before returning its
    commit message leaves an orphan `_tmp-*.jsonl` that abort() never
    hears about (Spark only reports messages it received), so
    commit() sweeps stale `_tmp-*` files after publishing — readers
    are safe either way because Spark skips `_`-prefixed files."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        uid = uuid.uuid4().hex
        tmp = os.path.join(self.path, f"_tmp-{uid}.jsonl")
        final = os.path.join(self.path, f"part-{pid:05d}-{uid}.jsonl")
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _JsonlCommit(tmp, final)

    def commit(self, messages):
        import glob
        import os

        published = set()
        for m in messages:
            os.replace(m.tmp_path, m.final_path)
            published.add(m.tmp_path)
        # Sweep orphans from tasks that died before reporting a commit
        # message (abort() never sees those) — see class docstring.
        for stale in glob.glob(os.path.join(self.path, "_tmp-*.jsonl")):
            if stale not in published:
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlDirSink(DataSource):
    """format name 'jsonldir'; option: path (target directory)."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)


def _ensure_sink_registered(spark: SparkSession) -> None:
    key = ("sink", spark.sparkContext.applicationId)
    if key not in _registered:
        spark.dataSource.register(JsonlDirSink)
        _registered.add(key)


@query(
    "python_datasource_sink",
    oracle="""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY lang
    """,
)
def q_python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents through the custom Python DataSource WRITER
    ('jsonldir'), read the landed JSON-lines back, and aggregate —
    the round trip proves schema, task parallelism, and the
    two-phase commit (side file + driver rename) all flow through
    the Spark 4 Python write path. The oracle aggregates the source
    table directly: sink + read-back must be lossless.

    Scale honesty: rows cross the Python boundary per the API's
    contract — this is for systems WITHOUT a JVM connector; parquet
    sinks stay on the `operators/sinks.py` JVM path. Each task
    streams its partition to one file: no driver collect, no
    cross-task coordination until the rename-only commit."""
    import os
    import shutil
    import tempfile

    from hadoop_wordcount_spark.sources.tables import load_table

    _ensure_sink_registered(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = os.path.join(
        tempfile.gettempdir(), "hwcs_sinks", sf_dir.strip("/").replace("/", "_"),
        "pyds_jsonl",
    )
    shutil.rmtree(path, ignore_errors=True)
    d.write.format("jsonldir").option("path", path).mode("append").save()
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        os.path.join(path, "*.jsonl")
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


class _JsonlStreamCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, part_id: int):
        self.tmp_path = tmp_path
        self.part_id = part_id


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch JSONL stream sink with exactly-once publishes.

    Same shared-filesystem contract as `JsonlDirWriter` (the batch
    twin). Exactly-once mechanics differ because the STREAMING
    commit is per micro-batch and must be idempotent under batch
    REPLAY (a restart re-runs the last unacknowledged batch from the
    checkpoint): tasks write `_tmp-*` side files, and commit()
    publishes them under DETERMINISTIC names
    `batch-{batchId:05d}-part-{pid:05d}.jsonl` — a replayed batch
    re-derives the same names and os.replace overwrites its own
    previous (uncommitted-to-the-checkpoint) output instead of
    duplicating it. abort() removes the batch's side files; commit()
    sweeps orphans from dead tasks, exactly like the batch writer."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            self.path, f"_tmp-{uuid.uuid4().hex}.jsonl"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _JsonlStreamCommit(tmp, pid)

    def commit(self, messages, batchId):
        import glob
        import os

        published = set()
        finals = set()
        for m in messages:
            if m is None:
                continue
            final = os.path.join(
                self.path, f"batch-{batchId:05d}-part-{m.part_id:05d}.jsonl"
            )
            os.replace(m.tmp_path, final)
            published.add(m.tmp_path)
            finals.add(final)
        for stale in glob.glob(os.path.join(self.path, "_tmp-*.jsonl")):
            if stale not in published:
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass
        # A replayed micro-batch may run with FEWER partitions than
        # the failed prior attempt (e.g. a shuffle-partition config
        # change across restart); os.replace then only overwrites the
        # low-pid names, leaving the prior attempt's higher-pid
        # batch-*.jsonl files to double-count on readback. Sweep any
        # file for THIS batchId that this commit did not just publish.
        for prior in glob.glob(
            os.path.join(self.path, f"batch-{batchId:05d}-part-*.jsonl")
        ):
            if prior not in finals:
                try:
                    os.remove(prior)
                except FileNotFoundError:
                    pass

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlDirStreamSink(DataSource):
    """format name 'jsonlstream'; option: path (target directory)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlstream"

    def streamWriter(self, schema, overwrite: bool) -> JsonlDirStreamWriter:
        return JsonlDirStreamWriter(self.options)


def _ensure_stream_sink_registered(spark: SparkSession) -> None:
    key = ("stream_sink", spark.sparkContext.applicationId)
    if key not in _registered:
        spark.dataSource.register(JsonlDirStreamSink)
        _registered.add(key)


@query(
    "python_stream_sink",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY event_type
    """,
)
def q_python_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING write through a custom Python DataSource — the
    fourth quadrant of the Python DataSource matrix (batch read:
    `python_datasource_scan`; batch write: `python_datasource_sink`;
    stream read: `python_stream_source`; stream write: this). A real
    Structured Streaming query drains the events fixture through
    `writeStream.format("jsonlstream")` with an availableNow
    trigger; the landed micro-batch files are read back and
    aggregated — the oracle aggregates the source table directly, so
    the sink must be lossless and duplicate-free across batches.

    Scale notes: each task streams its partition straight to a side
    file (no driver collect); the only coordination is the
    rename-only per-batch commit, and replay idempotence comes from
    deterministic (batchId, partitionId) file names — see
    `JsonlDirStreamWriter`. Rows cross the Python boundary by the
    API's nature; JVM sinks remain the default path."""
    import os
    import shutil
    import tempfile

    from hadoop_wordcount_spark.streaming.stream_queries import events_stream

    _ensure_stream_sink_registered(spark)
    base = os.path.join(
        tempfile.gettempdir(), "hwcs_sinks",
        sf_dir.strip("/").replace("/", "_"), "pyds_stream",
    )
    out = os.path.join(base, "out")
    cp = os.path.join(base, "checkpoint")
    shutil.rmtree(base, ignore_errors=True)
    ev = events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    q = (
        ev.writeStream.format("jsonlstream")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.schema(
        "event_id long, event_type string, value double"
    ).json(os.path.join(out, "*.jsonl"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )
