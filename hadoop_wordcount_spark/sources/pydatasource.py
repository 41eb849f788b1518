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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
