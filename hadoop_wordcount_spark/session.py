"""SparkSession factory.

The reference's driver builds a mutable Hadoop ``Job`` property bag
(``WordCount.java:30-42``) and notoriously drops the CLI-provided
``Configuration`` (``new Job()`` instead of ``new Job(getConf())``,
``WordCount.java:30``). Here the session is the single configuration
point and ``extra_conf`` is actually honored.

Scale notes (100 TB design):
- ``spark.sql.adaptive.enabled`` — AQE re-plans shuffles at runtime
  (partition coalescing, skew-join splitting); essential at scale and
  harmless locally.
- ``spark.sql.shuffle.partitions`` — sized to cores locally; on a
  1000-executor cluster this should be ~2-3x total cores (or left to
  AQE's ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``).
- Arrow enabled so the few Pandas-UDF operators batch-transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "hadoop_wordcount_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 48g on the 128 GiB bench host: the single local-mode JVM
        # holds execution memory for 32 concurrent tasks PLUS every
        # session-lifetime shared cache, broadcast, and streaming
        # memory-sink across a 125-query sweep — at 8g that pressure
        # showed up as multi-second GC storms striking random bands of
        # consecutive bench queries (2-8x inflation, unreproducible in
        # a fresh session). Override with SPARK_DRIVER_MEMORY.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
