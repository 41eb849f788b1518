"""Table sources.

The reference reads text lines via the default ``TextInputFormat``
(selected by the *absence* of ``setInputFormatClass`` in
``WordCount.java:30-42``). Our engine's primary storage is parquet
(columnar scan + predicate pushdown + column pruning via Catalyst);
text/CSV/JSON line sources live in :mod:`.textfiles`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns and pushes filters."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events table to (``ts``: TIMESTAMP_NTZ in µs,
    ``ts_ns``: epoch nanoseconds as long) regardless of how the
    parquet file stores time. Two generations of driver testdata
    exist:

    - TIMESTAMP(NANOS): Spark's reader rejects it outright
      ([PARQUET_TYPE_ILLEGAL]), so read nanos as long (legacy conf)
      and rebuild ``ts`` truncated to microseconds — exactly what
      DuckDB's reader does.
    - timestamp[us] (isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ
      directly (and DuckDB a naive TIMESTAMP — same instant); derive
      ``ts_ns`` from it.
    - timestamp[us/ms] (isAdjustedToUTC=true): Spark reads TIMESTAMP
      (LTZ, an instant); take ``unix_micros`` — which reads the
      instant directly, independent of the session timezone — and
      rebuild the UTC wall-clock NTZ from it (a bare NTZ cast would
      silently read the session-LOCAL wall clock, making correctness
      rest on the session-TZ=UTC pin).

    The three dtypes are branched EXPLICITLY — an unrecognized ts
    dtype raises instead of falling through to a wrong default. All
    downstream arithmetic is timezone-free epoch math, and ``ts_ns``
    keeps integer time math (second-truncated gaps etc.)
    engine-portable.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_dtype = dict(df.dtypes)["ts"]
    ns_from_ntz = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
    ).cast("long")
    if ts_dtype == "bigint":  # TIMESTAMP(NANOS) as long
        return df.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts_ns div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    if ts_dtype == "timestamp_ntz":
        return df.withColumn("ts_ns", ns_from_ntz)
    if ts_dtype == "timestamp":  # instant-adjusted (LTZ) parquet
        return df.withColumn(
            "ts_ns", (F.unix_micros("ts") * 1000).cast("long")
        ).withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts_ns div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    raise TypeError(f"events.ts: unsupported parquet dtype {ts_dtype!r}")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
