"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi).

These formats need their runtime jars on the Spark classpath; this
container ships none of them, so the connectors are import-gated
stubs that fail loudly with setup instructions instead of failing
obscurely at plan time. The read/write API mirrors the parquet
sources so swapping formats is a one-line change for callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_HINT = (
    "Delta Lake requires the delta-spark package and "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension; "
    "not available in this environment."
)
_ICEBERG_HINT = (
    "Iceberg requires the iceberg-spark-runtime jar and a catalog "
    "config (spark.sql.catalog.*); not available in this environment."
)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(_DELTA_HINT) from exc
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "error") -> None:
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(_DELTA_HINT) from exc
    df.write.format("delta").mode(mode).save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not spark.conf.get("spark.sql.catalog.iceberg", None):
        raise NotImplementedError(_ICEBERG_HINT)
    return spark.read.table(table)
