"""Line-oriented text sources — the reference's O1/O2 surface.

Reference semantics (SURVEY.md §2.1):
- O1: ``TextInputFormat`` reads ``(byte offset, line)`` records; the
  map body ignores the offset (``MapClass.java:17-27``), so we drop
  it and read lines as a single ``value: string`` column.
- O2: ``FileInputFormat.addInputPath`` (``WordCount.java:34``)
  accepts files, directories and globs; repeated paths union.
  ``spark.read.text(*paths)`` has identical semantics natively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Read text files/dirs/globs as one line per row (column ``value``).

    Multiple paths union, mirroring repeated ``addInputPath`` calls.
    Byte offsets are intentionally not surfaced (the reference never
    uses them); pass ``with_offsets=True`` nowhere — if offset
    fidelity is ever needed, use ``read_lines_with_offsets``.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(list(paths))


def read_lines_with_offsets(spark: SparkSession, path: str) -> DataFrame:
    """Fidelity variant exposing ``(offset, value)`` like TextInputFormat.

    Spark's text source does not expose byte offsets; a monotonic
    per-file line index is the closest distributed equivalent and is
    sufficient for provenance. Columns: ``file``, ``line_no``, ``value``.
    """
    df = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
    return df.withColumn("line_no", F.row_number().over(w) - F.lit(1))
