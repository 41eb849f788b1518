"""hadoop_wordcount_spark — a PySpark-native analytics engine.

Re-expresses the full capability surface of the reference repo
``xiaoliangg/hadoop-wordcount`` (classic Hadoop MapReduce WordCount,
see ``/root/reference/wordcount/src/main/java/.../WordCount.java``)
as idiomatic Spark DataFrame / SQL plans, then extends it with the
LLM-data-pipeline operators a 100 TB training-data pipeline needs:
deduplication, similarity search, multimodal columns and text
analysis.

Design principles (SURVEY.md §7):
- DataFrame/SQL first; Catalyst + Tungsten pick the physical plan.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs
  only where built-ins cannot express the semantics.
- Every operator registered in :mod:`hadoop_wordcount_spark.registry`
  with a DuckDB oracle where SQL-expressible.
"""

__version__ = "0.1.0"

from hadoop_wordcount_spark.session import get_spark  # noqa: F401
