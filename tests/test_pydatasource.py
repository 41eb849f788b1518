"""Pins for the Spark 4 Python DataSource ('docgen') beyond the
oracle hash: partition planning and rerun determinism."""

from __future__ import annotations

from hadoop_wordcount_spark import registry
from hadoop_wordcount_spark.sources import pydatasource
from tests.conftest import SF_SMALL

registry.load_all()


def _load(spark, n, parts):
    pydatasource._ensure_registered(spark)
    return (
        spark.read.format("docgen")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


def test_docgen_rows_and_partition_planning(spark):
    df = _load(spark, 100, 4)
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(100))
    # partition tags match the planned ranges (25 ids per partition)
    for r in rows:
        assert r["part_id"] == r["doc_id"] // 25


def test_docgen_uneven_split_covers_all_rows(spark):
    df = _load(spark, 10, 3)  # step 4 -> partitions of 4, 4, 2
    assert sorted(r["doc_id"] for r in df.collect()) == list(range(10))


def test_docgen_rerun_is_deterministic(spark):
    a = registry.QUERIES["python_datasource_scan"](spark, SF_SMALL).collect()
    b = registry.QUERIES["python_datasource_scan"](spark, SF_SMALL).collect()
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    assert sum(r["n"] for r in a) == pydatasource._N
    # every md5 bucket drew from several planned partitions
    assert all(r["n_parts"] > 1 for r in a)
