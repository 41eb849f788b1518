"""Every oracle-backed registered query must hash-match its DuckDB
oracle — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hadoop_wordcount_spark import registry
from tests.oracle_utils import compare_query

registry.load_all()

ORACLED = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    mismatch = compare_query(
        spark, sf_dir, name, registry.QUERIES[name], registry.ORACLES[name]
    )
    assert mismatch is None, mismatch


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
