"""Local mirror of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive value multiset. Strict equality —
queries are designed so both engines emit identical (pre-rounded)
values."""

from __future__ import annotations

import math

import duckdb

from hadoop_wordcount_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # queries pre-round; repr of the double is then engine-stable
        return repr(round(v, 6))
    if isinstance(v, bool):
        return repr(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return repr(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df_pandas[cols].iterrows()
    ]
    return cols, sorted(rows)


def compare_query(spark, sf_dir: str, name: str, query_fn, oracle: str):
    """Return None if Spark result matches the DuckDB oracle, else a
    human-readable mismatch description."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()

    s_cols, s_rows = _normalize(spark_pdf)
    o_cols, o_rows = _normalize(oracle_pdf)
    if s_cols != o_cols:
        return f"{name}: columns differ: spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return f"{name}: row counts differ: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        return f"{name}: values differ, first diffs (spark, oracle): {diffs}"
    return None
