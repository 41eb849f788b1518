"""Vector math over array<float> embedding columns — pure built-in
Catalyst expressions (zip_with / aggregate), no UDFs, so similarity
scans stay inside whole-stage codegen.

Accumulation is sequential left-to-right in double precision (both
``F.aggregate`` here and DuckDB's list functions in the oracles), so
cross-engine results agree to far more digits than the 4 we round to.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
