"""Distributed global ranking primitives.

`Window.orderBy(...)` with NO partition spec is the classic scale
trap: Spark plans a single-partition Exchange and ranks the whole
input on ONE task. Fine for vocab-sized inputs; fatal for
corpus-sized ones (the 1x-64x probe measured curriculum_shards'
unpartitioned ntile at alpha ~1.5 — the serial sort's n log n on one
core, with spill).

The canonical distributed recipe, exact and deterministic under any
cluster layout, is implemented here once and shared:

1. `repartitionByRange` on the order keys — Spark's range exchange
   (a sampled boundary pass + scatter, the same machinery behind
   global orderBy) puts partition p strictly before partition p+1;
2. rank WITHIN each partition (parallel local sorts);
3. add per-partition offsets — a prefix sum over the per-partition
   COUNTS (<= shuffle.partitions rows, broadcast back).

global rank = local rank + offset(partition): exact row_number / an
exact prefix sum, with every corpus-sized stage parallel. The order
columns must be a TOTAL order (unique tiebreak) for cross-engine
determinism — same contract the single-partition form already had.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid"
_LRN = "__rank_lrn"
_OFF = "__rank_off"

# Strategy threshold, in ROWS of the rank's (caller-projected) input:
# at or below it the plain single-partition window wins — a one-task
# sort of a dimension-sized table costs milliseconds, while the
# distributed recipe pays two exchanges + a cache + a broadcast of
# fixed overhead. Above it the one-task sort is the bottleneck the
# recipe exists to remove. The pick is made from a runtime count of
# the projected input — the same runtime-stats philosophy as AQE and
# autoBroadcastJoinThreshold (and the count pass is O(scan), tiny
# next to the rank it sizes). Callers pass small_threshold=0 to pin
# the distributed path (tests do, to exercise it at toy scale).
SMALL_RANK_INPUT = 60_000


def _with_partition_offsets(
    df: DataFrame, order_cols: list[Column], extra_sum: str | None = None
) -> DataFrame:
    """Range-partition df on order_cols, attach `_PID`, local rank
    `_LRN`, and broadcast count-offsets `_OFF` (plus, when
    `extra_sum` names a column, its per-partition prefix sums as
    `_OFF + 's'`)."""
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    r = df.repartitionByRange(parts, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    local = Window.partitionBy(_PID).orderBy(*order_cols)
    # Cache the ranked rows: the offsets branch AND the main branch
    # both read them — without this, every global_* call re-evaluates
    # its whole input twice, and CHAINED calls (orders_rfm_segments
    # ntiles three times) multiply to 2^depth evaluations. The cached
    # set carries only the rank's input columns (callers project
    # first), and bench cold mode clears it per query.
    r = r.withColumn(_LRN, F.row_number().over(local)).cache()
    aggs = [F.count(F.lit(1)).alias("_n")]
    if extra_sum is not None:
        aggs.append(F.sum(extra_sum).alias("_s"))
    counts = r.groupBy(_PID).agg(*aggs)
    prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    sel = [
        F.col(_PID),
        F.coalesce(F.sum("_n").over(prev), F.lit(0)).cast("long").alias(_OFF),
    ]
    if extra_sum is not None:
        sel.append(
            F.coalesce(F.sum("_s").over(prev), F.lit(0)).alias(_OFF + "s")
        )
    offsets = counts.select(*sel)  # <= `parts` rows: broadcast + tiny window
    return r.join(F.broadcast(offsets), _PID)


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    small_threshold: int = SMALL_RANK_INPUT,
) -> DataFrame:
    """Exact global row_number over a total order, every stage
    parallel past the size threshold. Equivalent to
    ``row_number().over(Window.orderBy(*order_cols))``."""
    if small_threshold and df.count() <= small_threshold:
        return df.withColumn(
            out, F.row_number().over(Window.orderBy(*order_cols))
        )
    r = _with_partition_offsets(df, order_cols)
    return r.withColumn(out, (F.col(_LRN) + F.col(_OFF)).cast("int")).drop(
        _PID, _LRN, _OFF
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int,
    out: str = "bucket",
    small_threshold: int = SMALL_RANK_INPUT,
) -> DataFrame:
    """Exact SQL ntile(n) over a total order. Past the size threshold
    it avoids the single-partition window: global row_number + the
    ntile size rule (first n_total mod n buckets get one extra
    row)."""
    if small_threshold and df.count() <= small_threshold:
        return df.withColumn(
            out, F.ntile(n_buckets).over(Window.orderBy(*order_cols))
        )
    r = _with_partition_offsets(df, order_cols)
    # n_total attaches as a broadcast scalar (an unbounded window
    # frame would itself be a single-partition window).
    n_total = r.agg(F.count(F.lit(1)).cast("long").alias("_t"))
    r = r.crossJoin(F.broadcast(n_total))
    rn = F.col(_LRN) + F.col(_OFF)
    base = F.floor(F.col("_t") / n_buckets)
    rem = F.col("_t") % n_buckets
    cut = rem * (base + 1)
    bucket = F.when(
        rn <= cut, F.floor((rn - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((rn - 1 - cut) / F.greatest(base, F.lit(1))) + 1)
    return r.withColumn(out, bucket.cast("int")).drop(_PID, _LRN, _OFF, "_t")


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    val: str,
    out: str = "cum",
    small_threshold: int = SMALL_RANK_INPUT,
) -> DataFrame:
    """Exact global running sum of `val` over a total order (rows
    unbounded-preceding through current), every stage parallel past
    the size threshold."""
    if small_threshold and df.count() <= small_threshold:
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out, F.sum(val).over(w))
    r = _with_partition_offsets(df, order_cols, extra_sum=val)
    local = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return r.withColumn(
        out, F.sum(val).over(local) + F.col(_OFF + "s")
    ).drop(_PID, _LRN, _OFF, _OFF + "s")
