"""Query registry.

Every implemented operator registers here with a name, a callable
``(spark, sf_dir) -> DataFrame`` and (where ANSI-SQL-expressible) a
DuckDB oracle SQL string over the pre-registered table views
(``region nation customer supplier part orders lineitem events
documents embeddings``). ``__spark_entry__.py`` re-exports these for
the driver's correctness harness.

Verification-priority order is LEDGER-DRIVEN, not hand-maintained.
The driver's correctness harness walks ``queries()`` in iteration
order under a ~50-row budget, so the order decides which entries get
a fresh hard-signal row each round. Rounds 8 and 9 both shipped
hand-curated ``_PRIORITY`` heads whose arithmetic went stale within
one round (r8 verdict #6, r9 verdict #1 + ADVICE). The fix is to
stop hand-writing it: ``load_all()`` reads the committed
``CORRECTNESS_r*.json`` ledgers and orders oracled entries by

    (latest fully-green ledger round, md5(name))

ascending — so never-ledgered entries (round 0) and entries whose
LATEST row was not fully green (requeued as round 0) always iterate
first, the stalest-rowed entries fill the rest of the budget, and
the md5 tiebreak interleaves families so a bursty host steal-window
cannot contaminate a whole family at once (the r04
alphabetical-block anomaly, see DEVNOTES). Rows-only entries (no
ANSI oracle by design) stay permanently last — a driver slot spent
on an ``err: no_oracle`` row is a wasted slot (r7 verdict #5).
``tests/test_registry_budget.py`` asserts the ordering invariants.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Rows-only entries (no ANSI oracle by design — GK sketch, LSH
# recall-bounded, HLL-sketch profile). Their assurance comes from
# pytest error/recall bounds, not driver slots; a driver row for them
# can only ever read `err: no_oracle`. Permanently last in iteration
# order (r7 verdict #5). Kept as documentation; the tail is DERIVED
# from ORACLES membership so a new oracle-less entry can't silently
# jump the queue.
_ROWS_ONLY_TAIL: list[str] = [
    "value_percentiles",
    "approx_distinct_words",
    "sim_search_lsh",
    "profile_table_sketch",
]


def _row_green(row: object) -> bool:
    """True iff a driver ledger row is a full oracled pass
    (rows + schema + hash matched, no error). Anything else —
    including the designed ``err: no_oracle`` rows — does not count
    as verification coverage for ordering purposes."""
    if not isinstance(row, dict):
        return False
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def _ledger_rounds(repo_root: Optional[str] = None) -> dict[str, int]:
    """Latest ledger round per query name from CORRECTNESS_r*.json.

    An entry whose LATEST row was not fully green maps to 0 — it
    requeues at the head of next round's budget instead of waiting
    out a full rotation. Missing/unparsable files are skipped (the
    registry must still import on a bare checkout)."""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, object]] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row)
    return {
        name: (rnd if _row_green(row) else 0)
        for name, (rnd, row) in latest.items()
    }


def priority_key(name: str, rounds: dict[str, int]) -> tuple[int, str]:
    """Sort key for oracled entries: stalest ledger round first
    (never-ledgered / latest-row-failed = 0), md5(name) tiebreak to
    interleave families within a round cohort."""
    return (rounds.get(name, 0), hashlib.md5(name.encode()).hexdigest())


def load_all() -> None:
    """Import every operator module so its queries register, then
    reorder the registry: oracled entries stalest-ledger-round first
    (md5-interleaved within a cohort), rows-only entries last."""
    # Imports are side-effecting (decorator registration).
    from hadoop_wordcount_spark.operators import (  # noqa: F401
        corpus,
        dedup,
        graph,
        multimodal,
        pandas_ops,
        relational,
        sampling,
        similarity,
        sinks,
        sketches,
        text_analysis,
        wordcount,
    )
    from hadoop_wordcount_spark.sources import pydatasource  # noqa: F401
    from hadoop_wordcount_spark.streaming import stream_queries  # noqa: F401

    rounds = _ledger_rounds()
    oracled = sorted(
        (n for n in QUERIES if n in ORACLES),
        key=lambda n: priority_key(n, rounds),
    )
    rows_only = [n for n in QUERIES if n not in ORACLES]
    ordered = {n: QUERIES[n] for n in oracled}
    ordered.update({n: QUERIES[n] for n in rows_only})
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)
