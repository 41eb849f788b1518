"""Simulate the round driver's verify pass end-to-end in a fresh
process: smoke `entry(spark)`, then run every `queries()` entry at
sf0.01 against its `oracle_sql()` via DuckDB (row count + sorted
column names + order-insensitive value multiset), and print a
CORRECTNESS-style JSON summary.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_wordcount_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim")

    t0 = time.perf_counter()
    n_entry = entrymod.entry(spark).count()
    smoke = {"rows": n_entry, "ok": n_entry > 0,
             "sec": round(time.perf_counter() - t0, 2)}

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                mismatch = compare_query(spark, sf_dir, name, queries[name], oracles[name])
                status = "match" if mismatch is None else f"MISMATCH: {mismatch}"
            else:
                n = queries[name](spark, sf_dir).count()
                status = f"rows-only ({n} rows)"
        except Exception as exc:
            status = f"ERROR: {type(exc).__name__}: {exc}"[:200]
        results[name] = {"status": status, "sec": round(time.perf_counter() - t0, 2)}

    bad = {k: v for k, v in results.items()
           if not (v["status"] == "match" or v["status"].startswith("rows-only"))}
    print(json.dumps({
        "sf_dir": sf_dir,
        "entry_smoke": smoke,
        "n_queries": len(queries),
        "n_oracled": len(oracles),
        "n_match": sum(1 for v in results.values() if v["status"] == "match"),
        "n_rows_only": sum(1 for v in results.values()
                           if v["status"].startswith("rows-only")),
        "failures": bad,
    }, indent=2))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
