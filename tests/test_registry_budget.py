"""Driver-budget hygiene (r8 verdict #6).

The driver's correctness harness walks ``queries()`` in iteration
order under a ~50-row budget. Entries that have never received a
driver ledger row must therefore form a strict prefix of that order —
otherwise they silently fall outside the budget, which is exactly how
15 round-8 entries went un-ledgered (r8 verdict "What's wrong" #3).

This test recomputes "never ledgered" from the CORRECTNESS_r*.json
files on disk and asserts the prefix property, so the _PRIORITY head
arithmetic can never go stale again.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledgered_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            names.update(data.keys())
    return names


def test_never_ledgered_entries_form_prefix():
    from hadoop_wordcount_spark import registry

    registry.load_all()
    order = list(registry.QUERIES.keys())
    ledgered = _ledgered_names()
    never = {
        n
        for n in order
        if n not in ledgered and n in registry.ORACLES
    }
    if not never:
        return  # every oracled entry has a row — nothing to order
    # Every never-ledgered oracled entry must appear before every
    # already-ledgered oracled entry.
    last_never = max(order.index(n) for n in never)
    misordered = [
        n
        for n in order[: last_never + 1]
        if n in ledgered and n in registry.ORACLES
    ]
    assert not misordered, (
        f"{len(never)} never-ledgered oracled entries do not form a "
        f"prefix of queries() order; these ledgered entries iterate "
        f"before the last never-ledgered one ({order[last_never]!r}): "
        f"{misordered[:10]}"
    )


def test_rows_only_entries_are_last():
    from hadoop_wordcount_spark import registry

    registry.load_all()
    order = list(registry.QUERIES.keys())
    rows_only = [n for n in order if n not in registry.ORACLES]
    # Rows-only entries (no oracle by design) must occupy the very
    # tail — a driver slot spent on an `err: no_oracle` row is wasted.
    assert order[len(order) - len(rows_only):] == rows_only
