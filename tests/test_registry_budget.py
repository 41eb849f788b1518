"""Driver-budget hygiene (r8 verdict #6, r9 verdict #1).

The driver's correctness harness walks ``queries()`` in iteration
order under a ~50-row budget. Rounds 8 and 9 both proved that a
hand-curated priority head goes stale within one round, so
``registry.load_all()`` now derives the order from the committed
CORRECTNESS_r*.json ledgers: oracled entries iterate in ascending
latest-green-ledger-round order (never-ledgered or latest-row-FAILED
= round 0, i.e. first), md5-interleaved within a round cohort, and
rows-only entries are permanently last. These tests recompute the
ledger state independently and assert every invariant, so the head
can never silently drift from the budget again.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_rows() -> dict[str, tuple[int, dict]]:
    """Independent re-read of the ledgers: name -> (round, row)."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row)
    return latest


def _epoch() -> dict:
    try:
        data = json.load(open(os.path.join(REPO, "LEDGER_EPOCH.json")))
        return data if isinstance(data, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def _stale_round(name: str, latest: dict[str, tuple[int, dict]]) -> int:
    if name not in latest:
        return 0
    rnd, row = latest[name]
    green = isinstance(row, dict) and bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )
    if not green:
        return 0
    # Plan-epoch rule (r11 verdict #1): a green row only stays fresh
    # while the entry's implementation fingerprint matches the
    # committed snapshot taken when that row landed.
    from hadoop_wordcount_spark import registry

    if _epoch().get(name) != registry.entry_fingerprint(name):
        return 0
    return rnd


def _loaded_registry():
    from hadoop_wordcount_spark import registry

    registry.load_all()
    return registry


def test_oracled_entries_iterate_stalest_first():
    """The general invariant (r9 verdict #1): oracled entries iterate
    in ascending latest-green-ledger-round order, so the driver's
    50-slot budget always lands on the entries that most need a fresh
    hard-signal row."""
    registry = _loaded_registry()
    latest = _latest_rows()
    order = [n for n in registry.QUERIES if n in registry.ORACLES]
    seq = [(_stale_round(n, latest), n) for n in order]
    bad = [
        (a, b)
        for a, b in zip(seq, seq[1:])
        if a[0] > b[0]
    ]
    assert not bad, (
        f"oracled entries out of stalest-first order (round, name) "
        f"pairs where a later entry is staler: {bad[:10]}"
    )


def test_never_ledgered_entries_form_prefix():
    """Special case of stalest-first that caught the r8 bug: an entry
    with no ledger row at all must iterate before every entry that
    has one."""
    registry = _loaded_registry()
    order = list(registry.QUERIES.keys())
    latest = _latest_rows()
    never = {
        n for n in order if n not in latest and n in registry.ORACLES
    }
    if not never:
        return  # every oracled entry has a row — covered by the
        # general stalest-first test above
    last_never = max(order.index(n) for n in never)
    misordered = [
        n
        for n in order[: last_never + 1]
        if n in latest and n in registry.ORACLES
    ]
    assert not misordered, (
        f"{len(never)} never-ledgered oracled entries do not form a "
        f"prefix of queries() order; these ledgered entries iterate "
        f"before the last never-ledgered one ({order[last_never]!r}): "
        f"{misordered[:10]}"
    )


def test_failed_latest_row_requeues_first():
    """A row that is not fully green must map to round 0 (requeue at
    the head) — unit check on the registry's row classifier."""
    from hadoop_wordcount_spark import registry

    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    assert registry._row_green(green)
    for broken in (
        {**green, "rows_match": False},
        {**green, "schema_match": False},
        {**green, "hash_match": False},
        {**green, "err": "no_oracle"},
        "not-a-dict",
        None,
    ):
        assert not registry._row_green(broken), broken


def test_ledger_rounds_requeue_failed_latest(tmp_path):
    """End-to-end on a synthetic ledger directory: latest-green wins;
    a latest FAILED row resets the entry to round 0 even if an older
    green row exists."""
    from hadoop_wordcount_spark import registry

    g = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    bad = {**g, "hash_match": False}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_stays": g, "q_regressed": g})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_regressed": bad, "q_new": g})
    )
    rounds = registry._ledger_rounds(repo_root=str(tmp_path))
    assert rounds == {"q_stays": 1, "q_regressed": 0, "q_new": 2}


def test_epoch_mismatch_requeues_entry_first(monkeypatch):
    """Plan-epoch requeue (r11 verdict #1): tampering one entry's
    snapshotted fingerprint must move it into the round-0 prefix of
    the iteration order, ahead of every epoch-fresh ledgered entry."""
    from hadoop_wordcount_spark import registry

    registry.load_all()
    latest = _latest_rows()
    epoch = _epoch()
    # Pick a ledgered, snapshotted entry that currently sorts LATE.
    victim = next(
        n
        for n in reversed(list(registry.QUERIES))
        if n in registry.ORACLES and n in epoch and n in latest
    )
    tampered = {**epoch, victim: "not-the-real-fingerprint"}
    monkeypatch.setattr(
        registry, "_epoch_fingerprints", lambda repo_root=None: tampered
    )
    registry.load_all()
    try:
        order = [n for n in registry.QUERIES if n in registry.ORACLES]
        fresh_positions = [
            order.index(n)
            for n in order
            if n != victim
            and _stale_round(n, latest) > 0
        ]
        assert order.index(victim) < min(fresh_positions), (
            f"{victim!r} (tampered fingerprint) iterates after an "
            f"epoch-fresh ledgered entry"
        )
    finally:
        monkeypatch.undo()
        registry.load_all()


def test_unsnapshotted_entries_precede_snapshotted():
    """An oracled entry absent from LEDGER_EPOCH.json has no proof its
    latest row certified its current code — it must iterate before
    every snapshotted-and-matching entry. (Today this pins the nine
    r11-rewritten operators into the r12 driver head; the invariant
    stays valid after they land fresh rows and get re-snapshotted.)"""
    registry = _loaded_registry()
    latest = _latest_rows()
    epoch = _epoch()
    order = [n for n in registry.QUERIES if n in registry.ORACLES]
    requeued = [
        n for n in order if n in latest and _stale_round(n, latest) == 0
    ]
    if not requeued:
        return
    last_requeued = max(order.index(n) for n in requeued)
    jumped = [
        n
        for n in order[: last_requeued + 1]
        if _stale_round(n, latest) > 0
    ]
    assert not jumped, (
        f"epoch-fresh entries iterate before requeued ones: {jumped[:10]}"
    )
    # And the snapshot file itself must exist and cover the fresh set.
    assert epoch, "LEDGER_EPOCH.json missing or empty"


def test_rows_only_entries_are_last():
    registry = _loaded_registry()
    order = list(registry.QUERIES.keys())
    rows_only = [n for n in order if n not in registry.ORACLES]
    # Rows-only entries (no oracle by design) must occupy the very
    # tail — a driver slot spent on an `err: no_oracle` row is wasted.
    assert order[len(order) - len(rows_only):] == rows_only


def test_head_is_exactly_the_stalest_cohorts():
    """The first 50 oracled entries must be a 50-element prefix of
    the global stalest-first sort — i.e. no staler entry is left
    outside the driver budget while a fresher one sits inside it."""
    registry = _loaded_registry()
    latest = _latest_rows()
    oracled = [n for n in registry.QUERIES if n in registry.ORACLES]
    expected = sorted(
        oracled,
        key=lambda n: (
            _stale_round(n, latest),
            hashlib.md5(n.encode()).hexdigest(),
        ),
    )
    assert oracled[:50] == expected[:50]
