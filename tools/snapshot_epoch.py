"""Maintain LEDGER_EPOCH.json — the per-entry fingerprint snapshot
behind the registry's plan-epoch requeue (r11 verdict #1).

A driver ledger row certifies the implementation that existed when
the driver ran it. This tool records, per oracled entry, the content
fingerprint (``registry.entry_fingerprint``) the entry had when its
latest driver row landed. ``registry.load_all()`` requeues any
ledgered entry whose CURRENT fingerprint differs from (or is missing
from) the snapshot as round 0, so a rewrite re-verifies in the very
next driver budget instead of waiting out a full rotation.

Usage (run from the repo root, at ROUND START before editing code —
the working tree then equals what the driver just tested, so the
current fingerprints ARE the fingerprints the new rows certified):

  python tools/snapshot_epoch.py
      Refresh fingerprints for every entry with a green row in the
      NEWEST CORRECTNESS_r*.json (the rows the driver just landed),
      prune entries no longer registered, write the file.

  python tools/snapshot_epoch.py --bootstrap-all
      One-time initialisation: snapshot every entry that has a green
      ledger row in ANY round. Only honest immediately after a round
      whose code the driver fully re-verified locally (oracle-parity
      pytest green); entries known to have been rewritten SINCE their
      latest row must then be --requeue'd.

  python tools/snapshot_epoch.py --requeue NAME [NAME...]
      Drop entries from the snapshot so they requeue at round 0
      (use for helper/constant rewrites the fingerprint can't see).

  python tools/snapshot_epoch.py --refresh NAME [NAME...]
      Re-stamp entries at their current fingerprint WITHOUT a new
      driver row — an explicit assertion that an edit was
      non-behavioral (docstring/comment) or locally parity-verified.
      Record the rationale in DEVNOTES.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hadoop_wordcount_spark import registry  # noqa: E402


def _green_names_by_round() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        out[int(m.group(1))] = {
            n for n, row in data.items() if registry._row_green(row)
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bootstrap-all", action="store_true")
    ap.add_argument("--requeue", nargs="+", default=[])
    ap.add_argument("--refresh", nargs="+", default=[])
    args = ap.parse_args()

    registry.load_all()
    path = os.path.join(REPO, registry.EPOCH_FILE)
    try:
        epoch = json.load(open(path))
        assert isinstance(epoch, dict)
    except (OSError, json.JSONDecodeError, AssertionError):
        epoch = {}

    by_round = _green_names_by_round()
    oracled = {n for n in registry.QUERIES if n in registry.ORACLES}

    if args.bootstrap_all:
        targets = set().union(*by_round.values()) if by_round else set()
    elif by_round and not (args.requeue or args.refresh):
        targets = by_round[max(by_round)]
    else:
        targets = set()
    targets |= set(args.refresh)

    unknown = (targets | set(args.requeue)) - oracled
    if unknown:
        print(f"warning: not oracled/registered, skipped: {sorted(unknown)}")
        targets -= unknown

    for n in sorted(targets):
        epoch[n] = registry.entry_fingerprint(n)
    for n in args.requeue:
        epoch.pop(n, None)
    # Prune entries that left the registry.
    epoch = {n: fp for n, fp in epoch.items() if n in oracled}

    with open(path, "w") as f:
        json.dump(dict(sorted(epoch.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {registry.EPOCH_FILE}: {len(epoch)} snapshotted, "
        f"{len(oracled) - len(epoch)} of {len(oracled)} oracled entries "
        f"will requeue as round 0"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
