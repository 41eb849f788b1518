"""Rewrite SCALE.md's standing-numbers table from BENCH.json.
Usage: python tools/update_scale_table.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "### Standing numbers (sf0.1, local[32], seconds)"


def main() -> None:
    with open(os.path.join(ROOT, "BENCH.json")) as f:
        bench = json.load(f)
    q = dict(sorted(bench["queries"].items()))
    names = list(q)
    half = (len(names) + 1) // 2
    lines = [MARK, "", "| query | sec | | query | sec |", "|---|---|---|---|---|"]
    for i in range(half):
        left = f"{names[i]} | {q[names[i]]}"
        right = (
            f"{names[half + i]} | {q[names[half + i]]}"
            if half + i < len(names)
            else " | "
        )
        lines.append(f"| {left} | | {right} |")
    lines += [
        "",
        f"Total wall-clock, all {len(names)} queries sequentially: "
        f"**{bench['value']}s**.",
        "",
    ]
    path = os.path.join(ROOT, "SCALE.md")
    with open(path) as f:
        content = f.read()
    head = content.split(MARK)[0]
    with open(path, "w") as f:
        f.write(head + "\n".join(lines))
    print(f"SCALE.md table updated ({len(names)} queries, {bench['value']}s)")


if __name__ == "__main__":
    main()
