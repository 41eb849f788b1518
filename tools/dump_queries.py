"""Regenerate QUERIES.md: the full registry reference — every query
name, its check mode, and the first docstring paragraph of its
implementation. Usage: python tools/dump_queries.py (no Spark needed)."""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_wordcount_spark import registry


def main() -> None:
    registry.load_all()
    out = [
        "# QUERIES — registry reference (auto-generated)\n",
        "Every entry of `__spark_entry__.queries()`. \"oracle\" = DuckDB "
        "hash-checked by the driver; \"rows-only\" = sketch/seeded/stateful "
        "op with a dedicated pytest bound instead. Run any of them with "
        "`python -m hadoop_wordcount_spark.run_query <name>`. "
        "Regenerate: `python tools/dump_queries.py`.\n",
    ]
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        mode = "oracle" if name in registry.ORACLES else "rows-only"
        doc = inspect.getdoc(fn) or ""
        first_para = doc.split("\n\n")[0].replace("\n", " ").strip()
        src = os.path.relpath(inspect.getsourcefile(fn), "/root/repo")
        line = inspect.getsourcelines(fn)[1]
        out.append(f"## `{name}` — {mode}\n\n`{src}:{line}` — {first_para}\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "QUERIES.md"), "w") as f:
        f.write("\n".join(out))
    print(f"QUERIES.md written ({len(registry.QUERIES)} queries)")


if __name__ == "__main__":
    main()
