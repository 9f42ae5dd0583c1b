"""Regenerate QUERIES.md from the live driver contract.

Run after adding/reordering queries:  python tools/gen_queries_md.py
"""

from __future__ import annotations

import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = """# Query catalog

One row per `queries()` entry in `__spark_entry__.py` (the driver
verification contract), in dict insertion order (the order the driver
adjudicates): the callable's home module, the correctness gate it
passes (DuckDB value-hash oracle, or rows-only for non-SQL-expressible
ops), and one-line semantics from the docstring.

| query | module | gate | semantics |
|---|---|---|---|
"""


def main() -> None:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    rows = []
    for name, fn in qs.items():
        mod = fn.__module__
        if mod.endswith("extensions"):
            mod = "fmda.plans.extensions"
        gate = "oracle" if name in oracles else "rows-only"
        doc = (inspect.getdoc(fn) or "").split("\n\n")[0].replace("\n", " ")
        if len(doc) > 140:
            doc = doc[:137] + "..."
        rows.append(f"| {name} | {mod} | {gate} | {doc} |")
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows to {out}; entry 50 = {list(qs)[49]}")


if __name__ == "__main__":
    main()
