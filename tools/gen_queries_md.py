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

    # Keep README's headline catalog counts in lockstep with queries()
    # (the r6 verdict flagged a hand-maintained "130 queries" that
    # drifted when w20 landed). The block between the snapshot markers
    # is regenerated here and must not be edited by hand.
    rows_only = sorted(set(qs) - set(oracles))
    snapshot = (
        "<!-- catalog-snapshot:begin -->\n"
        f"**Catalog: {len(qs)} queries** — {len(oracles)} with DuckDB "
        f"value-hash oracles, {len(rows_only)} rows-only "
        f"({', '.join(rows_only)}). The driver adjudicates the first 50 "
        f"entries per round; entry 50 is `{list(qs)[49]}`. Full list "
        "with per-query gate mode and semantics: `QUERIES.md`; full "
        "per-query benchmark timings: `BENCH_FULL.json`.\n"
        "<!-- catalog-snapshot:end -->"
    )
    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    import re

    patched, n = re.subn(
        r"<!-- catalog-snapshot:begin -->.*?<!-- catalog-snapshot:end -->",
        snapshot,
        readme,
        flags=re.S,
    )
    if n != 1:
        raise SystemExit("README.md catalog-snapshot markers missing")
    with open(readme_path, "w") as f:
        f.write(patched)
    print(f"patched README.md catalog snapshot ({len(qs)} queries)")


if __name__ == "__main__":
    main()
