"""Capture ``.explain("formatted")`` output for named queries.

    python tools/capture_plans.py --out plans/r16 --suffix after q1 q2 ...

Writes ``<out>/<query>_<suffix>.txt``. Runs against sf0.1 by default.
Batch queries are planned without execution; streaming-harness queries
EXECUTE their stream during construction (their returned frame is a
memory-sink table), so their file carries the returned frame's plan
plus a note — job-level evidence for those lives in
tools/profile_queries.py output, quoted in OPTIMIZATION_r16.md.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ns = ap.parse_args()

    from financial_market_data_analysis_spark import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    os.makedirs(ns.out, exist_ok=True)
    for name in ns.queries:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, ns.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(ns.out, f"{name}_{ns.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as exc:
            print(f"{name} failed: {exc}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
