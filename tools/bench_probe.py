"""Standalone per-query timing probe for bench-noise triage.

When tools/bench_compare.py flags a regression, the first question is
whether the code got slower or the host did (this sandbox exhibits
whole-process freezes and ±1.5-2x swings on sub-2-second queries, with
a different regression set per full bench run — measured in round 11).
This probe answers it without a 20-minute full bench: it times ONLY
the named queries, in a fresh session, with N back-to-back passes
each, so JIT/codegen warm-up and session-accumulation effects are
visible as a convergence trend across passes rather than folded into
one number.

    python tools/bench_probe.py x75_compression_table q21_sole_returner
    python tools/bench_probe.py --passes 5 --sf /root/testdata/sf0.1 x9_embed_neardup

Interpretation guide (from the round-11 x75 investigation): a query
whose passes converge downward toward the old number (e.g. 7.7 → 6.4
→ 6.0 against an old 5.5) is paying warm-up/session pressure, not a
code regression; a query that is flat-slower across all passes in a
fresh session deserves a plan diff.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("queries", nargs="+", metavar="QUERY")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ns = ap.parse_args()
    argv, passes, sf = ns.queries, ns.passes, ns.sf
    if passes < 1:
        ap.error("--passes must be >= 1")

    from financial_market_data_analysis_spark import get_spark

    spark = get_spark(app_name="bench-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    unknown = [n for n in argv if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf
    for name in argv:
        qs[name](spark, warm).count()  # codegen/footer warm-up
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            qs[name](spark, sf).count()
            ts.append(round(time.perf_counter() - t0, 2))
        trend = "converging" if len(ts) > 1 and ts[-1] < ts[0] * 0.9 else "flat"
        print(f"{name}: {ts} min={min(ts)} ({trend})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
