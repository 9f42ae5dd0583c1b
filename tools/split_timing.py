"""Split each query's wall-clock into plan-CONSTRUCTION vs EXECUTION.

Optimization guide §1 (measure first) applied to the per-query fixed
overhead of the ~130-query sub-second tail: ``bench.py`` times
``fn(spark, sf_dir).count()``, which pays (a) Python-side DataFrame
construction — Py4J round trips plus per-op eager analysis — and
(b) the actual Spark jobs. The two have entirely different fixes
(generated-SQL builders / fewer ops vs fewer jobs), so measure them
separately:

    python tools/split_timing.py                # all queries
    python tools/split_timing.py x75_compression_table x30_ann_recall

Construction time for queries that run eager checkpoints INSIDE the
builder (most of the heavy tier) includes those jobs by design — the
split is "time until the final DataFrame handle exists" vs "the final
count()", which is still the boundary that tells you whether a fix
belongs at plan-build or at execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    only = set(sys.argv[1:]) or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from financial_market_data_analysis_spark import get_spark

    spark = get_spark(app_name="split-timing")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
        except Exception as exc:  # keep the sweep going
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        rows.append((name, round(t1 - t0, 3), round(t2 - t1, 3)))

    rows.sort(key=lambda r: -(r[1]))
    total_c = sum(r[1] for r in rows)
    total_e = sum(r[2] for r in rows)
    print(f"{'query':<34} {'construct':>9} {'execute':>9}")
    for name, c, e in rows:
        print(f"{name:<34} {c:>9.3f} {e:>9.3f}")
    print(f"{'TOTAL':<34} {total_c:>9.3f} {total_e:>9.3f}")
    with open("/tmp/split_timing.json", "w") as fh:
        json.dump(
            {n: {"construct": c, "execute": e} for n, c, e in rows}, fh
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
