"""Per-query JOB-level profiler (optimization guide §1: measure first).

At fixture scale (sf0.1 ≤ 11 MB/table) wall-clock is dominated by fixed
per-job overheads — scheduling, planning, state-store commits, staging
writes — not data volume. This tool answers "where do a query's seconds
go" by running each named query in a fresh tuned session with the Spark
event log enabled, then parsing the log into a per-job timeline:

    python tools/profile_queries.py x73_leakage_free_split t22_stream_five_feed_join

Output per query: wall seconds, number of Spark jobs, per-job duration /
task count / task time, and the job description (queries label phases via
setJobDescription where they do). Streaming queries additionally show
micro-batch structure (each micro-batch is its own job set).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/spark-events-profile"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", metavar="QUERY")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=1,
                    help="timed passes after the warm-up pass")
    ns = ap.parse_args()

    os.makedirs(EVDIR, exist_ok=True)
    from financial_market_data_analysis_spark import get_spark

    spark = get_spark(
        app_name="profile-queries",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    unknown = [n for n in ns.queries if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    # Warm-up at the smallest scale so codegen/footers aren't billed.
    warm = "/root/testdata/sf0.001"
    for name in ns.queries:
        try:
            qs[name](spark, warm if os.path.isdir(warm) else ns.sf).count()
        except Exception as exc:
            print(f"warm-up {name} failed: {exc}", file=sys.stderr)

    marks = {}
    for name in ns.queries:
        best = None
        for _ in range(max(1, ns.passes)):
            spark.sparkContext.setJobGroup(name, name)
            t0w = time.time()
            t0 = time.perf_counter()
            qs[name](spark, ns.sf).count()
            el = time.perf_counter() - t0
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            if best is None or el < best[0]:
                best = (el, t0w, t0w + el)
        marks[name] = best
        print(f"timed {name}: {best[0]:.3f}s")

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Parse the event log. Spark 4 writes a rolling-v2 DIRECTORY
    # (eventlog_v2_<appId>/events_N_<appId>...); older writers a flat file.
    import glob as _glob

    paths = [p for p in (os.path.join(EVDIR, app_id),) if os.path.isfile(p)]
    if not paths:
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        if os.path.isdir(d):
            paths = sorted(_glob.glob(os.path.join(d, "events_*")))
    if not paths:
        cands = [p for p in os.listdir(EVDIR) if app_id in p]
        paths = [os.path.join(EVDIR, cands[0])] if cands else []
    if not paths:
        print(f"no event log for {app_id}", file=sys.stderr)
        return 1

    jobs = {}        # job id -> dict
    stage_tasks = {} # stage id -> [task ms]
    stage_names = {}
    def _lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "group": props.get("spark.jobGroup.id"),
                    "desc": (props.get("spark.job.description") or "")[:110],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0)
                                  for s in ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                stage_tasks.setdefault(sid, []).append(dur)
            elif e == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                stage_names[si.get("Stage ID")] = si.get("Stage Name", "")

    for name, (wall, t0w, t1w) in marks.items():
        # Streaming micro-batch jobs run on the stream's own thread with
        # the STREAM's runId as their job group — attribute any job that
        # starts inside the query's wall-clock window and isn't labelled
        # as a different profiled query.
        mine = sorted(
            (j for j in jobs.values() if "end" in j
             and (j.get("group") == name
                  or (j.get("group") not in marks
                      and t0w <= j["start"] <= t1w))),
            key=lambda j: j["start"],
        )
        jt = sum(j["end"] - j["start"] for j in mine)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(mine)} jobs, "
              f"job time {jt:.2f}s, gap (driver/python) {wall - jt:.2f}s")
        for j in mine:
            tt = sum(ms for s in j["stages"] for ms in stage_tasks.get(s, []))
            print(f"  job {j['end']-j['start']:6.2f}s  stages={len(j['stages'])}"
                  f" tasks={j['ntasks']:4d} tasktime={tt/1000:6.2f}s  {j['desc'][:90]}")
            if tt > 1000:
                for s in j["stages"]:
                    st = sum(stage_tasks.get(s, []))
                    if st > 500:
                        print(f"      stage {s}: {st/1000:6.2f}s "
                              f"{len(stage_tasks.get(s, []))} tasks  "
                              f"{stage_names.get(s, '')[:80]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
