#!/usr/bin/env python
"""Stage-level profiler for the bench headline queries (guide §1: measure
first). Runs each query exactly like bench.py (warm-up + timed noop write)
with the Spark event log enabled, then parses the log to attribute time to
stages: per query it prints job/stage counts, per-stage wall-clock, task
time, shuffle bytes, and the stage's first line of the callsite.

Usage: python tools/bench_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark_graft_evlog"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench

    names = sys.argv[2:] or bench.HEADLINE

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from db_writer_redshift_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"TIMED::{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        print(f"[profile] {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log (plain file, or rolling eventlog_v2 dir) ----
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR)]
        path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]
    job_of_stage: dict[int, int] = {}
    job_desc: dict[int, str] = {}
    job_span: dict[int, list[float]] = {}
    stages: dict[int, dict] = {}
    task_time: dict[int, float] = defaultdict(float)
    task_count: dict[int, int] = defaultdict(int)
    fetch_wait: dict[int, float] = defaultdict(float)
    def iter_lines():
        for p in parts:
            if p.endswith(".zstd"):
                import zstandard

                with open(p, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    import io

                    for line in io.TextIOWrapper(reader):
                        yield line
            else:
                with open(p) as fh:
                    yield from fh

    for line in iter_lines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            job_desc[jid] = ev.get("Properties", {}).get(
                "spark.job.description", ""
            )
            job_span[jid] = [ev.get("Submission Time", 0) / 1e3, 0.0]
            for s in ev.get("Stage Infos", []):
                job_of_stage[s["Stage ID"]] = jid
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in job_span:
                job_span[jid][1] = ev.get("Completion Time", 0) / 1e3
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "wall": ((comp - sub) / 1e3) if sub and comp else 0.0,
                "name": si.get("Stage Name", "")[:90],
                "ntask": si.get("Number of Tasks", 0),
            }
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            ti = ev.get("Task Info", {})
            task_time[sid] += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
            task_count[sid] += 1
            tm = ev.get("Task Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            fetch_wait[sid] += srm.get("Fetch Wait Time", 0) / 1e3

    by_query: dict[str, list[int]] = defaultdict(list)
    for jid, desc in job_desc.items():
        if desc.startswith("TIMED::"):
            by_query[desc[7:]].append(jid)

    for name in names:
        jids = sorted(by_query.get(name, []))
        sids = sorted(s for s, j in job_of_stage.items() if j in jids and s in stages)
        gap = 0.0
        if jids:
            spans = sorted(job_span[j] for j in jids)
            run = sum(b - a for a, b in spans)
            total = spans[-1][1] - spans[0][0]
            gap = total - run
        print(f"\n=== {name}: {timings[name]:.3f}s wall, {len(jids)} jobs, "
              f"{len(sids)} stages, inter-job gap {gap:.3f}s ===")
        for sid in sids:
            st = stages[sid]
            print(
                f"  stage {sid:4d} wall={st['wall']:6.3f}s tasks={st['ntask']:3d} "
                f"taskTime={task_time[sid]:7.3f}s fetchWait={fetch_wait[sid]:5.3f}s  {st['name']}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
