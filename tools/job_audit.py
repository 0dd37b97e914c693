#!/usr/bin/env python
"""Audit every Spark job a catalog query runs: count, duration, call site.

Usage: python tools/job_audit.py <query_name> [sf_dir]

Runs the gate once cold (noop sink, after a sf0.001 warmup — bench.py's
methodology) and then dumps the driver's AppStatusStore job list for the
run window: one line per job with its duration and description/call
site.  Fixed per-job overhead on local mode is ~50-150 ms, so the job
COUNT times that overhead is the floor this report exposes; the listing
shows which engine phase schedules each job.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from kafka_database_import_spark.plans.registry import all_queries
    from kafka_database_import_spark.session import EngineConfig, get_spark

    spark = get_spark(EngineConfig())
    q = all_queries()[name]

    try:
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    first_job = sc._jsc.sc().dagScheduler().nextJobId()
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    last_job = sc._jsc.sc().dagScheduler().nextJobId()

    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        jid = j.jobId()
        if jid < first_job or jid >= last_job:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (
                comp.get().getTime() - sub.get().getTime()
            ) / 1000.0
        desc = j.description()
        dtxt = desc.get() if desc.isDefined() else j.name()
        rows.append((jid, dur, j.numTasks(), dtxt))
    rows.sort()
    print(f"=== {name}: {last_job - first_job} jobs, wall {wall:.2f}s ===")
    tot = 0.0
    for jid, dur, ntasks, dtxt in rows:
        tot += dur or 0.0
        print(f"job {jid:4d}  {dur if dur is not None else -1:7.3f}s  "
              f"tasks={ntasks:3d}  {dtxt[:140]}")
    print(f"sum of job durations: {tot:.2f}s of wall {wall:.2f}s "
          f"(gap = driver/py4j/planning time)")


if __name__ == "__main__":
    main()
