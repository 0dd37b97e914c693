#!/usr/bin/env python
"""Profile one catalog query's wall time by Python call site.

Usage: python tools/profile_query.py <query_name> [sf_dir] [topN]

Runs the query once cold (like bench.py's timed runs: build the frame,
noop-sink it) under cProfile. Because every Spark action blocks in
py4j, cumulative time per engine function ~= wall time spent inside
that phase (commit, refresh, diff, ...) — exactly the breakdown the
optimization loop needs. Profiling overhead is small next to the
multi-second gates this is for.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from kafka_database_import_spark.plans.registry import all_queries
    from kafka_database_import_spark.session import EngineConfig, get_spark

    spark = get_spark(EngineConfig())
    q = all_queries()[name]

    # warm the JVM/codegen on the smallest fixture so the profile
    # measures the plan, not JIT (same methodology as bench.py)
    try:
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    prof.disable()
    wall = time.perf_counter() - t0

    buf = io.StringIO()
    st = pstats.Stats(prof, stream=buf)
    st.sort_stats("cumulative")
    st.print_stats(r"kafka_database_import_spark|bench|plans", top)
    print(f"=== {name} wall {wall:.2f}s (sf_dir={sf_dir}) ===")
    print(buf.getvalue())

    buf2 = io.StringIO()
    st2 = pstats.Stats(prof, stream=buf2)
    st2.sort_stats("tottime")
    st2.print_stats(20)
    print("=== top self-time (any module) ===")
    print(buf2.getvalue())


if __name__ == "__main__":
    main()
