#!/usr/bin/env python
"""Capture .explain("formatted") for catalog queries into plans/<KDIS_PLANS_DIR, default r15>/.

Usage: python tools/capture_plans.py <suffix> [name ...]

With no names, captures every HEADLINE query from bench.py. Lifecycle
gates (COLD create/commit/refresh sequences) execute side effects while
building their frame; the captured plan is the final returned frame's,
which is what the driver times through the noop sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from kafka_database_import_spark.plans.registry import all_queries
    from kafka_database_import_spark.session import EngineConfig, get_spark

    spark = get_spark(EngineConfig())
    catalog = all_queries()
    if not names:
        names = [n for n in HEADLINE if n in catalog]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("KDIS_PLANS_DIR", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = catalog.get(name)
        if q is None:
            print(f"skip {name}: not in catalog", file=sys.stderr)
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture failures loudly but keep going
            plan = f"CAPTURE FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
