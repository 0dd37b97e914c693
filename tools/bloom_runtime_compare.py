"""Measure Spark's NATIVE runtime bloom-filter join against the
hand-built ``operators/bloom.py`` path (VERDICT r4 item 5).

Scenario: selective supplier dimension (s_acctbal > threshold) semi-
joins the lineitem fact. Four strategies:

  smj          plain sort-merge semi join, no pruning (baseline)
  native-bloom SMJ + spark.sql.optimizer.runtime.bloomFilter (Spark
               injects might_contain(bloom_filter_agg(build side)) into
               the fact scan filter at planning time)
  hand-bloom   operators/bloom.bloom_prune_semi_join (8 KiB bitmap
               aggregated distributed-side, probed as literal codegen
               bit arithmetic on the scan, exact semi join closes)
  broadcast    broadcast hash semi join (what AQE picks when the dim
               fits; the 100 TB case this tool models is when it does
               NOT)

Native injection preconditions (why the confs below are set): the
application side must be a SHUFFLE join branch (broadcast joins don't
qualify — the broadcast already prunes) and its scan must exceed
``applicationSideScanSizeThreshold`` (default 10GB — exactly tuned for
the 100 TB case; lowered here because the fixture is small).

Usage: PYTHONPATH=/root/repo python tools/bloom_runtime_compare.py [sf_dir]
Prints a table; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_database_import_spark.operators.bloom import bloom_prune_semi_join
from kafka_database_import_spark.session import EngineConfig, get_spark
from kafka_database_import_spark.sources.readers import load_table

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def _timed(df):
    t0 = time.monotonic()
    n = df.count()
    return n, time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(EngineConfig(master="local[8]", shuffle_partitions=32))

    def fact():
        return load_table(spark, sf_dir, "lineitem")

    def dim():
        return load_table(spark, sf_dir, "supplier").filter(
            F.col("s_acctbal") > 9000
        )

    rows = []
    fact().count()  # warm the scan (JIT + page cache) before any timing

    # broadcast reference (default confs)
    n, s = _timed(
        fact().join(
            F.broadcast(dim()), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
    )
    rows.append(("broadcast", n, s, ""))

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        n, s = _timed(
            fact().join(
                dim(), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
            )
        )
        rows.append(("smj", n, s, ""))

        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = fact().join(
            dim(), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        injected = "might_contain" in plan
        n, s = _timed(df)
        rows.append(("native-bloom", n, s, f"injected={injected}"))

        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        n, s = _timed(
            bloom_prune_semi_join(fact(), "l_suppkey", dim(), "s_suppkey")
        )
        rows.append(("hand-bloom", n, s, "8KiB literal bitmap"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        for k in _BLOOM_CONFS:
            spark.conf.unset(k)

    print(f"\nsf_dir={sf_dir}")
    print(f"{'strategy':<14}{'rows':>10}{'sec':>9}  note")
    for name, n, s, note in rows:
        print(f"{name:<14}{n:>10}{s:>9.2f}  {note}")


if __name__ == "__main__":
    main()
