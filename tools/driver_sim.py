"""Driver sim: plain session, foreign cwd, full queries() sweep with
oracle hash-compare at sf0.01 via oracle.run_all, plus rows-only
execution of the non-oracled queries."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .appName("driver-sim")
    .getOrCreate()
)

import __spark_entry__ as E
from kafka_database_import_spark import oracle
from kafka_database_import_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.01"

n = E.entry(spark).count()
n2 = E.entry(spark).count()
print(f"entry: {n} rows (idempotent: {n == n2})", flush=True)

only = sys.argv[1:]
t0 = time.time()
results = oracle.run_all(
    spark, SF,
    names=[s for s in only] if only else None,
)
bad = [r for r in results if not r.match]
for r in results:
    if not r.match:
        print(f"MISMATCH {r.name}: spark={r.spark_rows} oracle="
              f"{r.oracle_rows} diff={r.sample_diff[:300]}", flush=True)
print(f"oracled: {len(results)} compared, {len(bad)} mismatches "
      f"({time.time()-t0:.0f}s)", flush=True)

# non-oracled queries: execute, count
t1 = time.time()
errs = []
no_oracle = 0
for name, q in all_queries().items():
    if q.oracle is not None or (only and name not in only):
        continue
    no_oracle += 1
    try:
        q.fn(spark, SF).count()
    except Exception as e:
        errs.append((name, f"{type(e).__name__}: {e}"))
        print(f"ERROR {name}: {errs[-1][1][:300]}", flush=True)
print(f"rows-only: {no_oracle} executed, {len(errs)} errors "
      f"({time.time()-t1:.0f}s)", flush=True)
print(f"VERDICT: {'OK' if not bad and not errs else 'FAIL'} "
      f"total {time.time()-t0:.0f}s")
