"""10x scale sweep of the TPC-DS catalog (VERDICT r12 item 3).

Runs every tpcds_* query (or the names passed as argv) at sf0.1 and at
the 10x fixture (/tmp/sf1ish, built by tools/make_scale10.py), twice
per scale — the warm second run is quoted, the cold first absorbs
JIT/codegen — and prints one line per query plus a markdown table for
SCALE.md. A query whose 10x/sf0.1 warm ratio exceeds RATIO_FLAG is
flagged for the q75/q72 treatment (diagnose, rewrite, keep the oracle
as the equivalence proof). Run from anywhere:

    PYTHONPATH=/root/repo python tools/tpcds_scale_sweep.py [names...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

RATIO_FLAG = 4.0  # 10x data on 8 cores: >4x wall = super-linear smell

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .appName("tpcds-scale-sweep")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from kafka_database_import_spark.plans.registry import all_queries

names = sys.argv[1:]
qs = {
    n: q
    for n, q in all_queries().items()
    if n.startswith("tpcds_") and (not names or n in names)
}


def run(fn, sf):
    t0 = time.time()
    fn(spark, sf).count()
    return time.time() - t0


rows = []
for n, q in sorted(qs.items()):
    try:
        run(q.fn, "/root/testdata/sf0.1")
        t_small = run(q.fn, "/root/testdata/sf0.1")
        run(q.fn, "/tmp/sf1ish")
        t_big = run(q.fn, "/tmp/sf1ish")
        ratio = t_big / max(t_small, 1e-9)
        flag = "  <-- SUPER-LINEAR" if ratio > RATIO_FLAG else ""
        print(
            f"{n}: sf0.1 {t_small:.2f}s  10x {t_big:.2f}s  "
            f"ratio {ratio:.1f}x{flag}",
            flush=True,
        )
        rows.append((n, t_small, t_big, ratio))
    except Exception as e:
        print(f"{n}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
        rows.append((n, None, None, None))

print("\n| query | sf0.1 warm | 10x warm | ratio |")
print("|---|---|---|---|")
for n, a, b, r in rows:
    if a is None:
        print(f"| {n} | ERROR | | |")
    else:
        print(f"| {n} | {a:.2f} s | {b:.2f} s | {r:.1f}x |")
flagged = [n for n, a, b, r in rows if r and r > RATIO_FLAG]
print(json.dumps({"flagged": flagged, "n": len(rows)}))
