#!/usr/bin/env python
"""Measure the round-12 insert-only MIN/MAX fast path against the
pruned recompute it replaces (SCALE.md evidence).

Scenario: a MIN/MAX+COUNT/SUM view over a base snapshot built from the
fixture lineitem (group = l_suppkey % G). An append-only commit touches
a slice of groups; the same refresh is timed twice from identical
starting states — once auto (upgrades to ``delta_insert_only``) and
once ``strategy='recompute'`` (version-pinned base re-read). The base
is rebuilt between runs so both see cold manifests.

Usage: PYTHONPATH=/root/repo python tools/mv_insert_only_bench.py \
           [SF_DIR] [GROUPS]
Prints one JSON line {rows, groups, t_insert_only_s, t_recompute_s}.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from kafka_database_import_spark.session import EngineConfig, get_spark
from kafka_database_import_spark.sources.mv import MaterializedView
from kafka_database_import_spark.sources.readers import load_table
from kafka_database_import_spark.sources.snapshot import SnapshotTable


def build(spark, sf_dir: str, root: str, groups: int):
    shutil.rmtree(root, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % groups).alias("g"),
        F.col("l_orderkey").alias("k"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("x"),
    )
    base = SnapshotTable(f"{root}/base")
    base.commit(li)
    mv = MaterializedView.create(
        spark,
        base,
        f"{root}/mv",
        ["g"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "min", "col": "x", "alias": "mn"},
            {"fn": "max", "col": "x", "alias": "mx"},
        ],
    )
    # append-only window: new rows for ~1/8 of the groups
    base.commit(
        li.filter(F.col("g") % 8 == 0).withColumn("x", F.col("x") + 1)
    )
    return base, mv


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(EngineConfig())
    n_rows = load_table(spark, sf_dir, "lineitem").count()
    out = {"rows": n_rows, "groups": groups}
    for label, strategy in (
        ("t_insert_only_s", "auto"),
        ("t_recompute_s", "recompute"),
    ):
        root = tempfile.mkdtemp(prefix="kdis_mvbench_")
        base, mv = build(spark, sf_dir, root, groups)
        t0 = time.perf_counter()
        res = mv.refresh(spark, strategy=strategy)
        out[label] = round(time.perf_counter() - t0, 3)
        out[f"strategy_{strategy}"] = res["strategy"]
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
