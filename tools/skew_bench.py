#!/usr/bin/env python
"""Zipf-skew stress fixture + salted-vs-unsalted measurements (SCALE.md).

make_scale10.py shifts keys uniformly, so AQE skew handling and
operators/skew.py salting were result-verified but never *measured*
under real skew. This tool builds a COPIES× events table whose user_id
follows a Zipf(s=1.2)-tailed law over the customer key domain (hottest
key ≈ 13 % of all rows) plus a uniform twin of identical size, then
measures, on each:

* the events⋈customer shuffle join — unsalted vs salted_join
  (operators/skew.py), both with AQE *off* (isolating the salt), and
  unsalted with AQE skew-join *on* (the runtime alternative);
* q72 sessionize and q81 funnel — user_id-partitioned window chains,
  the shape AQE can NOT split (window partitions are atomic), i.e.
  where a hot key genuinely serializes work.

Zipf sampling is a pure-codegen inverse-CDF: u ~ Uniform(0,1] derived
deterministically from xxhash64(event_id), rank = u^(-1/(s-1)) = u^-5
(tail P(R>r) ∝ r^-(s-1)), folded into the key domain with pmod so the
tail mass stays spread. Deterministic: same fixture every run.

Usage: python tools/skew_bench.py [SRC_SF_DIR] [OUT_JSON]
Env: SCALE_COPIES (default 30)
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from kafka_database_import_spark.operators.skew import salted_join
from kafka_database_import_spark.session import EngineConfig, get_spark
from kafka_database_import_spark.sources.readers import load_table

COPIES = int(os.environ.get("SCALE_COPIES", "30"))
ZIPF_S = 1.2


def build_fixtures(spark, src: str, root: str) -> dict[str, str]:
    """{name: dir} for zipf / uniform / hot90 — COPIES× events each,
    same rows, only the user_id distribution differs; customer copied
    alongside."""
    cust = load_table(spark, src, "customer").select("c_custkey")
    lo, n_keys = cust.agg(F.min("c_custkey"), F.count(F.lit(1))).first()
    ev = load_table(spark, src, "events")
    copies = ev
    for i in range(1, COPIES):
        copies = copies.unionAll(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    # u in (0, 1]: hash → [0, 1e9) → shift by +0.5 to dodge u=0
    u = (F.pmod(F.xxhash64("event_id"), F.lit(1_000_000_000)) + 0.5) / 1e9
    # clamp the Pareto tail before the bigint cast (u ~ 1e-9 → u^-5 ~
    # 1e45 overflows); the ~0.06 % of rows past the clamp fold onto one
    # extra warm key via the pmod below — harmless for a skew stressor
    rank = F.least(
        F.pow(u, F.lit(-1.0 / (ZIPF_S - 1.0))), F.lit(9.0e15)
    ).cast("bigint")
    zipf_uid = F.lit(lo) + F.pmod(rank - 1, F.lit(n_keys))
    unif_uid = F.lit(lo) + F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(n_keys))

    # the degenerate regime salting exists for: 90 % of rows on ONE key
    hot90_uid = F.when(
        F.pmod(F.xxhash64("event_id", F.lit(13)), F.lit(10)) < 9, F.lit(lo)
    ).otherwise(unif_uid)

    out = {}
    for name, uid in (
        ("zipf", zipf_uid),
        ("uniform", unif_uid),
        ("hot90", hot90_uid),
    ):
        d = os.path.join(root, name)
        copies.withColumn("user_id", uid).repartition(16).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        load_table(spark, src, "customer").write.mode("overwrite").parquet(
            os.path.join(d, "customer.parquet")
        )
        out[name] = d
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def bench_dir(spark, d: str) -> dict[str, float]:
    from kafka_database_import_spark.plans.analytics import (
        q72_sessionize_batch,
        q81_funnel,
    )

    res: dict[str, float] = {}

    def shuffle_confs(aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    ev = load_table(spark, d, "events").select("user_id", "value")
    cust = load_table(spark, d, "customer").select("c_custkey", "c_name")

    shuffle_confs(aqe=False)
    res["join_unsalted_noaqe"] = timed(
        lambda: ev.join(cust, ev.user_id == cust.c_custkey)
        .agg(F.sum("value"))
        .collect()
    )
    res["join_salted_noaqe"] = timed(
        lambda: salted_join(ev, cust, "user_id", "c_custkey", n_salts=32)
        .agg(F.sum("value"))
        .collect()
    )
    shuffle_confs(aqe=True)
    res["join_unsalted_aqe"] = timed(
        lambda: ev.join(cust, ev.user_id == cust.c_custkey)
        .agg(F.sum("value"))
        .collect()
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    res["q72_sessionize"] = timed(lambda: q72_sessionize_batch(spark, d).count())
    res["q81_funnel"] = timed(lambda: q81_funnel(spark, d).count())
    return res


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_bench.json"
    root = "/tmp/sfskew"
    spark = get_spark(EngineConfig())
    dirs = build_fixtures(spark, src, root)
    zipf_dir = dirs["zipf"]

    hot = (
        spark.read.parquet(os.path.join(zipf_dir, "events.parquet"))
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )
    total = spark.read.parquet(os.path.join(zipf_dir, "events.parquet")).count()
    report = {
        "copies": COPIES,
        "rows": total,
        "hot_keys": [{"user_id": r.user_id, "rows": r["count"]} for r in hot],
        "hot_share": round(hot[0]["count"] / total, 3),
        **{name: bench_dir(spark, d) for name, d in dirs.items()},
    }
    print(json.dumps(report, indent=2))
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
