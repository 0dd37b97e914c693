#!/usr/bin/env python
"""Build a 10x key-shifted copy of an sf fixture dir (default sf0.1 ->
/tmp/sf1ish) for scale experiments — see SCALE.md.

Key offsets are applied consistently across the join graph (custkey in
customer/orders/events, orderkey in orders/lineitem, partkey in
part/lineitem, suppkey in supplier/lineitem) so joins remain real at
10x. Each document copy beyond the first gets one appended
distinguishing token: exact dedup stays non-degenerate while the
corpus becomes genuinely near-duplicate-heavy (each doc then has 9
Jaccard~0.97 copies) — the boilerplate-rich shape of a real crawl and
the stress case for the MinHash-LSH bucketing path.

Usage: python tools/make_scale10.py [SRC_SF_DIR] [DST_DIR]
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from kafka_database_import_spark.session import EngineConfig, get_spark
from kafka_database_import_spark.sources.readers import load_table

COPIES = int(os.environ.get("SCALE_COPIES", "10"))
# per-key-domain offsets: > max key in the sf0.1 fixture, so shifted
# copies never collide
OFFSETS = dict(cust=20_000, order=700_000, part=25_000, supp=2_000,
               event=200_000, doc=10_000, vec=4_000)
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "embeddings": {"vec_id": "vec"},
}


def _copies(df, shifts, mutate=None):
    outs = []
    for i in range(COPIES):
        d = df
        for col, dom in shifts.items():
            d = d.withColumn(col, F.col(col) + F.lit(i * OFFSETS[dom]))
        if mutate is not None:
            d = mutate(d, i)
        outs.append(d)
    out = outs[0]
    for d in outs[1:]:
        out = out.unionAll(d)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1ish"
    spark = get_spark(EngineConfig())
    for name, shifts in SHIFTS.items():
        df = _copies(load_table(spark, src, name), shifts)
        df.repartition(8).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(name, "done")

    def mutate_doc(d, i):
        if i == 0:
            return d
        d = d.withColumn("text", F.concat("text", F.lit(f" copytoken{i}")))
        return d.withColumn("n_chars", F.length("text"))

    docs = _copies(load_table(spark, src, "documents"), {"doc_id": "doc"}, mutate_doc)
    docs.repartition(8).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    print("documents done")
    for t in ("region", "nation"):  # broadcast dims stay as-is
        load_table(spark, src, t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(t, "done")


if __name__ == "__main__":
    main()
