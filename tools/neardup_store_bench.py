#!/usr/bin/env python
"""Measure the streaming near-dup store layouts as the store GROWS
(round 14, VERDICT r13 item 5): per-batch sink seconds for a TRICKLE
probe batch against a signature store accumulating bulk epochs —
plain layout vs the banded ``pmod(band_hash, K)`` partition-pruned
layout (`operators/dedup.incremental_neardup_sink`). The claim under
test: the plain store's per-batch cost grows with the store (O(corpus)
re-scan per batch), the banded trickle probe stays ~flat because the
probe's band keys prune the store read to its own partitions.

Also asserts, under the banded layout: epoch compaction preserves the
pb partitioning AND a replayed epoch stays a no-op after compaction.

Usage: python tools/neardup_store_bench.py [SF_DIR] [SEED_EPOCHS]
Defaults: /tmp/sf1ish (the 10x fixture), 8 seed epochs. Prints a
markdown table for SCALE.md plus one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_database_import_spark.operators.dedup import (  # noqa: E402
    compact_neardup_store,
    incremental_neardup_sink,
)
from kafka_database_import_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1ish"
SEED_EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
PROBE_DOCS = 100
BANDED_K = 4096  # trickle regime: K >> probe band rows (4*PROBE_DOCS)


def main() -> None:
    spark = get_spark()
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .cache()
    )
    n_docs = docs.count()
    probe = (
        docs.limit(PROBE_DOCS)
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" probe suffix")).alias("text"))
        .cache()
    )
    probe.count()
    results: dict = {"seed_docs_per_epoch": n_docs, "modes": {}}
    for mode, k in (("plain", None), (f"banded_k{BANDED_K}", BANDED_K)):
        store = tempfile.mkdtemp(prefix=f"kdis_ndstore_{mode}_")
        shutil.rmtree(store, ignore_errors=True)
        sink = incremental_neardup_sink(store, banded_layout_k=k)
        rows = []
        for e in range(SEED_EPOCHS):
            seed = docs.select(
                (F.col("doc_id") + e * 1_000_000).alias("doc_id"), "text"
            )
            sink(seed, e)
            # probe: one trickle batch against the store as of epoch e
            t0 = time.perf_counter()
            sink(probe, 1000 + e)
            dt = time.perf_counter() - t0
            # remove the probe's epoch so the next probe sees only bulk
            # history (pure store-growth measurement)
            for sub in ("signatures", "matches"):
                shutil.rmtree(
                    os.path.join(store, sub, f"epoch={1000 + e}"),
                    ignore_errors=True,
                )
            rows.append(
                {"store_docs": (e + 1) * n_docs, "probe_s": round(dt, 3)}
            )
            print(f"{mode}: store={rows[-1]['store_docs']} "
                  f"probe={rows[-1]['probe_s']}s", flush=True)
        if k:
            # compaction keeps pb layout + replay-after-compaction no-op
            merged = compact_neardup_store(spark, store)
            assert merged == SEED_EPOCHS, merged
            import glob

            assert glob.glob(
                os.path.join(store, "signatures", "epoch=c*", "pb=*")
            ), "compacted banded store must keep pb partitioning"
            before = sorted(
                os.listdir(os.path.join(store, "signatures"))
            )
            sink(docs.select("doc_id", "text"), 0)  # replay epoch 0
            assert sorted(
                os.listdir(os.path.join(store, "signatures"))
            ) == before, "replay after compaction must be a no-op"
            t0 = time.perf_counter()
            sink(probe, 2000)
            rows.append(
                {
                    "store_docs": SEED_EPOCHS * n_docs,
                    "probe_s": round(time.perf_counter() - t0, 3),
                    "compacted": True,
                }
            )
            print(f"{mode} post-compaction probe={rows[-1]['probe_s']}s",
                  flush=True)
        results["modes"][mode] = rows
        shutil.rmtree(store, ignore_errors=True)

    print("\n| store docs | plain probe s | banded probe s |")
    print("|---|---|---|")
    plain = results["modes"]["plain"]
    banded = results["modes"][f"banded_k{BANDED_K}"]
    for p, b in zip(plain, banded):
        print(f"| {p['store_docs']:,} | {p['probe_s']} | {b['probe_s']} |")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
