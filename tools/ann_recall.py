#!/usr/bin/env python
"""Recall curves for the three ANN paths on a CLUSTERED corpus.

The fixture embeddings are near-random — LSH's documented worst case
(operators/similarity.py): neighbors are barely closer than strangers,
so recall thresholds tuned there say little about real embedding
spaces. This tool builds a mixture-of-Gaussians corpus (the shape real
text/image embeddings actually have: tight clusters around semantic
modes), computes exact cosine top-k ground truth, and records
recall@k vs the knob that buys recall for each path:

* LSH: n_tables (union of hash-table probes), n_planes fixed;
* IVF: n_probe (cells probed per query), n_lists fixed;
* PQ: shortlist (ADC candidates reranked exactly).

Output: one JSON with {path, param, recall, seconds} rows — the
SCALE.md table — so property-test thresholds on the clustered corpus
can be set from measurement, not hope.

Usage: PYTHONPATH=. python tools/ann_recall.py [OUT_JSON] [SCALE]

SCALE (default 1) multiplies the corpus size (queries stay fixed):
SCALE=10 is the r5 growth check — do the knee points measured at 4k
vectors hold at 40k? (VERDICT r4 item 7.)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

from kafka_database_import_spark.operators.similarity import (
    cosine_topk_blocked,
    ivf_topk,
    lsh_ann_topk,
    pq_topk,
)
from kafka_database_import_spark.session import EngineConfig, get_spark

DIM = 64
N_CLUSTERS = 20
CORPUS_N = 4000  # multiplied by the SCALE argv
QUERY_N = 40
K = 10
SEED = 7


def mog_corpus(spark, scale: int = 1):
    """(corpus_df, queries_df): CORPUS_N points around N_CLUSTERS
    Gaussian modes (sigma 0.35 vs inter-center distance ~ sqrt(2*25)),
    queries drawn from the same modes — so true neighbors are
    overwhelmingly same-cluster, like real embedding spaces."""
    rng = np.random.default_rng(SEED)
    n = CORPUS_N * scale
    centers = rng.normal(0.0, 5.0, size=(N_CLUSTERS, DIM))
    assign = rng.integers(0, N_CLUSTERS, size=n)
    pts = centers[assign] + rng.normal(0.0, 0.35 * 5.0, size=(n, DIM))
    q_assign = rng.integers(0, N_CLUSTERS, size=QUERY_N)
    q_pts = centers[q_assign] + rng.normal(0.0, 0.35 * 5.0, size=(QUERY_N, DIM))

    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(16)
    queries = spark.createDataFrame(
        [(int(1_000_000 + i), [float(x) for x in q_pts[i]]) for i in range(QUERY_N)],
        "vec_id long, embedding array<double>",
    )
    return corpus, queries


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def recall(truth: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    return round(hits / total, 3)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_recall.json"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(EngineConfig())
    corpus, queries = mog_corpus(spark, scale)
    corpus.cache().count()

    truth = topk_sets(cosine_topk_blocked(corpus, queries, k=K))
    rows = []

    for n_tables in (2, 4, 8):
        t0 = time.time()
        got = topk_sets(
            lsh_ann_topk(
                corpus, queries, k=K, dim=DIM, n_planes=6, n_tables=n_tables
            )
        )
        rows.append(
            {
                "path": "lsh",
                "param": f"planes=6,tables={n_tables}",
                "recall": recall(truth, got),
                "sec": round(time.time() - t0, 2),
            }
        )

    for n_probe in (1, 2, 4):
        t0 = time.time()
        got = topk_sets(
            ivf_topk(corpus, queries, k=K, n_lists=32, n_probe=n_probe)
        )
        rows.append(
            {
                "path": "ivf",
                "param": f"lists=32,probe={n_probe}",
                "recall": recall(truth, got),
                "sec": round(time.time() - t0, 2),
            }
        )

    for shortlist in (20, 50, 100):
        t0 = time.time()
        got = topk_sets(pq_topk(corpus, queries, k=K, shortlist=shortlist))
        rows.append(
            {
                "path": "pq",
                "param": f"sub=8,codes=16,shortlist={shortlist}",
                "recall": recall(truth, got),
                "sec": round(time.time() - t0, 2),
            }
        )

    from kafka_database_import_spark.operators.similarity import ivfpq_topk

    for shortlist in (20, 50, 100):
        t0 = time.time()
        got = topk_sets(
            ivfpq_topk(
                corpus, queries, k=K, n_lists=32, n_probe=4,
                shortlist=shortlist,
            )
        )
        rows.append(
            {
                "path": "ivfpq",
                "param": f"lists=32,probe=4,shortlist={shortlist}",
                "recall": recall(truth, got),
                "sec": round(time.time() - t0, 2),
            }
        )

    report = {
        "corpus": {
            "kind": "mixture-of-gaussians",
            "clusters": N_CLUSTERS,
            "n": CORPUS_N * scale,
            "queries": QUERY_N,
            "dim": DIM,
            "k": K,
        },
        "rows": rows,
    }
    print(json.dumps(report, indent=2))
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
