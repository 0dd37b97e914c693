"""Property tests for non-hashable operators (SURVEY §5.2): Q18 approx
distinct ±5 %, Q44 MinHash recall on planted near-dups, SimHash
locality, Q45b LSH-ANN recall vs exact. All inputs are deterministic
(fixture tables + fixed perturbations; the hash family is xxhash64, so
results are identical run-to-run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.operators import dedup
from kafka_database_import_spark.operators.dedup import (
    minhash_candidate_pairs,
    simhash63,
)
from kafka_database_import_spark.operators.similarity import cosine_topk, lsh_ann_topk
from kafka_database_import_spark.sources.readers import load_table


def test_q18_approx_distinct_within_5pct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 0.05 * row.exact, (row.exact, row.approx)


def _planted(spark, sf_dir, n=20):
    """n fixture docs + near-dup copies (last two words dropped,
    id offset +100000)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    toks = F.split(F.col("text"), r"\s+")
    perturbed = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.size(toks) - 2), " ").alias("text"),
    )
    return docs.select("doc_id", "text").unionAll(perturbed)


def test_q44_minhash_recall_on_planted_dups(spark, sf_dir):
    n = 20
    corpus = _planted(spark, sf_dir, n)
    pairs = minhash_candidate_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    found = {
        (r.id_a, r.id_b) for r in pairs.collect()
    }
    planted = {(i, i + 100000) for i in range(n)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"recall={recall} found={sorted(found)[:10]}"


def test_q44_minhash_no_false_pairs_on_unique_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", jaccard_threshold=0.9)
    # unique word-soup fixtures: nothing should be ≥0.9-Jaccard similar
    assert pairs.count() == 0


def test_q44_hot_bucket_cap_drops_degenerate_buckets(spark, sf_dir, monkeypatch):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
    # 8 identical texts -> one degenerate bucket per band
    same = docs.select("doc_id", F.lit("a b c d e f g h i j").alias("text"))
    assert minhash_candidate_pairs(same, "doc_id", "text").count() == 8 * 7 / 2
    monkeypatch.setattr(dedup, "HOT_BUCKET_CAP", 5)
    assert minhash_candidate_pairs(same, "doc_id", "text").count() == 0
    # The cap's bite is observable. Mix in one small duplicate group
    # that SURVIVES the cap: the observation must both report the
    # degenerate bucket's drop and leave the healthy bucket alone.
    # (The surviving pair also keeps the result non-empty — AQE's
    # empty-relation propagation would otherwise prune the observed
    # node entirely and the metric would never fire.)
    from pyspark.sql import Observation

    pair = same.sparkSession.createDataFrame(
        [(900, "k l m n o p q r s t"), (901, "k l m n o p q r s t")],
        "doc_id LONG, text STRING",
    )
    obs = Observation("capped")
    got = minhash_candidate_pairs(
        same.unionAll(pair), "doc_id", "text", bucket_observation=obs
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(900, 901)}
    # all 8 boilerplate docs × 4 bands dropped; the pair's 2×4 rows kept
    assert obs.get["capped_band_rows"] == 8 * 4
    assert obs.get["max_bucket"] == 8
    assert obs.get["band_rows"] == 10 * 4


def test_q97_simhash_locality(spark, sf_dir):
    corpus = _planted(spark, sf_dir, 20)
    sigs = {r.doc_id: r.simhash for r in simhash63(corpus, "doc_id", "text").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    planted = [hamming(sigs[i], sigs[i + 100000]) for i in range(20) if i + 100000 in sigs]
    unrelated = [hamming(sigs[i], sigs[j]) for i in range(10) for j in range(10, 20)]
    avg_planted = sum(planted) / len(planted)
    avg_unrelated = sum(unrelated) / len(unrelated)
    # near-dups must be markedly closer in hamming space than unrelated docs
    assert avg_planted < 10 < avg_unrelated, (avg_planted, avg_unrelated)


def test_q99b_lsh_ann_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_ann_topk(emb, queries, k=5)
    truth = {(r.query_id, r.cand_id) for r in exact.collect()}
    got = {(r.query_id, r.cand_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # 4 tables × 6 hyperplanes on 64-dim data: recall well above chance;
    # threshold pinned below the measured value with margin
    assert recall >= 0.5, f"recall={recall}"


def test_q53b_approx_percentile_error_bound(spark, sf_dir):
    """The sketch's medians must sit within 2 % (relative) of the exact
    per-group percentiles at accuracy=10000."""
    from kafka_database_import_spark.plans.registry import all_queries

    qs = all_queries()
    exact = {r.l_returnflag: r for r in qs["q53_percentiles"].fn(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r for r in qs["q53b_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.median_approx - e.median_qty) <= 0.02 * max(e.median_qty, 1)
        assert abs(a.p95_approx - e.p95_qty) <= 0.02 * max(e.p95_qty, 1)


def test_q99d_ivf_recall_vs_exact(spark, sf_dir):
    from kafka_database_import_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.cand_id) for r in cosine_topk(emb, queries, k=5).collect()}
    got = {(r.query_id, r.cand_id) for r in ivf_topk(emb, queries, k=5).collect()}
    recall = len(truth & got) / len(truth)
    # measured 0.72 at n_probe=4/16 lists on the fixture; pinned below
    assert recall >= 0.6, f"recall={recall}"


def test_q45_exact_topk_is_symmetric_sane(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        sims = [r.cosine_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True), f"q{qid} not sorted: {sims}"
        assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_connected_components_chain_and_island(spark):
    from kafka_database_import_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 20)],
        ["src", "dst"],
    )
    got = {
        (r.node, r.component) for r in connected_components(edges, max_iter=10).collect()
    }
    want = (
        {(n, 1) for n in range(1, 7)}
        | {(10, 10), (11, 10)}
        | {(20, 20), (21, 20)}
    )
    assert got == want


def test_connected_components_raises_without_convergence(spark):
    import pytest as _pytest

    from kafka_database_import_spark.operators.graph import connected_components

    # A 12-hop path needs ~12 rounds of plain label propagation.
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["src", "dst"])
    with _pytest.raises(RuntimeError):
        connected_components(edges, max_iter=2)

def test_q69_hll_sketch_accuracy_and_merge_consistency(spark, sf_dir):
    """Per-group estimates within ±5 % of exact, and the union of
    per-group sketches must equal one directly-built global sketch —
    the merge path can't lose or invent information."""
    from kafka_database_import_spark.plans.sketches import (
        HLL_LGK,
        build_sketches,
        merge_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    per_type = build_sketches(ev, "event_type", "user_id")
    est = {
        r.event_type: r.est
        for r in per_type.select(
            "event_type", F.hll_sketch_estimate("sketch").alias("est")
        ).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for t, e in exact.items():
        assert abs(est[t] - e) <= 0.05 * max(e, 1), (t, e, est[t])

    merged = merge_sketches(per_type).select(
        F.hll_sketch_estimate("sketch").alias("est")
    ).collect()[0].est
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(HLL_LGK))
        ).alias("est")
    ).collect()[0].est
    assert merged == direct, (merged, direct)


def test_q69_sketches_survive_persistence(spark, sf_dir, tmp_path):
    """The binary sketch column round-trips through parquet and still
    unions — the store-now-merge-later contract."""
    from kafka_database_import_spark.plans.sketches import (
        build_sketches,
        merge_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "sketches.parquet")
    build_sketches(ev, "event_type", "user_id").write.parquet(path)
    live = merge_sketches(build_sketches(ev, "event_type", "user_id")).select(
        F.hll_sketch_estimate("sketch").alias("est")
    ).collect()[0].est
    stored = merge_sketches(spark.read.parquet(path)).select(
        F.hll_sketch_estimate("sketch").alias("est")
    ).collect()[0].est
    assert stored == live


def test_q74_count_min_sketch_bounds_vs_exact(spark, sf_dir):
    """Count-Min never undercounts, and with eps=0.01/conf=0.95 (fixed
    seed → deterministic) overcounts by at most eps·N on the fixture
    vocabulary — the sketch alternative to q74's exact counts for
    vocabularies that don't fit an aggregate."""
    from kafka_database_import_spark.functions.text import tokens as toks

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(toks(F.col("text"))).alias("term"))
    exact = {r.term: r.n for r in tok.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(exact.values())
    sk_bytes = tok.agg(
        F.count_min_sketch("term", F.lit(0.01), F.lit(0.95), F.lit(42)).alias("sk")
    ).collect()[0].sk
    jsk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_bytes)
    )
    for term, n in exact.items():
        est = jsk.estimateCount(term)
        assert est >= n, (term, n, est)
        assert est <= n + 0.01 * total, (term, n, est, total)


def test_q99p_pq_recall_vs_exact(spark, sf_dir):
    from kafka_database_import_spark.operators.similarity import cosine_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.cand_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.cand_id) for r in pq_topk(emb, queries, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # PQ with 8 subspaces x 16 codes + 50-candidate exact rerank:
    # measured 0.84 at sf0.01; 0.6 is the regression floor
    assert recall >= 0.6, recall
    # rerank is exact: every returned similarity equals the exact path's
    sims_exact = {(r.query_id, r.cand_id): r.cosine_sim for r in cosine_topk(emb, queries, k=5).collect()}
    for r in pq_topk(emb, queries, k=5).collect():
        if (r.query_id, r.cand_id) in sims_exact:
            assert abs(r.cosine_sim - sims_exact[(r.query_id, r.cand_id)]) < 1e-9


def test_pagerank_converges_and_orders_by_degree(spark):
    from kafka_database_import_spark.operators.graph import pagerank

    # star graph: hub 1 connected to 2..9, plus an isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 10)] + [(20, 21)], ["src", "dst"]
    )
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    # hub collects contributions from all leaves: highest rank
    assert got[1] > got[2]
    assert all(got[i] == got[2] for i in range(3, 10))  # leaves symmetric
    assert got[20] == got[21]  # symmetric pair
    # total rank mass conserved within integer-floor loss:
    # n*(base + damping) >= sum >= n*base
    n, total = len(got), sum(got.values())
    assert n * 150_000 <= total <= n * 1_000_000 + n

    # determinism: bit-identical on rerun (integer arithmetic)
    again = {r.node: r.rank for r in pagerank(edges).collect()}
    assert got == again


def test_bloom_prune_handles_mixed_integer_widths(spark):
    """xxhash64 is type-sensitive (int 5 and bigint 5 hash differently);
    the bloom must normalize integral widths or every probe is a false
    negative and matching rows are silently dropped."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.bloom import bloom_prune_semi_join

    fact = spark.createDataFrame(
        [(i, f"r{i}") for i in range(200)], "k long, payload string"
    )
    dim = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "dk int")
    got = sorted(
        r.k for r in bloom_prune_semi_join(fact, "k", dim, "dk").collect()
    )
    assert got == list(range(0, 200, 7))

    # incompatible (non-integral) key types are rejected up front,
    # never silently empty
    dim_str = spark.createDataFrame([("5",)], "dk string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible key types"):
        bloom_prune_semi_join(fact, "k", dim_str, "dk")


def test_clustered_corpus_ann_recall(spark):
    """Recall thresholds on a CLUSTERED corpus (mixture of Gaussians —
    the shape real embeddings have; the fixture's near-random vectors
    are LSH's documented worst case). Measured curves in SCALE.md
    round 4; thresholds here sit under the measured points:

    * LSH (6 planes, 8 tables): 0.993 measured → assert ≥ 0.9 (the
      random-fixture test needed 16 tables for 0.9 — clustered data
      buys the same recall at half the shuffle volume);
    * IVF (8 lists, 2 probes): 1.0 measured → assert ≥ 0.9;
    * IVF-PQ vs flat PQ at IDENTICAL codebook budget (8×16) and
      shortlist: fat clusters (~300 members ≫ shortlist 30) collapse
      flat PQ — same-cluster vectors share codes, ADC cannot rank
      within the cluster, the shortlist degenerates toward an
      arbitrary tie-subset (0.44 measured) — while residual encoding
      spends the same codes on within-cluster variation (0.66
      measured). Assert the gap, not just the level."""
    import numpy as np

    from kafka_database_import_spark.operators.similarity import (
        cosine_topk_blocked,
        ivf_topk,
        ivfpq_topk,
        lsh_ann_topk,
        pq_topk,
    )

    dim, n_clusters, n, n_q, k = 32, 6, 1800, 15, 10
    rng = np.random.default_rng(11)
    centers = rng.normal(0.0, 5.0, size=(n_clusters, dim))
    pts = centers[rng.integers(0, n_clusters, size=n)] + rng.normal(
        0.0, 1.75, size=(n, dim)
    )
    qp = centers[rng.integers(0, n_clusters, size=n_q)] + rng.normal(
        0.0, 1.75, size=(n_q, dim)
    )
    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8).cache()
    queries = spark.createDataFrame(
        [(int(10_000 + i), [float(x) for x in qp[i]]) for i in range(n_q)],
        "vec_id long, embedding array<double>",
    )

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.cand_id)
        return out

    def recall(t, g):
        return sum(len(t[q] & g.get(q, set())) for q in t) / sum(
            len(t[q]) for q in t
        )

    truth = sets(cosine_topk_blocked(corpus, queries, k=k))
    r_lsh = recall(
        truth, sets(lsh_ann_topk(corpus, queries, k=k, dim=dim, n_planes=6, n_tables=8))
    )
    r_ivf = recall(truth, sets(ivf_topk(corpus, queries, k=k, n_lists=8, n_probe=2)))
    r_ivfpq = recall(
        truth,
        sets(
            ivfpq_topk(
                corpus, queries, k=k, n_lists=8, n_probe=3,
                n_subspaces=8, n_codes=16, shortlist=30,
            )
        ),
    )
    r_flatpq = recall(
        truth,
        sets(pq_topk(corpus, queries, k=k, n_subspaces=8, n_codes=16, shortlist=30)),
    )
    assert r_lsh >= 0.9, r_lsh
    assert r_ivf >= 0.9, r_ivf
    assert r_ivfpq >= 0.55, r_ivfpq
    assert r_ivfpq >= r_flatpq + 0.1, (r_ivfpq, r_flatpq)
    corpus.unpersist()


def test_bitmap_state_exact_and_merge_consistent(spark, sf_dir):
    """The (group, bucket, bitmap) state is EXACT (equals
    COUNT(DISTINCT)) and mergeable: building bitmaps on two disjoint
    halves of events and OR-merging them must reproduce the
    whole-corpus counts bit-for-bit — the incremental cross-day
    re-count path build_bitmaps promises."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.plans.sketches import (
        bitmap_distinct,
        build_bitmaps,
        merge_bitmaps,
    )
    from kafka_database_import_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    whole = bitmap_distinct(build_bitmaps(ev, "event_type", "user_id"),
                            ["event_type"])
    got = {r["event_type"]: r["n_distinct"] for r in whole.collect()}
    assert got == exact

    lo = ev.filter(F.col("user_id") % 2 == 0)
    hi = ev.filter(F.col("user_id") % 2 == 1)
    merged = merge_bitmaps(
        build_bitmaps(lo, "event_type", "user_id").unionAll(
            build_bitmaps(hi, "event_type", "user_id")
        ),
        ["event_type"],
    )
    got_merged = {
        r["event_type"]: r["n_distinct"]
        for r in bitmap_distinct(merged, ["event_type"]).collect()
    }
    assert got_merged == exact


def test_cdc_apply_matches_sequential_replay_model(spark):
    """Model-based check: apply_changelog over random changelogs must
    equal a literal one-op-at-a-time dict replay. Randomized ops/keys/
    seqs (fixed seeds), including keys that end deleted, keys updated
    after a delete (resurrection), and single-op keys."""
    import random

    from pyspark.sql import types as T

    from kafka_database_import_spark.operators.cdc import apply_changelog

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    for seed in range(5):
        rng = random.Random(seed)
        n_keys = rng.randint(3, 12)
        rows = []
        seqs = list(range(1, rng.randint(20, 60)))
        rng.shuffle(seqs)
        for seq in seqs:
            k = rng.randrange(n_keys)
            op = "D" if rng.random() < 0.3 else "U"
            rows.append((k, seq, op, f"v{seq}" if op == "U" else None))
        # model: replay ops in seq order
        state: dict[int, tuple[int, str]] = {}
        for k, seq, op, v in sorted(rows, key=lambda r: r[1]):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (seq, v)
        want = {k: (seq, v) for k, (seq, v) in state.items()}

        # model semantics: LAST op wins — a delete followed by a later
        # update resurrects the key; apply_changelog must agree
        got = {
            r["k"]: (r["seq"], r["v"])
            for r in apply_changelog(
                spark.createDataFrame(rows, schema), ["k"], "seq", "op"
            ).collect()
        }
        # dict-replay keeps a key iff its LAST op was an update; but
        # note the subtlety: replay applies every op, apply_changelog
        # looks only at the final one — they agree exactly because
        # upserts carry full rows (no partial updates in this model)
        assert got == want, f"seed={seed}: {got} != {want}"


def test_histogram_sketch_merges_exactly_and_bounds_quantile_error(spark, sf_dir):
    """(1) Building histograms on two disjoint halves and merging must
    equal the whole-corpus build EXACTLY (counts are integers — merge
    is addition). (2) Every sketch quantile must sit within one bucket
    width of the exact percentile_disc value."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.plans.sketches import (
        build_histogram_sketch,
        histogram_quantiles,
        merge_histogram_sketches,
    )
    from kafka_database_import_spark.sources.readers import load_table

    LO, HI, NB = 0, 60_000_000, 1000
    width = (HI - LO) // NB
    cents = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c"),
        F.col("o_orderkey"),
    )
    whole = build_histogram_sketch(cents, "status", "c", LO, HI, NB)
    halves = build_histogram_sketch(
        cents.filter(F.col("o_orderkey") % 2 == 0), "status", "c", LO, HI, NB
    ).unionAll(
        build_histogram_sketch(
            cents.filter(F.col("o_orderkey") % 2 == 1), "status", "c", LO, HI, NB
        )
    )
    merged = merge_histogram_sketches(halves, ["status"])
    as_map = lambda df: {
        (r["status"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_map(merged) == as_map(whole)  # byte-exact merge

    got = {
        (r["status"], r["q_pct"]): r["bucket_lo"]
        for r in histogram_quantiles(whole, "status", [50, 90, 99], LO, HI, NB).collect()
    }
    exact = {
        (r["status"], q): r[f"p{q}"]
        for r in cents.groupBy("status")
        .agg(
            *[
                F.expr(f"percentile_disc(0.{q}) WITHIN GROUP (ORDER BY c)").alias(f"p{q}")
                for q in (50, 90, 99)
            ]
        )
        .collect()
        for q in (50, 90, 99)
    }
    for key, bucket_lo in got.items():
        assert abs(bucket_lo - exact[key]) <= width, (
            f"{key}: sketch {bucket_lo} vs exact {exact[key]} (width {width})"
        )


def test_bitmap_state_survives_persistence(spark, sf_dir, tmp_path):
    """The build-once/merge-forever contract requires the bitmap state
    to round-trip storage: write (group, bucket, bitmap) to parquet,
    read back, counts must be identical — binary column fidelity."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.plans.sketches import (
        bitmap_distinct,
        build_bitmaps,
    )
    from kafka_database_import_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    state = build_bitmaps(ev, "event_type", "user_id")
    before = {
        r["event_type"]: r["n_distinct"]
        for r in bitmap_distinct(state, ["event_type"]).collect()
    }
    path = str(tmp_path / "bitmap_state")
    state.write.parquet(path)
    restored = spark.read.parquet(path)
    after = {
        r["event_type"]: r["n_distinct"]
        for r in bitmap_distinct(restored, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert before == after == exact


def test_cdc_apply_valid_ops_rejects_corrupt_feed(spark):
    """With valid_ops set, a poisoned op code fails the job instead of
    silently upserting; without it, unknown ops upsert (documented)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from pyspark.sql import types as T

    from kafka_database_import_spark.operators.cdc import apply_changelog

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    rows = [(1, 1, "U", "a"), (2, 2, "X", "poison"), (1, 3, "D", None)]
    df = spark.createDataFrame(rows, schema)
    # lenient default: 'X' upserts
    got = {r["k"]: r["v"] for r in apply_changelog(df, ["k"], "seq", "op").collect()}
    assert got == {2: "poison"}
    # strict: job fails on the unknown op
    with pytest.raises(SparkRuntimeException, match="unknown CDC op"):
        apply_changelog(df, ["k"], "seq", "op", valid_ops=("U", "D")).collect()
    # misconfiguration caught eagerly
    with pytest.raises(ValueError, match="delete_op"):
        apply_changelog(df, ["k"], "seq", "op", delete_op="D", valid_ops=("U",))


def test_triangle_count_matches_brute_force_on_random_graphs(spark):
    """Model-based check of the degree-oriented wedge algorithm:
    random G(n, p) graphs (with deliberate multi-edges, reversed
    duplicates, and self-loops thrown in) vs an itertools brute force
    over all vertex triples."""
    import itertools
    import random

    from kafka_database_import_spark.operators.graph import count_triangles

    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(8, 16)
        edges = set()
        for u, v in itertools.combinations(range(n), 2):
            if rng.random() < 0.35:
                edges.add((u, v))
        want = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in edges and (b, c) in edges and (a, c) in edges
        )
        rows = [list(e) for e in edges]
        # adversarial noise the operator must normalize away
        rows += [[v, u] for (u, v) in list(edges)[: len(edges) // 3]]  # reversed dups
        rows += [[u, u] for u in range(0, n, 3)]  # self-loops
        df = spark.createDataFrame(rows, "a LONG, b LONG")
        got = count_triangles(df).collect()[0]["n_triangles"]
        assert got == want, f"seed={seed}: {got} != brute-force {want}"


def test_incremental_neardup_matches_brute_force_model(spark):
    """neardup_matches_against == the brute-force model (every pair
    with ≥1 colliding band AND a 16-hash estimate ≥ t), on random
    corpora of templated near-copies — within-batch orientation
    emitted once, store matches in natural orientation, ids disjoint
    by the caller contract."""
    import random

    from kafka_database_import_spark.operators.dedup import (
        BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        minhash_signatures,
        neardup_matches_against,
    )

    words = [f"w{i}" for i in range(40)]
    for seed in range(3):
        rng = random.Random(seed)
        base_texts = [
            " ".join(rng.choices(words, k=rng.randint(12, 20))) for _ in range(4)
        ]

        def doc(i):
            t = base_texts[rng.randrange(len(base_texts))]
            if rng.random() < 0.5:  # perturb: drop/append a word
                t = t + " " + rng.choice(words)
            return (i, t)

        store_rows = [doc(i) for i in range(0, 6)]
        new_rows = [doc(i) for i in range(100, 106)]
        sig_store = minhash_signatures(
            spark.createDataFrame(store_rows, "doc_id long, text string"),
            "doc_id",
            "text",
        )
        sig_new = minhash_signatures(
            spark.createDataFrame(new_rows, "doc_id long, text string"),
            "doc_id",
            "text",
        )
        got = {
            (r.id_new, r.id_base)
            for r in neardup_matches_against(
                sig_new, sig_store, "doc_id", est_threshold=0.5
            ).collect()
        }

        # brute-force model over the collected signatures
        sN = {r.doc_id: [r[f"h{i}"] for i in range(N_HASHES)] for r in sig_new.collect()}
        sS = {r.doc_id: [r[f"h{i}"] for i in range(N_HASHES)] for r in sig_store.collect()}

        def hits(sa, sb):
            band = any(
                sa[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                == sb[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                for b in range(BANDS)
            )
            est = sum(x == y for x, y in zip(sa, sb)) / N_HASHES
            return band and est >= 0.5

        want = {
            (a, b)
            for a in sN
            for b in sN
            if a < b and hits(sN[a], sN[b])
        } | {(a, b) for a in sN for b in sS if hits(sN[a], sS[b])}
        assert got == want, f"seed={seed} got^want={got ^ want}"


def test_random_projection_preserves_pairwise_distances(spark):
    """JL property of random_projection: with K=64 output dims, squared
    pairwise distances after projection (rescaled by 1/(scale²·K))
    approximate the originals — loose ε bounds appropriate to K=64,
    plus exactness: the projection is integer arithmetic, so re-running
    it must be bit-identical."""
    import random

    import numpy as np

    from kafka_database_import_spark.operators.similarity import random_projection

    rng = random.Random(7)
    D, K, n = 64, 64, 10
    vecs = {i: [rng.gauss(0, 1) for _ in range(D)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    long = random_projection(df, out_dim=K).collect()
    proj = {}
    for r in long:
        proj.setdefault(r.vec_id, [0] * K)[r.k] = r.proj
    # bit-identical rerun
    again = random_projection(df, out_dim=K).collect()
    assert {(r.vec_id, r.k): r.proj for r in again} == {
        (r.vec_id, r.k): r.proj for r in long
    }

    qvecs = {i: np.floor(np.array(v) * 1000 + 0.5) for i, v in vecs.items()}
    ratios = []
    for a in range(n):
        for b in range(a + 1, n):
            d_orig = float(((qvecs[a] - qvecs[b]) ** 2).sum())
            pa, pb = np.array(proj[a], float), np.array(proj[b], float)
            d_proj = float(((pa - pb) ** 2).sum()) / K
            ratios.append(d_proj / d_orig)
    ratios = np.array(ratios)
    # K=64 JL distortion: all pair ratios in a loose (0.4, 2.2) band
    # and the mean ratio near 1 (sign matrix is unbiased). The linear
    # PRF this operator first shipped with failed exactly here
    # (ratios 0.01-6.5: columns were ±copies) — keep this test honest.
    assert ratios.min() > 0.4 and ratios.max() < 2.2, (ratios.min(), ratios.max())
    assert 0.8 < ratios.mean() < 1.25, ratios.mean()


def test_kmv_theta_estimates_partial_overlaps(spark):
    """KMV/theta set-expression accuracy on CONSTRUCTED partial
    overlaps (the events fixture's types share all users, so the
    catalog query only exercises the full-overlap corner): two 20k-id
    sets overlapping by 10k must estimate union/intersection within
    the k=256 error envelope (~3σ ≈ 19%), and the estimates must be
    deterministic across reruns."""
    from kafka_database_import_spark.plans.registry import all_queries

    rows = [("a", i) for i in range(20_000)] + [
        ("b", i) for i in range(10_000, 30_000)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    import tempfile, os

    d = tempfile.mkdtemp(prefix="kdis_kmv_")
    # reuse the catalog query's pipeline by staging a fixture-shaped dir
    df.withColumn("event_id", df.user_id).withColumn(
        "ts", (df.user_id.cast("timestamp"))
    ).withColumn("value", df.user_id.cast("double")).withColumn(
        "props", df.event_type
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    q = all_queries()["q99zzb_kmv_theta_sketch"]
    out = {(r.type_a, r.type_b): r for r in q.fn(spark, d).collect()}
    r = out[("a", "b")]
    assert abs(r.est_union - 30_000) / 30_000 < 0.19, r
    assert abs(r.est_inter - 10_000) / 10_000 < 0.19, r
    out2 = {(r2.type_a, r2.type_b): r2 for r2 in q.fn(spark, d).collect()}
    assert (out2[("a", "b")].est_union, out2[("a", "b")].est_inter) == (
        r.est_union,
        r.est_inter,
    )


def test_exact_cosine_paths_refuse_huge_query_sets(spark):
    """VERDICT r11 #6: the exact paths' 'query side is small by
    contract' clause is ENFORCED, not just documented — above
    max_queries both cosine_topk (broadcast) and cosine_topk_blocked
    (driver collect) refuse loudly, naming the ANN paths; None opts
    out."""
    import pytest

    from kafka_database_import_spark.operators.similarity import (
        cosine_topk_blocked,
    )

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("float") for i in range(4)]).alias(
            "embedding"
        ),
    )
    qs = emb.limit(10)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        cosine_topk(emb, qs, k=3, max_queries=5)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        cosine_topk_blocked(emb, qs, k=3, max_queries=5)
    # at or under the cap (and with None) both run
    assert cosine_topk(emb, qs, k=3, max_queries=10).count() > 0
    assert cosine_topk_blocked(emb, qs, k=3, max_queries=None).count() > 0
