"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash
(SURVEY §2.2 Q43–Q44; the reference has no dedup — this is declared
engine surface for training-data pipelines).

Scale design — the 100 TB question is "bucketed or all-pairs", and the
answer here is always bucketed:

* exact dedup: one hash-shuffle on ``sha2(text)`` (map-side partial
  aggregation first);
* MinHash-LSH: signature → band buckets → self-join *within bucket
  only*. Candidate generation never sees a crossJoin; cost is
  Σ|bucket|², bounded by the hot-bucket cap below;
* SimHash: one 63-bit signature per doc (embarrassingly parallel);
  near-dup lookup is a bucket join on signature prefixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.text import tokens, word_shingles

# LSH shape: 16 minhash functions, 4 bands × 4 rows. s-curve threshold
# (1/b)^(1/r) = (1/4)^(1/4) ≈ 0.71 Jaccard — tuned for near-dup text.
N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = N_HASHES // BANDS

# Buckets larger than this are dropped from candidate generation (and
# should be surfaced as a metric): a 10^6-doc bucket means degenerate
# boilerplate, and its |bucket|² pair expansion would dominate the job.
HOT_BUCKET_CAP = 10_000


def _fan_out(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work (shingling, hashing) runs at the
    cluster's parallelism. Scan parallelism follows input splits; a
    small file is one split, serializing all downstream codegen work
    onto one core (measured 9× on the sf0.1 fixture). The split count
    is lower-bounded via ``inputFiles()`` — NOT ``df.rdd``, which
    forces a full plan→RDD conversion per call. At real scale the file
    count exceeds the default parallelism and this is a no-op — no
    shuffle is added. Non-file sources (in-memory test corpora) report
    zero files and are always fanned out, which is what a
    single-partition ``createDataFrame`` corpus needs anyway."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, n_copies, keeper) per distinct text. One shuffle on
    the 256-bit content hash; group keys are uniform so no skew."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, h0..h15) minhash signature table.

    Shape matters: shingles are *exploded to rows* and the 16 minhashes
    are ``min`` aggregates over per-salt xxhash64 — one shuffle keyed on
    the doc id with map-side partial mins, and each shingle is hashed
    exactly 16 times. (The tempting alternative — 16
    ``array_min(transform(...))`` expressions in one projection — gets
    its shingle subexpression inlined per reference by Catalyst's
    projection collapse: measured 16–256× recompute and a 378 s sf0.1
    run vs ~2 s for this plan.) Docs with no shingles (< 3 tokens) have
    no rows here; they cannot be near-duplicates by definition."""
    sh_rows = _fan_out(df).select(
        F.col(id_col), F.explode(word_shingles(tokens(F.col(text_col)))).alias("shingle")
    )
    # parsed-string form of min(xxhash64(concat(shingle, '#i'))) —
    # resolves to the identical analyzed expression as the F.min/
    # F.xxhash64/F.concat chain (pinned by tests/test_plan_shapes) but
    # costs ONE py4j round trip per aggregate instead of ~6; the 16-
    # expression build was ~0.2 s of driver plan-construction per run
    # (guide §7.3: plan-build time is driver wall time).
    aggs = [
        F.expr(f"min(xxhash64(concat(shingle, '#{i}')))").alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh_rows.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.5,
    signature_prefilter: float | None = None,
    bucket_observation=None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding.

    Plan shape (the part that must survive 100×): signature aggregation
    (one doc-id shuffle, map-side combine — see minhash_signatures);
    band hashes are cheap expressions over the materialized h0..h15
    attributes; ``explode`` to (band_id, band_hash) buckets; the
    self-join keys on the bucket — Spark shuffles both sides on
    (band_id, band_hash), so only same-bucket docs ever meet. Exact
    Jaccard re-verification runs on candidate pairs only.

    Signature-estimate pre-filter (OPT-IN via ``signature_prefilter``;
    default ``None`` = pure LSH-banding candidate semantics): when set,
    the h0..h15 attributes ride through the band exchange (128
    B/band-row wider — the price of NOT re-deriving the whole
    shingle→signature pipeline via two joins back to ``sig``), so the
    self-join can estimate Jaccard as the fraction of equal minhashes
    and drop hopeless candidates BEFORE the ``distinct`` exchange and
    the expensive re-shingle verification. The catalog query (q44)
    passes ``0.7 × jaccard_threshold``: a candidate pair has ≥1
    matching band (4 equal hashes) by construction, so for a true-J ≥
    0.5 pair the estimate falls below 0.35 only when ≤1 of the other 12
    hashes match — P ≈ 13·(1/2)^12 ≈ 0.3 % — measured several-fold
    fewer verification pairs at no observed recall loss. That ~0.3 %
    borderline false-drop chance is a BEHAVIOR CHANGE vs pure banding,
    which is why it is not the default here."""
    sig = minhash_signatures(df, id_col, text_col)
    hcols = [f"h{i}" for i in range(N_HASHES)] if signature_prefilter is not None else []
    # parsed-string band array: struct(.. AS ..) resolves to the same
    # CreateNamedStruct the aliased F.struct built (pinned by
    # tests/test_plan_shapes — the explain text is byte-identical), one
    # round trip for the whole explode tree instead of ~10 per band
    band_structs = ", ".join(
        "struct({b} AS band_id, xxhash64({hs}) AS band_hash)".format(
            b=b,
            hs=", ".join(
                f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    bands = sig.select(
        F.col(id_col),
        *hcols,
        F.expr(f"explode(array({band_structs}))").alias("band"),
    ).select(id_col, *hcols, "band.band_id", "band.band_hash")

    # Hot-bucket cap (skew guard; see module docstring): a window count
    # over the bucket key rather than a groupBy + semi-join — the
    # window's shuffle on (band_id, band_hash) is the same partitioning
    # the pair self-join needs, so the exchange is computed once and
    # reused instead of re-deriving the signature pipeline per consumer.
    w_bucket = Window.partitionBy("band_id", "band_hash")
    bands = bands.withColumn("bn", F.count(F.lit(1)).over(w_bucket))
    # Surface how much the cap bit: rides the query as observe()
    # metrics (zero extra scans). Pass an Observation to read them
    # programmatically; the default string-named metric reaches any
    # QueryExecutionListener (ops dashboards). Attached to the LEFT
    # side of the self-join only — a CollectMetrics node duplicated by
    # the self-join double-fires the observation (and breaks it
    # outright when AQE empty-propagates one side). The shuffle below
    # is still shared via ReusedExchange; the window above the exchange
    # was always computed per-side.
    observed = bands.observe(
        bucket_observation or "minhash_lsh_buckets",
        F.sum(F.when(F.col("bn") > HOT_BUCKET_CAP, 1).otherwise(0)).alias(
            "capped_band_rows"
        ),
        F.count(F.lit(1)).alias("band_rows"),
        F.max("bn").alias("max_bucket"),
    )
    capped = F.col("bn") <= HOT_BUCKET_CAP
    left = observed.filter(capped).drop("bn").alias("l")
    right = bands.filter(capped).drop("bn").alias("r")
    cand = left.join(
        right,
        (F.col(f"l.band_id") == F.col(f"r.band_id"))
        & (F.col(f"l.band_hash") == F.col(f"r.band_hash"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    if signature_prefilter is not None:
        # parsed-string estimate: Python's sum() built 0 + w0 + ... +
        # w15 (the leading 0 constant-folds away), this builds the same
        # CASE chain in one round trip; physical plan pinned identical
        est_sql = " + ".join(
            f"(CASE WHEN l.h{i} = r.h{i} THEN 1 ELSE 0 END)"
            for i in range(N_HASHES)
        )
        cand = cand.filter(
            F.expr(f"(0 + {est_sql}) / {N_HASHES}")
            >= F.lit(signature_prefilter)
        )
    cand = cand.select(
        F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
    ).distinct()

    # Exact-Jaccard verification on candidates only (shared with the
    # streaming path's offline verifier).
    return exact_jaccard_for_pairs(
        cand, df, id_col, text_col, "id_a", "id_b"
    ).filter(F.col("jaccard") >= jaccard_threshold)


def exact_jaccard_for_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Exact Jaccard for an explicit pair list: re-shingle ONLY docs
    that appear in some pair (semi-join first), then join pairs back —
    never broadcast shingle sets, never re-shingle the full corpus for
    a sparse pair list. This is both q44's verification tail and the
    OFFLINE verifier for the streaming near-dup path, whose signature
    store cannot verify exactly (it never keeps text): feed it the
    published ``matches/epoch=*`` pairs plus the text-bearing corpus
    and it returns ``(a_col, b_col, jaccard)`` to threshold at will."""
    ids = (
        pairs.select(F.col(a_col).alias(id_col))
        .unionAll(pairs.select(F.col(b_col).alias(id_col)))
        .distinct()
    )
    shingled = _fan_out(docs.join(ids, id_col, "left_semi")).select(
        F.col(id_col), word_shingles(tokens(F.col(text_col))).alias("sh")
    )
    a = shingled.withColumnRenamed(id_col, a_col).withColumnRenamed("sh", "sh_a")
    b = shingled.withColumnRenamed(id_col, b_col).withColumnRenamed("sh", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.select(a_col, b_col)
        .join(a, a_col)
        .join(b, b_col)
        .select(
            a_col,
            b_col,
            (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
    )


def simhash63(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash per document (bit 63 skipped to stay in a signed
    long). Per-token xxhash64, per-bit ±1 votes summed in one
    aggregation over exploded tokens — JVM-side, map-side combinable,
    one shuffle on the doc id. Near-dup ⇔ small hamming distance
    (``bit_count(sig_a ^ sig_b)``)."""
    tok = _fan_out(df).select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(63)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(63):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig + term
    return voted.select(F.col(id_col), sig.alias("simhash"))


def signature_band_rows(sig: DataFrame, id_col: str) -> DataFrame:
    """Explode a signature table (id, h0..h15) to (id, h0..h15,
    band_id, band_hash) rows — the shared banding step of the batch
    (``minhash_candidate_pairs``) and incremental paths."""
    return sig.select(
        F.col(id_col),
        *[f"h{i}" for i in range(N_HASHES)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
                        ).alias("band_hash"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, *[f"h{i}" for i in range(N_HASHES)], "band.band_id", "band.band_hash")


def neardup_matches_against(
    sig_new: DataFrame,
    sig_store: DataFrame | None,
    id_col: str,
    est_threshold: float = 0.5,
) -> DataFrame:
    """(id_new, id_base, est) near-dup matches of NEW signatures
    within the batch AND against the historical STORE (whose ids must
    be disjoint from the batch — the caller's epoch discipline
    guarantees it): band-bucket joins — never all-pairs — then the
    16-hash Jaccard estimate as the accept rule. Within-batch pairs
    are emitted once (``id_new < id_base``); store matches keep their
    natural orientation (new → base). Signature-estimate matching is
    the deliberate contract of the INCREMENTAL path: the store keeps
    136 bytes/doc of signature, never the text, so exact re-shingle
    verification is impossible by design and the estimate's resolution
    (1/16) is documented at the call sites."""
    ln = signature_band_rows(sig_new, id_col).alias("l")
    est = (
        sum(
            F.when(F.col(f"l.h{i}") == F.col(f"r.h{i}"), 1).otherwise(0)
            for i in range(N_HASHES)
        )
        / N_HASHES
    )
    within = (
        ln.join(
            signature_band_rows(sig_new, id_col).alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .filter(est >= F.lit(est_threshold))
        .select(
            F.col(f"l.{id_col}").alias("id_new"),
            F.col(f"r.{id_col}").alias("id_base"),
            est.alias("est"),
        )
    )
    if sig_store is None:
        return within.distinct()
    vs_store = (
        ln.join(
            signature_band_rows(sig_store, id_col).alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            # Defense in depth for the disjoint-ids contract: if a
            # replay anomaly ever lands a batch's own ids in the store,
            # refuse to emit the degenerate self-match rather than
            # publishing est=1.0 self-pairs.
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .filter(est >= F.lit(est_threshold))
        .select(
            F.col(f"l.{id_col}").alias("id_new"),
            F.col(f"r.{id_col}").alias("id_base"),
            est.alias("est"),
        )
    )
    return within.unionByName(vs_store).distinct()


def neardup_matches_against_banded(
    sig_new: DataFrame,
    store_bands: DataFrame | None,
    id_col: str,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Banded-store variant of :func:`neardup_matches_against`: the
    store side arrives ALREADY as band rows (id, h0..h15, band_id,
    band_hash[, pb]) — the pruning layout — so only the batch is
    banded here. Semantics identical; the model-based property test
    asserts both paths produce the same matches."""
    ln = signature_band_rows(sig_new, id_col).alias("l")
    est = (
        sum(
            F.when(F.col(f"l.h{i}") == F.col(f"r.h{i}"), 1).otherwise(0)
            for i in range(N_HASHES)
        )
        / N_HASHES
    )
    within = (
        ln.join(
            signature_band_rows(sig_new, id_col).alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .filter(est >= F.lit(est_threshold))
        .select(
            F.col(f"l.{id_col}").alias("id_new"),
            F.col(f"r.{id_col}").alias("id_base"),
            est.alias("est"),
        )
    )
    if store_bands is None:
        return within.distinct()
    vs_store = (
        ln.join(
            store_bands.alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            # Same disjoint-ids defense as the unbanded path.
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .filter(est >= F.lit(est_threshold))
        .select(
            F.col(f"l.{id_col}").alias("id_new"),
            F.col(f"r.{id_col}").alias("id_base"),
            est.alias("est"),
        )
    )
    return within.unionByName(vs_store).distinct()


def _compacted_epochs(sig_dir: str) -> set[int]:
    """Epoch ids whose ``epoch=<id>`` replay-marker directories were
    merged away by :func:`compact_neardup_store`. The manifest keeps
    the sink's replay guard sound after compaction: a replayed epoch
    whose directory no longer exists is still recognized as committed."""
    import json
    import os

    path = os.path.join(sig_dir, "_compacted_epochs.json")
    if not os.path.exists(path):
        return set()
    with open(path) as fh:
        return set(json.load(fh))


def incremental_neardup_sink(
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_threshold: float = 0.5,
    banded_layout_k: int | None = 256,
):
    """``foreachBatch`` function for STREAMING near-duplicate detection
    against a growing historical corpus — the online variant of q44
    (q37 covers exact streaming dedup; this is the LSH analogue).

    Per micro-batch: (1) minhash the batch, (2) band-join it against
    the signature STORE ∪ itself (new-vs-history and new-vs-new),
    (3) publish flagged pairs and the batch's signatures. Replay
    safety is the snapshot trick, not a ledger row: each epoch's
    signatures and matches land as ``epoch=<id>`` directories written
    to a temp path and atomically ``os.replace``d — a replayed epoch
    sees its directory exists and becomes a no-op, so the store never
    double-counts a document no matter how the stream crashes.

    100 TB design: the store holds 17 longs/doc (id + 16 minhashes,
    ~136 B) — 10¹¹ docs ≈ 14 TB of signatures vs petabytes of text;
    matching is bucketed (band join) and estimate-based (resolution
    1/16), with exact verification deferred to an offline pass that
    still has the text.

    Store layout (round 14 — the banded layout is now the DEFAULT for
    long streams): with ``banded_layout_k=K`` the store holds BAND
    rows hive-partitioned by ``pb = pmod(band_hash, K)``, so each
    batch's distinct pb set prunes the store read at planning time —
    the naive O(store)-per-batch scan becomes
    O(store × coverage(batch)/K). Sizing law (measured at 10×,
    SCALE.md): a batch carrying ``B`` band rows (4 per doc) touches
    ``K·(1 − e^(−B/K))`` partitions, so pruning bites when ``K ≳
    10·B`` (trickle streams against a large historical store — the
    regime long streams live in); for bulk batches whose bands cover
    every partition the layout costs only the ×4 band-row storage and
    a partitioned write, and reads degrade gracefully to the full
    scan. ``banded_layout_k=None`` keeps the plain signature store
    (smallest store, right for short-lived streams). Pair long
    streams with periodic :func:`compact_neardup_store` — it
    preserves the pb partitioning, keeps the per-batch read at
    O(files-in-one-snapshot), and the replay guard survives
    compaction via the ``_compacted_epochs.json`` manifest. The
    epoch-snapshot commit protocol is unchanged by the layout."""
    import os
    import shutil

    sig_dir = os.path.join(store_dir, "signatures")
    match_dir = os.path.join(store_dir, "matches")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch_sig = os.path.join(sig_dir, f"epoch={epoch_id}")
        epoch_match = os.path.join(match_dir, f"epoch={epoch_id}")
        # Replay guard: the epoch directory is the commit marker, and
        # after compaction folds markers into one snapshot the manifest
        # remembers them — a replay-after-compaction must stay a no-op,
        # or the batch band-joins against a store that now contains its
        # own ids (self-matches, corrupt match dir).
        if os.path.exists(epoch_sig) or epoch_id in _compacted_epochs(sig_dir):
            return
        sig_new = minhash_signatures(batch_df, id_col, text_col).localCheckpoint()
        # COMMITTED epochs only, as an explicit path list: a crash
        # leaves an epoch=N.inprogress directory behind, and the glob
        # "epoch=*" would read its partial parquet into the store —
        # silent signature corruption on the restart path.
        committed = (
            sorted(
                os.path.join(sig_dir, e)
                for e in os.listdir(sig_dir)
                if e.startswith("epoch=") and not e.endswith(".inprogress")
            )
            if os.path.isdir(sig_dir)
            else []
        )
        have_store = bool(committed)
        if banded_layout_k is None:
            sig_store = spark.read.parquet(*committed) if have_store else None
            matches = neardup_matches_against(
                sig_new, sig_store, id_col, est_threshold
            )
            store_epoch_df = sig_new
        else:
            # Pruning layout: the store holds BAND rows hive-partitioned
            # by pb = pmod(band_hash, K). The batch's distinct pb set is
            # bounded by 4×|batch|, so the store read prunes to those
            # partitions at planning time — the O(store)-per-batch scan
            # becomes O(store × |batch_pbs|/K).
            new_bands = signature_band_rows(sig_new, id_col).withColumn(
                "pb", F.pmod(F.col("band_hash"), F.lit(banded_layout_k))
            )
            store_bands = None
            if have_store:
                batch_pbs = [
                    r.pb for r in new_bands.select("pb").distinct().collect()
                ]
                store_bands = spark.read.option("basePath", sig_dir).parquet(
                    *committed
                ).filter(F.col("pb").isin(batch_pbs))
            matches = neardup_matches_against_banded(
                sig_new, store_bands, id_col, est_threshold
            )
            store_epoch_df = new_bands

        for final, df_out, part_cols in (
            (epoch_match, matches, None),
            (epoch_sig, store_epoch_df, ["pb"] if banded_layout_k else None),
        ):
            tmp = final + ".inprogress"
            shutil.rmtree(tmp, ignore_errors=True)
            w = df_out.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(tmp)
            os.replace(tmp, final)  # atomic publish; matches before sigs,
            # so a crash between the two replays the epoch (sig dir is
            # the commit marker) and overwrites the same match dir

    return sink


def compact_neardup_store(spark, store_dir: str) -> int:
    """Compact the incremental near-dup signature store: merge every
    ``epoch=<id>`` directory into one ``epoch=c<maxid>`` snapshot
    (atomic temp + rename, preserving the pb partitioning if present),
    then drop the source epochs. Keeps the per-batch store read at
    O(files-in-one-snapshot) instead of O(epochs) after long streams.

    Crash safety is deliberately cheap here: a crash between publish
    and source-epoch removal leaves DUPLICATE signature rows, which is
    benign — the matcher ends in ``distinct()`` so duplicated store
    rows can only produce identical match rows, never wrong ones (the
    next compaction removes them). The one sequence that is NOT benign
    — a stream crash after sink publish but before the checkpoint
    commit, with compaction running before restart — is covered by the
    ``_compacted_epochs.json`` manifest: the merged epochs' ids are
    recorded (atomic tmp+replace, BEFORE the marker directories are
    dropped) so the sink's replay guard still recognizes the replayed
    epoch as committed instead of band-joining the batch against a
    snapshot holding its own ids. Returns the number of epochs
    merged."""
    import json
    import os
    import re
    import shutil

    sig_dir = os.path.join(store_dir, "signatures")
    epochs = [
        e
        for e in os.listdir(sig_dir)
        if e.startswith("epoch=") and not e.endswith(".inprogress")
    ]
    if len(epochs) <= 1:
        return len(epochs)
    max_id = max(int(re.sub(r"\D", "", e) or 0) for e in epochs)
    df = spark.read.option("basePath", sig_dir).parquet(
        *[os.path.join(sig_dir, e) for e in epochs]
    ).drop("epoch")
    final = os.path.join(sig_dir, f"epoch=c{max_id}")
    tmp = final + ".inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    w = df.write.mode("overwrite")
    if "pb" in df.columns:
        w = w.partitionBy("pb")
    w.parquet(tmp)
    os.replace(tmp, final)
    # Record the merged replay markers before dropping them. Plain
    # numeric epochs are checkpoint batch ids; `epoch=c*` snapshots are
    # compaction artifacts already covered by earlier manifest entries.
    merged_ids = {
        int(e.split("=", 1)[1]) for e in epochs if re.fullmatch(r"epoch=\d+", e)
    }
    manifest = os.path.join(sig_dir, "_compacted_epochs.json")
    all_ids = sorted(_compacted_epochs(sig_dir) | merged_ids)
    tmp_manifest = manifest + ".inprogress"
    with open(tmp_manifest, "w") as fh:
        json.dump(all_ids, fh)
    os.replace(tmp_manifest, manifest)
    for e in epochs:
        shutil.rmtree(os.path.join(sig_dir, e), ignore_errors=True)
    return len(epochs)
