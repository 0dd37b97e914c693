"""LLM-data-pipeline operators (SURVEY §2.2 Q43–Q47): deduplication,
similarity search, text analysis, multimodal columns.

The reference has none of these — they are the declared engine
extension for training-data pipelines at 100 TB. Design rules applied
throughout: bucketed candidate generation (never all-pairs), JVM-side
expressions (no Python in hot paths), cross-engine-stable rounding
(``functions.numeric.mround``), and every SQL-expressible op carries a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from kafka_database_import_spark.functions.numeric import mround
from kafka_database_import_spark.functions.text import (
    LANG_MARKERS,
    language_guess,
    rolling_fingerprint,
    stopword_hits,
    token_count_bpe,
    tokens,
    word_shingles,
)
from kafka_database_import_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_candidate_pairs,
    simhash63,
)
from kafka_database_import_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
)
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# Q43 — deduplication, exact
# --------------------------------------------------------------------------


@query(
    "q43_exact_dedup",
    oracle="""
    SELECT sha256(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
    FROM documents
    GROUP BY sha256(text)
    ORDER BY text_hash NULLS LAST, n_copies NULLS LAST, keeper NULLS LAST
    """,
)
def q43_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: content-hash groupBy (one uniform shuffle;
    map-side partial agg). ``keeper = MIN(doc_id)`` is the canonical
    survivor policy."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered(exact_dedup_groups(docs, "doc_id", "text"))


@query(
    "q96_dedup_survivors",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY sha256(text))
    ORDER BY doc_id NULLS LAST, lang NULLS LAST
    """,
)
def q96_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: survivors semi-joined back —
    the shape a training pipeline actually consumes."""
    docs = load_table(spark, sf_dir, "documents")
    keepers = exact_dedup_groups(docs, "doc_id", "text").select("keeper")
    # No broadcast hint: keeper cardinality ~= |distinct docs|; must be
    # a shuffle semi-join at corpus scale (AQE broadcasts when small).
    out = docs.join(keepers, docs.doc_id == keepers.keeper, "left_semi").select(
        "doc_id", "lang"
    )
    return ordered(out)


# --------------------------------------------------------------------------
# Q44 — near-duplicate detection
# --------------------------------------------------------------------------


@query("q44_minhash_lsh")  # no oracle: engine-hash-dependent; property-tested
def q44_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (bucketed; see
    operators/dedup.py for the 100 TB plan shape). Fixture documents are
    unique word-soup so few/no pairs survive at default threshold —
    recall ≥ 0.9 on planted near-dups is asserted in
    tests/test_properties.py."""
    docs = load_table(spark, sf_dir, "documents")
    # Prefilter is opt-in on the operator (pure-banding default); the
    # catalog query opts in at 0.7×threshold — the measured-safe cut
    # (see operators/dedup.py docstring for the false-drop analysis).
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.5, signature_prefilter=0.7 * 0.5
    )
    return pairs.orderBy("id_a", "id_b")


@query("q97_simhash")  # no oracle: xxhash64 has no DuckDB twin; property-tested
def q97_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """63-bit SimHash signatures (near-dup ⇔ small hamming distance).
    One map-side-combinable aggregation; property-tested for the
    similar-text ⇒ close-signature invariant."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash63(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "q98_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(text), '\\s+')) - 1, 1)),
               i -> string_split_regex(lower(text), '\\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\\s+')[i+1] || ' ' ||
                    string_split_regex(lower(text), '\\s+')[i+2])) AS grams
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           FLOOR(len(list_intersect(a.grams, b.grams))::DOUBLE
                 / greatest(len(a.grams) + len(b.grams)
                            - len(list_intersect(a.grams, b.grams)), 1)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams)) > 0
    ORDER BY id_a NULLS LAST, id_b NULLS LAST, jaccard NULLS LAST
    """,
)
def q98_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over a bounded slice (doc_id < 40) — the
    ground-truth twin of q44's approximate path, differentially
    verified. The all-pairs join is bounded by construction here; at
    scale this runs only on LSH candidates (q44)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = docs.select(
        "doc_id", word_shingles(tokens(F.col("text"))).alias("grams")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    out = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("inter", inter)
        .filter(F.col("inter") > 0)
        .select(
            "id_a",
            "id_b",
            mround(F.col("inter").cast("double") / F.greatest(union, F.lit(1)), 4).alias(
                "jaccard"
            ),
        )
    )
    return ordered(out)


@query(
    "q63_dedup_clusters",
    oracle="""
    WITH RECURSIVE
    pairs AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey < 2000
    ),
    sym AS (SELECT src AS u, dst AS v FROM pairs
            UNION SELECT dst, src FROM pairs),
    walk(node, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.node
    )
    SELECT node AS part_key, MIN(label) AS component
    FROM walk GROUP BY node
    ORDER BY part_key NULLS LAST, component NULLS LAST
    """,
)
def q63_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of a pair list into duplicate clusters —
    the step between q44 (near-dup *pairs*) and "keep one per group":
    A≈B, B≈C ⇒ {A,B,C} one cluster. Runs label-propagation connected
    components (operators/graph.py; iterated join + min-agg with
    per-round localCheckpoint) on a deterministic co-occurrence graph
    — parts sharing an order — so the DuckDB twin is a recursive-CTE
    reachability fixpoint over the identical edge set. On a real
    corpus the edge input is q44's candidate-pair output."""
    from kafka_database_import_spark.operators.graph import connected_components

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    cc = connected_components(edges).select(
        F.col("node").alias("part_key"), "component"
    )
    return ordered(cc)


# --------------------------------------------------------------------------
# Q45 — similarity search
# --------------------------------------------------------------------------


@query(
    "q45_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    sims AS (
      SELECT q.query_id, c.cand_id,
             FLOOR(list_dot_product(q.qv, c.cv)
                   / greatest(sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.cv, c.cv)), 1e-12)
                   * 10000 + 0.5) / 10000 AS cosine_sim
      FROM q JOIN c ON c.cand_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, rank, cand_id, cosine_sim FROM ranked WHERE rank <= 5
    ORDER BY query_id NULLS LAST, rank NULLS LAST, cand_id NULLS LAST,
             cosine_sim NULLS LAST
    """,
)
def q45_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for queries vec_id < 10 (see
    operators/similarity.py for why this plan is also the small-query
    100 TB plan: broadcast queries, scan-local dot products, partial
    top-k before one shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return ordered(out, "query_id", "rank", "cand_id", "cosine_sim")


@query(
    "q99c_cosine_topk_blocked",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    sims AS (
      SELECT q.query_id, c.cand_id,
             FLOOR(list_dot_product(q.qv, c.cv)
                   / greatest(sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.cv, c.cv)), 1e-12)
                   * 10000 + 0.5) / 10000 AS cosine_sim
      FROM q JOIN c ON c.cand_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, rank, cand_id, cosine_sim FROM ranked WHERE rank <= 5
    ORDER BY query_id NULLS LAST, rank NULLS LAST, cand_id NULLS LAST,
             cosine_sim NULLS LAST
    """,
)
def q99c_cosine_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 via per-partition BLAS matmul — same answer
    and oracle as q45, different physical strategy (see
    operators/similarity.cosine_topk_blocked for the crossover
    rationale: Arrow+matmul wins as dim × |queries| grows)."""
    from kafka_database_import_spark.operators.similarity import cosine_topk_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk_blocked(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return ordered(out, "query_id", "rank", "cand_id", "cosine_sim")


@query("q99d_ivf_ann")  # no oracle: approximate; recall property-tested vs q45
def q99d_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (k-means cells + n_probe search,
    operators/similarity.ivf_topk). Measured at sf0.01: recall 0.72 at
    n_probe=4/16 lists, 0.90 at n_probe=8 — ahead of sign-LSH on the
    same near-random fixture because the cells adapt to the data."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.orderBy("query_id", "rank", "cand_id")


@query("q99b_lsh_ann")  # no oracle: approximate; recall property-tested vs q45
def q99b_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k — the large-query-set scale path
    (bucket join, never all-pairs). Recall vs the exact q45 is asserted
    in tests/test_properties.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.orderBy("query_id", "rank", "cand_id")


# --------------------------------------------------------------------------
# Q46 — text analysis
# --------------------------------------------------------------------------


@query(
    "q46_text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
           length(text) AS n_chars_m,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x IN ('the','and','of','to','a'))) AS n_stopwords,
           FLOOR(length(replace(text, ' ', ''))::DOUBLE
                 / greatest(len(string_split_regex(lower(text), '\\s+')), 1)
                 * 100 + 0.5) / 100 AS avg_token_len,
           list_reduce(list_prepend(0, list_transform(
               string_split_regex(lower(text), '\\s+'), w -> len(w))),
               (a, b) -> (a * 31 + b) % 1073741789) AS fingerprint
    FROM documents
    ORDER BY doc_id NULLS LAST, n_tokens NULLS LAST, n_chars_m NULLS LAST,
             n_bpe_tokens NULLS LAST, n_stopwords NULLS LAST,
             avg_token_len NULLS LAST, fingerprint NULLS LAST
    """,
)
def q46_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: whitespace + BPE-ish token counts,
    stopword hits, average token length, order-sensitive rolling
    fingerprint — all single-pass scan-local expressions."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    out = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        token_count_bpe("text").alias("n_bpe_tokens"),
        stopword_hits(t, LANG_MARKERS["en"]).alias("n_stopwords"),
        mround(
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.greatest(F.size(t), F.lit(1))
        ).alias("avg_token_len"),
        rolling_fingerprint(t).alias("fingerprint"),
    )
    return ordered(out)


@query(
    "q99e_quality_histogram",
    oracle="""
    SELECT lang,
           CAST(FLOOR(n_chars / 100) AS BIGINT) AS len_bucket,
           COUNT(*) AS n_docs,
           FLOOR(AVG(n_chars::DOUBLE) * 100 + 0.5) / 100 AS avg_chars
    FROM documents
    GROUP BY lang, CAST(FLOOR(n_chars / 100) AS BIGINT)
    ORDER BY lang NULLS LAST, len_bucket NULLS LAST, n_docs NULLS LAST,
             avg_chars NULLS LAST
    """,
)
def q99e_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality histogram: language × length-bucket with counts —
    the filter-design view of a training corpus (width_bucket-style
    binning; low-cardinality groupBy, map-side combinable)."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.groupBy(
        "lang", F.floor(F.col("n_chars") / 100).alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        mround(F.avg(F.col("n_chars").cast("double"))).alias("avg_chars"),
    )
    return ordered(out)


def _langid_oracle_case() -> str:
    """CASE cascade mirroring functions.text.language_guess (alphabetical
    tiebreak via evaluation order)."""
    hits = {
        lang: (
            "len(list_filter(string_split_regex(lower(text), '\\s+'), "
            f"x -> x IN ({', '.join(repr(w) for w in ws)})))"
        )
        for lang, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = "\n           ".join(
        f"WHEN {best} > 0 AND {hits[lang]} = {best} THEN '{lang}'"
        for lang in sorted(hits)
    )
    return f"CASE {whens} ELSE 'und' END"


@query(
    "q99f_language_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           {_langid_oracle_case()} AS guessed_lang
    FROM documents
    ORDER BY doc_id NULLS LAST, labeled_lang NULLS LAST, guessed_lang NULLS LAST
    """,
)
def q99f_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-frequency language-ID heuristic next to the fixture label.
    (Fixture text is synthetic shared-vocabulary word-soup, so the
    heuristic's *accuracy* is meaningless here — the differential check
    verifies the scoring/tiebreak logic itself.)"""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        language_guess(tokens(F.col("text"))).alias("guessed_lang"),
    )
    return ordered(out)


# --------------------------------------------------------------------------
# Q47 — multimodal columns
# --------------------------------------------------------------------------



@query(
    "q47_multimodal_columns",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           length(text) AS n_bytes,
           sha256(text) AS content_hash,
           source AS origin
    FROM documents
    ORDER BY doc_id NULLS LAST, modality NULLS LAST, n_bytes NULLS LAST,
             content_hash NULLS LAST, origin NULLS LAST
    """,
)
def q47_multimodal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pattern: opaque ``binary`` payload + typed
    metadata struct + content hash. Fixture payloads are UTF-8 text
    bytes (no image/audio libs in the sandbox); the schema/partitioning
    pattern is identical for real media. The oracle checks byte-level
    agreement (sha256 over the exact payload bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.col("source").alias("origin"),
    )
    out = docs.select(
        "doc_id", payload.alias("payload"), meta.alias("meta"),
        F.sha2(payload, 256).alias("content_hash"),
    ).select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "content_hash",
        F.col("meta.origin").alias("origin"),
    )
    return ordered(out)


@query("q99h_multimodal_decode")  # no oracle: Arrow-UDF path; unit-tested
def q99h_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via ``mapInPandas``
    (Arrow batches — the real plumbing for image/audio decode at scale;
    see multimodal/decode.py for the extractor registry and how codec
    dependencies degrade in this sandbox)."""
    from kafka_database_import_spark.multimodal.decode import extract_text_features

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_text_features(docs).orderBy("doc_id")


@query("q99i_image_decode")  # no oracle: Arrow-UDF decode; unit + self-check
def q99i_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode at catalog level: synthesize a deterministic
    BMP per document (seeded by doc_id) in one mapInPandas pass, then
    run ``extract_image_features`` (codec-free BMP header parse +
    NumPy) over the binary payloads — the full encode→Arrow→decode
    round trip the multimodal pipeline would run on real media.
    Self-checking by construction: ``width == 8 + doc_id % 16`` and the
    stored per-image mean equals the extractor's recomputed mean."""
    from kafka_database_import_spark.multimodal.decode import (
        encode_bmp as _enc,
        extract_image_features,
    )

    enc = _enc  # closure-capture for by-value pickling on workers

    def _synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, means = [], []
            for doc_id in pdf["doc_id"]:
                rng = np.random.default_rng(int(doc_id))
                w, h = 8 + int(doc_id) % 16, 8 + int(doc_id) % 8
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                payloads.append(enc(img))
                means.append(float(img.reshape(-1, 3).mean()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "gen_mean": means}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(500)
    corpus = docs.mapInPandas(
        _synth, schema="doc_id long, payload binary, gen_mean double"
    )
    feats = extract_image_features(corpus)
    out = (
        feats.join(corpus.select("doc_id", "gen_mean"), "doc_id")
        .select(
            "doc_id",
            "format",
            "width",
            "height",
            F.round((F.col("mean_r") + F.col("mean_g") + F.col("mean_b")) / 3, 6).alias(
                "mean_rgb"
            ),
            F.round("gen_mean", 6).alias("gen_mean"),
            (
                F.abs((F.col("mean_r") + F.col("mean_g") + F.col("mean_b")) / 3 - F.col("gen_mean"))
                < 1e-6
            ).alias("mean_ok"),
        )
        .orderBy("doc_id")
    )
    return out


@query(
    "q71_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127
               AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> floor(x / scale + 0.5)::INT) AS qv
      FROM s
    )
    SELECT vec_id,
           len(qv) AS n_dims,
           array_to_string(qv, ',') AS q_str,
           FLOOR(scale * 1e6 + 0.5) / 1e6 AS scale_r,
           FLOOR(list_max(list_transform(range(1, len(v) + 1),
                   i -> abs(qv[i] * scale - v[i]))) * 1e6 + 0.5) / 1e6
             AS max_err_r
    FROM q
    ORDER BY vec_id NULLS LAST, n_dims NULLS LAST, q_str NULLS LAST,
             scale_r NULLS LAST, max_err_r NULLS LAST
    """,
)
def q71_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — 4×
    compression of the dominant storage/shuffle cost of an embedding
    corpus (float32[64] → int8[64] + one f64 scale). Per-vector
    absmax/127 scaling, round-half-up, all scan-local JVM expressions;
    the oracle re-derives the identical arithmetic (explicit
    FLOOR(x+0.5) rounding, engine-neutral). ``max_err_r`` bounds the
    reconstruction error at ≤ scale/2 per dimension by construction —
    the property that makes quantized cosine/L2 a safe first-pass
    filter (rerank the top candidates at full precision, q45-style)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    emb = emb.select("vec_id", v.alias("v"))
    absmax = F.array_max(F.transform("v", F.abs))
    scale = F.greatest(absmax, F.lit(1e-12)) / 127
    emb = emb.select("vec_id", "v", scale.alias("scale"))
    qv = F.transform("v", lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"))
    emb = emb.select("vec_id", "v", "scale", qv.alias("qv"))
    err = F.array_max(
        F.zip_with("qv", "v", lambda qi, xi: F.abs(qi * F.col("scale") - xi))
    )
    out = emb.select(
        "vec_id",
        F.size("qv").alias("n_dims"),
        F.concat_ws(",", F.transform("qv", lambda x: x.cast("string"))).alias(
            "q_str"
        ),
        (F.floor(F.col("scale") * 1e6 + 0.5) / 1e6).alias("scale_r"),
        (F.floor(err * 1e6 + 0.5) / 1e6).alias("max_err_r"),
    )
    return ordered(out)


@query(
    "q74_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    )
    SELECT term, COUNT(*) AS n
    FROM tok GROUP BY term
    ORDER BY n DESC, term ASC
    LIMIT 20
    """,
)
def q74_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 tokens (vocabulary heavy hitters) with a
    deterministic tiebreak. explode → partial-agg → one shuffle on the
    token → TakeOrderedAndProject: the map-side combine collapses each
    partition to its local vocabulary before the exchange, so shuffle
    volume is |vocab|·partitions, not |tokens| — the property that
    makes corpus-scale term counting tractable. The mergeable-sketch
    alternative for when even the vocabulary doesn't fit (Count-Min,
    ``F.count_min_sketch``) is property-tested in
    tests/test_properties.py against these exact counts."""
    docs = load_table(spark, sf_dir, "documents")
    from kafka_database_import_spark.functions.text import tokens

    out = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(20)
    )
    return out


@query(
    "q75_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
    r AS (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, d.doc_freq ASC,
                                         t.term ASC) AS rnk
      FROM tf t JOIN df d ON t.term = d.term
    )
    SELECT doc_id, term, tf, doc_freq, rnk FROM r WHERE rnk <= 3
    ORDER BY doc_id NULLS LAST, term NULLS LAST, tf NULLS LAST,
             doc_freq NULLS LAST, rnk NULLS LAST
    """,
)
def q75_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinguishing terms, ranked tf-idf-style but
    on the *integer* pair (tf DESC, doc-frequency ASC) with an
    alphabetical tiebreak — the exact ordering float tf·idf induces,
    without the cross-engine float-log divergence. Plan shape: one
    shuffle to (doc, term), a vocabulary-sized aggregate for document
    frequencies joined back on the term key, then the q25-style
    WindowGroupLimit partial top-k per document. The df table is
    |vocab| rows — at corpus scale it broadcast-joins; AQE picks that
    up from runtime stats."""
    from kafka_database_import_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    out = (
        tf.join(dfreq, "term")
        .select(
            "doc_id", "term", "tf", "doc_freq",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )
    return ordered(out)


@query(
    "q76_repetition_filter",
    oracle="""
    WITH th AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\\s+'), w ->
               list_reduce(list_prepend(0::BIGINT,
                 list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                 (a, b) -> (a * 31 + b) % 1073741789)) AS th
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(th)),
                    i -> th[i] * 1073741789 + th[i+1])) AS gram
      FROM th WHERE len(th) >= 2
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY doc_id, gram),
    s AS (SELECT doc_id, MAX(n) AS top_n, SUM(n) AS total FROM c GROUP BY doc_id)
    SELECT doc_id, top_n, total,
           FLOOR(top_n::DOUBLE / total * 1e4 + 0.5) / 1e4 AS top_frac,
           CASE WHEN top_n::DOUBLE / total > 0.2 THEN 1 ELSE 0 END AS flagged
    FROM s
    ORDER BY doc_id NULLS LAST, top_n NULLS LAST, total NULLS LAST,
             top_frac NULLS LAST, flagged NULLS LAST
    """,
)
def q76_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scoring (the Gopher/Dolma
    "top-2-gram fraction" quality filter): share of a document's word
    bigrams taken by its single most frequent bigram; >0.2 flags
    boilerplate-/loop-generated text. Aggregation is per-document —
    explode bigrams, count within (doc, gram), max/sum per doc — so the
    shuffle key is the doc id and the op scales embarrassingly; no
    corpus-wide state at all. Bigrams are INTEGER ids (token poly-hash
    pairs packed collision-free: a*P+b with both hashes < P), not
    concatenated strings — same interpreted-lambda cost lesson as q70,
    and the shuffle rows are 16 bytes instead of strings."""
    from kafka_database_import_spark.functions.text import (
        POLY_MOD,
        poly_hash,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    th = F.transform(tokens(F.col("text")), poly_hash)
    docs = docs.select("doc_id", th.alias("th")).filter(F.size("th") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("th") - 1),
        lambda i: F.element_at("th", i) * POLY_MOD + F.element_at("th", i + 1),
    )
    g = docs.select("doc_id", F.explode(grams).alias("gram"))
    c = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("n"))
    s = c.groupBy("doc_id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total")
    )
    frac = F.col("top_n").cast("double") / F.col("total")
    out = s.select(
        "doc_id", "top_n", "total",
        (F.floor(frac * 1e4 + 0.5) / 1e4).alias("top_frac"),
        F.when(frac > 0.2, 1).otherwise(0).alias("flagged"),
    )
    return ordered(out)


@query(
    "q80_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 16 AS shard,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    p AS (
      SELECT shard, FLOOR((cum - n_tokens) / 512)::BIGINT AS seq_id, n_tokens
      FROM c
    )
    SELECT shard, seq_id, COUNT(*) AS n_docs, SUM(n_tokens) AS seq_tokens
    FROM p GROUP BY shard, seq_id
    ORDER BY shard NULLS LAST, seq_id NULLS LAST, n_docs NULLS LAST,
             seq_tokens NULLS LAST
    """,
)
def q80_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing — concatenating documents into
    fixed-token-budget training sequences (the step between a cleaned
    corpus and a pretraining dataloader). Docs are packed in doc_id
    order by running token count (BPE-ish pre-split, q46's counter);
    a doc starts a new sequence when its START offset crosses the
    512-token boundary. Packing is per-SHARD (doc_id mod 16): a global
    ordered cumsum would be one total sort with a sequential tail —
    sharding makes the window partitioned, so packing parallelizes
    with the data and stays deterministic (shard + order are pure
    functions of the key). One shuffle on shard; everything else is
    window arithmetic."""
    from pyspark.sql import Window

    from kafka_database_import_spark.functions.text import token_count_bpe

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 16).alias("shard"),
        token_count_bpe(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.select(
        "shard", "n_tokens", F.sum("n_tokens").over(w).alias("cum")
    )
    p = c.select(
        "shard",
        F.floor((F.col("cum") - F.col("n_tokens")) / 512).cast("bigint").alias("seq_id"),
        "n_tokens",
    )
    out = p.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )
    return ordered(out)


@query(
    "q99m_vocab_build",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
      FROM documents
    ),
    c AS (
      SELECT token, COUNT(*)::BIGINT AS freq FROM tok
      GROUP BY token HAVING COUNT(*) >= 5
    )
    SELECT token, freq,
           ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS vocab_id
    FROM c
    ORDER BY token NULLS LAST, freq NULLS LAST, vocab_id NULLS LAST
    """,
)
def q99m_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction — the tokenizer-training precursor every
    corpus pipeline runs: token frequencies (one (token) shuffle with
    map-side combine), min-count threshold, then contiguous ids
    assigned by (freq DESC, token ASC). The id assignment is a global
    ROW_NUMBER — a single-partition window, which is correct HERE
    because a min-count-thresholded vocabulary is orders of magnitude
    smaller than the corpus (the 100 TB posture: ~1e6 rows through one
    task after a corpus-sized distributed aggregation; if ids need not
    be dense, zipWithIndex-free range partitioning would remove even
    that)."""
    from kafka_database_import_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    c = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.col("freq") >= 5)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    out = c.select("token", "freq", F.row_number().over(w).alias("vocab_id"))
    return ordered(out)


@query(
    "q99n_source_rebalance",
    oracle="""
    WITH c AS (
      SELECT source, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY source
    ),
    t AS (SELECT MIN(cnt) AS target FROM c)
    SELECT doc_id, src AS source FROM (
      SELECT d.doc_id AS doc_id, d.source AS src
      FROM documents d JOIN c ON d.source = c.source CROSS JOIN t
      WHERE (d.doc_id * 2654435761) % 1048576 * c.cnt < t.target * 1048576
    )
    ORDER BY doc_id NULLS LAST, source NULLS LAST
    """,
)
def q99n_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: deterministically downsample every
    source to the size of the smallest one. The keep decision is pure
    integer arithmetic — Knuth multiplicative hash of the doc id into
    2^20 buckets, kept iff ``bucket·cnt < target·2^20`` — so it is (a)
    engine-reproducible (no rand(), no engine hash), (b) stable under
    re-partitioning and re-runs, and (c) exact-rate without a second
    pass. Plan: one tiny per-source count aggregate broadcast back onto
    the scan (AQE turns the join into a broadcast automatically), the
    global min crossed in as a 1-row broadcast — the corpus itself
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    t = c.agg(F.min("cnt").alias("target"))
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1048576))
    out = (
        docs.join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .filter(bucket * F.col("cnt") < F.col("target") * F.lit(1048576))
        .select("doc_id", "source")
    )
    return ordered(out)


@query("q99p_pq_ann")  # no oracle: k-means-dependent; recall property-tested
def q99p_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py:pq_topk):
    per-subspace k-means codebooks, 32× vector compression for the
    candidate pass, asymmetric-distance scoring via per-query lookup
    tables, exact rerank on a bounded shortlist. Recall ≥ 0.6 vs the
    exact q45 path asserted in tests/test_properties.py (measured
    ~0.84 at sf0.01 defaults)."""
    from kafka_database_import_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_topk(emb, queries, k=5).orderBy("query_id", "rank")


@query("q99zf_ivfpq_ann")  # no oracle: k-means-dependent; recall property-tested
def q99zf_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.py:ivfpq_topk): coarse k-means
    cells + product quantization of the RESIDUAL, asymmetric distance
    within probed cells, exact rerank. The scale ANN path for clustered
    embedding spaces, where flat PQ's codes collapse to per-cluster
    ties (measured collapse + recovery in SCALE.md round 4). Recall vs
    the exact q45 path asserted in tests/test_properties.py."""
    from kafka_database_import_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_topk(emb, queries, k=5, n_lists=16, n_probe=4).orderBy(
        "query_id", "rank"
    )


# --------------------------------------------------------------------------
# Q47 extensions — audio / video / resize (multimodal/media.py)
# --------------------------------------------------------------------------


@query(
    "q99zn_audio_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(1 + doc_id % 2 AS INT) AS channels,
             CAST(500 + doc_id % 7 AS BIGINT) AS n_frames
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200)
    ),
    fr AS (SELECT doc_id, channels, n_frames,
                  unnest(generate_series(0, n_frames - 1)) AS i
           FROM d),
    s AS (SELECT doc_id, channels, n_frames, i,
                 unnest(generate_series(0, channels - 1)) AS ch
          FROM fr),
    x AS (SELECT doc_id, channels, n_frames, i, ch,
                 ((doc_id*3 + i*5 + ch*11) % 256 - 128) * 64 AS v
          FROM s),
    agg AS (
      SELECT doc_id,
             CAST(SUM(v * v) AS BIGINT) AS sum_sq,
             CAST(MAX(ABS(v)) AS INT) AS peak
      FROM x GROUP BY doc_id
    ),
    zc AS (
      SELECT doc_id, COUNT(*) AS zero_crossings
      FROM (
        SELECT doc_id, (v >= 0) AS sgn,
               LAG(v >= 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM x WHERE ch = 0
      ) WHERE prev IS NOT NULL AND sgn <> prev
      GROUP BY doc_id
    )
    SELECT d.doc_id, 8000 AS sample_rate, d.channels, d.n_frames,
           agg.sum_sq, agg.peak,
           CAST(COALESCE(zc.zero_crossings, 0) AS BIGINT) AS zero_crossings,
           d.n_frames * 125 AS duration_us
    FROM d JOIN agg USING (doc_id) LEFT JOIN zc USING (doc_id)
    ORDER BY doc_id NULLS LAST
    """,
)
def q99zn_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode at catalog level: synthesize a deterministic
    16-bit PCM WAV per document (mono/stereo alternating, sample value
    a closed-form function of (doc_id, i, channel)), push the bytes
    through the full RIFF encode → Arrow → chunk-walk decode →
    feature-extract path (``multimodal/media.py``), and emit the
    integer-exact features (Σx², peak, zero-crossings). Because the
    waveform is closed-form, DuckDB recomputes every feature from
    ``generate_series`` — a full hash oracle over a binary-codec path.
    ``duration_us`` is derived integer arithmetic
    (``n_frames·10⁶ div rate``), exact at 8 kHz."""
    from kafka_database_import_spark.multimodal.media import (
        encode_wav as _enc,
        extract_audio_features,
        yield_chunked,
    )

    # closure-capture for by-value pickling on workers (both factory-made)
    enc, chunk = _enc, yield_chunked

    def _synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                channels = 1 + doc_id % 2
                n = 500 + doc_id % 7
                i = np.arange(n, dtype=np.int64)[:, None]
                ch = np.arange(channels, dtype=np.int64)[None, :]
                x = ((doc_id * 3 + i * 5 + ch * 11) % 256 - 128) * 64
                payloads.append(enc(x.astype(np.int16), 8000))
            yield from chunk(
                pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(200)
    corpus = docs.mapInPandas(_synth, schema="doc_id long, payload binary")
    feats = extract_audio_features(corpus)
    out = feats.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        "sum_sq",
        "peak",
        "zero_crossings",
        F.expr("n_frames * 1000000 div sample_rate").alias("duration_us"),
    )
    return ordered(out, "doc_id")


@query(
    "q99zo_video_frame_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(16 + doc_id % 8 AS INT) AS width,
             CAST(8 + doc_id % 4 AS INT) AS height,
             CAST(4 + doc_id % 9 AS INT) AS n_frames
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    ),
    fr AS (
      SELECT doc_id, width, height, n_frames,
             unnest(generate_series(0, n_frames - 1)) AS f
      FROM d
    ),
    sampled AS (SELECT * FROM fr WHERE f % 3 = 0),
    rr AS (SELECT doc_id, width, height, n_frames, f,
                  unnest(generate_series(0, height - 1)) AS r
           FROM sampled),
    cc AS (SELECT doc_id, width, height, n_frames, f, r,
                  unnest(generate_series(0, width - 1)) AS c
           FROM rr)
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           n_frames, width, height,
           CAST(SUM((doc_id*31 + f*17 + r + c) % 256) AS BIGINT) AS y_sum
    FROM cc
    GROUP BY doc_id, f, n_frames, width, height
    ORDER BY doc_id NULLS LAST, frame_idx NULLS LAST
    """,
)
def q99zo_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling at catalog level: synthesize a
    deterministic YUV4MPEG2 (C444) stream per document — per-frame Y
    plane a closed-form gradient of (doc_id, frame, row, col) — then
    run the one-to-many ``sample_video_frames`` pass (every 3rd frame,
    integer luma sum per sampled frame). The decode fan-out shape
    (rows out ≠ rows in, single Arrow pass) that real frame extraction
    uses at 100 TB; the closed-form pixels give DuckDB a full hash
    oracle over the container parse + plane geometry."""
    from kafka_database_import_spark.multimodal.media import (
        encode_y4m as _enc,
        sample_video_frames,
        yield_chunked,
    )

    enc, chunk = _enc, yield_chunked

    def _synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 16 + doc_id % 8, 8 + doc_id % 4
                n_frames = 4 + doc_id % 9
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                frames = []
                for f in range(n_frames):
                    y = ((doc_id * 31 + f * 17 + r + c) % 256).astype(np.uint8)
                    uv = np.full((h, w), 128, np.uint8)
                    frames.append(np.stack([y, uv, uv]))
                payloads.append(enc(frames, fps=25))
            yield from chunk(pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads}))

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    corpus = docs.mapInPandas(_synth, schema="doc_id long, payload binary")
    out = sample_video_frames(corpus, every_n=3)
    return ordered(out, "doc_id", "frame_idx")


@query(
    "q99zp_image_resize",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(8 + doc_id % 16 AS BIGINT) AS src_w,
             CAST(8 + doc_id % 8 AS BIGINT) AS src_h
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 300)
    ),
    rr AS (SELECT doc_id, src_w, src_h, unnest(generate_series(0, 4)) AS r FROM d),
    cc AS (SELECT doc_id, src_w, src_h, r, unnest(generate_series(0, 6)) AS c FROM rr)
    SELECT doc_id,
           7 AS width, 5 AS height,
           CAST(SUM((doc_id + (r * src_h) // 5 + (c * src_w) // 7) % 256) AS BIGINT)
             AS y_sum,
           CAST(MAX(doc_id % 256) AS INT) AS tl,
           CAST(MAX((doc_id + (4 * src_h) // 5 + (6 * src_w) // 7) % 256) AS INT) AS br
    FROM cc
    GROUP BY doc_id
    ORDER BY doc_id NULLS LAST
    """,
)
def q99zp_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (thumbnail) pass at catalog level: synthesize a
    deterministic gradient BMP per document (pixel value
    ``(doc_id + row + col) % 256`` in all channels, per-doc geometry),
    run ``resize_images`` (codec-free decode → nearest-neighbor
    ``(dst·src)//out`` index mapping → BMP re-encode), then decode the
    RESIZED payloads and emit integer pixel evidence (channel-0 sum +
    corner pixels). Both the resize arithmetic and the BMP round trip
    are closed-form, so DuckDB recomputes the expected thumbnail
    pixels exactly — a hash oracle over a binary→binary media op."""
    from kafka_database_import_spark.multimodal.decode import (
        decode_image,
        encode_bmp as _enc,
    )
    from kafka_database_import_spark.multimodal.media import resize_images, yield_chunked

    enc, dec, chunk = _enc, decode_image, yield_chunked

    def _synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 16, 8 + doc_id % 8
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                px = ((doc_id + r + c) % 256).astype(np.uint8)
                payloads.append(enc(np.broadcast_to(px, (h, w, 3)).copy()))
            yield from chunk(pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads}))

    def _evidence(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                fmt, px = dec(bytes(buf))
                rows.append(
                    (
                        doc_id,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px[:, :, 0].sum(dtype="int64")),
                        int(px[0, 0, 0]),
                        int(px[-1, -1, 0]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "y_sum", "tl", "br"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(300)
    corpus = docs.mapInPandas(_synth, schema="doc_id long, payload binary")
    resized = resize_images(corpus, out_w=7, out_h=5)
    out = resized.mapInPandas(
        _evidence,
        schema="doc_id long, width int, height int, y_sum long, tl int, br int",
    )
    return ordered(out, "doc_id")


@query("q99zw_stream_neardup")  # no oracle: streaming + estimate-based; unit-tested
def q99zw_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-duplicate detection (the online q44;
    operators/dedup.incremental_neardup_sink): the documents corpus
    arrives as two micro-batches (split by doc_id parity, mtime-pinned
    file stream); each batch is minhashed, band-joined against the
    growing signature store, and its matches + signatures are published
    as atomic epoch snapshots — replay-idempotent by directory
    existence, no ledger rows. Returns all flagged pairs; the estimate
    rule (≥ 8/16 equal minhashes ≈ J ≥ 0.5) matches the batch q44
    threshold, and the store holds signatures only (136 B/doc — the
    100 TB contract: history never re-reads text). Round 14: the sink
    runs its DEFAULT store layout, which is now the banded
    ``pmod(band_hash, K)`` hive-partitioned one — each batch's band
    keys prune the store read instead of re-scanning the whole corpus
    (flat-slope measurement in SCALE.md; identical match set pinned by
    tests/test_streaming.py)."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    from kafka_database_import_spark.operators.dedup import incremental_neardup_sink

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    work = os.path.join(tempfile.gettempdir(), f"kdis_stream_nd_{tag}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    store = os.path.join(work, "store")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for parity, mtime in ((0, 1_000), (1, 2_000)):
        scratch = tempfile.mkdtemp(prefix="kdis_nd_stage_")
        docs.filter(F.col("doc_id") % 2 == parity).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = os.path.join(src, f"b{parity}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(dst, (mtime, mtime))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(incremental_neardup_sink(store))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    mdir = os.path.join(store, "matches")
    committed = sorted(
        os.path.join(mdir, e)
        for e in os.listdir(mdir)
        if e.startswith("epoch=") and not e.endswith(".inprogress")
    )
    out = spark.read.parquet(*committed).select(
        "id_new", "id_base", mround(F.col("est"), 4).alias("est_q4")
    )
    return ordered(out, "id_new", "id_base", "est_q4")


@query(
    "q99zy_random_projection",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(generate_series(0, len(embedding) - 1)) AS j
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, j, CAST(FLOOR(x * 1000 + 0.5) AS BIGINT) AS qx FROM s
    ),
    ks AS (SELECT unnest(generate_series(0, 15)) AS k),
    sgn AS (
      SELECT q.vec_id, q.j, q.qx, ks.k,
             ((q.j * 2654435761 + ks.k * 40503 + 11) % 1000003) AS x1
      FROM q, ks
    ),
    sgn2 AS (
      SELECT vec_id, j, qx, k,
             ((x1 * x1 + j * 97 + k * 65027) % 1000003) AS x2
      FROM sgn
    )
    SELECT vec_id,
           CAST(k AS INT) AS k,
           CAST(SUM(qx * (1 - 2 * (((x2 * x2 + 3) % 1000003) % 2)))
                AS BIGINT) AS proj
    FROM sgn2
    GROUP BY vec_id, k
    ORDER BY vec_id NULLS LAST, k NULLS LAST, proj NULLS LAST
    """,
)
def q99zy_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection (operators/similarity.random_projection):
    64-d embeddings → 16-d integer sketches via the hash-sign matrix,
    entirely inside whole-stage codegen (one aggregate(transform(...))
    per output dim — no explode of the input, no shuffle, no Python).
    Quantized-integer arithmetic makes every projected coordinate
    exact, so DuckDB replays the identical PRF sign matrix and sums —
    a full hash oracle over the dimensionality-reduction pass that
    fronts ANN at scale. Distance-preservation quality is property-
    tested separately (tests/test_properties.py)."""
    from kafka_database_import_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    out = random_projection(emb, "vec_id", "embedding", out_dim=16)
    return ordered(out, "vec_id", "k", "proj")


@query(
    "q99zza_weighted_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id, n_chars,
             pow(((doc_id * 2654435761 + 12345) % 1000003 + 1) / 1000004.0,
                 1.0 / greatest(n_chars, 1)) AS pri
      FROM documents
    ),
    top AS (SELECT * FROM p ORDER BY pri DESC, doc_id LIMIT 50)
    SELECT doc_id, n_chars, FLOOR(pri * 1e9 + 0.5) / 1e9 AS pri_q9
    FROM top
    ORDER BY doc_id NULLS LAST, n_chars NULLS LAST, pri_q9 NULLS LAST
    """,
)
def q99zza_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each document draws priority
    ``u^(1/w)`` with weight w = n_chars and u a PRF-uniform from its
    id — the top-k by priority IS a weighted sample, reproducible
    run-to-run and engine-to-engine because u is integer arithmetic
    (no rand()). The top-k runs as TakeOrderedAndProject: per-partition
    partial top-k, only k rows per partition reach the driver-side
    merge — the distributed shape weighted corpus subsampling needs at
    100 TB (same plan class as q24). Priorities are quantized to 1e-9
    in the OUTPUT only (libm pow may differ in the last ulp across
    engines; the k-boundary gap is ~1.8e-5 at sf0.01, so membership is
    robust) — selection itself uses full precision."""
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(2654435761) + 12345) % 1000003 + 1) / F.lit(
        1000004.0
    )
    pri = F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1)))
    top = (
        docs.select("doc_id", "n_chars", pri.alias("pri"))
        .orderBy(F.col("pri").desc(), "doc_id")
        .limit(50)
    )
    out = top.select(
        "doc_id",
        "n_chars",
        (F.floor(F.col("pri") * 1e9 + 0.5) / 1e9).alias("pri_q9"),
    )
    return ordered(out, "doc_id", "n_chars", "pri_q9")


@query(
    "q99zzf_bm25_ranked_retrieval",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n, SUM(dl) AS t FROM dl),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qterms(query_id, term) AS (VALUES
      (1, 'spark'), (1, 'join'), (1, 'filter'),
      (2, 'hash'), (2, 'table'), (2, 'scan'),
      (3, 'window'), (3, 'agg'), (3, 'batch')),
    contrib AS (
      SELECT q.query_id, f.doc_id,
             CAST(FLOOR(LN((2.0 * s.n + 2) / (2 * d.df + 1)) * 10000 + 0.5)
                  AS BIGINT)
               * ((2 * (44 * f.tf * s.t) * 10000
                   + (20 * f.tf * s.t + 6 * s.t + 18 * l.dl * s.n))
                  // (2 * (20 * f.tf * s.t + 6 * s.t + 18 * l.dl * s.n)))
               AS c_e8
      FROM tf f
      JOIN qterms q ON f.term = q.term
      JOIN dfreq d  ON f.term = d.term
      JOIN dl l     ON f.doc_id = l.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT query_id, doc_id, SUM(c_e8) AS score_e8,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY SUM(c_e8) DESC, doc_id ASC) AS rnk
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id,
           CAST(score_e8 AS DOUBLE) / 1e8 AS score, rnk
    FROM scored WHERE rnk <= 10
    ORDER BY query_id NULLS LAST, doc_id NULLS LAST, score NULLS LAST,
             rnk NULLS LAST
    """,
)
def q99zzf_bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the q75 inverted-index shape (VERDICT
    r4 item 4): three literal keyword queries, top-10 documents each.

    Exactness: BM25's tf-saturation ``tf·(k1+1)/(tf + k1·(1-b+b·dl/
    avgdl))`` with the textbook k1=1.2, b=0.75 is ALGEBRAICALLY
    RATIONAL — multiplying through by 20·T (T = total corpus tokens,
    avgdl = T/N) gives ``44·tf·T / (20·tf·T + 6·T + 18·dl·N)``, an
    exact integer ratio fixed-pointed at 1e4 by round-half-up INTEGER
    division (no float ever touches it). The idf is the Lucene
    non-negative form ``ln((N+0.5+0.5)/(df+0.5)) = ln((2N+2)/(2df+1))``
    — a float ln of an exact integer ratio, floor-rounded at 1e4; a
    cross-engine divergence would need libm to differ within ~1e-12 of
    a rounding boundary over the few thousand distinct df values
    (measured margin far larger; same discipline as q82's pow note).
    Scores are then SUMS OF INTEGERS — order-independent and exact.

    Plan shape at 100 TB: one (doc,term) shuffle builds tf; dl reuses
    the doc key; the query-term join broadcasts 9 rows and PRUNES the
    posting lists to the query vocabulary before any scoring work; the
    two corpus stats are bounded driver-side scalars folded into the
    expressions as literals (no join at all); per-query top-10 is the
    q25 WindowGroupLimit partial top-k."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus stats are TWO bounded scalars (N docs, T tokens) — collect
    # once driver-side (the _partsupp/zorder discipline) rather than a
    # 1-row join Catalyst would fold into a nested-loop cross
    n_docs, total_tok = dl.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = spark.createDataFrame(
        [
            (1, "spark"), (1, "join"), (1, "filter"),
            (2, "hash"), (2, "table"), (2, "scan"),
            (3, "window"), (3, "agg"), (3, "batch"),
        ],
        "query_id int, term string",
    )
    idf_e4 = F.floor(
        F.log((2.0 * n_docs + 2) / (2 * F.col("df") + 1)) * 10000 + 0.5
    ).cast("long")
    num = 44 * F.col("tf") * F.lit(total_tok)
    den = (
        20 * F.col("tf") * F.lit(total_tok)
        + 6 * F.lit(total_tok)
        + 18 * F.col("dl") * F.lit(n_docs)
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .withColumn("num", num)
        .withColumn("den", den)
        .select(
            "query_id",
            "doc_id",
            (
                idf_e4 * F.expr("(2 * num * 10000 + den) div (2 * den)")
            ).alias("c_e8"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e8").desc(), F.col("doc_id").asc()
    )
    out = (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.sum("c_e8").alias("score_e8"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id",
            "doc_id",
            (F.col("score_e8").cast("double") / 1e8).alias("score"),
            "rnk",
        )
    )
    return ordered(out, "query_id", "doc_id", "score", "rnk")
