"""Training-corpus cleaning operators (the Dolma/C4 class of
transforms): PII scrubbing, boilerplate-line removal, benchmark
decontamination. All scan-local or single-shuffle, all DuckDB-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.text import tokens, word_shingles
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table

# Public-pattern PII regexes (C4/Dolma-style cleaning). Kept simple and
# identical in both engines — the point is the pipeline shape, not
# regex completeness.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


@query(
    "q62_corpus_prep_pipeline",
    oracle=f"""
    WITH survivors AS (
      SELECT * FROM documents
      WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY sha256(text))
    ),
    kept AS (
      SELECT * FROM survivors
      WHERE (least(len(string_split_regex(lower(text), '\\s+'))::DOUBLE / 60, 1.0) * 0.5
             + least(n_chars::DOUBLE / 300, 1.0) * 0.5) >= 0.5
    ),
    scrubbed AS (
      SELECT lang,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{URL_RE}', '<URL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
      FROM kept
    )
    SELECT lang, COUNT(*) AS n_docs, SUM(length(clean_text)) AS total_chars
    FROM scrubbed
    GROUP BY lang
    ORDER BY lang NULLS LAST, n_docs NULLS LAST, total_chars NULLS LAST
    """,
)
def q62_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep flow as ONE composed pipeline — exact dedup
    → quality filter → PII scrub → per-language accounting. This is the
    LLM-pipeline analog of q48's relational pipeline: every stage is an
    operator already verified in isolation (q43/q99g/q59); the
    composition check proves they chain without re-shuffling — dedup's
    hash shuffle is the only exchange, everything downstream is
    scan-local on its output."""
    from kafka_database_import_spark.operators.dedup import exact_dedup_groups

    docs = load_table(spark, sf_dir, "documents")
    keepers = exact_dedup_groups(docs, "doc_id", "text").select("keeper")
    # No broadcast hint: the keeper set is ~|distinct docs| — at corpus
    # scale it must shuffle-join on doc_id; AQE still picks broadcast
    # when the build side is actually small.
    survivors = docs.join(keepers, docs.doc_id == keepers.keeper, "left_semi")
    t = tokens(F.col("text"))
    quality = (
        F.least(F.size(t).cast("double") / 60, F.lit(1.0)) * 0.5
        + F.least(F.col("n_chars").cast("double") / 300, F.lit(1.0)) * 0.5
    )
    kept = survivors.filter(quality >= 0.5)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    out = (
        kept.select("lang", clean.alias("clean_text"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("clean_text")).alias("total_chars"),
        )
    )
    return ordered(out)


@query(
    "q64_hash_split",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 100 < 90 THEN 'validation'
                ELSE 'test' END AS split_name
    FROM documents
    ORDER BY doc_id NULLS LAST, bucket NULLS LAST, split_name NULLS LAST
    """,
)
def q64_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment: bucket =
    md5(doc_id) first-8-hex-digits mod 100 → 80/10/10. The reproducible
    alternative to ``randomSplit`` for corpus curation — stable across
    runs, engines, partitionings, and cluster sizes, because the split
    is a pure function of the row key (both engines compute the
    identical standard md5). Scan-local, no shuffle, no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    out = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("split_name"),
    )
    return ordered(out)


@query(
    "q59_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
           length(text)
             - length(regexp_replace(text, '{EMAIL_RE}', '', 'g')) AS email_chars
    FROM documents
    ORDER BY doc_id NULLS LAST, clean_text NULLS LAST, email_chars NULLS LAST
    """,
)
def q59_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/URL/phone patterns replaced with typed
    placeholder tokens — pure ``regexp_replace`` chain, scan-local,
    whole-stage codegen. (Fixture text is synthetic word-soup, so most
    rows pass through unchanged — the differential check still covers
    the replacement semantics byte-for-byte on every row.)"""
    docs = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    out = docs.select(
        "doc_id",
        clean.alias("clean_text"),
        (
            F.length("text") - F.length(F.regexp_replace("text", EMAIL_RE, ""))
        ).alias("email_chars"),
    )
    return ordered(out)


@query(
    "q60_boilerplate_lines",
    oracle="""
    WITH toklines AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df
      FROM toklines GROUP BY tok
    )
    SELECT tok, df
    FROM freq
    WHERE df >= 0.75 * (SELECT COUNT(*) FROM documents)
    ORDER BY tok NULLS LAST, df NULLS LAST
    """,
)
def q60_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (C4-style): units that appear in almost
    every document are template noise, not content. Fixture docs have
    no line structure, so the unit here is the token; the pipeline
    shape (explode → document-frequency → threshold) is identical for
    lines or paragraphs. One shuffle on the unit, count-distinct on
    doc_id map-side partial. Threshold is a corpus-size fraction (75 %)
    — a broadcast scalar, so the cutoff scales with the corpus instead
    of going vacuous at small SFs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    out = freq.crossJoin(F.broadcast(total)).filter(
        F.col("df") >= 0.75 * F.col("n_docs")
    ).select("tok", "df")
    return ordered(out)


@query(
    "q61_decontamination",
    oracle="""
    WITH th AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\\s+'), w ->
               list_reduce(list_prepend(0::BIGINT,
                 list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                 (a, b) -> (a * 31 + b) % 1073741789)) AS th
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(th) >= 3 THEN
               list_distinct(list_transform(range(1, len(th) - 1),
                 i -> ((th[i] * 1000003 + th[i+1]) % 1073741789 * 1000003
                       + th[i+2]) % 1073741789))
             ELSE [] END AS grams
      FROM th
    ),
    bg AS (SELECT unnest(grams) AS gram FROM sh WHERE doc_id < 5),
    cg AS (SELECT doc_id, unnest(grams) AS gram FROM sh WHERE doc_id >= 5)
    SELECT doc_id, COUNT(*) AS shared
    FROM cg JOIN bg ON cg.gram = bg.gram
    GROUP BY doc_id
    ORDER BY doc_id NULLS LAST, shared NULLS LAST
    """,
)
def q61_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing 3-gram
    shingles with a benchmark set (docs 0-4 stand in for an eval set).
    Shape: explode each doc's distinct shingle ids once, hash-join
    against the broadcast benchmark shingle bag, count matches per doc
    — each (corpus-gram, bench-doc) hit counts once, i.e. the sum of
    per-bench-doc intersection sizes, without a bench-side crossJoin
    multiplying the corpus |bench| times. Shingles are integer ids
    (q70's token-poly-hash combine; the oracle runs the identical
    arithmetic, so even hash collisions agree).

    Expression-structure note: the shingle array is built as ONE
    self-contained expression (slice the token-hash array at offsets
    0/1/2, zip, combine) instead of referencing a ``th`` column from a
    previous projection. This plan is consumed twice (broadcast bench
    side + corpus side), and CollapseProject inlines cross-projection
    column references into every use site — with per-element
    ``element_at(th, i)`` references that meant re-evaluating the whole
    token-hash pass per element (measured 96 s at sf0.1; this form is
    ~2 s). Slicing references the array a bounded 3 times per ROW, not
    per element. At real scale the broadcast bag becomes a broadcast
    Bloom filter and the count degrades to a may-contain screen + exact
    recheck of survivors."""
    from kafka_database_import_spark.functions.text import (
        POLY_MOD,
        poly_hash,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    th = F.transform(tokens(F.col("text")), poly_hash)
    # Generate barrier: exploding a singleton array pins ``th`` as a real
    # attribute — CollapseProject cannot merge a Project into a Generate,
    # so the token-hash pass runs exactly once per row even though the
    # slices below reference it three times and the plan is consumed by
    # two join sides (without it: 3 evals/row; with cross-projection
    # column refs instead: per-ELEMENT re-evaluation, measured 96 s at
    # sf0.1 vs 1.3 s for this form).
    d = docs.select("doc_id", F.explode(F.array(th)).alias("th"))
    n_sh = F.greatest(F.size("th") - 2, F.lit(0))
    z = F.arrays_zip(
        F.slice("th", 1, n_sh).alias("a"),
        F.slice("th", 2, n_sh).alias("b"),
        F.slice("th", 3, n_sh).alias("c"),
    )
    grams = F.array_distinct(
        F.transform(
            z,
            lambda s: ((s["a"] * 1000003 + s["b"]) % POLY_MOD * 1000003 + s["c"])
            % POLY_MOD,
        )
    )
    sh = d.select("doc_id", grams.alias("grams"))
    bench = sh.filter(F.col("doc_id") < 5).select(F.explode("grams").alias("gram"))
    corpus = sh.filter(F.col("doc_id") >= 5).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    out = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return ordered(out)


@query(
    "q66_stratified_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 30 END)
    ORDER BY doc_id NULLS LAST, lang NULLS LAST, bucket NULLS LAST
    """,
)
def q66_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates (10 % of
    the dominant 'en' stratum, 30 % of the rest — i.e. downsample the
    over-represented language) decided row-locally from the md5 key
    bucket, same scheme as q64. No RNG, no shuffle, no per-stratum
    pass: one scan-local predicate regardless of stratum count, which
    is what makes it usable as a corpus-mixing primitive at 100 TB
    (``sampleBy`` re-rolls per run; this is stable under retries and
    across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(30)
    out = docs.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < rate
    )
    return ordered(out)


@query(
    "q70_winnow_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
    ),
    th AS (
      SELECT doc_id,
             list_transform(t, w ->
               list_reduce(list_prepend(0::BIGINT,
                 list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                 (a, b) -> (a * 31 + b) % 1073741789)) AS th
      FROM toks
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(th) >= 3 THEN
               list_transform(range(1, len(th) - 1),
                 i -> ((th[i] * 1000003 + th[i+1]) % 1073741789 * 1000003
                       + th[i+2]) % 1073741789)
             ELSE [] END AS hs
      FROM th
    ),
    fp AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(range(1, len(hs) - 2),
                                            i -> list_min(hs[i:i+3])))
             WHEN len(hs) >= 1 THEN [list_min(hs)]
             ELSE [] END AS fps
      FROM sh
    ),
    ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
    ORDER BY doc_a NULLS LAST, doc_b NULLS LAST, n_shared NULLS LAST
    """,
)
def q70_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm) for corpus overlap detection: hash every
    positional 3-word shingle, keep the minimum hash of each sliding
    window of 4 (so any shared run of >=6 words is guaranteed to share
    a fingerprint), then find document pairs sharing >=2 fingerprints.
    The winnow keeps ~1/w of the shingle hashes while preserving the
    overlap guarantee — that density reduction is what makes the
    pair-finding shuffle affordable at corpus scale. The shuffle itself
    is the LSH-band shape (explode selected fingerprints → shuffle on
    fingerprint → emit co-bucketed pairs), never an all-pairs compare.

    Hashing cost note (measured at sf0.1): higher-order-function
    lambdas evaluate interpreted, outside whole-stage codegen, so
    per-CHARACTER work per shingle is 12 s; hashing each token's
    characters ONCE (engine-neutral polynomial, functions/text.
    poly_hash) and combining the three token hashes arithmetically per
    shingle is the same fingerprint family at 2 s. Linear in document
    length either way, but the constant matters when the expression
    interpreter is the engine."""
    from kafka_database_import_spark.functions.text import (
        POLY_MOD,
        poly_hash,
        tokens,
    )

    w = 4
    docs = load_table(spark, sf_dir, "documents")
    th = F.transform(tokens(F.col("text")), poly_hash)
    docs = docs.select("doc_id", th.alias("th"))
    n_tok = F.size("th")
    shingle = lambda i: (  # noqa: E731
        (F.element_at("th", i) * 1000003 + F.element_at("th", i + 1))
        % POLY_MOD
        * 1000003
        + F.element_at("th", i + 2)
    ) % POLY_MOD
    hs = F.when(
        n_tok >= 3, F.transform(F.sequence(F.lit(1), n_tok - 2), shingle)
    ).otherwise(F.array().cast("array<long>"))
    docs = docs.select("doc_id", hs.alias("hs"))
    n_win = F.size("hs") - (w - 1)
    fps = (
        F.when(
            F.size("hs") >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda i: F.array_min(F.slice("hs", i, w)),
                )
            ),
        )
        .when(F.size("hs") >= 1, F.array(F.array_min("hs")))
        .otherwise(F.array().cast("array<long>"))
    )
    ex = docs.select("doc_id", F.explode(fps).alias("fp"))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return ordered(pairs)


@query(
    "q99zzk_stratified_sample",
    oracle="""
    WITH h AS (
      SELECT c_mktsegment AS segment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             ((c_custkey * 2654435761) % 1000003) % 1000 AS slot
      FROM customer
    ),
    q AS (
      SELECT segment,
             CASE segment WHEN 'BUILDING' THEN 500 WHEN 'MACHINERY' THEN 250
                          WHEN 'AUTOMOBILE' THEN 100 ELSE 50 END AS permille
      FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)
    )
    SELECT h.segment AS segment, COUNT(*) AS n_sampled,
           SUM(h.cents) AS cents_sampled,
           MAX(q.permille) AS permille
    FROM h JOIN q ON h.segment = q.segment
    WHERE h.slot < q.permille
    GROUP BY h.segment
    ORDER BY h.segment NULLS LAST, n_sampled NULLS LAST,
             cents_sampled NULLS LAST, permille NULLS LAST
    """,
)
def q99zzk_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC stratified sampling — per-stratum fractions via an
    integer hash threshold instead of ``sampleBy``'s RNG: row kept iff
    ``PRF(key) mod 1000 < permille[stratum]``, with the repo's Knuth
    multiplicative PRF so both engines select the IDENTICAL sample
    (sampleBy's Bernoulli draw can never be cross-engine-oracled, and
    at 100 TB reproducible samples are what make train/eval splits and
    A/B cohorts auditable/resumable — same reason q82's weighted
    sampler is deterministic). Plan: pure scan-local codegen filter,
    broadcast of the 5-row fraction table, one partial-agg shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    fractions = {
        "BUILDING": 500, "MACHINERY": 250, "AUTOMOBILE": 100,
    }
    frac_df = F.broadcast(
        cust.select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .withColumn(
            "permille",
            F.coalesce(
                *[
                    F.when(F.col("segment") == s, F.lit(p))
                    for s, p in fractions.items()
                ],
                F.lit(50),
            ),
        )
    )
    h = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        (((F.col("c_custkey") * 2654435761) % 1000003) % 1000).alias("slot"),
    )
    out = (
        h.join(frac_df, "segment")
        .filter(F.col("slot") < F.col("permille"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("cents").alias("cents_sampled"),
            F.max("permille").alias("permille"),
        )
    )
    return ordered(out, "segment", "n_sampled", "cents_sampled", "permille")


@query(
    "q99zzl_entity_resolution",
    oracle="""
    WITH RECURSIVE recs AS (
      SELECT c_custkey * 2 AS rec_id,
             'cust-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS txt,
             c_custkey % 300 AS blk
      FROM customer
      UNION ALL
      SELECT c_custkey * 3 + 1000000,
             'cust-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || 'x',
             c_custkey % 300
      FROM customer
      UNION ALL
      SELECT c_custkey * 3 + 2000000,
             'cust-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || 'xyz',
             c_custkey % 300
      FROM customer
    ),
    edges AS (
      SELECT a.rec_id AS u, b.rec_id AS v
      FROM recs a JOIN recs b
        ON a.blk = b.blk AND a.rec_id < b.rec_id
       AND levenshtein(a.txt, b.txt) <= 2
    ),
    sym AS (
      SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
    ),
    reach(src, dst) AS (
      SELECT rec_id, rec_id FROM recs
      UNION
      SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
    ),
    canon AS (SELECT src AS rec_id, MIN(dst) AS canonical FROM reach GROUP BY src),
    comps AS (SELECT canonical, COUNT(*) AS n_records FROM canon GROUP BY canonical)
    SELECT n_records, COUNT(*) AS n_components,
           SUM(canonical) AS canonical_checksum
    FROM comps GROUP BY n_records
    ORDER BY n_records NULLS LAST, n_components NULLS LAST,
             canonical_checksum NULLS LAST
    """,
)
def q99zzl_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY RESOLUTION as a composition of the engine's verified
    primitives: deterministic record corpus (each customer appears as
    THREE textual variants forming an edit-distance CHAIN — base ↔
    base+'x' ↔ base+'xyz', where the ends are distance 3 apart and
    only connect THROUGH the middle record, so resolution genuinely
    requires transitive closure, not pairwise matching; md5-derived so
    both engines synthesize the IDENTICAL strings) → blocked candidate
    pairs (join within a
    300-bucket blocking key — never all-pairs; the 100 TB shape) →
    exact Levenshtein match (≤2, integer, engine-identical) →
    CONNECTED COMPONENTS over the match graph (operators/graph.py label
    propagation) → canonical id = component min → component-size
    distribution with a canonical-id checksum.

    The differential value: Spark resolves transitive identity with
    iterative label propagation while the oracle uses a recursive-CTE
    reachability closure — two entirely different algorithms that must
    agree on every component, including any accidental cross-entity
    chains the md5 corpus happens to contain. Singleton records (no
    edges) keep themselves as canonical via the left join."""
    from kafka_database_import_spark.operators.graph import (
        connected_components,
    )

    cust = load_table(spark, sf_dir, "customer")
    base_txt = F.concat(
        F.lit("cust-"), F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8)
    )
    recs = (
        cust.select(
            (F.col("c_custkey") * 2).alias("rec_id"),
            base_txt.alias("txt"),
            (F.col("c_custkey") % 300).alias("blk"),
        )
    ).unionByName(
        cust.select(
            (F.col("c_custkey") * 3 + 1_000_000).alias("rec_id"),
            F.concat(base_txt, F.lit("x")).alias("txt"),
            (F.col("c_custkey") % 300).alias("blk"),
        )
    ).unionByName(
        cust.select(
            (F.col("c_custkey") * 3 + 2_000_000).alias("rec_id"),
            F.concat(base_txt, F.lit("xyz")).alias("txt"),
            (F.col("c_custkey") % 300).alias("blk"),
        )
    )
    a, b = recs.alias("a"), recs.alias("b")
    edges = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.rec_id") < F.col("b.rec_id"))
        & (F.levenshtein(F.col("a.txt"), F.col("b.txt")) <= 2),
    ).select(F.col("a.rec_id").alias("src"), F.col("b.rec_id").alias("dst"))
    comp = connected_components(edges)
    canon = (
        recs.join(comp, recs.rec_id == comp.node, "left")
        .select(
            "rec_id",
            F.coalesce(F.col("component"), F.col("rec_id")).alias("canonical"),
        )
    )
    comps = canon.groupBy("canonical").agg(F.count(F.lit(1)).alias("n_records"))
    out = comps.groupBy("n_records").agg(
        F.count(F.lit(1)).alias("n_components"),
        F.sum("canonical").alias("canonical_checksum"),
    )
    return ordered(out, "n_records", "n_components", "canonical_checksum")
