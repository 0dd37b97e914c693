"""Mergeable-sketch operators — the aggregation pattern that makes
100 TB distinct-counting incremental.

``approx_count_distinct`` (q18) answers one query; a *persisted* HLL
sketch answers every future query over any union of the sketched
groups without rescanning the data: build per-partition/per-day
sketches once (binary column, a few KB each), store them, and
``hll_union_agg`` collapses any subset — cross-day, cross-source,
cross-table — into an estimate in milliseconds. That build-once /
merge-forever shape is the only way rolling distinct-user metrics stay
sublinear at corpus scale; re-aggregating raw events is a full scan
per question. Spark's implementation is the public Apache DataSketches
HllSketch (``F.hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

Reference parity: the reference has no sketch surface (its metric is
an exact running row counter, kafka-database-import.go:215-218); this
is declared engine surface for the training-data-pipeline tier.

No DuckDB oracle — sketch binaries are engine-specific — so the
contract is pinned by property tests (tests/test_properties.py):
±5 % accuracy vs exact distinct, and exact merge-consistency
(union of per-group sketches ≡ one global sketch, byte-for-byte
estimate equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table

# Fixed log2m so sketches built in different jobs/rounds stay
# union-compatible; unions of mismatched precisions downgrade.
HLL_LGK = 12


def build_sketches(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, sketch) — one mergeable HLL binary per group. This is
    the map-side-combinable aggregation: partial sketches merge inside
    each partition before the single shuffle on ``group_col``."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(HLL_LGK)).alias("sketch")
    )


def merge_sketches(sketches: DataFrame, group_col: str | None = None) -> DataFrame:
    """Collapse stored sketches — the no-rescan re-aggregation path.
    ``group_col=None`` → one global row."""
    agg = F.hll_union_agg("sketch").alias("sketch")
    return (
        sketches.groupBy(group_col).agg(agg) if group_col else sketches.agg(agg)
    )


@query("q69_hll_sketch_merge")  # no oracle: sketch binaries are engine-specific
def q69_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct count: per-event-type HLL sketches
    over ``user_id``, then a global estimate from *unioning the
    sketches* — the raw events are scanned exactly once. Output is one
    row per event type plus an ``__all__`` row whose estimate comes
    from the sketch union, never from re-reading events."""
    events = load_table(spark, sf_dir, "events")
    per_type = build_sketches(events, "event_type", "user_id")
    type_rows = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    global_row = merge_sketches(per_type).select(
        F.lit("__all__").alias("scope"),
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    return ordered(type_rows.unionAll(global_row))


def build_bitmaps(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, bucket, bitmap) — EXACT mergeable distinct state.

    Where the HLL path above trades exactness for fixed size, dense
    non-negative integer id domains (user ids, doc ids) admit an exact
    sketch: Spark's ``bitmap_construct_agg`` packs ids into 4 KB bitmap
    segments, one per ``bitmap_bucket_number(id)`` (32 768 ids each).
    The aggregation is map-side combinable (bitmaps OR together inside
    each partition before the shuffle), and the stored (group, bucket,
    bitmap) rows are a *mergeable exact* distinct state: tomorrow's
    events OR into today's bitmaps without rescanning either day —
    ``bitmap_or_agg`` — and re-counting any union of groups is a scan
    of KB-sized bitmaps, not TB of raw events. At 100 TB this is the
    exact counterpart of the HLL rollup: state is bounded by the id
    domain (÷ 32 768 buckets × groups), not by event volume."""
    return df.groupBy(
        F.col(group_col),
        F.bitmap_bucket_number(F.col(value_col).cast("long")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col(value_col).cast("long"))
        ).alias("bitmap")
    )


def merge_bitmaps(bitmaps: DataFrame, group_cols: list[str]) -> DataFrame:
    """OR previously-built bitmap states together (cross-day /
    cross-source union) — bucket stays in the key so segments of the
    same id range merge with each other."""
    return bitmaps.groupBy(*group_cols, "bucket").agg(
        F.bitmap_or_agg("bitmap").alias("bitmap")
    )


def bitmap_distinct(bitmaps: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse (group, bucket, bitmap) state to exact distinct counts:
    buckets partition the id domain, so per-group counts are the SUM of
    per-bucket popcounts."""
    return bitmaps.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count("bitmap")).alias("n_distinct")
    )


@query(
    "q99zg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type NULLS LAST, n_users NULLS LAST
    """,
)
def q99zg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type computed through the
    mergeable bitmap state (build → count), differentially checked
    against plain COUNT(DISTINCT). Unlike q17's expand-based exact
    count-distinct, the shuffled state here is one 4 KB bitmap per
    (type, 32 768-id bucket) — at 100 TB the shuffle volume is bounded
    by the id domain, not the event count, and the intermediate state
    is persistable for incremental re-counting (see build_bitmaps)."""
    events = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    state = build_bitmaps(events, "event_type", "user_id")
    counts = bitmap_distinct(state, ["event_type"]).withColumnRenamed(
        "n_distinct", "n_users"
    )
    return ordered(counts, "event_type", "n_users")


def build_histogram_sketch(
    df: DataFrame, group_col: str, value_col: str, lo: int, hi: int, n_buckets: int
) -> DataFrame:
    """(group, bucket, cnt) — a fixed-range equi-width histogram as a
    MERGEABLE quantile sketch (the fourth classic sketch next to HLL
    distinct, count-min frequency, and bitmap exact-distinct).

    State is ≤ ``n_buckets`` integer counts per group regardless of row
    count; two days' histograms merge by ADDING counts; any quantile
    reads off the cumulative counts with error ≤ one bucket width —
    deterministic, integer-only, engine-exact. Honest trade-off vs
    KLL/t-digest: the value range must be known up front (true for
    bounded business domains — prices, latencies with a cap, scores)
    and error is absolute in VALUE space, not rank space. Values
    outside [lo, hi) clamp into the edge buckets."""
    width = (hi - lo) // n_buckets
    if width <= 0:
        raise ValueError("hi - lo must be >= n_buckets (integer bucket width)")
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)).cast("long")
    return df.groupBy(F.col(group_col), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def merge_histogram_sketches(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Add counts bucket-wise — cross-day/cross-source union without
    rescanning raw data."""
    return sketches.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketches: DataFrame, group_col: str, qs_pct: list[int], lo: int, hi: int, n_buckets: int
) -> DataFrame:
    """(group, q_pct, bucket_lo) — for each requested percentile, the
    lower edge of the first bucket whose cumulative count reaches
    ``ceil(q% · total)`` (percentile_disc rank semantics, integer
    arithmetic end to end)."""
    from pyspark.sql import Window

    width = (hi - lo) // n_buckets
    w = Window.partitionBy(group_col).orderBy("bucket")
    cum = sketches.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(group_col))
    )
    qdf = cum.sparkSession.createDataFrame(
        [(q,) for q in qs_pct], "q_pct LONG"
    )
    hit = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("cum") * 100 >= F.col("q_pct") * F.col("total")
    )
    first = (
        hit.groupBy(group_col, "q_pct")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            group_col,
            "q_pct",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
        )
    )
    return first


@query(
    "q99zm_histogram_quantiles",
    oracle="""
    WITH cents AS (
      SELECT o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    ),
    b AS (
      SELECT status,
             LEAST(GREATEST(CAST(FLOOR(c / 60000) AS BIGINT), 0), 999) AS bucket,
             COUNT(*) AS cnt
      FROM cents GROUP BY 1, 2
    ),
    cum AS (
      SELECT status, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY status ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY status) AS total
      FROM b
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS q_pct)
    SELECT status, q_pct,
           MIN(bucket) * 60000 AS bucket_lo
    FROM cum CROSS JOIN qs
    WHERE cum * 100 >= q_pct * total
    GROUP BY status, q_pct
    ORDER BY status NULLS LAST, q_pct NULLS LAST, bucket_lo NULLS LAST
    """,
)
def q99zm_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order value per status THROUGH the mergeable
    histogram sketch (1,000 buckets over [0, 600k) in integer cents,
    bucket width 60000 = $600): build → cumulative-rank extraction,
    integer arithmetic end to end so DuckDB running the identical
    bucket formula matches bit-for-bit. Contrast q53's exact
    percentiles (full sort per group — the right answer when you can
    afford a rescan) and q53b's approx_percentile (better error, not
    mergeable-persistable): this state is ≤1,000 longs per group,
    persists, and merges across days by addition
    (merge_histogram_sketches; merge-consistency property-tested)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c"),
    )
    sk = build_histogram_sketch(cents, "status", "c", 0, 60_000_000, 1000)
    out = histogram_quantiles(sk, "status", [50, 90, 99], 0, 60_000_000, 1000)
    return ordered(out, "status", "q_pct", "bucket_lo")


@query(
    "q99zzb_kmv_theta_sketch",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             (user_id * 2654435761 + 98765) % 2000003 AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS r
      FROM h
    ),
    sk AS (
      SELECT event_type,
             list(hv ORDER BY hv) FILTER (r <= 256) AS vals,
             CAST(COUNT(*) AS BIGINT) AS n_t,
             CAST(MAX(CASE WHEN r <= 256 THEN hv END) AS BIGINT) AS kth
      FROM ranked GROUP BY event_type
    ),
    sk2 AS (
      SELECT event_type, vals, n_t,
             CASE WHEN n_t < 256 THEN 2000003 ELSE kth END AS theta
      FROM sk
    ),
    est AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             least(a.theta, b.theta) AS theta,
             CAST(len(list_filter(list_intersect(a.vals, b.vals),
                                  x -> x < least(a.theta, b.theta)))
                  AS BIGINT) AS inter_cnt,
             CAST(len(list_filter(list_distinct(list_concat(a.vals, b.vals)),
                                  x -> x < least(a.theta, b.theta)))
                  AS BIGINT) AS union_cnt
      FROM sk2 a JOIN sk2 b ON a.event_type < b.event_type
    ),
    ex AS (
      SELECT x.type_a, x.type_b,
             CAST(SUM(CASE WHEN x.in_a + x.in_b = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS exact_inter,
             CAST(COUNT(*) AS BIGINT) AS exact_union
      FROM (
        SELECT p.type_a, p.type_b, h.hv,
               MAX(CASE WHEN h.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN h.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
        FROM (SELECT DISTINCT a.event_type AS type_a, b.event_type AS type_b
              FROM (SELECT DISTINCT event_type FROM h) a
              JOIN (SELECT DISTINCT event_type FROM h) b
                ON a.event_type < b.event_type) p
        JOIN h ON h.event_type IN (p.type_a, p.type_b)
        GROUP BY p.type_a, p.type_b, h.hv
      ) x
      GROUP BY x.type_a, x.type_b
    )
    SELECT est.type_a AS type_a, est.type_b AS type_b, est.theta,
           est.inter_cnt * 2000003 // est.theta AS est_inter,
           est.union_cnt * 2000003 // est.theta AS est_union,
           ex.exact_inter, ex.exact_union
    FROM est JOIN ex ON est.type_a = ex.type_a AND est.type_b = ex.type_b
    ORDER BY type_a NULLS LAST, type_b NULLS LAST, theta NULLS LAST,
             est_inter NULLS LAST, est_union NULLS LAST,
             exact_inter NULLS LAST, exact_union NULLS LAST
    """,
)
def q99zzb_kmv_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketches — the sketch family member HLL can't be:
    set-EXPRESSION estimates (intersection as well as union) from k
    minimum hash values. The hash is a PRF (integer arithmetic, no
    rand()), so the k-minimums, thetas, and every estimate are
    deterministic integers both engines reproduce bit-for-bit — a full
    hash oracle over a sketch algorithm, with the exact pair counts
    alongside for calibration. Sets smaller than k degrade to exact
    (theta = M) by construction.

    Plan shape at 100 TB: one distinct shuffle on (type, hash), the
    per-type k-minimums via WindowGroupLimit (partial top-k before the
    shuffle — q25's plan class), then all pair algebra on a 5-row
    broadcast frame of ≤256-element arrays. The sketch IS the shuffle
    bound: no pairwise work ever touches the fact table."""
    M, K = 2_000_003, 256
    events = load_table(spark, sf_dir, "events")
    h = (
        events.select(
            "event_type",
            ((F.col("user_id") * F.lit(2654435761) + 98765) % M).alias("hv"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    r = Window.partitionBy("event_type").orderBy("hv")
    ranked = h.withColumn("r", F.row_number().over(r))
    sk = (
        ranked.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("r") <= K, F.col("hv")))
            ).alias("vals"),
            F.count(F.lit(1)).alias("n_t"),
            F.max(F.when(F.col("r") <= K, F.col("hv"))).alias("kth"),
        )
        .withColumn(
            "theta",
            F.when(F.col("n_t") < K, F.lit(M)).otherwise(F.col("kth")),
        )
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("vals").alias("va"),
        F.col("theta").alias("ta"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("vals").alias("vb"),
        F.col("theta").alias("tb"),
    )
    theta = F.least("ta", "tb")
    below = lambda arr: F.size(F.filter(arr, lambda x: x < theta))
    est = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            theta.alias("theta"),
            below(F.array_intersect("va", "vb")).cast("long").alias("inter_cnt"),
            below(F.array_union("va", "vb")).cast("long").alias("union_cnt"),
        )
    )
    pairs = (
        h.select(F.col("event_type").alias("type_a"))
        .distinct()
        .join(
            h.select(F.col("event_type").alias("type_b")).distinct(),
            F.col("type_a") < F.col("type_b"),
        )
    )
    member = pairs.join(
        h,
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    ex = (
        member.groupBy("type_a", "type_b", "hv")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.when(F.col("in_a") + F.col("in_b") == 2, 1).otherwise(0)
            )
            .cast("long")
            .alias("exact_inter"),
            F.count(F.lit(1)).alias("exact_union"),
        )
    )
    out = est.join(ex, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "theta",
        F.expr("inter_cnt * 2000003 div theta").alias("est_inter"),
        F.expr("union_cnt * 2000003 div theta").alias("est_union"),
        "exact_inter",
        "exact_union",
    )
    return ordered(
        out,
        "type_a",
        "type_b",
        "theta",
        "est_inter",
        "est_union",
        "exact_inter",
        "exact_union",
    )
