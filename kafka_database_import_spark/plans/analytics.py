"""Analytical surface beyond the SURVEY §2 minimum: pivot, subquery
forms, exact percentiles, and TPC-H-shaped multi-join aggregations —
the queries a user of a general engine writes on day two. All
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.numeric import avg_exact, dround, money, mround
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


@query(
    "q51_pivot",
    oracle="""
    SELECT n_name,
           COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                        THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0)::DOUBLE
             AS automobile,
           COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                        THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0)::DOUBLE
             AS building,
           COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                        THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0)::DOUBLE
             AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name NULLS LAST, automobile NULLS LAST, building NULLS LAST,
             machinery NULLS LAST
    """,
)
def q51_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): segment balances per nation. The pivot
    values are declared explicitly — an undeclared pivot needs an extra
    distinct-values job before planning, a full scan you never want at
    100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(F.sum(money("c_acctbal")))
    )
    cols = [F.col("n_name")] + [
        F.coalesce(F.col(s), F.lit(0)).cast("double").alias(s.lower()) for s in segs
    ]
    return ordered(out.select(*cols))


@query(
    "q52_subqueries",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY c_custkey NULLS LAST, c_acctbal NULLS LAST
    """,
)
def q52_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated-EXISTS subqueries through the SQL surface.
    Catalyst rewrites the scalar subquery to a broadcast and the EXISTS
    to a left-semi join — the same physical shapes as the DataFrame
    catalog entries, arrived at from SQL."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    out = spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
          AND EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        """
    )
    return ordered(out)


@query(
    "q53_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(CAST(l_quantity AS DECIMAL(12,2)), 0.5)
                 AS DECIMAL(18,6)), 2)::DOUBLE AS median_qty,
           ROUND(CAST(quantile_cont(CAST(l_quantity AS DECIMAL(12,2)), 0.95)
                 AS DECIMAL(18,6)), 2)::DOUBLE AS p95_qty,
           quantile_disc(CAST(l_quantity AS DECIMAL(12,2)), 0.5)::DOUBLE
             AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag NULLS LAST, median_qty NULLS LAST, p95_qty NULLS LAST,
             median_disc NULLS LAST
    """,
)
def q53_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous + discrete) per group. Exact
    percentile requires a per-group sort — at 100 TB prefer
    ``approx_percentile`` (mergeable sketch, one pass); the exact form
    is the oracle-checkable ground truth. Quantities are exact 2dp
    decimals so interpolation happens on exact values in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = money("l_quantity")
    out = li.groupBy("l_returnflag").agg(
        F.round(F.percentile(qty, F.lit(0.5)).cast("decimal(18,6)"), 2)
        .cast("double")
        .alias("median_qty"),
        F.round(F.percentile(qty, F.lit(0.95)).cast("decimal(18,6)"), 2)
        .cast("double")
        .alias("p95_qty"),
        F.median(qty).cast("double").alias("median_disc"),
    )
    return ordered(out)


@query(
    "q56_unpivot",
    oracle="""
    SELECT p_partkey, metric,
           ROUND(CAST(val AS DECIMAL(12,2)), 2)::DOUBLE AS val
    FROM (
      SELECT p_partkey, 'retail_price' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size_units' AS metric, CAST(p_size AS DOUBLE) FROM part
    )
    ORDER BY p_partkey NULLS LAST, metric NULLS LAST, val NULLS LAST
    """,
)
def q56_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of q51): wide part attributes to long
    (key, metric, value) form via ``unpivot`` — scan-local 1→N row
    expansion, no shuffle."""
    part = load_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("double").alias("size_units"),
    )
    out = wide.unpivot(
        "p_partkey", ["retail_price", "size_units"], "metric", "raw_val"
    ).select(
        "p_partkey", "metric", dround(F.col("raw_val").cast("decimal(12,2)")).alias("val")
    )
    return ordered(out)


@query(
    "q57_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey NULLS LAST, nations NULLS LAST, n_nations NULLS LAST
    """,
)
def q57_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg). ``collect_list`` order is
    nondeterministic under parallelism — ``array_sort`` before the join
    is what makes the result stable and cross-engine comparable (the
    same discipline as any order-sensitive distributed aggregation)."""
    nation = load_table(spark, sf_dir, "nation")
    out = nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )
    return ordered(out)


@query(
    "q55_resample_locf",
    oracle="""
    WITH agg AS (
      SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS slot,
             COUNT(*) AS n, FLOOR(SUM(value) * 100 + 0.5) / 100 AS v
      FROM events GROUP BY user_id, time_bucket(INTERVAL '15 minutes', ts)),
    bounds AS (SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi
               FROM agg GROUP BY user_id),
    grid AS (SELECT user_id,
                    unnest(generate_series(lo, hi, INTERVAL '15 minutes')) AS slot
             FROM bounds)
    SELECT g.user_id, epoch_us(g.slot) AS slot_us,
           COALESCE(a.n, 0) AS n_events,
           last_value(a.v IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.slot
                   ROWS UNBOUNDED PRECEDING) AS filled_sum
    FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.slot = a.slot
    ORDER BY g.user_id NULLS LAST, slot_us NULLS LAST, n_events NULLS LAST,
             filled_sum NULLS LAST
    """,
)
def q55_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 15-minute resample of the event stream with gap-fill
    and LOCF (operators/timeseries.resample_locf) — the hypertable
    rollup pattern as pure DataFrame composition."""
    from kafka_database_import_spark.operators.timeseries import resample_locf

    ev = load_table(spark, sf_dir, "events")
    out = resample_locf(ev, "user_id", "ts", "value", interval_sec=900)
    out = out.select(
        "user_id",
        F.unix_micros("slot").alias("slot_us"),
        "n_events",
        "filled_sum",
    )
    return ordered(out)


@query("q53b_approx_percentiles")  # no oracle: sketch; error-bound property-tested
def q53b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the mergeable KLL-style sketch
    (``approx_percentile``) — the 100 TB path: one pass, map-side
    partial sketches, no per-group sort. q53 is its exact ground truth;
    tests/test_properties.py bounds the error."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000))
        .cast("double")
        .alias("median_approx"),
        F.percentile_approx("l_quantity", F.lit(0.95), F.lit(10000))
        .cast("double")
        .alias("p95_approx"),
    )
    return ordered(out)


@query(
    "q54_tpch_shape",
    oracle="""
    SELECT n_name,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)::DOUBLE
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY n_name
    HAVING COUNT(DISTINCT o_orderkey) > 5
    ORDER BY n_name NULLS LAST, n_orders NULLS LAST, revenue NULLS LAST
    """,
)
def q54_tpch_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact → fact → three broadcast dims,
    filtered on the smallest dim, grouped + HAVING. The plan to want at
    100 TB: region/nation/customer broadcast, lineitem⋈orders as the
    one big join, partial aggregation before the group shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dround(
                F.sum(money("l_extendedprice") * (1 - money("l_discount")))
            ).alias("revenue"),
        )
        .filter(F.col("n_orders") > 5)
    )
    return ordered(out)


@query(
    "q65_scd2_history",
    oracle="""
    WITH ordered_ev AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER w AS prev_type
      FROM events WHERE user_id < 200
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts
      FROM ordered_ev
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    ORDER BY user_id NULLS LAST, event_type NULLS LAST,
             valid_from NULLS LAST, valid_to NULLS LAST, is_current NULLS LAST
    """,
)
def q65_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: collapse an event stream into
    validity intervals — rows survive only where the tracked attribute
    *changes*, then each change opens an interval closed by the next
    one (open-ended ⇒ current). Two window passes over the same
    (user_id, ts) sort; Catalyst reuses the single sort-shuffle for
    both, so at scale this is one exchange keyed on the entity id —
    the standard way to build dimension history from a CDC feed."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    out = changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.when(F.lead("ts").over(w2).isNull(), 1).otherwise(0).alias("is_current"),
    )
    return ordered(out)


@query(
    "q68_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sv,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS svv
      FROM events GROUP BY event_type
    )
    SELECT event_id, event_type, value,
           FLOOR((value - sv::DOUBLE / n)
                 / sqrt(svv::DOUBLE / n - (sv::DOUBLE / n) ^ 2)
                 * 10000 + 0.5) / 10000 AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((value - sv::DOUBLE / n)
              / sqrt(svv::DOUBLE / n - (sv::DOUBLE / n) ^ 2)) > 2.5
    ORDER BY event_id NULLS LAST, event_type NULLS LAST, value NULLS LAST,
             z NULLS LAST
    """,
)
def q68_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection — the numeric-quality twin
    of the text-quality filter (q99g): flag events > 2.5σ from their
    type's mean. Moments are accumulated as exact decimals (sum and
    sum-of-squares), so mean/σ are order-independent and bit-identical
    across engines and partitionings — the same trick as q16's money
    sums; the double math happens once, on the exact moments. Plan
    shape: one partial-aggregated shuffle for the 5-row stats table,
    broadcast back onto the scan — no second pass over the fact side
    at 100 TB."""
    from kafka_database_import_spark.functions.numeric import mround

    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).alias("sv"),
        F.sum(vdec * vdec).alias("svv"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("sv").cast("double") / F.col("n")
    sigma = F.sqrt(F.col("svv").cast("double") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / sigma
    out = joined.filter(F.abs(z) > 2.5).select(
        "event_id", "event_type", "value", mround(z, 4).alias("z")
    )
    return ordered(out)


@query(
    "q72_sessionize_batch",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM o
    )
    SELECT user_id, session_seq,
           epoch_us(MIN(ts)) AS start_us,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
    FROM s
    GROUP BY user_id, session_seq
    ORDER BY user_id NULLS LAST, session_seq NULLS LAST, start_us NULLS LAST,
             duration_us NULLS LAST, n_events NULLS LAST, sum_value NULLS LAST
    """,
)
def q72_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): per-user sessions split
    at >30-minute silences, with start/duration/count/value stats — the
    batch twin of the streaming session window (q35), and the canonical
    event-log → training-example grouping step. One shuffle on
    ``user_id`` serves both window passes and the final aggregate
    (Catalyst reuses the partitioning); tie-rows on ``ts`` are
    order-insensitive by construction (a 0 gap never opens a session),
    so the result is deterministic under any executor schedule."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    ev = ev.select("user_id", "ts", "value", new_s.alias("new_s"))
    sid = F.sum("new_s").over(
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ev.select("user_id", "ts", "value", sid.alias("session_seq"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
            F.count(F.lit(1)).alias("n_events"),
            mround(F.sum("value")).alias("sum_value"),
        )
    )
    return ordered(out)


@query(
    "q77_zorder_layout",
    oracle="""
    WITH b AS (
      SELECT MIN(user_id) AS xlo, MAX(user_id) AS xhi,
             MIN(event_id) AS ylo, MAX(event_id) AS yhi
      FROM events
    ),
    n AS (
      SELECT FLOOR((user_id - xlo)::DOUBLE * 65535 / greatest(xhi - xlo, 1))::BIGINT AS xn,
             FLOOR((event_id - ylo)::DOUBLE * 65535 / greatest(yhi - ylo, 1))::BIGINT AS yn
      FROM events, b
    ),
    z AS (
      SELECT list_reduce(list_prepend(0::BIGINT, range(0, 16)), (acc, i) ->
               acc | (((xn >> i) & 1) << (2*i))
                   | (((yn >> i) & 1) << (2*i + 1))) AS zv
      FROM n
    )
    SELECT zv >> 24 AS z_bucket,
           COUNT(*) AS n,
           MIN(zv) AS z_min,
           MAX(zv) AS z_max
    FROM z
    GROUP BY z_bucket
    ORDER BY z_bucket NULLS LAST, n NULLS LAST, z_min NULLS LAST,
             z_max NULLS LAST
    """,
)
def q77_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key (operators/zorder.py) over
    (user_id, event_id), both first normalized to the 16-bit grid from
    their observed min/max — without that normalization the wider key's
    high bits dominate every range split and the layout degrades to a
    1-D sort (operators/zorder.normalized16). This is the
    multi-dimensional sort key that keeps every output file narrow in
    BOTH dimensions so parquet min/max stats prune two-dimensional
    predicates — the public Delta/Iceberg OPTIMIZE ZORDER technique as
    plain DataFrame ops. The oracle recomputes the identical normalize
    + bit interleave with a DuckDB list fold; the layout effect on real
    written files is asserted in tests/test_scale_paths.py. The bounds
    pre-pass is a broadcast scalar row, not a collect."""
    from kafka_database_import_spark.operators.zorder import zvalue

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("user_id").alias("xlo"),
        F.max("user_id").alias("xhi"),
        F.min("event_id").alias("ylo"),
        F.max("event_id").alias("yhi"),
    )
    ev = ev.crossJoin(F.broadcast(bounds))
    xn = F.floor(
        (F.col("user_id") - F.col("xlo")).cast("double")
        * 65535
        / F.greatest(F.col("xhi") - F.col("xlo"), F.lit(1))
    ).cast("long")
    yn = F.floor(
        (F.col("event_id") - F.col("ylo")).cast("double")
        * 65535
        / F.greatest(F.col("yhi") - F.col("ylo"), F.lit(1))
    ).cast("long")
    out = (
        ev.select(zvalue(xn, yn).alias("zv"))
        .groupBy(F.shiftright("zv", 24).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zv").alias("z_min"),
            F.max("zv").alias("z_max"),
        )
    )
    return ordered(out)


@query(
    "q78_table_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders
               WHERE o_orderkey % 10 != 3),
    b AS (SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                      ELSE o_totalprice END AS v
          FROM orders WHERE o_orderkey % 10 != 4),
    j AS (
      SELECT COALESCE(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'only_right'
                  WHEN b.k IS NULL THEN 'only_left'
                  WHEN a.v != b.v THEN 'changed'
                  ELSE 'same' END AS status
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT status, COUNT(*) AS n
    FROM j WHERE status != 'same'
    GROUP BY status
    ORDER BY status NULLS LAST, n NULLS LAST
    """,
)
def q78_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation (anti-entropy diff): classify keys as
    only-left / only-right / changed between two table versions — the
    validation step after any migration, backfill, or engine swap
    (e.g. verifying this engine against the reference's output). One
    full outer join on the key — a single co-partitioned shuffle of
    both sides; at 100 TB the cheap screen is comparing per-partition
    row-hash aggregates first and full-outer-joining only partitions
    whose digests differ. The two 'versions' here are deterministic
    perturbations of orders, so ground truth is exact in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    b = orders.filter(F.col("o_orderkey") % 10 != 4).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("v"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    j = aa.join(bb, F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.when(F.col("a.k").isNull(), "only_right")
        .when(F.col("b.k").isNull(), "only_left")
        .when(F.col("a.v") != F.col("b.v"), "changed")
        .otherwise("same")
        .alias("status")
    )
    out = (
        j.filter(F.col("status") != "same")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ordered(out)


@query(
    "q79_ntile_discretize",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT decile, COUNT(*) AS n, MIN(c_custkey) AS first_key
    FROM t GROUP BY decile
    ORDER BY decile NULLS LAST, n NULLS LAST, first_key NULLS LAST
    """,
)
def q79_ntile_discretize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization via ``ntile`` — feature binning /
    cohort assignment. The unpartitioned ORDER BY makes this a single
    total sort; the key (c_acctbal, c_custkey) is made unique so tile
    boundaries are deterministic cross-engine. At 100 TB you don't run
    a global ntile: the scale path is approx_percentile cut points
    (mergeable sketch, one pass) + a scan-local bucket lookup — the
    q53b/q69 pattern; this exact form is its oracle-checkable twin."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    out = (
        cust.select("c_custkey", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.min("c_custkey").alias("first_key"))
    )
    return ordered(out)


@query(
    "q81_funnel",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    w2 AS (
      SELECT user_id, ts, event_type, t1,
             MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM w
    ),
    w3 AS (
      SELECT user_id, t1, t2,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    per_user AS (
      SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      FROM w3 GROUP BY user_id
    )
    SELECT COUNT(t1) AS n_viewed,
           COUNT(t2) AS n_clicked_after_view,
           COUNT(t3) AS n_purchased_after_click
    FROM per_user
    """,
)
def q81_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click-after-view →
    purchase-after-click): per-user milestone timestamps via THREE
    STACKED unbounded windows over the same ``user_id`` partitioning —
    Catalyst stacks the Window nodes on one exchange, so the whole
    sequential-dependency chain (each milestone filters on the previous
    one) costs a single shuffle, not a join per funnel step. The final
    per-user collapse reuses the same partitioning; only the 3-number
    global count crosses it."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    ev = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    ev = ev.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    ev = ev.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    out = per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )
    return out


@query(
    "q82_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, ts,
             date_trunc('day', MIN(ts) OVER (PARTITION BY user_id))
               AS cohort_day
      FROM events
    ),
    o AS (
      SELECT user_id, cohort_day,
             date_diff('day', cohort_day, date_trunc('day', ts)) AS offset_days
      FROM f
    )
    SELECT epoch_us(cohort_day) AS cohort_day_us, offset_days,
           COUNT(DISTINCT user_id) AS n_users
    FROM o
    WHERE offset_days IN (0, 1, 7, 14)
    GROUP BY cohort_day, offset_days
    ORDER BY cohort_day_us NULLS LAST, offset_days NULLS LAST,
             n_users NULLS LAST
    """,
)
def q82_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis: users bucketed by first-activity day,
    counted again at day offsets 0/1/7/14 — the standard growth metric
    as two shuffles (a ``user_id`` window for the cohort day, then the
    (cohort, offset) distinct-count). The distinct count is exact here;
    at 100 TB the q69 HLL-sketch path computes the same matrix
    incrementally (one sketch per (cohort, offset), merged daily)
    without rescanning history."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.withColumn("cohort_day", F.date_trunc("day", F.min("ts").over(w)))
    o = f.select(
        "user_id",
        "cohort_day",
        F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias(
            "offset_days"
        ),
    )
    out = (
        o.filter(F.col("offset_days").isin(0, 1, 7, 14))
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.unix_micros("cohort_day").alias("cohort_day_us"),
            "offset_days",
            "n_users",
        )
    )
    return ordered(out)


@query(
    "q85_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 100
    ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST,
             o_totalprice NULLS LAST
    """,
)
def q85_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) through
    the SQL surface — the "for each row, run this parameterized query"
    form users port from OLTP engines. Catalyst DECORRELATES it: the
    per-row ORDER BY/LIMIT becomes the same window-rank + filter plan
    as q25 (one shuffle, partial top-k) rather than |customers|
    query executions — which is the only form that survives 100 TB.
    DuckDB executes the identical SQL natively as the oracle."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    out = spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat_v c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat_v o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 100
        """
    )
    return ordered(out)


@query(
    "q86_interval_overlap_join",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1
      FROM events WHERE user_id < 80
      GROUP BY user_id, time_bucket(INTERVAL '6 hours', ts)
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*) AS n_overlaps
    FROM s a JOIN s b
      ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1
    GROUP BY user_a, user_b
    ORDER BY user_a NULLS LAST, user_b NULLS LAST, n_overlaps NULLS LAST
    """,
)
def q86_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join — "which activity intervals of different
    users overlap in time" — via BUCKETED candidate generation: explode
    each interval into the 6-hour grid slots it touches, equi-join on
    the slot (a hash shuffle), dedupe, then apply the exact overlap
    predicate. The naive form is a pure theta-join (no equality
    conjunct → BroadcastNestedLoopJoin, O(n²) compares); bucketing
    turns it into the same band-bucket shape as q44's LSH join, with
    the grid pitch trading candidate count against per-interval
    explode width. The oracle runs the naive theta form in DuckDB —
    same rows, different physical strategy; intervals here are per-user
    6-hour activity spans (min/max event ts)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 80)
    s = ev.groupBy(
        "user_id", F.window("ts", "6 hours").alias("w")
    ).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1")).drop("w")
    slot = 6 * 3600 * 1_000_000  # grid pitch in microseconds
    slots = F.sequence(
        F.floor(F.unix_micros("t0") / slot).cast("long"),
        F.floor(F.unix_micros("t1") / slot).cast("long"),
    )
    e = s.select("user_id", "t0", "t1", F.explode(slots).alias("slot"))
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.t0").alias("a0"),
            F.col("a.t1").alias("a1"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.t0").alias("b0"),
            F.col("b.t1").alias("b1"),
        )
        .distinct()
    )
    out = (
        cand.filter((F.col("a0") <= F.col("b1")) & (F.col("b0") <= F.col("a1")))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )
    return ordered(out)


@query(
    "q87_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           MIN(o_custkey)::VARCHAR AS min_v, MAX(o_custkey)::VARCHAR AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           strftime(MIN(o_orderdate), '%Y-%m-%d'),
           strftime(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    ORDER BY col NULLS LAST, n_null NULLS LAST, n_distinct NULLS LAST,
             min_v NULLS LAST, max_v NULLS LAST
    """,
)
def q87_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling — null count / distinct count / min / max per
    column, the first query anyone runs on unfamiliar data. ONE scan
    computes every column's stats as parallel aggregates (Spark
    evaluates all aggregate expressions in a single pass; the
    three-branch UNION in the oracle is DuckDB's equivalent, not the
    plan shape here), then unpivots to (col, stats) rows. At 100 TB
    swap the exact distincts for approx_count_distinct/HLL (q18/q69) —
    same single-scan shape. Values are stringified per-type for the
    uniform schema, the same trade `df.summary()` makes."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))

    def stats(c, fmt=None):
        mn, mx = F.min(c), F.max(c)
        if fmt:
            mn, mx = F.date_format(mn, fmt), F.date_format(mx, fmt)
        return F.struct(
            (cnt - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            mn.cast("string").alias("min_v"),
            mx.cast("string").alias("max_v"),
        )

    wide = orders.agg(
        stats("o_custkey").alias("o_custkey"),
        stats("o_orderpriority").alias("o_orderpriority"),
        stats("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )
    cols = ["o_custkey", "o_orderpriority", "o_orderdate"]
    long = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}.n_null").alias("n_null"),
                        F.col(f"{c}.n_distinct").alias("n_distinct"),
                        F.col(f"{c}.min_v").alias("min_v"),
                        F.col(f"{c}.max_v").alias("max_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col", "s.n_null", "s.n_distinct", "s.min_v", "s.max_v")
    return ordered(long)


@query(
    "q99l_grouped_regression",
    oracle="""
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS TIMESTAMP)::DATE)::BIGINT AS x,
             CAST(value AS DECIMAL(12,2)) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, COUNT(*)::BIGINT AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM e GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000 + 0.5) / 1000000
             AS slope,
           FLOOR(((CAST(sy AS DOUBLE)
                   - (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000
             AS intercept
    FROM s
    ORDER BY event_type NULLS LAST, n NULLS LAST, slope NULLS LAST,
             intercept NULLS LAST
    """,
)
def q99l_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (value vs day-of-month) from
    the five classic sufficient statistics — the scale pattern for any
    moment-based model fit: ONE map-side-combinable aggregation per
    group, closed-form solve in the projection, no iteration and no
    second pass. Cross-engine float hazard handled the repo's standard
    way (functions/numeric.py): x is an exact integer day index, y an
    exact DECIMAL(12,2), so all five sums are exact and
    order-independent under distribution; slope/intercept are then the
    same two float64 divisions on both engines — bit-identical before
    the presentation rounding."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        F.col("value").cast("decimal(12,2)").alias("y"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    out = s.select(
        "event_type",
        "n",
        mround(slope, 6).alias("slope"),
        mround(intercept, 6).alias("intercept"),
    )
    return ordered(out)


@query(
    "q99s_winsorized_stats",
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(value AS DECIMAL(12,2)), event_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    b AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT) THEN v END) AS p05,
             MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT) THEN v END) AS p95
      FROM r GROUP BY event_type
    )
    SELECT event_type, n, mean_raw, mean_winsor, n_low, n_high FROM (
      SELECT e.event_type AS event_type,
             COUNT(*) AS n,
             FLOOR(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(*) * 100 + 0.5) / 100 AS mean_raw,
             FLOOR(CAST(SUM(LEAST(GREATEST(CAST(e.value AS DECIMAL(12,2)),
                                           b.p05), b.p95)) AS DOUBLE)
                   / COUNT(*) * 100 + 0.5) / 100 AS mean_winsor,
             SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) < b.p05 THEN 1 ELSE 0 END)
               AS n_low,
             SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) > b.p95 THEN 1 ELSE 0 END)
               AS n_high
      FROM events e JOIN b ON e.event_type = b.event_type
      GROUP BY e.event_type
    )
    ORDER BY event_type NULLS LAST, n NULLS LAST, mean_raw NULLS LAST,
             mean_winsor NULLS LAST, n_low NULLS LAST, n_high NULLS LAST
    """,
)
def q99s_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) robust statistics per group — the
    standard tail-taming step before training-signal aggregation. Two
    passes: exact p05/p95 per group (tiny result, broadcast back), then
    one clamped aggregation in exact decimal arithmetic (sums are
    order-independent; the mean's float division is the same op on both
    engines). At 100 TB swap the exact percentile for the mergeable
    approx_percentile sketch (q53b path) — the clamp stage is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    val = money("value")
    # Discrete rank-selected bounds (value at rank ceil(p·n), ties by
    # event_id): pure integer index semantics, so both engines pick the
    # same exact decimal — continuous interpolation differs between
    # engines by an ulp on uneven data and would skew the clamp.
    w_rank = Window.partitionBy("event_type").orderBy(val, F.col("event_id"))
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        val.alias("v"),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("p05"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("p95"),
    )
    clamped = F.least(F.greatest(val, F.col("p05")), F.col("p95"))
    out = (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            avg_exact(F.sum(val), F.count(F.lit(1))).alias("mean_raw"),
            avg_exact(F.sum(clamped), F.count(F.lit(1))).alias("mean_winsor"),
            F.sum(F.when(val < F.col("p05"), 1).otherwise(0)).alias("n_low"),
            F.sum(F.when(val > F.col("p95"), 1).otherwise(0)).alias("n_high"),
        )
    )
    return ordered(out)


@query(
    "q99t_embedding_centroids",
    oracle="""
    WITH q AS (
      SELECT vec_id % 4 AS grp,
             unnest(range(1, len(embedding) + 1)) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS qv
      FROM embeddings
    )
    SELECT grp, dim, COUNT(*) AS n_vecs,
           FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / 1000000 * 1000000 + 0.5)
             / 1000000 AS centroid
    FROM q GROUP BY grp, dim
    ORDER BY grp NULLS LAST, dim NULLS LAST, n_vecs NULLS LAST,
             centroid NULLS LAST
    """,
)
def q99t_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding centroids with ORDER-INDEPENDENT exact
    arithmetic: float sums across a cluster are nondeterministic in the
    last ulp (summation order), so each element is quantized to an
    integer microunit first — the distributed LongType sum is then
    exact, and only the final per-dimension division happens in float,
    identically on both engines. Long-form output (grp, dim, centroid):
    one posexplode + one (grp, dim)-keyed aggregation with map-side
    combine — the centroid-update shape of distributed k-means and
    embedding-drift monitoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        (F.col("vec_id") % 4).alias("grp"),
        F.posexplode(F.col("embedding")).alias("pos", "x"),
    ).select(
        "grp",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    out = q.groupBy("grp", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        mround(F.sum("qv").cast("double") / F.count(F.lit(1)) / 1000000, 6).alias(
            "centroid"
        ),
    )
    return ordered(out)


@query(
    "q99zc_scd2_pointintime_join",
    oracle="""
    WITH segs AS (SELECT ['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
                          'MACHINERY'] AS arr),
    dim AS (
      SELECT c_custkey,
             arr[1 + (c_custkey + u) % 5] AS segment,
             TIMESTAMP '2024-01-01' + u * INTERVAL '10 days' AS valid_from,
             CASE WHEN u < 2
                  THEN TIMESTAMP '2024-01-01' + (u + 1) * INTERVAL '10 days'
             END AS valid_to
      FROM customer, unnest([0, 1, 2]) AS t(u), segs
    )
    SELECT e.event_id, e.user_id, d.segment AS seg_at_event
    FROM events e JOIN dim d
      ON e.user_id = d.c_custkey
     AND CAST(e.ts AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < d.valid_to)
    ORDER BY event_id NULLS LAST, user_id NULLS LAST, seg_at_event NULLS LAST
    """,
)
def q99zc_scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (effective-dated) dimension join — the warehouse
    pattern q65's SCD2 history exists FOR: each fact row joins the one
    dimension version whose [valid_from, valid_to) interval contains
    the fact's event time. The history here is synthesized closed-form
    (3 versions per customer over deterministic 10-day windows) so both
    engines build the identical dimension. Scale shape: an SCD2
    dimension is versions × entities — still dimension-sized — so it
    BROADCASTS and the interval containment resolves scan-local on the
    fact side; the fact table never shuffles. A fact time outside every
    version would drop here (inner); production uses a left join + null
    audit (q99x's violations pattern)."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    vers = spark.range(3).select(F.col("id").cast("int").alias("u"))
    seg_arr = F.array(*[F.lit(s) for s in segs])
    dim = (
        cust.crossJoin(F.broadcast(vers))
        .select(
            "c_custkey",
            F.element_at(
                seg_arr, ((F.col("c_custkey") + F.col("u")) % 5 + 1).cast("int")
            ).alias(
                "segment"
            ),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=F.col("u") * 10)
            ).alias("valid_from"),
            F.when(
                F.col("u") < 2,
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=(F.col("u") + 1) * 10),
            ).alias("valid_to"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    out = ev.join(
        F.broadcast(dim),
        (ev.user_id == dim.c_custkey)
        & (ev.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (ev.ts < dim.valid_to)),
    ).select("event_id", "user_id", F.col("segment").alias("seg_at_event"))
    return ordered(out)
