"""Relational core: scans, projections, filters, joins, aggregates,
sort/limit, set ops (SURVEY §2.2 Q01–Q02, Q06–Q20, Q24–Q27).

The reference's whole relational surface is scan → project → IN-list
semi-join → limit (``kafka-database-import.go:148-185``); everything
else here is the declared engine extension. All queries are expressed
declaratively so Catalyst gets pushdown/pruning/reordering for free; the
only physical hints are ``broadcast`` for dimension tables and an
explicit merge hint where we *want* a shuffle join exercised.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.numeric import avg_exact, dround, money
from kafka_database_import_spark.operators.joins import asof_join
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import (
    NATION_SCHEMA,
    csv_scan_with_schema,
    json_scan_with_schema,
    load_table,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Scans (Q01, Q02)
# --------------------------------------------------------------------------


@query(
    "q01_parquet_scan",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    ORDER BY r_regionkey NULLS LAST, r_name NULLS LAST
    """,
)
def q01_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan (reference R1: unfiltered collection scan,
    kafka-database-import.go:148-158). Columnar vectorized read; column
    pruning reaches the scan via ReadSchema."""
    return ordered(_t(spark, sf_dir, "region").select("r_regionkey", "r_name"))


@query(
    "q02_csv_scan_schema",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey NULLS LAST, n_name NULLS LAST, n_regionkey NULLS LAST
    """,
)
def q02_csv_scan_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema (no inference pass — at 100 TB
    schema inference is a full extra read). The CSV twin of the nation
    parquet is materialized lazily (the driver invokes queries without
    test fixtures): cache keyed by a content fingerprint of the source
    parquet (stale-proof across fixture regeneration) and published by
    atomic rename (race-proof under parallel runs). Only the schema's
    columns are written, so the read schema matches positionally by
    construction."""
    src = os.path.join(sf_dir, "nation.parquet")
    st = os.stat(src)
    fingerprint = f"{os.path.basename(os.path.normpath(sf_dir))}-{st.st_size}-{st.st_mtime_ns}"
    cache = os.path.join(tempfile.gettempdir(), "kdis_csv_cache", fingerprint)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        tmp = tempfile.mkdtemp(prefix="kdis_csv_stage_")
        stage = os.path.join(tmp, "out")
        _t(spark, sf_dir, "nation").select(
            *[f.name for f in NATION_SCHEMA.fields]
        ).coalesce(1).write.mode("overwrite").option("header", "true").csv(stage)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        try:
            os.rename(stage, cache)
        except OSError:
            pass  # concurrent run won the rename; its cache is identical
    df = csv_scan_with_schema(spark, cache, NATION_SCHEMA)
    return ordered(df.select("n_nationkey", "n_name", "n_regionkey"))


@query(
    "q89_json_scan_schema",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey NULLS LAST, n_name NULLS LAST, n_regionkey NULLS LAST
    """,
)
def q89_json_scan_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with explicit schema (the JSON half of SURVEY
    Q02; PERMISSIVE mode mirrors the reference's skip-and-continue on
    decode errors, kafka-database-import.go:192-197). Same
    fingerprint-keyed atomic cache as the CSV/ORC twins; the oracle
    reads the parquet original — format round-trip equality."""
    src = os.path.join(sf_dir, "nation.parquet")
    st = os.stat(src)
    fingerprint = f"json-{os.path.basename(os.path.normpath(sf_dir))}-{st.st_size}-{st.st_mtime_ns}"
    cache = os.path.join(tempfile.gettempdir(), "kdis_json_cache", fingerprint)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        tmp = tempfile.mkdtemp(prefix="kdis_json_stage_")
        stage = os.path.join(tmp, "out")
        _t(spark, sf_dir, "nation").select(
            *[f.name for f in NATION_SCHEMA.fields]
        ).coalesce(1).write.mode("overwrite").json(stage)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        try:
            os.rename(stage, cache)
        except OSError:
            pass  # concurrent run won the rename
    df = json_scan_with_schema(spark, cache, NATION_SCHEMA)
    return ordered(df.select("n_nationkey", "n_name", "n_regionkey"))


@query(
    "q88_orc_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey NULLS LAST, n_name NULLS LAST, n_regionkey NULLS LAST
    """,
)
def q88_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan (columnar alternative to parquet; Spark-native reader
    with the same pushdown/pruning machinery). The ORC twin of the
    nation table is lazily materialized with the same fingerprint-keyed
    atomic cache as q02's CSV; the oracle reads the parquet original —
    format round-trip equality is the check."""
    src = os.path.join(sf_dir, "nation.parquet")
    st = os.stat(src)
    fingerprint = f"orc-{os.path.basename(os.path.normpath(sf_dir))}-{st.st_size}-{st.st_mtime_ns}"
    cache = os.path.join(tempfile.gettempdir(), "kdis_orc_cache", fingerprint)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        tmp = tempfile.mkdtemp(prefix="kdis_orc_stage_")
        stage = os.path.join(tmp, "out")
        _t(spark, sf_dir, "nation").select(
            *[f.name for f in NATION_SCHEMA.fields]
        ).coalesce(1).write.mode("overwrite").orc(stage)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        try:
            os.rename(stage, cache)
        except OSError:
            pass  # concurrent run won the rename
    df = spark.read.schema(NATION_SCHEMA).orc(cache)
    return ordered(df.select("n_nationkey", "n_name", "n_regionkey"))


# --------------------------------------------------------------------------
# Projection / filter (Q06, Q07)
# --------------------------------------------------------------------------


@query(
    "q06_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2))), 2)::DOUBLE AS revenue,
           ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_tax AS DECIMAL(12,2)), 2)::DOUBLE AS tax_amount,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, revenue NULLS LAST,
             tax_amount NULLS LAST, flag_status NULLS LAST
    """,
)
def q06_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed columns (reference R2 projection,
    kafka-database-import.go:160-163, extended with expressions)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.select(
        "l_orderkey",
        "l_linenumber",
        dround(money("l_extendedprice") * (1 - money("l_discount"))).alias("revenue"),
        dround(money("l_extendedprice") * money("l_tax")).alias("tax_amount"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )
    return ordered(out)


@query(
    "q07_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE (l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20)
       OR (l_linestatus LIKE 'O%' AND l_discount >= 0.09 AND l_shipdate IS NOT NULL)
    ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, l_quantity NULLS LAST,
             l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def q07_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, IN, BETWEEN, LIKE, IS NULL
    (reference R3's server-side predicate, kafka-database-import.go:169-170;
    Catalyst pushes these into the parquet scan — see PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_returnflag").isin("A", "R") & F.col("l_quantity").between(10, 20)
    ) | (
        F.col("l_linestatus").like("O%")
        & (F.col("l_discount") >= 0.09)
        & F.col("l_shipdate").isNotNull()
    )
    out = li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )
    return ordered(out)


# --------------------------------------------------------------------------
# Joins (Q08–Q15)
# --------------------------------------------------------------------------


@query(
    "q08_join_broadcast",
    oracle="""
    SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey NULLS LAST, c_name NULLS LAST, total NULLS LAST
    """,
)
def q08_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with an explicit broadcast of the dimension side —
    the Spark-native form of the reference's client-materialized filter
    table (kafka-database-import.go:148-158). No shuffle of the fact side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    out = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total"))
    )
    return ordered(out)


@query(
    "q09_join_shuffle",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)::DOUBLE AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority NULLS LAST, n_lines NULLS LAST, revenue NULLS LAST
    """,
)
def q09_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle (sort-merge) fact-to-fact join; MERGE hint pins the
    strategy so the test exercises the shuffle path even when AQE would
    broadcast at small SF. At 100 TB both sides hash-partition on the
    join key; AQE splits skewed partitions."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").hint("merge")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dround(
                F.sum(money("l_extendedprice") * (1 - money("l_discount")))
            ).alias("revenue"),
        )
    )
    return ordered(out)


@query(
    "q10_join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderstatus
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 100000
    ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST, o_orderstatus NULLS LAST
    """,
)
def q10_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (produces NULL rows)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    out = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 100000),
        "left",
    ).select("c_custkey", "o_orderkey", "o_orderstatus")
    return ordered(out)


@query(
    "q91_join_full_outer",
    oracle="""
    SELECT ck.k AS cust_side, sk.k AS supp_side
    FROM (SELECT DISTINCT c_nationkey AS k FROM customer WHERE c_acctbal > 5000) ck
    FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS k FROM supplier) sk
      ON ck.k = sk.k
    ORDER BY cust_side NULLS LAST, supp_side NULLS LAST
    """,
)
def q91_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over two derived key sets (NULLs on both sides)."""
    ck = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("k"))
        .distinct()
    )
    sk = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    out = ck.join(sk, ck.k == sk.k, "full").select(
        ck.k.alias("cust_side"), sk.k.alias("supp_side")
    )
    return ordered(out)


@query(
    "q11_join_semi",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    ORDER BY event_id NULLS LAST, user_id NULLS LAST, event_type NULLS LAST
    """,
)
def q11_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — THE reference operator (R4): device rows kept iff
    their user id appears in the filter table, filter side broadcast
    (kafka-database-import.go:148-170). Broadcast hash semi-join: the fact
    side never shuffles."""
    events = _t(spark, sf_dir, "events")
    users = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    out = events.join(
        F.broadcast(users), events.user_id == users.c_custkey, "left_semi"
    ).select("event_id", "user_id", "event_type")
    return ordered(out)


@query(
    "q12_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_custkey IS NOT NULL AND o_totalprice > 150000)
    ORDER BY c_custkey NULLS LAST, c_name NULLS LAST
    """,
)
def q12_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no high-value (>150k) orders.
    (The unqualified "no orders at all" variant returns zero rows at
    every fixture SF — a vacuous hash match; the price predicate keeps
    both survivor and eliminated sets non-empty so the differential
    check discriminates.)"""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    out = cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )
    return ordered(out)


@query(
    "q13_join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    ORDER BY r1 NULLS LAST, r2 NULLS LAST
    """,
)
def q13_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join over bounded inputs (both sides tiny → broadcast NLJ)."""
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return ordered(a.crossJoin(b))


@query(
    "q14_join_range",
    oracle="""
    SELECT b.band AS band, COUNT(*) AS n,
           ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2)::DOUBLE AS total_qty
    FROM lineitem l
    JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 100.0, 'high'))
         AS b(lo, hi, band)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    ORDER BY band NULLS LAST, n NULLS LAST, total_qty NULLS LAST
    """,
)
def q14_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range (non-equi) join against a small band table. The band
    side is broadcast, so the non-equi condition evaluates as a broadcast
    nested-loop — the only scalable plan for small-dim range joins."""
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 100.0, "high")],
        "lo double, hi double, band string",
    )
    out = (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.sum(money("l_quantity"))).alias("total_qty"),
        )
    )
    return ordered(out)


@query(
    "q15_join_asof",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           epoch_us(MAX(CAST(e.ts AS TIMESTAMP))) AS asof_us
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) <= o.o_orderdate
    GROUP BY o.o_orderkey, o.o_custkey
    ORDER BY o_orderkey NULLS LAST, o_custkey NULLS LAST, asof_us NULLS LAST
    """,
)
def q15_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event ts ≤ order date per user. Implemented as
    the scalable union+window pattern (one shuffle on the key, no N×M
    range-join blowup) — see operators/joins.py:asof_join."""
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    out = asof_join(
        left=orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        right=events.select("user_id", "ts"),
        left_on="o_custkey",
        right_on="user_id",
        left_time="o_orderdate",
        right_time="ts",
    )
    out = out.select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(F.col("asof_time")).alias("asof_us"),
    )
    return ordered(out)


# --------------------------------------------------------------------------
# Aggregation (Q16–Q20)
# --------------------------------------------------------------------------


@query(
    "q16_agg_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2)::DOUBLE AS sum_qty,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)::DOUBLE AS sum_base_price,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)::DOUBLE AS sum_disc_price,
           FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 100 + 0.5) / 100 AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, sum_qty NULLS LAST,
             sum_base_price NULLS LAST, sum_disc_price NULLS LAST, avg_qty NULLS LAST,
             min_price NULLS LAST, max_price NULLS LAST, count_order NULLS LAST
    """,
)
def q16_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate, TPC-H Q1 shape: partial (map-side) aggregation then
    one shuffle on the 2-column group key — low cardinality, so the
    reduce side is trivially small at any SF."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        dround(F.sum(money("l_quantity"))).alias("sum_qty"),
        dround(F.sum(money("l_extendedprice"))).alias("sum_base_price"),
        dround(
            F.sum(money("l_extendedprice") * (1 - money("l_discount")))
        ).alias("sum_disc_price"),
        avg_exact(F.sum(money("l_quantity")), F.count(F.lit(1))).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return ordered(out)


@query(
    "q17_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag NULLS LAST, n_parts NULLS LAST, n_supps NULLS LAST
    """,
)
def q17_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) — Catalyst expands to
    partial-dedup + expand, avoiding a per-group hash set blowup."""
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )
    return ordered(out)


@query("q18_agg_approx_distinct", oracle=None)
def q18_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++): the 100 TB answer to
    Q17 — no dedup shuffle, constant memory per group. Property-tested
    within ±5% of exact (tests/test_properties.py)."""
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )
    return ordered(out)


@query(
    "q19_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_customers,
           ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2)::DOUBLE AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS LAST, n_name NULLS LAST, g_region NULLS LAST,
             g_nation NULLS LAST, n_customers NULLS LAST, total_bal NULLS LAST
    """,
)
def q19_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate with GROUPING() disambiguation of the
    subtotal NULLs."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    out = joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        dround(F.sum(money("c_acctbal"))).alias("total_bal"),
    )
    out = out.select(
        "r_name", "n_name", "g_region", "g_nation", "n_customers", "total_bal"
    )
    return ordered(out)


@query(
    "q20_agg_filtered",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A'
                          THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 2)::DOUBLE
             AS returned_price,
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           FLOOR(CAST(SUM(CASE WHEN l_discount > 0.05
                          THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE)
                 / COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) * 100 + 0.5) / 100
             AS avg_discounted
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus NULLS LAST, returned_price NULLS LAST,
             n_bulk NULLS LAST, avg_discounted NULLS LAST
    """,
)
def q20_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (SUM(x) FILTER (WHERE …) semantics via CASE —
    NULL, not 0, when no row matches)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupBy("l_linestatus").agg(
        dround(
            F.sum(F.when(F.col("l_returnflag") == "A", money("l_extendedprice")))
        ).alias("returned_price"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        avg_exact(
            F.sum(F.when(F.col("l_discount") > 0.05, money("l_extendedprice"))),
            F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))),
        ).alias("avg_discounted"),
    )
    return ordered(out)


# --------------------------------------------------------------------------
# Sort / limit / top-k (Q24, Q25), set ops (Q26, Q27)
# --------------------------------------------------------------------------


@query(
    "q24_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC NULLS LAST,
             l_linenumber ASC NULLS LAST
    LIMIT 100
    """,
)
def q24_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total multi-key ORDER BY + LIMIT (reference R5's cap,
    kafka-database-import.go:111,180-185 — its off-by-one emits 250001;
    we implement the documented intent). Spark executes as TakeOrderedAndProject:
    per-partition top-k then k-way merge — never a full sort at scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
        F.col("l_extendedprice").desc_nulls_last(),
        F.col("l_orderkey").asc_nulls_last(),
        F.col("l_linenumber").asc_nulls_last(),
    ).limit(100)


@query(
    "q25_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey NULLS LAST, o_orderkey NULLS LAST,
             o_totalprice NULLS LAST, rn NULLS LAST
    """,
)
def q25_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via rank window + filter — see operators/topk.py.
    Catalyst inserts a WindowGroupLimit (partial top-k before the
    shuffle) so the full sort never materializes."""
    from kafka_database_import_spark.operators.topk import top_k_per_group

    orders = _t(spark, sf_dir, "orders")
    out = top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ordered(out.select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


@query(
    "q26_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey NULLS LAST, n NULLS LAST
    """,
)
def q26_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no dedup — zero shuffle, pure concatenation of
    partitions) then aggregate."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    out = c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
    return ordered(out)


@query(
    "q95_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    ORDER BY nationkey NULLS LAST
    """,
)
def q95_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): concat + hash-dedup shuffle on the full row."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return ordered(c.union(s).distinct())


@query(
    "q27_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, k FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
    )
    UNION ALL
    SELECT 'except' AS op, k FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT
      SELECT s_nationkey AS k FROM supplier
    )
    ORDER BY op NULLS LAST, k NULLS LAST
    """,
)
def q27_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics) tagged into one result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "k")
    exc = c.subtract(s).select(F.lit("except").alias("op"), "k")
    return ordered(inter.unionAll(exc))
