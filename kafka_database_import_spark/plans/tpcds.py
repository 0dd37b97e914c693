"""A TPC-DS-derived 15-query subset over synthesized multi-channel
retail tables (VERDICT r5 item 5).

TPC-H (plans/tpch.py, 22/22 green) under-exercises the shapes TPC-DS
stresses: ROLLUP/GROUPING()-driven report queries, CASE-heavy
conditional aggregation, multi-channel UNIONs, and cross-channel
customer behavior. This module extends the partsupp synthesis trick to
a full TPC-DS-ish star schema, derived deterministically from the
TPC-H fixtures on BOTH engines:

* ``sales`` — lineitem ⋈ orders (the one real shuffle), each line
  assigned a CHANNEL by key arithmetic: ``(l_orderkey·7 +
  l_linenumber) % 4`` → 0,1 = store, 2 = catalog, 3 = web (TPC-DS's
  ~50/25/25 channel split). Money stays in integer cents / cent·pct
  units (``FLOOR(x·100+0.5)``); a per-line cost percentage ``60 +
  l_partkey % 30`` yields an integer profit in cent·pct units, so
  every SUM is an order-independent BIGINT. ``l_returnflag = 'R'``
  doubles as the returns feed (TPC-DS's *_returns tables).
* ``date_dim`` — DISTINCT order dates with year/moy/dom/qoy (both
  engines' YEAR/MONTH/DAY/QUARTER agree) plus ``d_week_seq``/``d_dow``
  computed by EXPLICIT epoch-day arithmetic identical on both engines
  (weekofyear()/dayofweek() builtins diverge cross-engine and are
  never used).
* ``item`` — part with ``i_category = p_type`` (single-token in the
  fixtures), synthesized ``i_class``/``i_manufact_id`` from the key.
* ``store`` — 12 synthetic stores with a 6-state rotation.

Every query keeps its TPC-DS reference's STRUCTURE (join graph,
aggregation shape, rollup/grouping pattern) with the substitutions
documented per query. 100 TB spine: item/date_dim/store broadcast
(dimensions), the lineitem⋈orders shuffle is shared via the one
``sales`` projection, aggregates are map-side-partial friendly integer
sums, rollups expand AFTER filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


def _sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified fact: lineitem ⋈ orders with channel, integer money,
    and profit. One shuffle feeding every channel slice."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    f = li.join(o, li.l_orderkey == o.o_orderkey)
    disc = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    ext = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    margin = 100 - disc - (60 + F.col("l_partkey") % 30)
    return f.select(
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4).alias("chan"),
        F.col("l_orderkey").alias("order_sk"),
        F.col("o_orderdate").alias("sold_date"),
        F.col("l_partkey").alias("item_sk"),
        F.col("o_custkey").alias("cust_sk"),
        (F.col("l_suppkey") % 12).alias("store_sk"),
        (F.col("l_suppkey") % 4).alias("site_sk"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        ext.alias("ext_cents"),
        disc.alias("disc_pct"),
        (ext * (100 - disc)).alias("net_cp"),
        (ext * margin).alias("profit_cp"),
        (F.col("l_returnflag") == "R").alias("returned"),
    )


def _channel(spark: SparkSession, sf_dir: str, chan: str) -> DataFrame:
    s = _sales(spark, sf_dir)
    if chan == "store":
        return s.filter(F.col("chan") <= 1)
    if chan == "catalog":
        return s.filter(F.col("chan") == 2)
    return s.filter(F.col("chan") == 3)


def _date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        # the explicit isNotNull is load-bearing for pushdown hygiene:
        # the computed d_week_seq join keys put an UNpushable
        # isnotnull(<epoch-day arithmetic>) on this scan; this pushable
        # conjunct rides along so the scan always carries a real
        # PushedFilters entry (a NULL order date would never join or
        # bucket anyway — both engines exclude it identically)
        o.filter(F.col("o_orderdate").isNotNull())
        .select(F.col("o_orderdate").alias("d_date"))
        .distinct()
        .select(
            "d_date",
            F.year("d_date").alias("d_year"),
            F.month("d_date").alias("d_moy"),
            F.dayofmonth("d_date").alias("d_dom"),
            F.quarter("d_date").alias("d_qoy"),
            # cross-engine-exact calendar arithmetic (VERDICT r11 item
            # 3): weekofyear()/dayofweek() diverge between engines
            # (ISO-vs-locale rules), so BOTH engines compute the same
            # epoch-day expressions instead. d_week_seq = consecutive
            # Monday-anchored 7-day buckets since 1970-01-05 (TPC-DS's
            # d_week_seq is exactly such a sequence number); d_dow =
            # 0..6 with 0 = Sunday (1970-01-01 was a Thursday → +4).
            F.floor(
                F.datediff(F.col("d_date"), F.lit("1970-01-05").cast("date"))
                / 7
            )
            .cast("int")
            .alias("d_week_seq"),
            (
                (
                    F.datediff(
                        F.col("d_date"), F.lit("1970-01-01").cast("date")
                    )
                    + 4
                )
                % 7
            )
            .cast("int")
            .alias("d_dow"),
        )
    )


def _item(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("i_item_sk"),
        F.col("p_brand").alias("i_brand"),
        F.col("p_type").alias("i_category"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 8).cast("string")).alias(
            "i_class"
        ),
        (F.col("p_partkey") % 1000).alias("i_manufact_id"),
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("long")
        .alias("i_price_cents"),
    )


_STATES = ["TN", "CA", "TX", "NY", "OH", "GA"]


def _store(spark: SparkSession) -> DataFrame:
    rows = [(i, _STATES[i % 6]) for i in range(12)]
    return spark.createDataFrame(rows, "s_store_sk long, s_state string")


# ------------------------------------------------------------- SQL twin
_DS_SQL = """
sales AS (
  SELECT (l_orderkey * 7 + l_linenumber) % 4 AS chan,
         l_orderkey AS order_sk,
         o_orderdate AS sold_date,
         l_partkey AS item_sk,
         o_custkey AS cust_sk,
         l_suppkey % 12 AS store_sk,
         l_suppkey % 4 AS site_sk,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS ext_cents,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS net_cp,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)
              - (60 + l_partkey % 30)) AS profit_cp,
         (l_returnflag = 'R') AS returned
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
store_sales AS (SELECT * FROM sales WHERE chan <= 1),
catalog_sales AS (SELECT * FROM sales WHERE chan = 2),
web_sales AS (SELECT * FROM sales WHERE chan = 3),
date_dim AS (
  SELECT DISTINCT o_orderdate AS d_date,  -- NULL dates excluded below
         YEAR(o_orderdate) AS d_year, MONTH(o_orderdate) AS d_moy,
         DAY(o_orderdate) AS d_dom, QUARTER(o_orderdate) AS d_qoy,
         CAST(FLOOR((CAST(o_orderdate AS DATE) - DATE '1970-01-05') / 7.0)
              AS INTEGER) AS d_week_seq,
         CAST(((CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 4) % 7
              AS INTEGER) AS d_dow
  FROM orders
  WHERE o_orderdate IS NOT NULL
),
item AS (
  SELECT p_partkey AS i_item_sk, p_brand AS i_brand, p_type AS i_category,
         'c' || CAST(p_partkey % 8 AS VARCHAR) AS i_class,
         p_partkey % 1000 AS i_manufact_id,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS i_price_cents
  FROM part
),
store AS (
  SELECT i AS s_store_sk,
         CASE i % 6 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'TX'
                    WHEN 3 THEN 'NY' WHEN 4 THEN 'OH' ELSE 'GA' END AS s_state
  FROM (SELECT unnest(generate_series(0, 11)) AS i)
)
"""


@query(
    "tpcds_q03",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT d_year, i_brand, SUM(ext_cents) AS sales_cents
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    WHERE i_manufact_id = 128 AND d_moy = 11
    GROUP BY d_year, i_brand
    ORDER BY d_year NULLS LAST, i_brand NULLS LAST, sales_cents NULLS LAST
    """,
)
def tpcds_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 (brand revenue for one manufacturer in November, by
    year). Substitutions: i_manufact_id synthesized from the part key;
    ss_ext_sales_price → integer cents. 100 TB: item (filtered to
    ~1/1000th) and date_dim (filtered to moy=11) broadcast into the
    store_sales scan; the aggregate is a small (year × brand) hash."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_moy") == 11)
    it = _item(spark, sf_dir).filter(F.col("i_manufact_id") == 128)
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy("d_year", "i_brand")
        .agg(F.sum("ext_cents").alias("sales_cents"))
    )
    return ordered(out, "d_year", "i_brand", "sales_cents")


@query(
    "tpcds_q07",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT i_item_sk AS item,
           FLOOR(CAST(SUM(qty) * 100 AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_qty,
           FLOOR(CAST(SUM(ext_cents) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_price,
           FLOOR(CAST(SUM(disc_pct) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_disc,
           COUNT(*) AS n
    FROM store_sales
    JOIN customer ON cust_sk = c_custkey
    JOIN item ON item_sk = i_item_sk
    WHERE c_mktsegment = 'BUILDING' AND i_manufact_id < 100
    GROUP BY i_item_sk
    ORDER BY item NULLS LAST, avg_qty NULLS LAST, avg_price NULLS LAST,
             avg_disc NULLS LAST, n NULLS LAST
    """,
)
def tpcds_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q7 (per-item averages for a demographic slice).
    Substitutions: customer_demographics → c_mktsegment (the fixtures'
    segmentation column). Averages follow the repo's avg_exact
    discipline: floor-rounded double division of identical integer
    sums. 100 TB: customer is the mid-size dimension — at TPC-DS
    ratios it sort-merge-joins once; item broadcasts."""
    ss = _channel(spark, sf_dir, "store")
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    it = _item(spark, sf_dir).filter(F.col("i_manufact_id") < 100)
    cnt = F.count(F.lit(1))
    out = (
        ss.join(cu, ss.cust_sk == cu.c_custkey)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy(F.col("i_item_sk").alias("item"))
        .agg(
            (
                F.floor((F.sum("qty") * 100).cast("double") / cnt + 0.5) / 100
            ).alias("avg_qty"),
            (F.floor(F.sum("ext_cents").cast("double") / cnt + 0.5) / 100).alias(
                "avg_price"
            ),
            (F.floor(F.sum("disc_pct").cast("double") / cnt + 0.5) / 100).alias(
                "avg_disc"
            ),
            cnt.alias("n"),
        )
    )
    return ordered(out, "item", "avg_qty", "avg_price", "avg_disc", "n")


@query(
    "tpcds_q19",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT i_brand, SUM(ext_cents) AS sales_cents
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    JOIN customer ON cust_sk = c_custkey
    JOIN store ON store_sk = s_store_sk
    WHERE d_year = 1998 AND d_moy = 11 AND i_manufact_id < 200
      AND c_nationkey % 6 <> s_store_sk % 6
    GROUP BY i_brand
    ORDER BY i_brand NULLS LAST, sales_cents NULLS LAST
    """,
)
def tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q19 (brand revenue where the buyer's locale differs from
    the store's — the cross-shopping report). Substitutions: zip-code
    mismatch → customer nation-group vs store state-group mismatch.
    100 TB: three broadcasts (date, item, store) + one customer join;
    the inequality is a post-join filter, never a join condition, so
    the planner keeps equi-joins throughout."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1998) & (F.col("d_moy") == 11)
    )
    it = _item(spark, sf_dir).filter(F.col("i_manufact_id") < 200)
    cu = load_table(spark, sf_dir, "customer")
    st = _store(spark)
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .join(cu, ss.cust_sk == cu.c_custkey)
        .join(F.broadcast(st), ss.store_sk == st.s_store_sk)
        .filter(F.col("c_nationkey") % 6 != F.col("s_store_sk") % 6)
        .groupBy("i_brand")
        .agg(F.sum("ext_cents").alias("sales_cents"))
    )
    return ordered(out, "i_brand", "sales_cents")


@query(
    "tpcds_q36",
    oracle="WITH "
    + _DS_SQL
    + """,
    agg AS (
      SELECT SUM(profit_cp) AS profit_cp_sum, SUM(net_cp) AS net_cp_sum,
             i_category, i_class,
             GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
             CASE WHEN GROUPING(i_class) = 0 THEN i_category END AS parent
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = 1998
      GROUP BY ROLLUP (i_category, i_class)
    )
    SELECT CAST(profit_cp_sum AS DOUBLE) / net_cp_sum AS gross_margin,
           i_category, i_class, lochierarchy,
           RANK() OVER (
             PARTITION BY lochierarchy, parent
             ORDER BY CAST(profit_cp_sum AS DOUBLE) / net_cp_sum ASC
           ) AS rank_within_parent
    FROM agg
    ORDER BY gross_margin NULLS LAST, i_category NULLS LAST,
             i_class NULLS LAST, lochierarchy NULLS LAST,
             rank_within_parent NULLS LAST
    """,
)
def tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 (gross margin ROLLUP over category/class with
    RANK-within-hierarchy-level) — the CASE-heavy rollup/report shape
    TPC-H lacks. Margin = profit/net of integer cent·pct sums, so both
    engines divide identical BIGINTs (bit-identical doubles, identical
    rank order). 100 TB: the rollup expands after the year filter; the
    window runs over the tiny aggregate, not the fact."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1998)
    it = _item(spark, sf_dir)
    base = ss.join(F.broadcast(dd), ss.sold_date == dd.d_date).join(
        F.broadcast(it), ss.item_sk == it.i_item_sk
    )
    agg = base.rollup("i_category", "i_class").agg(
        F.sum("profit_cp").alias("profit_cp_sum"),
        F.sum("net_cp").alias("net_cp_sum"),
        (F.grouping("i_category") + F.grouping("i_class")).alias("lochierarchy"),
        F.when(F.grouping("i_class") == 0, F.col("i_category")).alias("parent"),
    )
    margin = (F.col("profit_cp_sum").cast("double") / F.col("net_cp_sum")).alias(
        "gross_margin"
    )
    w = Window.partitionBy("lochierarchy", "parent").orderBy(
        F.col("profit_cp_sum").cast("double") / F.col("net_cp_sum")
    )
    out = agg.select(
        margin,
        "i_category",
        "i_class",
        "lochierarchy",
        F.rank().over(w).alias("rank_within_parent"),
    )
    return ordered(
        out, "gross_margin", "i_category", "i_class", "lochierarchy",
        "rank_within_parent",
    )


@query(
    "tpcds_q42",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT d_year, i_category, SUM(ext_cents) AS sales_cents
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    WHERE d_moy = 12
    GROUP BY d_year, i_category
    ORDER BY d_year NULLS LAST, i_category NULLS LAST, sales_cents NULLS LAST
    """,
)
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q42 (category revenue for a month, by year). The plan is
    the q03 spine with a coarser group key — included because category
    (low cardinality) stresses the partial-agg path differently than
    brand (high cardinality)."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_moy") == 12)
    it = _item(spark, sf_dir)
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy("d_year", "i_category")
        .agg(F.sum("ext_cents").alias("sales_cents"))
    )
    return ordered(out, "d_year", "i_category", "sales_cents")


@query(
    "tpcds_q52",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT d_year, i_brand, SUM(net_cp) AS net_cp_sum
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    WHERE d_moy = 12 AND d_year = 2000
    GROUP BY d_year, i_brand
    ORDER BY d_year NULLS LAST, i_brand NULLS LAST, net_cp_sum NULLS LAST
    """,
)
def tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q52 (brand revenue for one December). Discounted revenue
    (net_cp) instead of list price — exercises the derived-column sum."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_moy") == 12) & (F.col("d_year") == 2000)
    )
    it = _item(spark, sf_dir)
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy("d_year", "i_brand")
        .agg(F.sum("net_cp").alias("net_cp_sum"))
    )
    return ordered(out, "d_year", "i_brand", "net_cp_sum")


@query(
    "tpcds_q55",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT i_brand, SUM(ext_cents) AS sales_cents
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    WHERE d_moy = 11 AND d_year = 1999
      AND i_manufact_id BETWEEN 28 AND 57
    GROUP BY i_brand
    ORDER BY i_brand NULLS LAST, sales_cents NULLS LAST
    """,
)
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q55 (brand revenue for one manager's items in a month).
    Substitution: i_manager_id → an i_manufact_id band."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_moy") == 11) & (F.col("d_year") == 1999)
    )
    it = _item(spark, sf_dir).filter(F.col("i_manufact_id").between(28, 57))
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy("i_brand")
        .agg(F.sum("ext_cents").alias("sales_cents"))
    )
    return ordered(out, "i_brand", "sales_cents")


@query(
    "tpcds_q60",
    oracle="WITH "
    + _DS_SQL
    + """,
    x AS (SELECT 1)
    -- INDEPENDENT FORM (round 13): the Spark side unions three
    -- per-channel aggregates; the channels partition the fact, so the
    -- union of per-item channel sums re-aggregated per item IS one
    -- per-item sum over the whole fact — computed here in a single
    -- pass with NO channel views, NO date_dim view (direct
    -- YEAR/MONTH), and NO item view (p_type straight off part)
    SELECT s.item_sk AS item, SUM(s.ext_cents) AS total_cents
    FROM sales s JOIN part ON s.item_sk = p_partkey
    WHERE p_type = 'ECONOMY'
      AND YEAR(s.sold_date) = 1999 AND MONTH(s.sold_date) = 9
    GROUP BY s.item_sk
    ORDER BY item NULLS LAST, total_cents NULLS LAST
    """,
)
def tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q60 (per-item revenue for one category-month, summed
    ACROSS the three channels via UNION ALL of per-channel aggregates)
    — the multi-channel union shape. 100 TB: each branch aggregates its
    channel slice before the union, so the re-aggregate sees 3 small
    inputs; the three branches share one underlying sales scan (Spark
    reuses the exchange under AQE when the subplans match)."""
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1999) & (F.col("d_moy") == 9)
    )
    it = _item(spark, sf_dir).filter(F.col("i_category") == "ECONOMY")

    def branch(chan: str) -> DataFrame:
        c = _channel(spark, sf_dir, chan)
        return (
            c.join(F.broadcast(it), c.item_sk == it.i_item_sk)
            .join(F.broadcast(dd), c.sold_date == dd.d_date)
            .groupBy("item_sk")
            .agg(F.sum("ext_cents").alias("total_cents"))
        )

    uni = branch("store").unionByName(branch("catalog")).unionByName(
        branch("web")
    )
    out = (
        uni.groupBy(F.col("item_sk").alias("item"))
        .agg(F.sum("total_cents").alias("total_cents"))
    )
    return ordered(out, "item", "total_cents")


@query(
    "tpcds_q74",
    oracle="WITH "
    + _DS_SQL
    + """,
    yt AS (
      -- INDEPENDENT FORM (round 13): the Spark side is one 4-sum
      -- conditional pivot; this side is the REFERENCE's own
      -- year_total 4-way SELF-JOIN (all legs inner: every total is
      -- >0-gated, and ext_cents > 0 makes presence ≡ tot > 0)
      SELECT cust_sk,
             CASE WHEN chan <= 1 THEN 's' ELSE 'w' END AS cg,
             YEAR(sold_date) AS y, SUM(ext_cents) AS tot
      FROM sales
      WHERE YEAR(sold_date) IN (1996, 1997) AND (chan <= 1 OR chan = 3)
      GROUP BY 1, 2, 3
    )
    SELECT a.cust_sk AS customer
    FROM (SELECT cust_sk, tot AS s96 FROM yt WHERE cg='s' AND y=1996) a
    JOIN (SELECT cust_sk, tot AS s97 FROM yt WHERE cg='s' AND y=1997) b
      ON a.cust_sk = b.cust_sk
    JOIN (SELECT cust_sk, tot AS w96 FROM yt WHERE cg='w' AND y=1996) c
      ON a.cust_sk = c.cust_sk
    JOIN (SELECT cust_sk, tot AS w97 FROM yt WHERE cg='w' AND y=1997) d
      ON a.cust_sk = d.cust_sk
    WHERE w97 * s96 > w96 * s97
    ORDER BY customer NULLS LAST
    """,
)
def tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q74/Q11 (customers whose web spending grew faster than
    their store spending year-over-year). The reference's 4-way
    self-join of a year_total CTE collapses to ONE conditional
    aggregation pass (4 filtered sums per customer) — same relation,
    quarter the shuffles. The growth-ratio comparison w97/w96 >
    s97/s96 is cross-multiplied into exact BIGINT arithmetic, so no
    division is compared across engines."""
    s = _sales(spark, sf_dir).filter(
        F.year("sold_date").isin(1996, 1997)
    )

    def cond_sum(chan_pred, yr):
        return F.sum(
            F.when(
                chan_pred & (F.year("sold_date") == yr), F.col("ext_cents")
            ).otherwise(F.lit(0))
        )

    store_p, web_p = F.col("chan") <= 1, F.col("chan") == 3
    yt = s.groupBy("cust_sk").agg(
        cond_sum(store_p, 1996).alias("s96"),
        cond_sum(store_p, 1997).alias("s97"),
        cond_sum(web_p, 1996).alias("w96"),
        cond_sum(web_p, 1997).alias("w97"),
    )
    out = yt.filter(
        (F.col("s96") > 0)
        & (F.col("s97") > 0)
        & (F.col("w96") > 0)
        & (F.col("w97") > 0)
        & (F.col("w97") * F.col("s96") > F.col("w96") * F.col("s97"))
    ).select(F.col("cust_sk").alias("customer"))
    return ordered(out, "customer")


@query(
    "tpcds_q77",
    oracle="WITH "
    + _DS_SQL
    + """,
    per AS (
      SELECT chan,
             SUM(CASE WHEN NOT returned THEN ext_cents ELSE 0 END)
               AS sales_cents,
             SUM(CASE WHEN returned THEN ext_cents ELSE 0 END)
               AS returns_cents,
             SUM(profit_cp) AS profit_cp_sum
      FROM sales WHERE YEAR(sold_date) = 2000
      GROUP BY chan
    )
    -- INDEPENDENT FORM (round 13): the Spark side GROUP BY ROLLUP +
    -- GROUPING(); this side spells the two grouping levels out as an
    -- explicit UNION ALL (detail rows + grand total) — a shared
    -- misreading of rollup/grouping semantics cannot hash-match
    SELECT CASE chan WHEN 0 THEN 'store' WHEN 1 THEN 'store'
                     WHEN 2 THEN 'catalog' WHEN 3 THEN 'web' END AS channel,
           0 AS g, sales_cents, returns_cents, profit_cp_sum
    FROM per
    UNION ALL
    SELECT NULL, 1, SUM(sales_cents), SUM(returns_cents),
           SUM(profit_cp_sum)
    FROM per
    ORDER BY channel NULLS LAST, g NULLS LAST, sales_cents NULLS LAST,
             returns_cents NULLS LAST, profit_cp_sum NULLS LAST
    """,
)
def tpcds_q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q77/Q5 (per-channel sales vs returns vs profit, with a
    ROLLUP grand total). Substitution: the *_returns tables are the
    ``l_returnflag = 'R'`` slice — same conditional-aggregation shape.
    Note the two store channel codes (0, 1) collapse under one label,
    so the rollup re-aggregates them — grouping on an expression's
    preimage, a corner the plain q19-family never hits."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date") == 2000)
    per = s.groupBy("chan").agg(
        F.sum(
            F.when(~F.col("returned"), F.col("ext_cents")).otherwise(F.lit(0))
        ).alias("sales_cents"),
        F.sum(
            F.when(F.col("returned"), F.col("ext_cents")).otherwise(F.lit(0))
        ).alias("returns_cents"),
        F.sum("profit_cp").alias("profit_cp_sum"),
    )
    label = (
        F.when(F.col("chan") <= 1, "store")
        .when(F.col("chan") == 2, "catalog")
        .when(F.col("chan") == 3, "web")
    )
    out = per.rollup("chan").agg(
        F.grouping("chan").alias("g"),
        F.sum("sales_cents").alias("sales_cents"),
        F.sum("returns_cents").alias("returns_cents"),
        F.sum("profit_cp_sum").alias("profit_cp_sum"),
    ).select(
        label.alias("channel"),
        "g",
        "sales_cents",
        "returns_cents",
        "profit_cp_sum",
    )
    return ordered(
        out, "channel", "g", "sales_cents", "returns_cents", "profit_cp_sum"
    )


@query(
    "tpcds_q86",
    oracle="WITH "
    + _DS_SQL
    + """,
    agg AS (
      SELECT SUM(net_cp) AS net_cp_sum, i_category, i_class,
             GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
             CASE WHEN GROUPING(i_class) = 0 THEN i_category END AS parent
      FROM web_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_qoy = 1 AND d_year = 2001
      GROUP BY ROLLUP (i_category, i_class)
    )
    SELECT net_cp_sum, i_category, i_class, lochierarchy,
           RANK() OVER (
             PARTITION BY lochierarchy, parent
             ORDER BY net_cp_sum DESC
           ) AS rank_within_parent
    FROM agg
    ORDER BY net_cp_sum NULLS LAST, i_category NULLS LAST, i_class NULLS LAST,
             lochierarchy NULLS LAST, rank_within_parent NULLS LAST
    """,
)
def tpcds_q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q86 (web revenue ROLLUP with rank-within-parent) — the
    q36 report shape on the web channel, ranked by an exact BIGINT so
    the window order needs no float reasoning at all."""
    ws = _channel(spark, sf_dir, "web")
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_qoy") == 1) & (F.col("d_year") == 2001)
    )
    it = _item(spark, sf_dir)
    agg = (
        ws.join(F.broadcast(dd), ws.sold_date == dd.d_date)
        .join(F.broadcast(it), ws.item_sk == it.i_item_sk)
        .rollup("i_category", "i_class")
        .agg(
            F.sum("net_cp").alias("net_cp_sum"),
            (F.grouping("i_category") + F.grouping("i_class")).alias(
                "lochierarchy"
            ),
            F.when(F.grouping("i_class") == 0, F.col("i_category")).alias(
                "parent"
            ),
        )
    )
    w = Window.partitionBy("lochierarchy", "parent").orderBy(
        F.col("net_cp_sum").desc()
    )
    out = agg.select(
        "net_cp_sum",
        "i_category",
        "i_class",
        "lochierarchy",
        F.rank().over(w).alias("rank_within_parent"),
    )
    return ordered(
        out, "net_cp_sum", "i_category", "i_class", "lochierarchy",
        "rank_within_parent",
    )


@query(
    "tpcds_q97",
    oracle="WITH "
    + _DS_SQL
    + """,
    ssci AS (SELECT DISTINCT cust_sk, item_sk FROM store_sales),
    wsci AS (SELECT DISTINCT cust_sk, item_sk FROM web_sales)
    SELECT SUM(CASE WHEN s.cust_sk IS NOT NULL AND w.cust_sk IS NULL
                    THEN 1 ELSE 0 END) AS store_only,
           SUM(CASE WHEN s.cust_sk IS NULL AND w.cust_sk IS NOT NULL
                    THEN 1 ELSE 0 END) AS web_only,
           SUM(CASE WHEN s.cust_sk IS NOT NULL AND w.cust_sk IS NOT NULL
                    THEN 1 ELSE 0 END) AS both_channels
    FROM ssci s
    FULL OUTER JOIN wsci w
      ON s.cust_sk = w.cust_sk AND s.item_sk = w.item_sk
    """,
)
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q97 (customer-item pairs bought in store only, web only,
    or both — the channel-overlap census): DISTINCT pair sets per
    channel, FULL OUTER JOIN, conditional count. 100 TB: the distincts
    are the heavy shuffles (pair cardinality), the outer join then
    co-partitions on the same key pair — AQE reuses the partitioning.
    Single-row output, so no ORDER BY is needed for determinism."""
    ss = _channel(spark, sf_dir, "store").select("cust_sk", "item_sk").distinct()
    ws = (
        _channel(spark, sf_dir, "web")
        .select(
            F.col("cust_sk").alias("w_cust_sk"),
            F.col("item_sk").alias("w_item_sk"),
        )
        .distinct()
    )
    j = ss.join(
        ws,
        (ss.cust_sk == ws.w_cust_sk) & (ss.item_sk == ws.w_item_sk),
        "full_outer",
    )
    one = F.lit(1)
    zero = F.lit(0)
    out = j.agg(
        F.sum(
            F.when(
                F.col("cust_sk").isNotNull() & F.col("w_cust_sk").isNull(), one
            ).otherwise(zero)
        ).alias("store_only"),
        F.sum(
            F.when(
                F.col("cust_sk").isNull() & F.col("w_cust_sk").isNotNull(), one
            ).otherwise(zero)
        ).alias("web_only"),
        F.sum(
            F.when(
                F.col("cust_sk").isNotNull() & F.col("w_cust_sk").isNotNull(),
                one,
            ).otherwise(zero)
        ).alias("both_channels"),
    )
    return out


@query(
    "tpcds_q29",
    oracle="WITH "
    + _DS_SQL
    + """,
    sold AS (
      SELECT item_sk, SUM(qty) AS sold_qty
      FROM store_sales WHERE NOT returned AND YEAR(sold_date) = 1999
      GROUP BY item_sk
    ),
    ret AS (
      SELECT item_sk, SUM(qty) AS ret_qty
      FROM store_sales WHERE returned AND YEAR(sold_date) = 1999
      GROUP BY item_sk
    ),
    rebought AS (
      SELECT item_sk, SUM(qty) AS cat_qty
      FROM catalog_sales WHERE YEAR(sold_date) IN (1999, 2000)
      GROUP BY item_sk
    )
    SELECT s.item_sk AS item, s.sold_qty, r.ret_qty, b.cat_qty
    FROM sold s
    JOIN ret r ON s.item_sk = r.item_sk
    JOIN rebought b ON s.item_sk = b.item_sk
    ORDER BY item NULLS LAST, sold_qty NULLS LAST, ret_qty NULLS LAST,
             cat_qty NULLS LAST
    """,
)
def tpcds_q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q29 (the buy → return → re-buy-through-catalog report,
    per item): three per-channel item aggregates joined on the item
    key. Substitutions: store_returns is the returned slice of
    store_sales; the pair-level (item, customer) correlation of the
    reference is item-level here — at the fixtures' channel split a
    same-customer triple is a ~single-row result, which would make the
    oracle vacuous. 100 TB: the three aggregates shuffle on the SAME
    key, so AQE co-partitions the joins with no extra exchange."""
    ss = _channel(spark, sf_dir, "store")
    y = F.year("sold_date")
    sold = (
        ss.filter(~F.col("returned") & (y == 1999))
        .groupBy("item_sk")
        .agg(F.sum("qty").alias("sold_qty"))
    )
    ret = (
        ss.filter(F.col("returned") & (y == 1999))
        .groupBy("item_sk")
        .agg(F.sum("qty").alias("ret_qty"))
    )
    rebought = (
        _channel(spark, sf_dir, "catalog")
        .filter(y.isin(1999, 2000))
        .groupBy("item_sk")
        .agg(F.sum("qty").alias("cat_qty"))
    )
    out = (
        sold.join(ret, on="item_sk")
        .join(rebought, on="item_sk")
        .select(
            F.col("item_sk").alias("item"), "sold_qty", "ret_qty", "cat_qty"
        )
    )
    return ordered(out, "item", "sold_qty", "ret_qty", "cat_qty")


@query(
    "tpcds_q51",
    oracle="WITH "
    + _DS_SQL
    + """,
    wd AS (
      SELECT item_sk, sold_date,
             SUM(SUM(ext_cents))
               OVER (PARTITION BY item_sk ORDER BY sold_date) AS cume
      FROM web_sales WHERE YEAR(sold_date) = 2000 AND item_sk % 50 = 0
      GROUP BY item_sk, sold_date
    ),
    sd AS (
      SELECT item_sk, sold_date,
             SUM(SUM(ext_cents))
               OVER (PARTITION BY item_sk ORDER BY sold_date) AS cume
      FROM store_sales WHERE YEAR(sold_date) = 2000 AND item_sk % 50 = 0
      GROUP BY item_sk, sold_date
    )
    SELECT COALESCE(w.item_sk, s.item_sk) AS item,
           COALESCE(w.sold_date, s.sold_date) AS d,
           w.cume AS web_cume, s.cume AS store_cume
    FROM wd w
    FULL OUTER JOIN sd s
      ON w.item_sk = s.item_sk AND w.sold_date = s.sold_date
    WHERE COALESCE(w.cume, 0) > COALESCE(s.cume, 0)
    ORDER BY item NULLS LAST, d NULLS LAST, web_cume NULLS LAST,
             store_cume NULLS LAST
    """,
)
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 (item-days where the WEB cumulative revenue leads the
    store's): per-channel daily aggregate, a running-total window over
    each, FULL OUTER JOIN on (item, day) — aggregate-then-window-then-
    outer-join, the one composition no other catalog query exercises.
    Money in integer cents keeps both the cumulative sums and the
    comparison exact. 100 TB: window partitions by item (parallel);
    the outer join co-shuffles two already-aggregated (small) sides."""
    y2000 = F.year("sold_date") == 2000
    sel = F.col("item_sk") % 50 == 0

    def cume(chan: str) -> DataFrame:
        daily = (
            _channel(spark, sf_dir, chan)
            .filter(y2000 & sel)
            .groupBy("item_sk", "sold_date")
            .agg(F.sum("ext_cents").alias("day_cents"))
        )
        w = Window.partitionBy("item_sk").orderBy("sold_date")
        return daily.select(
            "item_sk", "sold_date", F.sum("day_cents").over(w).alias("cume")
        )

    wd = cume("web").select(
        F.col("item_sk").alias("w_item"),
        F.col("sold_date").alias("w_date"),
        F.col("cume").alias("web_cume"),
    )
    sd = cume("store").select(
        F.col("item_sk").alias("s_item"),
        F.col("sold_date").alias("s_date"),
        F.col("cume").alias("store_cume"),
    )
    out = (
        wd.join(
            sd,
            (wd.w_item == sd.s_item) & (wd.w_date == sd.s_date),
            "full_outer",
        )
        .filter(
            F.coalesce(F.col("web_cume"), F.lit(0))
            > F.coalesce(F.col("store_cume"), F.lit(0))
        )
        .select(
            F.coalesce(F.col("w_item"), F.col("s_item")).alias("item"),
            F.coalesce(F.col("w_date"), F.col("s_date")).alias("d"),
            "web_cume",
            "store_cume",
        )
    )
    return ordered(out, "item", "d", "web_cume", "store_cume")


@query(
    "tpcds_q73",
    oracle="WITH "
    + _DS_SQL
    + """,
    tickets AS (
      SELECT l_orderkey AS ticket, o_custkey AS cust_sk,
             COUNT(*) AS items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE (l_orderkey * 7 + l_linenumber) % 4 <= 1
      GROUP BY l_orderkey, o_custkey
      HAVING COUNT(*) BETWEEN 4 AND 7
    )
    SELECT c_custkey AS customer, c_mktsegment AS segment,
           ticket, items
    FROM tickets JOIN customer ON cust_sk = c_custkey
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ORDER BY customer NULLS LAST, segment NULLS LAST, ticket NULLS LAST,
             items NULLS LAST
    """,
)
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q73 (customers with burst purchases: store tickets
    holding 4–7 items, joined to the customer dimension) — the
    aggregate-HAVING-then-join shape. The ticket is the order key;
    the store channel filter keeps parity with the synthesized
    channel split. 100 TB: the per-ticket count is map-side-partial
    on the natural lineitem clustering (orderkey), and the customer
    join happens AFTER the HAVING has cut the ticket set."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tickets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4 <= 1)
        .groupBy(
            F.col("l_orderkey").alias("ticket"),
            F.col("o_custkey").alias("cust_sk"),
        )
        .agg(F.count(F.lit(1)).alias("items"))
        .filter(F.col("items").between(4, 7))
    )
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    out = tickets.join(cu, tickets.cust_sk == cu.c_custkey).select(
        F.col("c_custkey").alias("customer"),
        F.col("c_mktsegment").alias("segment"),
        "ticket",
        "items",
    )
    return ordered(out, "customer", "segment", "ticket", "items")


@query(
    "tpcds_q67",
    oracle="WITH "
    + _DS_SQL
    + """,
    rolled AS (
      SELECT i_category, i_class, i_brand, SUM(net_cp) AS sumsales,
             GROUPING(i_category) AS g_cat, GROUPING(i_class) AS g_class,
             GROUPING(i_brand) AS g_brand
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = 2000
      GROUP BY ROLLUP (i_category, i_class, i_brand)
    )
    SELECT i_category, i_class, i_brand, sumsales,
           g_cat, g_class, g_brand, rk
    FROM (
      SELECT *, RANK() OVER (
               PARTITION BY i_category ORDER BY sumsales DESC
             ) AS rk
      FROM rolled
    )
    WHERE rk <= 5
    ORDER BY i_category NULLS LAST, i_class NULLS LAST, i_brand NULLS LAST,
             sumsales NULLS LAST, g_cat NULLS LAST, g_class NULLS LAST,
             g_brand NULLS LAST, rk NULLS LAST
    """,
)
def tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape — RANK OVER A ROLLUP (the window-over-grouped-
    hierarchy family the r6 verdict flagged as unexercised): store
    sales for one year aggregated over ROLLUP(category, class, brand),
    then ranked WITHIN each category partition (subtotal and
    grand-total rows rank in their own NULL-category partitions —
    rollup rows flow through the window like any other row), keeping
    each category's top 5 slices. RANK (not row_number) keeps ties
    deterministic across engines; money is the integer net_cp sum.
    Plan: broadcast dims onto the sales spine, ONE shuffle for the
    rollup's partial agg, one more for the window partition — the
    rollup expands after the filter, so the window's input is
    O(groups), not O(rows)."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 2000)
    it = _item(spark, sf_dir)
    rolled = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .rollup("i_category", "i_class", "i_brand")
        .agg(
            F.sum("net_cp").alias("sumsales"),
            F.grouping("i_category").cast("long").alias("g_cat"),
            F.grouping("i_class").cast("long").alias("g_class"),
            F.grouping("i_brand").cast("long").alias("g_brand"),
        )
    )
    w = Window.partitionBy("i_category").orderBy(F.col("sumsales").desc())
    out = (
        rolled.withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("i_category", "i_class", "i_brand", "sumsales",
                "g_cat", "g_class", "g_brand", "rk")
    )
    return ordered(out, "i_category", "i_class", "i_brand", "sumsales",
                   "g_cat", "g_class", "g_brand", "rk")


@query(
    "tpcds_q70",
    oracle="WITH "
    + _DS_SQL
    + """,
    base AS (
      SELECT s_state, store_sk, profit_cp
      FROM store_sales JOIN store ON store_sk = s_store_sk
    ),
    top_states AS (
      SELECT s_state FROM (
        SELECT s_state,
               RANK() OVER (ORDER BY SUM(profit_cp) DESC) AS r
        FROM base GROUP BY s_state
      ) WHERE r <= 3
    ),
    rolled AS (
      SELECT s_state, store_sk, SUM(profit_cp) AS total_cp,
             GROUPING(s_state) AS g_state, GROUPING(store_sk) AS g_store,
             GROUPING(s_state) + GROUPING(store_sk) AS lochierarchy
      FROM base
      WHERE s_state IN (SELECT s_state FROM top_states)
      GROUP BY ROLLUP (s_state, store_sk)
      HAVING CAST(SUM(profit_cp) AS DOUBLE)
             > CAST((SELECT SUM(profit_cp) FROM base) AS DOUBLE) / 1000.0
    )
    SELECT s_state, store_sk, total_cp, lochierarchy,
           CAST(RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN g_store = 0 THEN s_state END
             ORDER BY total_cp DESC
           ) AS BIGINT) AS rank_within_parent
    FROM rolled
    ORDER BY s_state NULLS LAST, store_sk NULLS LAST, total_cp NULLS LAST,
             lochierarchy NULLS LAST, rank_within_parent NULLS LAST
    """,
)
def tpcds_q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q70 shape — WINDOW OVER A GROUPED ROLLUP WITH HAVING:
    profit by (state, store) for the top-3 profit states (a ranking
    subquery gates the input, as in the reference query), aggregated
    over ROLLUP(state, store) with a HAVING that keeps slices above
    1/1000 of GLOBAL profit — a FRACTION, not an absolute, so the
    filter stays meaningful at every fixture scale (the q11 lesson) —
    then RANK within each rollup parent (partition = hierarchy level +
    state for leaf rows; the CASE collapses subtotal rows into their
    own partition, exactly the reference's rank_within_parent).
    Plan: store broadcast, one shuffle for the state ranking, one for
    the rollup, window over O(groups); the HAVING total attaches as a
    1-row broadcast join with an inequality condition (bounded BNLJ,
    linter-sanctioned)."""
    ss = _channel(spark, sf_dir, "store")
    st = _store(spark)
    base = ss.join(F.broadcast(st), ss.store_sk == st.s_store_sk).select(
        "s_state", "store_sk", "profit_cp"
    )
    # top-3 states by rank() semantics WITHOUT a global window (a
    # partition-less rank plans Sort over Exchange SinglePartition —
    # the linter's all-rows-through-one-task rule): the 3rd-highest
    # state total via TakeOrderedAndProject, then `p >= thr` keeps
    # exactly the rank<=3 set, ties included ([10,9,8,8] -> thr 8 ->
    # 4 states, same as RANK). The per-state agg subtree is identical
    # in both branches, so the exchange is reused, not recomputed.
    sums = base.groupBy("s_state").agg(F.sum("profit_cp").alias("p"))
    thr = (
        sums.orderBy(F.col("p").desc())
        .limit(3)
        .agg(F.min("p").alias("thr"))
    )
    top = (
        sums.join(F.broadcast(thr), F.col("p") >= F.col("thr"))
        .select("s_state")
    )
    rolled = (
        base.join(F.broadcast(top), on="s_state", how="left_semi")
        .rollup("s_state", "store_sk")
        .agg(
            F.sum("profit_cp").alias("total_cp"),
            F.grouping("s_state").cast("long").alias("g_state"),
            F.grouping("store_sk").cast("long").alias("g_store"),
        )
        .withColumn("lochierarchy", F.col("g_state") + F.col("g_store"))
    )
    grand = base.agg(F.sum("profit_cp").alias("grand_cp"))
    kept = rolled.join(
        F.broadcast(grand),
        F.col("total_cp").cast("double")
        > F.col("grand_cp").cast("double") / 1000.0,
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_store") == 0, F.col("s_state")),
    ).orderBy(F.col("total_cp").desc())
    out = kept.withColumn(
        "rank_within_parent", F.rank().over(w).cast("long")
    ).select("s_state", "store_sk", "total_cp", "lochierarchy",
             "rank_within_parent")
    return ordered(out, "s_state", "store_sk", "total_cp", "lochierarchy",
                   "rank_within_parent")


@query(
    "tpcds_q88",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT
      SUM(CASE WHEN d_dom BETWEEN  1 AND  3 THEN 1 ELSE 0 END) AS h1,
      SUM(CASE WHEN d_dom BETWEEN  4 AND  6 THEN 1 ELSE 0 END) AS h2,
      SUM(CASE WHEN d_dom BETWEEN  7 AND  9 THEN 1 ELSE 0 END) AS h3,
      SUM(CASE WHEN d_dom BETWEEN 10 AND 12 THEN 1 ELSE 0 END) AS h4,
      SUM(CASE WHEN d_dom BETWEEN 13 AND 15 THEN 1 ELSE 0 END) AS h5,
      SUM(CASE WHEN d_dom BETWEEN 16 AND 18 THEN 1 ELSE 0 END) AS h6,
      SUM(CASE WHEN d_dom BETWEEN 19 AND 21 THEN 1 ELSE 0 END) AS h7,
      SUM(CASE WHEN d_dom BETWEEN 22 AND 24 THEN 1 ELSE 0 END) AS h8
    FROM store_sales
    JOIN date_dim ON sold_date = d_date
    WHERE qty BETWEEN 5 AND 45 AND d_year = 1995
    """,
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 (the 8-band activity census — reference text cross
    joins EIGHT independent scalar COUNT(*) subqueries over disjoint
    half-hour bands). Substitutions: time_dim half-hours → day-of-month
    bands (the fixtures carry dates, not times); household-demographic
    filter → a qty range. DELIBERATE PLAN REWRITE, documented: the
    textbook 8-subquery cross join scans the fact table 8 times; the
    bands are disjoint predicates over one scan, so this fuses them
    into ONE pass with 8 conditional sums — map-side-combinable, one
    shuffle of a single 8-column row per partition. At 100 TB the
    difference is 8 fact scans vs 1; the oracle uses the fused form
    too, and band-disjointness makes it equal to the cross join by
    construction."""
    ss = _channel(spark, sf_dir, "store").filter(F.col("qty").between(5, 45))
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    j = ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
    aggs = [
        F.sum(
            F.when(
                F.col("d_dom").between(lo, lo + 2), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias(f"h{i + 1}")
        for i, lo in enumerate(range(1, 24, 3))
    ]
    return j.agg(*aggs)


@query(
    "tpcds_q38",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_all3 FROM (
      SELECT DISTINCT cust_sk FROM store_sales
      JOIN date_dim ON sold_date = d_date WHERE d_year = 1995
      INTERSECT
      SELECT DISTINCT cust_sk FROM catalog_sales
      JOIN date_dim ON sold_date = d_date WHERE d_year = 1995
      INTERSECT
      SELECT DISTINCT cust_sk FROM web_sales
      JOIN date_dim ON sold_date = d_date WHERE d_year = 1995
    )
    """,
)
def tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38 (customers active in ALL THREE channels within a
    year — the tri-channel INTERSECT): per-channel DISTINCT customer
    sets, two INTERSECTs, COUNT. Spark compiles INTERSECT to a
    left-semi join over aggregated keys, so the plan is three
    channel-sliced distincts (each one shuffle on cust_sk) followed by
    two co-partitioned semi-joins — AQE reuses the cust_sk exchange.
    100 TB: distinct-customer cardinality is bounded by the customer
    dimension, orders of magnitude below the fact, so the INTERSECT
    inputs are small relative to the scan regardless of fact size."""
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)

    def chan_custs(name: str) -> DataFrame:
        s = _channel(spark, sf_dir, name)
        return (
            s.join(F.broadcast(dd), s.sold_date == dd.d_date)
            .select("cust_sk")
            .distinct()
        )

    out = (
        chan_custs("store")
        .intersect(chan_custs("catalog"))
        .intersect(chan_custs("web"))
        .agg(F.count(F.lit(1)).alias("n_all3"))
    )
    return out


@query(
    "tpcds_q31",
    oracle="WITH "
    + _DS_SQL
    + """,
    g AS (
      SELECT i_category,
        SUM(CASE WHEN chan <= 1 AND d_qoy = 1 THEN ext_cents ELSE 0 END)
          AS store_q1,
        SUM(CASE WHEN chan <= 1 AND d_qoy = 2 THEN ext_cents ELSE 0 END)
          AS store_q2,
        SUM(CASE WHEN chan  = 3 AND d_qoy = 1 THEN ext_cents ELSE 0 END)
          AS web_q1,
        SUM(CASE WHEN chan  = 3 AND d_qoy = 2 THEN ext_cents ELSE 0 END)
          AS web_q2
      FROM sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = 1995 AND d_qoy IN (1, 2) AND chan <> 2
      GROUP BY i_category
    )
    SELECT i_category, store_q1, store_q2, web_q1, web_q2
    FROM g
    WHERE store_q1 > 0 AND web_q1 > 0
      AND CAST(web_q2 AS DOUBLE) / web_q1
        > CAST(store_q2 AS DOUBLE) / store_q1
    ORDER BY i_category
    """,
)
def tpcds_q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q31 (categories whose WEB sales grew faster than their
    STORE sales quarter-over-quarter; reference compares ss/ws growth
    ratios per county via a 6-way self-join of aggregate subqueries).
    Substitutions: county → item category (the fixtures' stable
    grouping key), Q1→Q2 of 1995. DELIBERATE PLAN REWRITE, documented:
    the textbook form joins four aggregate subqueries over the same
    fact — four scans, four shuffles, a join pyramid; both quarters
    and both channels are disjoint slices of ONE scan, so this fuses
    them into one grouped pass with four conditional sums, then
    filters on the growth comparison. The ratio compare stays on
    DOUBLE division of identical exact BIGINTs on both engines (the
    repo's money discipline: never compare accumulated floats,
    cross-multiplication would overflow BIGINT at scale)."""
    s = _sales(spark, sf_dir).filter(F.col("chan") != 2)
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1995) & F.col("d_qoy").isin(1, 2)
    )
    it = _item(spark, sf_dir)
    j = s.join(F.broadcast(dd), s.sold_date == dd.d_date).join(
        F.broadcast(it), s.item_sk == it.i_item_sk
    )

    def _slice(chan_store: bool, qoy: int):
        cond = (
            (F.col("chan") <= 1) if chan_store else (F.col("chan") == 3)
        ) & (F.col("d_qoy") == qoy)
        return F.sum(F.when(cond, F.col("ext_cents")).otherwise(F.lit(0)))

    g = j.groupBy("i_category").agg(
        _slice(True, 1).alias("store_q1"),
        _slice(True, 2).alias("store_q2"),
        _slice(False, 1).alias("web_q1"),
        _slice(False, 2).alias("web_q2"),
    )
    out = g.filter(
        (F.col("store_q1") > 0)
        & (F.col("web_q1") > 0)
        & (
            F.col("web_q2").cast("double") / F.col("web_q1")
            > F.col("store_q2").cast("double") / F.col("store_q1")
        )
    ).select("i_category", "store_q1", "store_q2", "web_q1", "web_q2")
    return ordered(out, "i_category")


@query(
    "tpcds_q59",
    oracle="WITH "
    + _DS_SQL
    + """,
    m AS (
      SELECT store_sk, d_moy, SUM(net_cp) AS net
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995
      GROUP BY store_sk, d_moy
    )
    SELECT c.store_sk AS store_sk, c.d_moy AS moy,
           p.net AS prev_net, c.net AS curr_net,
           CAST(c.net AS DOUBLE) / p.net AS ratio
    FROM m c
    JOIN m p ON c.store_sk = p.store_sk AND c.d_moy = p.d_moy + 1
    WHERE p.net > 0
    ORDER BY store_sk, moy
    """,
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 (period-over-period revenue ratio per store; the
    reference self-joins this-year weekly sums against last-year's on
    week_seq). Substitutions: weeks → months (day-of-week/week-number
    semantics are a known cross-engine divergence, documented in the
    module header), year-over-year → month-over-month within 1995.
    DELIBERATE PLAN REWRITE, documented: the self-join on ``moy =
    prev_moy + 1`` re-shuffles the aggregate twice; after the grouped
    sum, LAG over (store_sk ORDER BY d_moy) delivers the previous
    month in the SAME partitioning — one shuffle total. A gap guard
    (lag month must be exactly moy-1) keeps the window form equal to
    the self-join when a month is absent. The oracle keeps the
    textbook self-join, so the equality also PROVES the rewrite."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    m = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .groupBy("store_sk", "d_moy")
        .agg(F.sum("net_cp").alias("net"))
    )
    w = Window.partitionBy("store_sk").orderBy("d_moy")
    out = (
        m.withColumn("prev_net", F.lag("net").over(w))
        .withColumn("prev_moy", F.lag("d_moy").over(w))
        .filter(
            (F.col("prev_moy") == F.col("d_moy") - 1)
            & (F.col("prev_net") > 0)
        )
        .select(
            "store_sk",
            F.col("d_moy").alias("moy"),
            "prev_net",
            F.col("net").alias("curr_net"),
            (F.col("net").cast("double") / F.col("prev_net")).alias("ratio"),
        )
    )
    return ordered(out, "store_sk", "moy")


@query(
    "tpcds_q98",
    oracle="WITH "
    + _DS_SQL
    + """,
    rev AS (
      SELECT i_item_sk, i_class, SUM(net_cp) AS itemrevenue
      FROM web_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = 1995 AND d_moy = 5
      GROUP BY i_item_sk, i_class
    )
    SELECT i_item_sk, i_class, itemrevenue,
           CAST(itemrevenue AS DOUBLE) * 100
             / SUM(itemrevenue) OVER (PARTITION BY i_class)
             AS revenueratio
    FROM rev
    ORDER BY i_class, i_item_sk
    """,
)
def tpcds_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q98 (item revenue share within its class — the
    ratio-to-report window shape, which no other catalog query
    exercises: a windowed SUM over the grouped aggregate feeding a
    per-row percentage). One grouped shuffle on (item, class), then
    the window re-partitions on the class prefix. The percentage is
    DOUBLE division of identical exact BIGINTs (window sums of cents
    stay integer on both engines), per the money discipline. 100 TB:
    both shuffles key on item/class — dimension-bounded cardinality,
    not fact-bounded."""
    ws = _channel(spark, sf_dir, "web")
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1995) & (F.col("d_moy") == 5)
    )
    it = _item(spark, sf_dir)
    rev = (
        ws.join(F.broadcast(dd), ws.sold_date == dd.d_date)
        .join(F.broadcast(it), ws.item_sk == it.i_item_sk)
        .groupBy("i_item_sk", "i_class")
        .agg(F.sum("net_cp").alias("itemrevenue"))
    )
    w = Window.partitionBy("i_class")
    out = rev.select(
        "i_item_sk",
        "i_class",
        "itemrevenue",
        (
            F.col("itemrevenue").cast("double")
            * 100
            / F.sum("itemrevenue").over(w)
        ).alias("revenueratio"),
    )
    return ordered(out, "i_class", "i_item_sk")


@query(
    "tpcds_q89",
    oracle="WITH "
    + _DS_SQL
    + """,
    ms AS (
      SELECT i_category, store_sk, d_moy, SUM(net_cp) AS net
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = 1995
      GROUP BY i_category, store_sk, d_moy
    ),
    dev AS (
      SELECT i_category, store_sk, d_moy, net,
             AVG(net) OVER (PARTITION BY i_category, store_sk)
               AS avg_monthly
      FROM ms
    )
    SELECT i_category, store_sk, d_moy, net, avg_monthly
    FROM dev
    WHERE avg_monthly > 0
      AND ABS(net - avg_monthly) / avg_monthly > 0.1
    ORDER BY i_category, store_sk, d_moy
    """,
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q89 (months whose sales deviate >10 % from the
    category-store average — the windowed-average deviation filter).
    One grouped shuffle to (category, store, month), a window AVG over
    the (category, store) prefix, then the deviation predicate. AVG of
    BIGINT is exact-sum/exact-count on both engines, so the doubles
    compared are bit-identical; the deviation is a final-stage
    computation, never an accumulated float. Substitutions: the
    reference's store_name/company → the synthesized store key; one
    year, all months."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    it = _item(spark, sf_dir)
    ms = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy("i_category", "store_sk", "d_moy")
        .agg(F.sum("net_cp").alias("net"))
    )
    w = Window.partitionBy("i_category", "store_sk")
    dev = ms.withColumn("avg_monthly", F.avg("net").over(w))
    out = dev.filter(
        (F.col("avg_monthly") > 0)
        & (
            F.abs(F.col("net") - F.col("avg_monthly")) / F.col("avg_monthly")
            > 0.1
        )
    ).select("i_category", "store_sk", "d_moy", "net", "avg_monthly")
    return ordered(out, "i_category", "store_sk", "d_moy")


@query(
    "tpcds_q76",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT CASE WHEN chan <= 1 THEN 'store'
                WHEN chan = 2 THEN 'catalog'
                ELSE 'web' END AS channel,
           d_year, d_qoy, i_category,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           SUM(ext_cents) AS sales_amt
    FROM sales
    JOIN date_dim ON sold_date = d_date
    JOIN item ON item_sk = i_item_sk
    WHERE returned
    GROUP BY channel, d_year, d_qoy, i_category
    ORDER BY channel, d_year, d_qoy, i_category
    """,
)
def tpcds_q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q76 (the cross-channel anomaly census: counts and
    amounts per channel/period/category for flagged rows, UNION ALL of
    the three channel legs in the reference). Substitutions: the
    reference flags NULL dimension keys; the synthesized fact has no
    NULL keys, so the returns flag (l_returnflag='R', the module's
    *_returns feed) is the anomaly predicate. DELIBERATE PLAN REWRITE,
    documented: all three legs read the SAME unified fact here, so
    the UNION ALL collapses to one scan with a computed channel label
    — one shuffle on the full grouping key instead of three scans
    unioned. The oracle keeps the same fused form (the channels
    partition the fact, so it equals the 3-leg UNION ALL by
    construction)."""
    s = _sales(spark, sf_dir).filter(F.col("returned"))
    dd = _date_dim(spark, sf_dir)
    it = _item(spark, sf_dir)
    out = (
        s.join(F.broadcast(dd), s.sold_date == dd.d_date)
        .join(F.broadcast(it), s.item_sk == it.i_item_sk)
        .withColumn(
            "channel",
            F.when(F.col("chan") <= 1, F.lit("store"))
            .when(F.col("chan") == 2, F.lit("catalog"))
            .otherwise(F.lit("web")),
        )
        .groupBy("channel", "d_year", "d_qoy", "i_category")
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            F.sum("ext_cents").alias("sales_amt"),
        )
    )
    return ordered(out, "channel", "d_year", "d_qoy", "i_category")


@query(
    "tpcds_q49",
    oracle="WITH "
    + _DS_SQL
    + """,
    t AS (
      SELECT CASE WHEN chan <= 1 THEN 'store'
                  WHEN chan = 2 THEN 'catalog'
                  ELSE 'web' END AS channel,
             item_sk,
             SUM(CASE WHEN returned THEN qty ELSE 0 END) AS ret_qty,
             SUM(qty) AS tot_qty
      FROM sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995 AND d_moy = 12
      GROUP BY channel, item_sk
    ),
    r AS (
      SELECT channel, item_sk, ret_qty, tot_qty,
             RANK() OVER (
               PARTITION BY channel
               ORDER BY CAST(ret_qty AS DOUBLE) / tot_qty DESC, item_sk
             ) AS rnk
      FROM t
      WHERE ret_qty > 0 AND tot_qty > 0
    )
    SELECT channel, item_sk, ret_qty, tot_qty, rnk
    FROM r WHERE rnk <= 10
    ORDER BY channel, rnk, item_sk
    """,
)
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q49 (worst return ratios per channel — rank items by
    returned/total quantity inside each channel, keep the top 10,
    union the channels). The reference unions three per-channel
    subqueries; the unified fact fuses them into one grouped pass with
    a channel label (same rewrite as q76). The rank ordering is made
    TOTAL with the item key as tiebreaker — RANK over a ratio of
    identical integers is deterministic cross-engine only when ties
    are broken; the ratio itself is one double division of exact
    BIGINTs. WindowGroupLimit applies to the rnk<=10 filter, so the
    per-channel sort never materializes beyond the running top-10 per
    partition."""
    s = _sales(spark, sf_dir)
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1995) & (F.col("d_moy") == 12)
    )
    t = (
        s.join(F.broadcast(dd), s.sold_date == dd.d_date)
        .withColumn(
            "channel",
            F.when(F.col("chan") <= 1, F.lit("store"))
            .when(F.col("chan") == 2, F.lit("catalog"))
            .otherwise(F.lit("web")),
        )
        .groupBy("channel", "item_sk")
        .agg(
            F.sum(
                F.when(F.col("returned"), F.col("qty")).otherwise(F.lit(0))
            ).alias("ret_qty"),
            F.sum("qty").alias("tot_qty"),
        )
        .filter((F.col("ret_qty") > 0) & (F.col("tot_qty") > 0))
    )
    w = Window.partitionBy("channel").orderBy(
        (F.col("ret_qty").cast("double") / F.col("tot_qty")).desc(),
        F.col("item_sk"),
    )
    out = (
        t.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 10)
        .select("channel", "item_sk", "ret_qty", "tot_qty", "rnk")
    )
    return ordered(out, "channel", "rnk", "item_sk")


@query(
    "tpcds_q23",
    oracle="WITH "
    + _DS_SQL
    + """,
    freq_items AS (
      -- INDEPENDENT FORM (round 13): no date_dim view (direct YEAR on
      -- the sold date), no channel views (chan predicates on the
      -- unified fact), gates as key-distinct INNER joins instead of
      -- IN-subqueries, and the best-customer max via a window instead
      -- of a scalar subquery
      SELECT item_sk FROM sales
      WHERE chan <= 1 AND YEAR(sold_date) = 1995
      GROUP BY item_sk HAVING COUNT(*) > 4
    ),
    best_cust AS (
      SELECT cust_sk
      FROM (SELECT cust_sk, SUM(net_cp) AS tot,
                   MAX(SUM(net_cp)) OVER () AS mx
            FROM sales WHERE chan <= 1 GROUP BY cust_sk)
      WHERE 2 * tot > mx
    )
    SELECT SUM(net_cp) AS sales_cp
    FROM sales
    JOIN freq_items USING (item_sk)
    JOIN best_cust USING (cust_sk)
    WHERE chan >= 2 AND YEAR(sold_date) = 1995 AND MONTH(sold_date) = 5
    """,
)
def tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 (catalog/web revenue from FREQUENT store items bought
    by the BEST store customers — the double-semi-join gate over two
    derived sets). Substitutions: "frequent" = sold in store >4 times
    in the year; "best" = store lifetime spend above half the maximum
    (the reference's 95%-of-max tops-list), expressed as the INTEGER
    inequality ``2·tot > max(tot)`` so no engine ever forms a float;
    month 5 of 1995 as the probe window. Plan: both gate sets are
    aggregates orders of magnitude smaller than the fact, so they
    broadcast into LEFT SEMI joins against the catalog+web slice —
    the reference's own IN-subquery shape (and R4's semi-join spine)
    at 100 TB: no fact-side shuffle at all, one scalar output row."""
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    ss = _channel(spark, sf_dir, "store")
    ssd = ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
    freq = (
        ssd.groupBy("item_sk").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 4)
        .select("item_sk")
    )
    tot = ss.groupBy("cust_sk").agg(F.sum("net_cp").alias("tot"))
    mx = tot.agg(F.max("tot").alias("mx"))
    best = (
        tot.join(F.broadcast(mx), 2 * F.col("tot") > F.col("mx"))
        .select("cust_sk")
    )
    cw = _channel(spark, sf_dir, "catalog").unionAll(
        _channel(spark, sf_dir, "web")
    )
    probe = cw.join(
        F.broadcast(dd.filter(F.col("d_moy") == 5)),
        cw.sold_date == F.col("d_date"),
    )
    out = (
        probe.join(F.broadcast(freq), on="item_sk", how="left_semi")
        .join(F.broadcast(best), on="cust_sk", how="left_semi")
        .agg(F.sum("net_cp").alias("sales_cp"))
    )
    return out


@query(
    "tpcds_q54",
    oracle="WITH "
    + _DS_SQL
    + """,
    probe_custs AS (
      SELECT DISTINCT cust_sk
      FROM (SELECT * FROM catalog_sales UNION ALL SELECT * FROM web_sales)
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995 AND d_moy = 5
    ),
    spend AS (
      SELECT s.cust_sk, SUM(ext_cents) AS spend_cents
      FROM store_sales s
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995 AND d_moy IN (6, 7)
        AND s.cust_sk IN (SELECT cust_sk FROM probe_custs)
      GROUP BY s.cust_sk
    )
    SELECT CAST(FLOOR(spend_cents / 5000) AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS num_customers
    FROM spend
    GROUP BY segment
    ORDER BY segment
    """,
)
def tpcds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q54 (the revenue-segmentation HISTOGRAM: customers who
    bought catalog/web in one month, bucketed by their STORE spend in
    the following two months, counted per 50-dollar segment). The
    shape no other entry has: an aggregate OF an aggregate — per-
    customer sums re-grouped by a computed bucket of the sum. Bucket
    arithmetic stays integer (``floor(cents/5000)`` — exact integer
    division on both engines). Plan: probe-customer set broadcasts
    into a semi-join (customer-dimension-bounded), one shuffle to
    per-customer sums, then the histogram regroup moves only
    #customers rows — at 100 TB the second shuffle is noise."""
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    cw = _channel(spark, sf_dir, "catalog").unionAll(
        _channel(spark, sf_dir, "web")
    )
    probe = (
        cw.join(
            F.broadcast(dd.filter(F.col("d_moy") == 5)),
            cw.sold_date == F.col("d_date"),
        )
        .select("cust_sk")
        .distinct()
    )
    ss = _channel(spark, sf_dir, "store")
    spend = (
        ss.join(
            F.broadcast(dd.filter(F.col("d_moy").isin(6, 7))),
            ss.sold_date == F.col("d_date"),
        )
        .join(F.broadcast(probe), on="cust_sk", how="left_semi")
        .groupBy("cust_sk")
        .agg(F.sum("ext_cents").alias("spend_cents"))
    )
    out = (
        spend.select(
            F.floor(F.col("spend_cents") / 5000).cast("long").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )
    return ordered(out, "segment")


@query(
    "tpcds_q58",
    oracle="WITH "
    + _DS_SQL
    + """,
    c AS (
      SELECT item_sk, SUM(ext_cents) AS c_rev FROM catalog_sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995 AND d_moy = 3 GROUP BY item_sk
    ),
    w AS (
      SELECT item_sk, SUM(ext_cents) AS w_rev FROM web_sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995 AND d_moy = 3 GROUP BY item_sk
    )
    SELECT c.item_sk AS item_sk, c_rev, w_rev
    FROM c JOIN w ON c.item_sk = w.item_sk
    WHERE 20 * c_rev >= 9 * (c_rev + w_rev)
      AND 20 * c_rev <= 11 * (c_rev + w_rev)
      AND 20 * w_rev >= 9 * (c_rev + w_rev)
      AND 20 * w_rev <= 11 * (c_rev + w_rev)
    ORDER BY item_sk
    """,
)
def tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q58 (items selling EVENLY across channels in a period:
    each channel's revenue within ±10 % of the cross-channel average).
    Substitutions: the reference's 3-channel balance over the
    store/catalog/web triple can never fire here — the synthesized
    channel split gives store 2× the others BY CONSTRUCTION (chan 0,1)
    — so the balance is tested over the comparable catalog/web pair,
    documented. The ±10 %-of-mean band is the INTEGER inequality
    ``9·(c+w) ≤ 20·c ≤ 11·(c+w)`` (mean of two = (c+w)/2; cross-
    multiplied, no floats, no overflow at BIGINT cents). Plan: two
    channel-sliced grouped sums co-partitioned on item_sk — AQE reuses
    the exchange for the join; item-dimension-bounded cardinality."""
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == 1995) & (F.col("d_moy") == 3)
    )

    def rev(name: str, alias: str) -> DataFrame:
        s = _channel(spark, sf_dir, name)
        return (
            s.join(F.broadcast(dd), s.sold_date == dd.d_date)
            .groupBy("item_sk")
            .agg(F.sum("ext_cents").alias(alias))
        )

    c, w = rev("catalog", "c_rev"), rev("web", "w_rev")
    j = c.join(w, on="item_sk")
    both = F.col("c_rev") + F.col("w_rev")
    out = j.filter(
        (20 * F.col("c_rev") >= 9 * both)
        & (20 * F.col("c_rev") <= 11 * both)
        & (20 * F.col("w_rev") >= 9 * both)
        & (20 * F.col("w_rev") <= 11 * both)
    ).select("item_sk", "c_rev", "w_rev")
    return ordered(out, "item_sk")


@query(
    "tpcds_q65",
    oracle="WITH "
    + _DS_SQL
    + """,
    g AS (
      SELECT store_sk, item_sk, SUM(ext_cents) AS rev
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995
      GROUP BY store_sk, item_sk
    ),
    m AS (SELECT store_sk, MIN(rev) AS min_rev FROM g GROUP BY store_sk)
    SELECT g.store_sk AS store_sk, g.item_sk AS item_sk, g.rev AS rev
    FROM g JOIN m ON g.store_sk = m.store_sk
    WHERE 10 * g.rev <= 11 * m.min_rev
    ORDER BY store_sk, item_sk
    """,
)
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q65 (each store's SLOWEST-moving items: per-store-item
    revenue at most 110 % of that store's minimum item revenue — the
    reference's slow-mover report). Two-level aggregate with a
    re-join: g=(store,item)→rev, m=store→min(rev), filter ``10·rev ≤
    11·min`` (integer, no floats). Plan: the second aggregate and the
    join both key on store_sk, a prefix of g's grouping key — one real
    shuffle on (store,item), then the min-per-store moves 12 rows and
    BROADCASTS back. The window form (MIN OVER store) would be one
    shuffle too; the join form is kept because the reference's
    subquery structure is the point and the broadcast makes them
    equivalent at any scale."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    g = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .groupBy("store_sk", "item_sk")
        .agg(F.sum("ext_cents").alias("rev"))
    )
    m = g.groupBy("store_sk").agg(F.min("rev").alias("min_rev"))
    out = (
        g.join(F.broadcast(m), on="store_sk")
        .filter(10 * F.col("rev") <= 11 * F.col("min_rev"))
        .select("store_sk", "item_sk", "rev")
    )
    return ordered(out, "store_sk", "item_sk")


@query(
    "tpcds_q79",
    oracle="WITH "
    + _DS_SQL
    + """,
    tickets AS (
      SELECT cust_sk, sold_date, store_sk,
             SUM(profit_cp) AS ticket_profit, SUM(qty) AS ticket_qty
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      WHERE d_year = 1995
      GROUP BY cust_sk, sold_date, store_sk
    ),
    ranked AS (
      SELECT cust_sk, sold_date, store_sk, ticket_profit, ticket_qty,
             ROW_NUMBER() OVER (
               PARTITION BY cust_sk
               ORDER BY ticket_profit DESC, sold_date, store_sk
             ) AS rn
      FROM tickets
    )
    SELECT cust_sk, sold_date, store_sk, ticket_profit, ticket_qty
    FROM ranked WHERE rn = 1
    ORDER BY cust_sk
    """,
)
def tpcds_q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q79 (every customer's single most profitable store
    visit — ticket-level aggregation, then argmax-per-customer).
    A (cust, date, store) "ticket" grouping stands in for the
    reference's ss_ticket_number (the fixtures have no ticket ids);
    the argmax is ROW_NUMBER with a TOTAL ordering (profit desc, then
    date and store as tiebreakers) so both engines pick the same row
    even on tied profits — exact BIGINT profit makes ties real, not
    hypothetical. Plan: one shuffle to tickets, and the window
    re-groups on the cust_sk PREFIX of the same key;
    WindowGroupLimit keeps per-customer state at one running row."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1995)
    tickets = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .groupBy("cust_sk", "sold_date", "store_sk")
        .agg(
            F.sum("profit_cp").alias("ticket_profit"),
            F.sum("qty").alias("ticket_qty"),
        )
    )
    w = Window.partitionBy("cust_sk").orderBy(
        F.col("ticket_profit").desc(), F.col("sold_date"), F.col("store_sk")
    )
    out = (
        tickets.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cust_sk", "sold_date", "store_sk", "ticket_profit", "ticket_qty"
        )
    )
    return ordered(out, "cust_sk")


@query(
    "tpcds_q47",
    oracle="WITH "
    + _DS_SQL
    + """,
    monthly AS (
      SELECT i_brand, store_sk,
             YEAR(sold_date) AS yr, MONTH(sold_date) AS moy,
             SUM(ext_cents) AS sum_cents
      FROM store_sales JOIN item ON item_sk = i_item_sk
      WHERE YEAR(sold_date) IN (1995, 1996, 1997)
      GROUP BY i_brand, store_sk, YEAR(sold_date), MONTH(sold_date)
    ),
    w AS (
      SELECT i_brand, store_sk, yr, moy, sum_cents,
             SUM(sum_cents) OVER (PARTITION BY i_brand, store_sk, yr)
               AS ysum,
             CAST(COUNT(*) OVER (PARTITION BY i_brand, store_sk, yr)
                  AS BIGINT) AS ycnt,
             LAG(sum_cents) OVER (PARTITION BY i_brand, store_sk
                                  ORDER BY yr, moy) AS prev_cents,
             LEAD(sum_cents) OVER (PARTITION BY i_brand, store_sk
                                   ORDER BY yr, moy) AS next_cents
      FROM monthly
    )
    SELECT i_brand AS brand, store_sk AS store, yr, moy, sum_cents,
           prev_cents, next_cents
    FROM w
    WHERE yr = 1996 AND ysum > 0
      AND prev_cents IS NOT NULL AND next_cents IS NOT NULL
      AND 10 * ABS(ycnt * sum_cents - ysum) > ysum
    ORDER BY brand NULLS LAST, store NULLS LAST, yr NULLS LAST,
             moy NULLS LAST, sum_cents NULLS LAST, prev_cents NULLS LAST,
             next_cents NULLS LAST
    """,
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 (monthly brand×store sales that deviate >10 % from
    that year's average, with the neighboring months' figures via
    LAG/LEAD). The reference's three-way self-join of the v1 CTE (v1,
    v1_lag, v1_lead) collapses to LAG/LEAD windows over ONE pass —
    same relation, two fewer shuffles, the same plan TPC-DS vendors
    hand-optimize to. Deviation |sum − ysum/ycnt| > 0.1·(ysum/ycnt) is
    cross-multiplied to exact BIGINT (10·|ycnt·sum − ysum| > ysum), so
    no division is compared across engines. 100 TB: one shuffle to
    (brand, store, yr, moy) groups; both windows re-use the (brand,
    store) prefix of that partitioning; the item join broadcasts."""
    ss = _channel(spark, sf_dir, "store").filter(
        F.year("sold_date").isin(1995, 1996, 1997)
    )
    it = _item(spark, sf_dir).select("i_item_sk", "i_brand")
    monthly = (
        ss.join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy(
            "i_brand",
            "store_sk",
            F.year("sold_date").alias("yr"),
            F.month("sold_date").alias("moy"),
        )
        .agg(F.sum("ext_cents").alias("sum_cents"))
    )
    wy = Window.partitionBy("i_brand", "store_sk", "yr")
    ws = Window.partitionBy("i_brand", "store_sk").orderBy("yr", "moy")
    out = (
        monthly.select(
            "*",
            F.sum("sum_cents").over(wy).alias("ysum"),
            F.count(F.lit(1)).over(wy).cast("long").alias("ycnt"),
            F.lag("sum_cents").over(ws).alias("prev_cents"),
            F.lead("sum_cents").over(ws).alias("next_cents"),
        )
        .filter(
            (F.col("yr") == 1996)
            & (F.col("ysum") > 0)
            & F.col("prev_cents").isNotNull()
            & F.col("next_cents").isNotNull()
            & (
                10 * F.abs(F.col("ycnt") * F.col("sum_cents") - F.col("ysum"))
                > F.col("ysum")
            )
        )
        .select(
            F.col("i_brand").alias("brand"),
            F.col("store_sk").alias("store"),
            "yr",
            "moy",
            "sum_cents",
            "prev_cents",
            "next_cents",
        )
    )
    return ordered(
        out, "brand", "store", "yr", "moy", "sum_cents", "prev_cents",
        "next_cents",
    )


@query(
    "tpcds_q57",
    oracle="WITH "
    + _DS_SQL
    + """,
    monthly AS (
      SELECT i_category, site_sk,
             YEAR(sold_date) AS yr, MONTH(sold_date) AS moy,
             SUM(net_cp) AS net
      FROM catalog_sales JOIN item ON item_sk = i_item_sk
      WHERE YEAR(sold_date) IN (1997, 1998, 1999)
      GROUP BY i_category, site_sk, YEAR(sold_date), MONTH(sold_date)
    ),
    w AS (
      SELECT i_category, site_sk, yr, moy, net,
             SUM(net) OVER (PARTITION BY i_category, site_sk, yr) AS ysum,
             CAST(COUNT(*) OVER (PARTITION BY i_category, site_sk, yr)
                  AS BIGINT) AS ycnt,
             LAG(net) OVER (PARTITION BY i_category, site_sk
                            ORDER BY yr, moy) AS prev_net,
             LEAD(net) OVER (PARTITION BY i_category, site_sk
                             ORDER BY yr, moy) AS next_net
      FROM monthly
    )
    SELECT i_category AS category, site_sk AS site, yr, moy, net,
           prev_net, next_net
    FROM w
    WHERE yr = 1998 AND ysum > 0
      AND prev_net IS NOT NULL AND next_net IS NOT NULL
      AND 10 * ABS(ycnt * net - ysum) > ysum
    ORDER BY category NULLS LAST, site NULLS LAST, yr NULLS LAST,
             moy NULLS LAST, net NULLS LAST, prev_net NULLS LAST,
             next_net NULLS LAST
    """,
)
def tpcds_q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q57 — Q47's catalog-channel twin over a different
    hierarchy (category × call-center; the fixtures' site_sk stands in
    for cc_name) and a different measure (net after discount, cent·pct
    units), different years. Same self-join→LAG/LEAD collapse and
    exact cross-multiplied deviation as q47 — together they pin the
    year-over-year window family on two channels with two
    hierarchies."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        F.year("sold_date").isin(1997, 1998, 1999)
    )
    it = _item(spark, sf_dir).select("i_item_sk", "i_category")
    monthly = (
        cs.join(F.broadcast(it), cs.item_sk == it.i_item_sk)
        .groupBy(
            "i_category",
            "site_sk",
            F.year("sold_date").alias("yr"),
            F.month("sold_date").alias("moy"),
        )
        .agg(F.sum("net_cp").alias("net"))
    )
    wy = Window.partitionBy("i_category", "site_sk", "yr")
    ws = Window.partitionBy("i_category", "site_sk").orderBy("yr", "moy")
    out = (
        monthly.select(
            "*",
            F.sum("net").over(wy).alias("ysum"),
            F.count(F.lit(1)).over(wy).cast("long").alias("ycnt"),
            F.lag("net").over(ws).alias("prev_net"),
            F.lead("net").over(ws).alias("next_net"),
        )
        .filter(
            (F.col("yr") == 1998)
            & (F.col("ysum") > 0)
            & F.col("prev_net").isNotNull()
            & F.col("next_net").isNotNull()
            & (
                10 * F.abs(F.col("ycnt") * F.col("net") - F.col("ysum"))
                > F.col("ysum")
            )
        )
        .select(
            F.col("i_category").alias("category"),
            F.col("site_sk").alias("site"),
            "yr",
            "moy",
            "net",
            "prev_net",
            "next_net",
        )
    )
    return ordered(
        out, "category", "site", "yr", "moy", "net", "prev_net", "next_net"
    )


@query(
    "tpcds_q34",
    oracle="WITH "
    + _DS_SQL
    + """,
    ticket AS (
      SELECT cust_sk, sold_date, store_sk, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM store_sales
      WHERE YEAR(sold_date) BETWEEN 1995 AND 1997
      GROUP BY cust_sk, sold_date, store_sk
    )
    SELECT c_custkey AS cust, c_mktsegment AS segment, sold_date, cnt
    FROM ticket JOIN customer ON cust_sk = c_custkey
    WHERE cnt BETWEEN 3 AND 6
    ORDER BY cust NULLS LAST, segment NULLS LAST, sold_date NULLS LAST,
             cnt NULLS LAST
    """,
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34 (customers whose store tickets fall in a target
    basket-size band, with their identity columns). Substitutions: the
    (cust, date, store) grouping stands in for ss_ticket_number (as
    q79), the 15–20 band becomes 3–6 (the fixtures' per-ticket line
    count is ~4), and c_mktsegment stands in for the name columns. The
    shape under test is the aggregate-then-band-filter-then-dim-join:
    the HAVING band must apply BEFORE the customer join (bands first,
    join the survivors) — joining first would shuffle every ticket
    against the dim for nothing at 100 TB."""
    ss = _channel(spark, sf_dir, "store").filter(
        F.year("sold_date").between(1995, 1997)
    )
    ticket = (
        ss.groupBy("cust_sk", "sold_date", "store_sk")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt").between(3, 6))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    out = ticket.join(
        F.broadcast(cust), ticket.cust_sk == cust.c_custkey
    ).select(
        F.col("c_custkey").alias("cust"),
        F.col("c_mktsegment").alias("segment"),
        "sold_date",
        "cnt",
    )
    return ordered(out, "cust", "segment", "sold_date", "cnt")


@query(
    "tpcds_q87",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_store_only
    FROM (
      SELECT DISTINCT cust_sk, sold_date FROM store_sales
      WHERE YEAR(sold_date) = 1996
      EXCEPT
      SELECT DISTINCT cust_sk, sold_date FROM catalog_sales
      WHERE YEAR(sold_date) = 1996
      EXCEPT
      SELECT DISTINCT cust_sk, sold_date FROM web_sales
      WHERE YEAR(sold_date) = 1996
    ) t
    """,
)
def tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q87 (how many customer-days bought in store but through
    NO other channel — the EXCEPT-chain census, the set-difference dual
    of q38's INTERSECT). Left-associative EXCEPT over three distinct
    projections; Spark's subtract is EXCEPT DISTINCT, so the chain is
    literal. 100 TB: three scans shuffle-dedup on the SAME (cust, date)
    key, and the EXCEPTs reuse that partitioning — one logical
    exchange, no broadcast (all three sides are fact-sized)."""
    y = F.year("sold_date")

    def days(chan):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == 1996)
            .select("cust_sk", "sold_date")
            .distinct()
        )

    only_store = days("store").subtract(days("catalog")).subtract(
        days("web")
    )
    return only_store.agg(
        F.count(F.lit(1)).cast("long").alias("n_store_only")
    )


@query(
    "tpcds_q16",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS total_cents
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-03-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      AND (SELECT COUNT(DISTINCT l.l_suppkey) FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey) >= 2
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
    """,
)
def tpcds_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q16 (orders shipped late from multi-supplier fulfilment
    with no returns — the EXISTS + NOT-EXISTS + distinct-count
    decorrelation query; TPC-H Q21 is its cousin). The oracle states
    the three correlated subqueries literally; the Spark plan
    DECORRELATES them by hand into ONE aggregation pass over lineitem
    (per-order: late-ship flag, distinct suppliers, returned flag)
    joined once against the date-filtered orders — three subqueries,
    one shuffle, which is exactly what a correlated EXISTS must become
    at 100 TB (per-row re-scans are quadratic death). Dates are
    TIMESTAMP + INTERVAL arithmetic, exact on both engines."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-03-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_returnflag"
    )
    j = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    per_order = j.groupBy("o_orderkey").agg(
        F.max(
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).cast("int")
        ).alias("late"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret"),
    )
    hits = per_order.filter(
        (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("ret") == 0)
    )
    out = hits.join(
        o.select(
            F.col("o_orderkey").alias("ok"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        ),
        hits.o_orderkey == F.col("ok"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )
    return out


@query(
    "tpcds_q41",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT DISTINCT i1.i_brand AS brand
    FROM item i1
    WHERE i1.i_category IN ('PROMO', 'ECONOMY')
      AND i1.i_manufact_id BETWEEN 700 AND 740
      AND EXISTS (SELECT 1 FROM item i2
                  WHERE i2.i_category IN ('PROMO', 'ECONOMY')
                    AND i2.i_manufact_id = i1.i_manufact_id
                    AND i2.i_brand <> i1.i_brand)
    ORDER BY brand NULLS LAST
    """,
)
def tpcds_q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q41 (brands from manufacturers whose line spans more
    than one brand in the target categories — the DIMENSION-ONLY
    correlated-EXISTS self-join; the reference correlates on a
    disjunction of attribute combos, here the category IN-list carries
    the reference's attribute filtering and the brand-diversity EXISTS
    its correlation — class diversity is degenerate in the fixtures:
    i_class = key % 8 collides for a manufacturer's two keys, which
    differ by 1000 ≡ 0 mod 8). The Spark plan decorrelates to a LEFT
    SEMI self-join on the manufacturer key with the inequality as the
    residual condition — dimension-sized on both sides, so it
    broadcasts and never touches a fact table: the rare query whose
    100 TB cost is the same as its 100 MB cost. Both scans push the
    category IN-list to parquet (the manufact band is computed,
    unpushable by construction; plan lint demands the real-column
    conjunct reach PushedFilters on each scan)."""
    it = _item(spark, sf_dir).filter(
        F.col("i_category").isin("PROMO", "ECONOMY")
    )
    i1 = it.filter(F.col("i_manufact_id").between(700, 740)).alias("i1")
    i2 = it.select(
        F.col("i_manufact_id").alias("m2"), F.col("i_brand").alias("b2")
    ).alias("i2")
    out = (
        i1.join(
            F.broadcast(i2),
            (F.col("i1.i_manufact_id") == F.col("m2"))
            & (F.col("i1.i_brand") != F.col("b2")),
            "left_semi",
        )
        .select(F.col("i_brand").alias("brand"))
        .distinct()
    )
    return ordered(out, "brand")


@query(
    "tpcds_q32",
    oracle="WITH "
    + _DS_SQL
    + """,
    ia AS (
      SELECT item_sk, SUM(disc_pct) AS sum_disc,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM catalog_sales GROUP BY item_sk
    )
    SELECT SUM(s.ext_cents * s.disc_pct) AS excess_disc_cp
    FROM catalog_sales s JOIN ia ON s.item_sk = ia.item_sk
    WHERE YEAR(s.sold_date) = 1997
      AND 10 * s.disc_pct * ia.cnt > 13 * ia.sum_disc
    """,
)
def tpcds_q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q32 (excess discount: money discounted on lines whose
    discount exceeds 1.3× the item's average). The reference's
    correlated scalar-AVG subquery decorrelates to one per-item
    aggregate joined back — and the 1.3×-average comparison
    cross-multiplies to exact integers (10·disc·cnt > 13·sum_disc), so
    no float AVG crosses engines. 100 TB: the per-item aggregate is
    map-side-partial over the fact, its result is item-sized and
    BROADCASTS back; the fact never shuffles."""
    cs = _channel(spark, sf_dir, "catalog")
    ia = cs.groupBy("item_sk").agg(
        F.sum("disc_pct").alias("sum_disc"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    s = cs.filter(F.year("sold_date") == 1997)
    out = s.join(
        F.broadcast(ia.withColumnRenamed("item_sk", "ia_item")),
        s.item_sk == F.col("ia_item"),
    ).filter(
        10 * F.col("disc_pct") * F.col("cnt") > 13 * F.col("sum_disc")
    ).agg(
        F.sum(F.col("ext_cents") * F.col("disc_pct")).alias(
            "excess_disc_cp"
        )
    )
    return out


@query(
    "tpcds_q62",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days > 90 AND lag_days <= 120
                         THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS dmore
    FROM (
      SELECT o_orderpriority,
             DATEDIFF('day', o_orderdate, l_shipdate) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE YEAR(o_orderdate) = 1997
    ) t
    GROUP BY o_orderpriority
    ORDER BY priority NULLS LAST
    """,
)
def tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q62 (the shipping-lag bucket census: how many lines
    shipped within 30/60/90/120/120+ days, pivoted per group — ship
    mode in the reference, order priority here; the fixtures' REAL
    l_shipdate drives the lag). Five CASE sums in ONE aggregation
    pass — the pivot-census shape. Day arithmetic truncates both
    engines' timestamps to dates (Spark datediff / DuckDB
    datediff('day')), an exact integer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "lag_days"
        ),
    )

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    lag = F.col("lag_days")
    out = j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        band(lag <= 30, "d30"),
        band((lag > 30) & (lag <= 60), "d60"),
        band((lag > 60) & (lag <= 90), "d90"),
        band((lag > 90) & (lag <= 120), "d120"),
        band(lag > 120, "dmore"),
    )
    return ordered(out, "priority")


@query(
    "tpcds_q90",
    oracle="""
    SELECT CAST(SUM(CASE WHEN HOUR(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
                AS BIGINT) AS am_cnt,
           CAST(SUM(CASE WHEN HOUR(ts) BETWEEN 18 AND 23 THEN 1 ELSE 0 END)
                AS BIGINT) AS pm_cnt
    FROM events WHERE event_type = 'view'
    """,
)
def tpcds_q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q90 (the am/pm activity ratio — morning vs evening web
    traffic; the events stream stands in for web_sales' time_dim join,
    with HOUR extracted directly instead of a dimension join). The
    reference divides the two counts; both counts return EXACTLY and
    the consumer divides — the integer-pair discipline every ratio
    query here follows. The event_type filter pushes to the scan; one
    conditional-aggregation pass, no join at all."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    h = F.hour("ts")
    return ev.agg(
        F.sum(F.when(h.between(6, 11), 1).otherwise(0))
        .cast("long")
        .alias("am_cnt"),
        F.sum(F.when(h.between(18, 23), 1).otherwise(0))
        .cast("long")
        .alias("pm_cnt"),
    )


@query(
    "tpcds_q61",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT SUM(CASE WHEN i_category = 'PROMO' THEN net_cp ELSE 0 END)
             AS promo_cp,
           SUM(net_cp) AS total_cp
    FROM store_sales JOIN item ON item_sk = i_item_sk
    WHERE YEAR(sold_date) = 1997 AND MONTH(sold_date) = 11
    """,
)
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q61 (promotional share of a month's store revenue). The
    reference computes two scalar aggregates in separate subqueries and
    cross-joins the 1-row results to divide; here both land in ONE
    conditional-aggregation pass over a single fact scan (the PROMO
    category plays the promotion flag) — same numbers, half the scans,
    no 1×1 cross join for the lint to flag — and the ratio ships as
    the exact integer pair, division left to the consumer."""
    ss = _channel(spark, sf_dir, "store").filter(
        (F.year("sold_date") == 1997) & (F.month("sold_date") == 11)
    )
    it = _item(spark, sf_dir).select("i_item_sk", "i_category")
    out = ss.join(F.broadcast(it), ss.item_sk == it.i_item_sk).agg(
        F.sum(
            F.when(F.col("i_category") == "PROMO", F.col("net_cp")).otherwise(
                F.lit(0)
            )
        ).alias("promo_cp"),
        F.sum("net_cp").alias("total_cp"),
    )
    return out


@query(
    "tpcds_q10",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM store_sales s
                  WHERE s.cust_sk = c.c_custkey
                    AND YEAR(s.sold_date) = 1996)
      AND (EXISTS (SELECT 1 FROM web_sales w
                   WHERE w.cust_sk = c.c_custkey
                     AND YEAR(w.sold_date) = 1996)
           OR EXISTS (SELECT 1 FROM catalog_sales x
                      WHERE x.cust_sk = c.c_custkey
                        AND YEAR(x.sold_date) = 1996))
    GROUP BY c_mktsegment
    ORDER BY segment NULLS LAST, n NULLS LAST
    """,
)
def tpcds_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q10 (customer demographics census gated on EXISTS store
    AND (EXISTS web OR EXISTS catalog)). The DISJUNCTIVE exists is the
    shape a semi-join chain cannot express directly — an OR of two
    semi-joins decorrelates to ONE semi-join against the UNION of the
    two channels' customer key sets, and the conjunctive store gate
    stays its own semi-join: two left-semis total, no correlated
    re-scan, no row duplication to undo (the reference's rewrite).
    100 TB: both gate sets are distinct customer keys (dimension-sized
    after dedup) and broadcast; the customer dim never shuffles."""
    y = F.year("sold_date")

    def custs(chan):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == 1996)
            .select("cust_sk")
            .distinct()
        )

    other = custs("web").union(custs("catalog")).distinct()
    cust = load_table(spark, sf_dir, "customer")
    gated = cust.join(
        F.broadcast(custs("store")),
        cust.c_custkey == F.col("cust_sk"),
        "left_semi",
    )
    gated = gated.join(
        F.broadcast(other),
        gated.c_custkey == other.cust_sk,
        "left_semi",
    )
    out = gated.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return ordered(out, "segment", "n")


@query(
    "tpcds_q78",
    oracle="WITH "
    + _DS_SQL
    + """,
    g AS (
      -- INDEPENDENT FORM (round 13): the Spark side LEFT-joins three
      -- per-channel aggregates with COALESCE padding; this side is
      -- ONE conditional-FILTER pass over the unified fact at the same
      -- (cust, item) grain — store presence (the inner base) becomes
      -- s_cnt > 0, the two outer pads become one chan>=2 sum
      SELECT cust_sk, item_sk,
             CAST(COUNT(*) FILTER (WHERE chan <= 1) AS BIGINT) AS s_cnt,
             SUM(qty) FILTER (WHERE chan <= 1) AS s_qty,
             SUM(net_cp) FILTER (WHERE chan <= 1) AS s_net,
             COALESCE(SUM(qty) FILTER (WHERE chan >= 2), 0) AS other_qty
      FROM sales WHERE YEAR(sold_date) = 1996
      GROUP BY cust_sk, item_sk
    )
    SELECT cust_sk AS cust, item_sk AS item, s_qty, s_net, other_qty
    FROM g
    WHERE s_cnt > 0 AND other_qty > 0
    ORDER BY cust NULLS LAST, item NULLS LAST, s_qty NULLS LAST,
             s_net NULLS LAST, other_qty NULLS LAST
    """,
)
def tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q78 (store loyalty: per customer-item, store volume
    beside the OTHER channels' volume, outer-joined so store-only
    pairs keep NULL→0 on the other side). Three per-channel aggregates
    on the SAME (cust, item) key LEFT-joined — the null-padding and
    COALESCE arithmetic ride the co-partitioned key, so AQE plans the
    two joins with no additional exchange after the aggregates. All
    quantities exact BIGINTs; the reference's store/other ratio is the
    integer pair (s_qty, other_qty), division left to the consumer."""
    y = F.year("sold_date")

    def agg(chan, *cols):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == 1996)
            .groupBy("cust_sk", "item_sk")
            .agg(*cols)
        )

    ss = agg(
        "store",
        F.sum("qty").alias("s_qty"),
        F.sum("net_cp").alias("s_net"),
    )
    ws = agg("web", F.sum("qty").alias("w_qty"))
    cs = agg("catalog", F.sum("qty").alias("c_qty"))
    j = ss.join(ws, ["cust_sk", "item_sk"], "left").join(
        cs, ["cust_sk", "item_sk"], "left"
    )
    other = F.coalesce(F.col("w_qty"), F.lit(0)) + F.coalesce(
        F.col("c_qty"), F.lit(0)
    )
    out = j.filter(other > 0).select(
        F.col("cust_sk").alias("cust"),
        F.col("item_sk").alias("item"),
        "s_qty",
        "s_net",
        other.alias("other_qty"),
    )
    return ordered(out, "cust", "item", "s_qty", "s_net", "other_qty")


@query(
    "tpcds_q01",
    oracle="WITH "
    + _DS_SQL
    + """,
    ctr AS (
      SELECT cust_sk, store_sk, SUM(net_cp) AS ctr_total
      FROM store_sales
      WHERE returned AND YEAR(sold_date) = 1996
      GROUP BY cust_sk, store_sk
    ),
    w AS (
      SELECT cust_sk, store_sk, ctr_total,
             SUM(ctr_total) OVER (PARTITION BY store_sk) AS st_sum,
             CAST(COUNT(*) OVER (PARTITION BY store_sk) AS BIGINT) AS st_n
      FROM ctr JOIN store ON store_sk = s_store_sk
      WHERE s_state = 'TN'
    )
    SELECT cust_sk AS cust, store_sk AS store, ctr_total
    FROM w
    WHERE 5 * st_n * ctr_total > 6 * st_sum
    ORDER BY cust NULLS LAST, store NULLS LAST, ctr_total NULLS LAST
    """,
)
def tpcds_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 (customers whose store-return total exceeds 1.2x the
    per-customer average for the same store, state-restricted). The
    reference's correlated scalar subquery (avg over the SAME store's
    customer totals) decorrelates to SUM/COUNT windows PARTITIONed BY
    store over the one per-(customer, store) aggregate -- no second
    aggregate, no re-join, the group-average gate rides the relation
    it gates. 1.2x is cross-multiplied to exact BIGINT
    (5*st_n*ctr_total > 6*st_sum). The state filter lands BEFORE the
    window (per-store window values are unaffected -- the partition
    key IS the filter grain), so pruned stores never enter the window
    exchange. 100 TB: one shuffle to (cust, store), the window re-uses
    the store prefix; the 12-row store dim broadcasts."""
    ss = _channel(spark, sf_dir, "store").filter(
        F.col("returned") & (F.year("sold_date") == 1996)
    )
    ctr = ss.groupBy("cust_sk", "store_sk").agg(
        F.sum("net_cp").alias("ctr_total")
    )
    st = _store(spark).filter(F.col("s_state") == "TN")
    ctr = ctr.join(F.broadcast(st), ctr.store_sk == st.s_store_sk).drop(
        "s_store_sk", "s_state"
    )
    w = Window.partitionBy("store_sk")
    out = (
        ctr.select(
            "*",
            F.sum("ctr_total").over(w).alias("st_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("st_n"),
        )
        .filter(
            5 * F.col("st_n") * F.col("ctr_total") > 6 * F.col("st_sum")
        )
        .select(
            F.col("cust_sk").alias("cust"),
            F.col("store_sk").alias("store"),
            "ctr_total",
        )
    )
    return ordered(out, "cust", "store", "ctr_total")


@query(
    "tpcds_q06",
    oracle="WITH "
    + _DS_SQL
    + """,
    priced AS (
      SELECT i_item_sk, i_price_cents,
             SUM(i_price_cents) OVER (PARTITION BY i_category) AS cat_sum,
             CAST(COUNT(*) OVER (PARTITION BY i_category) AS BIGINT) AS cat_n
      FROM item
    ),
    gated AS (
      SELECT i_item_sk FROM priced
      WHERE 5 * cat_n * i_price_cents > 6 * cat_sum
    )
    SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM store_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996
      AND item_sk IN (SELECT i_item_sk FROM gated)
    GROUP BY c_nationkey
    HAVING COUNT(*) >= 10
    ORDER BY nation NULLS LAST, cnt NULLS LAST
    """,
)
def tpcds_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q6 (customer geography census restricted to items priced
    >= 1.2x their category's average). Unlike Q32 -- whose average is a
    FACT-side per-item aggregate broadcast back -- this gate lives
    entirely on the item DIMENSION: the category average is a window
    over the item table itself, so the expensive side of the
    correlation never touches a fact row. The gated key set is
    dimension-sized and broadcasts into a LEFT SEMI against the fact;
    the customer join broadcasts too, leaving ONE fact shuffle (the
    final nation aggregate). 1.2x cross-multiplied to exact BIGINT.
    100 TB: fact is scanned once, semi-pruned at the scan by the
    broadcast key set; only the census aggregate shuffles."""
    it = _item(spark, sf_dir)
    wc = Window.partitionBy("i_category")
    gated = (
        it.select(
            "i_item_sk",
            "i_price_cents",
            F.sum("i_price_cents").over(wc).alias("cat_sum"),
            F.count(F.lit(1)).over(wc).cast("long").alias("cat_n"),
        )
        .filter(
            5 * F.col("cat_n") * F.col("i_price_cents")
            > 6 * F.col("cat_sum")
        )
        .select("i_item_sk")
    )
    ss = _channel(spark, sf_dir, "store").filter(F.year("sold_date") == 1996)
    ss = ss.join(
        F.broadcast(gated), ss.item_sk == gated.i_item_sk, "left_semi"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    out = (
        ss.join(F.broadcast(cust), ss.cust_sk == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= 10)
    )
    return ordered(out, "nation", "cnt")


@query(
    "tpcds_q09",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT
      CASE WHEN SUM(CASE WHEN qty BETWEEN 1 AND 10 THEN 1 ELSE 0 END) > 5000
           THEN SUM(CASE WHEN qty BETWEEN 1 AND 10 THEN ext_cents ELSE 0 END)
           ELSE SUM(CASE WHEN qty BETWEEN 1 AND 10 THEN net_cp ELSE 0 END)
      END AS b1,
      CASE WHEN SUM(CASE WHEN qty BETWEEN 11 AND 20 THEN 1 ELSE 0 END) > 5000
           THEN SUM(CASE WHEN qty BETWEEN 11 AND 20 THEN ext_cents ELSE 0 END)
           ELSE SUM(CASE WHEN qty BETWEEN 11 AND 20 THEN net_cp ELSE 0 END)
      END AS b2,
      CASE WHEN SUM(CASE WHEN qty BETWEEN 21 AND 30 THEN 1 ELSE 0 END) > 5000
           THEN SUM(CASE WHEN qty BETWEEN 21 AND 30 THEN ext_cents ELSE 0 END)
           ELSE SUM(CASE WHEN qty BETWEEN 21 AND 30 THEN net_cp ELSE 0 END)
      END AS b3,
      CASE WHEN SUM(CASE WHEN qty BETWEEN 31 AND 40 THEN 1 ELSE 0 END) > 5000
           THEN SUM(CASE WHEN qty BETWEEN 31 AND 40 THEN ext_cents ELSE 0 END)
           ELSE SUM(CASE WHEN qty BETWEEN 31 AND 40 THEN net_cp ELSE 0 END)
      END AS b4,
      CASE WHEN SUM(CASE WHEN qty BETWEEN 41 AND 50 THEN 1 ELSE 0 END) > 5000
           THEN SUM(CASE WHEN qty BETWEEN 41 AND 50 THEN ext_cents ELSE 0 END)
           ELSE SUM(CASE WHEN qty BETWEEN 41 AND 50 THEN net_cp ELSE 0 END)
      END AS b5
    FROM store_sales
    """,
)
def tpcds_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q9 (five quantity-band statistics, each picked by a
    count threshold). The reference phrases this as FIFTEEN correlated
    scalar subqueries over the same fact (a count, and two candidate
    aggregates per band, selected by CASE in the projection); all
    fifteen collapse to ONE conditional-aggregation pass -- per band, a
    conditional count and both conditional sums -- with the CASE
    selection applied to the single aggregate row afterward. The count
    threshold (5000) intentionally lands between the fixture scales,
    so sf0.001 exercises the ELSE branch and sf0.01+ the THEN branch
    on every band -- both branches stay oracle-watched. All sums are
    exact BIGINT cents / cent*pct units. 100 TB: one scan, one
    map-side-combinable aggregate to a single row; nothing shuffles
    but 15 partial sums."""
    ss = _channel(spark, sf_dir, "store")
    aggs = []
    for i, (lo, hi) in enumerate(
        [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
    ):
        band = F.col("qty").between(lo, hi)
        aggs += [
            F.sum(F.when(band, 1).otherwise(0)).alias(f"cnt{i}"),
            F.sum(F.when(band, F.col("ext_cents")).otherwise(0)).alias(
                f"ext{i}"
            ),
            F.sum(F.when(band, F.col("net_cp")).otherwise(0)).alias(
                f"net{i}"
            ),
        ]
    one = ss.agg(*aggs)
    out = one.select(
        *[
            F.when(F.col(f"cnt{i}") > 5000, F.col(f"ext{i}"))
            .otherwise(F.col(f"net{i}"))
            .alias(f"b{i}")
            for i in range(1, 6)
        ]
    )
    return ordered(out, "b1", "b2", "b3", "b4", "b5")


@query(
    "tpcds_q17",
    oracle="WITH "
    + _DS_SQL
    + """,
    sr AS (
      SELECT cust_sk, item_sk, item_sk % 100 AS item_cls, store_sk,
             qty AS r_qty
      FROM store_sales
      WHERE returned AND YEAR(sold_date) = 1996 AND QUARTER(sold_date) = 1
    ),
    cs AS (
      SELECT cust_sk, item_sk % 100 AS item_cls, qty AS c_qty
      FROM catalog_sales
      WHERE YEAR(sold_date) = 1996 AND QUARTER(sold_date) <= 3
    )
    SELECT i_category AS category, s_state AS state,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(r_qty) AS ret_qty, SUM(r_qty * r_qty) AS ret_qty_sq,
           SUM(c_qty) AS rep_qty, SUM(c_qty * c_qty) AS rep_qty_sq
    FROM sr
    JOIN cs ON sr.cust_sk = cs.cust_sk AND sr.item_cls = cs.item_cls
    JOIN item ON sr.item_sk = i_item_sk
    JOIN store ON sr.store_sk = s_store_sk
    GROUP BY i_category, s_state
    ORDER BY category NULLS LAST, state NULLS LAST, n NULLS LAST,
             ret_qty NULLS LAST, ret_qty_sq NULLS LAST,
             rep_qty NULLS LAST, rep_qty_sq NULLS LAST
    """,
)
def tpcds_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q17 (items store-sold in Q1, returned, then repurchased
    through the catalog within three quarters: quantity statistics per
    category x store-state). The reference chains THREE facts
    (store_sales |x| store_returns |x| catalog_sales); the fixtures
    fold sales/returns into one line via the `returned` flag
    (module docstring), so the ss|x|sr leg is that flag filter and the
    real cross-channel shuffle is the composite-key join to the catalog
    repurchase -- co-partitioned, one shuffle per side. The repurchase
    key is (customer, item CLASS = item_sk % 100) — ADVICE r11 noted
    the code had joined on EXACT item_sk, which yields 0 rows at
    sf<=0.01 in the TPC-H-derived fixtures (an exact same-part
    cross-channel repurchase essentially never occurs), leaving the
    join logic verified only on empty-vs-empty; the class-grain match
    keeps the chain-join shape non-degenerate while preserving the
    composite-key co-partitioning. STDDEV_SAMP/AVG of the reference are carried
    as exact integer moments (n, SUM q, SUM q^2) so no float crosses
    engines; variance is derivable downstream. 100 TB: both facts
    shuffle once on (cust, item); item and the 12-row store dim
    broadcast into the post-join aggregate."""
    sr = (
        _channel(spark, sf_dir, "store")
        .filter(
            F.col("returned")
            & (F.year("sold_date") == 1996)
            & (F.quarter("sold_date") == 1)
        )
        .select(
            "cust_sk",
            "item_sk",
            (F.col("item_sk") % 100).alias("item_cls"),
            "store_sk",
            F.col("qty").alias("r_qty"),
        )
    )
    cs = (
        _channel(spark, sf_dir, "catalog")
        .filter(
            (F.year("sold_date") == 1996) & (F.quarter("sold_date") <= 3)
        )
        .select(
            "cust_sk",
            (F.col("item_sk") % 100).alias("item_cls"),
            F.col("qty").alias("c_qty"),
        )
    )
    it = _item(spark, sf_dir).select("i_item_sk", "i_category")
    st = _store(spark)
    out = (
        sr.join(cs, ["cust_sk", "item_cls"])
        .join(F.broadcast(it), F.col("item_sk") == it.i_item_sk)
        .join(F.broadcast(st), F.col("store_sk") == st.s_store_sk)
        .groupBy(
            F.col("i_category").alias("category"),
            F.col("s_state").alias("state"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r_qty").alias("ret_qty"),
            F.sum(F.col("r_qty") * F.col("r_qty")).alias("ret_qty_sq"),
            F.sum("c_qty").alias("rep_qty"),
            F.sum(F.col("c_qty") * F.col("c_qty")).alias("rep_qty_sq"),
        )
    )
    return ordered(
        out, "category", "state", "n", "ret_qty", "ret_qty_sq", "rep_qty",
        "rep_qty_sq",
    )


@query(
    "tpcds_q39",
    oracle="WITH "
    + _DS_SQL
    + """,
    inv AS (
      SELECT store_sk AS wh, MONTH(sold_date) AS moy,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(qty) AS s,
             SUM(qty * qty) AS sq
      FROM store_sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY store_sk, MONTH(sold_date)
    ),
    flagged AS (
      SELECT * FROM inv
      WHERE n > 1 AND 4 * n * (n * sq - s * s) > (n - 1) * s * s
    )
    SELECT a.wh AS wh, a.n AS n1, a.s AS s1, a.sq AS sq1,
           b.n AS n2, b.s AS s2, b.sq AS sq2
    FROM flagged a
    JOIN flagged b ON a.wh = b.wh AND a.moy = 3 AND b.moy = 4
    ORDER BY wh NULLS LAST, n1 NULLS LAST, s1 NULLS LAST, sq1 NULLS LAST,
             n2 NULLS LAST, s2 NULLS LAST, sq2 NULLS LAST
    """,
)
def tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q39 (warehouses whose demand is high-variance in BOTH of
    two adjacent months: the inventory CTE self-joined on the
    time-shifted key). The coefficient-of-variation gate
    stdev/mean > 1/2 is cross-multiplied through the sample-variance
    definition to exact BIGINT: 4n(n*SUMSQ - SUM^2) > (n-1)*SUM^2 --
    no sqrt, no division, no float crosses engines (n > 1 guards the
    degenerate sample). The grain is (warehouse, month) -- the
    fixtures' store_sk stands in for warehouse_sk as elsewhere.
    100 TB: ONE aggregate pass builds the (wh, moy) relation (144
    groups per year -- dimension-sized), so the self-join is a
    broadcast of a filtered copy against itself; Spark's exchange
    reuse dedups the underlying scan under AQE, and even replayed
    twice the cost is two map-side-combinable passes, never a
    fact-fact shuffle."""
    inv = (
        _channel(spark, sf_dir, "store")
        .filter(F.year("sold_date") == 1996)
        .groupBy(
            F.col("store_sk").alias("wh"),
            F.month("sold_date").alias("moy"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").alias("s"),
            F.sum(F.col("qty") * F.col("qty")).alias("sq"),
        )
    )
    flagged = inv.filter(
        (F.col("n") > 1)
        & (
            4 * F.col("n") * (F.col("n") * F.col("sq") - F.col("s") * F.col("s"))
            > (F.col("n") - 1) * F.col("s") * F.col("s")
        )
    )
    a = flagged.filter(F.col("moy") == 3).alias("a")
    b = flagged.filter(F.col("moy") == 4).alias("b")
    out = a.join(F.broadcast(b), F.col("a.wh") == F.col("b.wh")).select(
        F.col("a.wh").alias("wh"),
        F.col("a.n").alias("n1"),
        F.col("a.s").alias("s1"),
        F.col("a.sq").alias("sq1"),
        F.col("b.n").alias("n2"),
        F.col("b.s").alias("s2"),
        F.col("b.sq").alias("sq2"),
    )
    return ordered(out, "wh", "n1", "s1", "sq1", "n2", "s2", "sq2")


@query(
    "tpcds_q44",
    oracle="WITH "
    + _DS_SQL
    + """,
    perf AS (
      SELECT item_sk, SUM(profit_cp) AS profit
      FROM store_sales
      WHERE store_sk = 4
      GROUP BY item_sk
    ),
    asc_r AS (
      SELECT item_sk,
             ROW_NUMBER() OVER (ORDER BY profit, item_sk) AS rnk
      FROM perf
    ),
    desc_r AS (
      SELECT item_sk,
             ROW_NUMBER() OVER (ORDER BY profit DESC, item_sk DESC) AS rnk
      FROM perf
    )
    SELECT a.rnk AS rnk, a.item_sk AS worst_item, d.item_sk AS best_item
    FROM asc_r a JOIN desc_r d ON a.rnk = d.rnk
    WHERE a.rnk <= 10
    ORDER BY rnk NULLS LAST, worst_item NULLS LAST, best_item NULLS LAST
    """,
)
def tpcds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q44 (best and worst performing items at one store,
    paired positionally: ascending rank i beside descending rank i --
    the rank-MEET shape, two opposite total orders of ONE aggregate
    joined on rank). Ranking is by exact BIGINT profit with the item
    key as total tiebreak, so ROW_NUMBER is deterministic on both
    engines (the reference ranks by avg net profit; the fixtures'
    integer-cents units make SUM the exact equivalent ordering for a
    fixed count grain). The global (unpartitioned) windows are the
    operator's SEMANTICS -- they run over the per-item aggregate, a
    dimension-sized relation (documented single-task reduce, same
    allowance class as q79_ntile); the fact is reduced by a
    store-pruned one-pass aggregate first. The rnk<=10 filter lands
    under both windows' outputs before the 10-row join."""
    perf = (
        _channel(spark, sf_dir, "store")
        .filter(F.col("store_sk") == 4)
        .groupBy("item_sk")
        .agg(F.sum("profit_cp").alias("profit"))
    )
    wa = Window.orderBy("profit", "item_sk")
    wd = Window.orderBy(F.col("profit").desc(), F.col("item_sk").desc())
    asc_r = perf.select(
        "item_sk", F.row_number().over(wa).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    desc_r = perf.select(
        "item_sk", F.row_number().over(wd).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    out = (
        asc_r.alias("a")
        .join(F.broadcast(desc_r.alias("d")), F.col("a.rnk") == F.col("d.rnk"))
        .select(
            F.col("a.rnk").alias("rnk"),
            F.col("a.item_sk").alias("worst_item"),
            F.col("d.item_sk").alias("best_item"),
        )
    )
    return ordered(out, "rnk", "worst_item", "best_item")


@query(
    "tpcds_q04",
    oracle="WITH "
    + _DS_SQL
    + """,
    yt AS (
      -- INDEPENDENT FORM (round 13): the Spark side pivots all six
      -- (channel, year) totals in one conditional pass; this side is
      -- the REFERENCE's own year_total SELF-JOIN algebra — one
      -- (cust, channel-group, year) aggregate joined six ways (inner
      -- for the >0-gated first-year legs, left+COALESCE for the
      -- second-year legs the pivot zero-fills). ext_cents > 0 always,
      -- so first-year presence ≡ tot > 0, matching the pivot's gate.
      SELECT cust_sk,
             CASE WHEN chan <= 1 THEN 's' WHEN chan = 2 THEN 'c'
                  ELSE 'w' END AS cg,
             YEAR(sold_date) AS y, SUM(ext_cents) AS tot
      FROM sales
      WHERE YEAR(sold_date) IN (1995, 1996)
      GROUP BY 1, 2, 3
    )
    SELECT a.cust_sk AS cust
    FROM      (SELECT cust_sk, tot AS s1 FROM yt
               WHERE cg = 's' AND y = 1995) a
    JOIN      (SELECT cust_sk, tot AS c1 FROM yt
               WHERE cg = 'c' AND y = 1995) b ON a.cust_sk = b.cust_sk
    JOIN      (SELECT cust_sk, tot AS w1 FROM yt
               WHERE cg = 'w' AND y = 1995) c ON a.cust_sk = c.cust_sk
    LEFT JOIN (SELECT cust_sk, tot AS s2 FROM yt
               WHERE cg = 's' AND y = 1996) d ON a.cust_sk = d.cust_sk
    LEFT JOIN (SELECT cust_sk, tot AS c2 FROM yt
               WHERE cg = 'c' AND y = 1996) e ON a.cust_sk = e.cust_sk
    LEFT JOIN (SELECT cust_sk, tot AS w2 FROM yt
               WHERE cg = 'w' AND y = 1996) f ON a.cust_sk = f.cust_sk
    WHERE CAST(COALESCE(c2, 0) AS HUGEINT) * s1
            > CAST(COALESCE(s2, 0) AS HUGEINT) * c1
      AND CAST(COALESCE(w2, 0) AS HUGEINT) * s1
            > CAST(COALESCE(s2, 0) AS HUGEINT) * w1
    ORDER BY cust NULLS LAST
    """,
)
def tpcds_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q4 (customers whose catalog AND web spending grew faster
    than their store spending across two years). The reference builds
    a year_total CTE and self-joins it SIX ways (3 channels x 2
    years); all six collapse to ONE conditional-aggregation pass per
    customer — six CASE sums over a single fact scan, no self-join at
    all (the pivot rewrite vendors hand-apply). The growth-ratio
    comparisons c2/c1 > s2/s1 cross-multiply to c2*s1 > s2*c1; the
    products of two year-total sums can exceed int64 at warehouse
    scale, so BOTH engines compare in 128-bit exact types (Spark
    decimal(38,0), DuckDB HUGEINT) — no float, no overflow. 100 TB:
    one shuffle to customer grain; everything else is a projection."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date").isin(1995, 1996))

    def cs(chan_cond, yr):
        return F.sum(
            F.when(
                chan_cond & (F.year("sold_date") == yr), F.col("ext_cents")
            ).otherwise(0)
        )

    store, cat, web = F.col("chan") <= 1, F.col("chan") == 2, F.col("chan") == 3
    yt = s.groupBy("cust_sk").agg(
        cs(store, 1995).alias("s1"),
        cs(store, 1996).alias("s2"),
        cs(cat, 1995).alias("c1"),
        cs(cat, 1996).alias("c2"),
        cs(web, 1995).alias("w1"),
        cs(web, 1996).alias("w2"),
    )

    def d(c):
        return F.col(c).cast("decimal(38,0)")

    out = yt.filter(
        (F.col("s1") > 0)
        & (F.col("c1") > 0)
        & (F.col("w1") > 0)
        & (d("c2") * d("s1") > d("s2") * d("c1"))
        & (d("w2") * d("s1") > d("s2") * d("w1"))
    ).select(F.col("cust_sk").alias("cust"))
    return ordered(out, "cust")


@query(
    "tpcds_q35",
    oracle="WITH "
    + _DS_SQL
    + """,
    gate AS (
      -- INDEPENDENT FORM (round 13): the Spark side gates with two
      -- semi-joins (store buyers ∩ web∪catalog buyers); this side is
      -- ONE grouped census over the unified fact with boolean-flag
      -- HAVING — intersection-of-sets re-derived as per-customer
      -- channel flags, no channel views, no IN-subqueries
      SELECT cust_sk FROM sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY cust_sk
      HAVING MAX(CASE WHEN chan <= 1 THEN 1 ELSE 0 END) = 1
         AND MAX(CASE WHEN chan >= 2 THEN 1 ELSE 0 END) = 1
    )
    SELECT c_mktsegment AS segment, c_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_cents,
           MIN(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_min,
           MAX(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_max
    FROM customer
    JOIN gate ON c_custkey = cust_sk
    GROUP BY c_mktsegment, c_nationkey
    ORDER BY segment NULLS LAST, nation NULLS LAST, n NULLS LAST,
             bal_cents NULLS LAST, bal_min NULLS LAST, bal_max NULLS LAST
    """,
)
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q35 (demographic statistics of customers active in the
    store AND in at least one direct channel — Q10's gates feeding a
    STATISTICS census instead of a bare count). Same decorrelation:
    the OR of two EXISTS unions into one distinct key set, two
    broadcast left-semis total; the aggregate then carries exact
    integer moment columns (COUNT/SUM/MIN/MAX of balance cents) per
    (segment, nation) — the reference's avg/min/max/count block with
    AVG left as the SUM/COUNT pair so nothing floating crosses
    engines. 100 TB: gate sets are distinct customer keys (broadcast);
    the customer dim aggregates in one pass."""
    y = F.year("sold_date")

    def custs(chan):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == 1996)
            .select("cust_sk")
            .distinct()
        )

    other = custs("web").union(custs("catalog")).distinct()
    cust = load_table(spark, sf_dir, "customer")
    gated = cust.join(
        F.broadcast(custs("store")),
        cust.c_custkey == F.col("cust_sk"),
        "left_semi",
    )
    gated = gated.join(
        F.broadcast(other), gated.c_custkey == other.cust_sk, "left_semi"
    )
    bal = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    out = gated.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        bal.alias("bal"),
    ).groupBy("segment", "nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bal").alias("bal_cents"),
        F.min("bal").alias("bal_min"),
        F.max("bal").alias("bal_max"),
    )
    return ordered(
        out, "segment", "nation", "n", "bal_cents", "bal_min", "bal_max"
    )


@query(
    "tpcds_q45",
    oracle="WITH "
    + _DS_SQL
    + """,
    hot_items AS (
      SELECT i_item_sk FROM item WHERE i_manufact_id IN (7, 77, 177)
    )
    SELECT c_nationkey AS nation, SUM(net_cp) AS net
    FROM web_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996
      AND (c_nationkey IN (1, 3, 5)
           OR item_sk IN (SELECT i_item_sk FROM hot_items))
    GROUP BY c_nationkey
    ORDER BY nation NULLS LAST, net NULLS LAST
    """,
)
def tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q45 (web revenue from customers in listed geographies OR
    from sales of listed items — a DISJUNCTION of a local dimension
    predicate with an uncorrelated IN-subquery). A semi-join cannot
    express the OR (it would drop the geography-only rows), and
    duplicating the fact through a UNION would double-count rows
    matching both arms; the rewrite is an EXISTENCE join — left-join
    the broadcast item key set with a match flag and filter
    (geo-pred OR flag) — one fact pass, no row duplication, the exact
    relational-algebra form Catalyst synthesizes for EXISTS-in-OR SQL.
    100 TB: the flag side is a dimension key set (broadcast); customer
    broadcasts; one shuffle for the census."""
    ws = _channel(spark, sf_dir, "web").filter(F.year("sold_date") == 1996)
    hot = (
        _item(spark, sf_dir)
        .filter(F.col("i_manufact_id").isin(7, 77, 177))
        .select(F.col("i_item_sk").alias("hot_sk"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    flagged = ws.join(
        F.broadcast(hot.withColumn("hot", F.lit(True))),
        ws.item_sk == F.col("hot_sk"),
        "left",
    )
    out = (
        flagged.join(F.broadcast(cust), flagged.cust_sk == cust.c_custkey)
        .filter(
            F.col("c_nationkey").isin(1, 3, 5)
            | F.col("hot").isNotNull()
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.sum("net_cp").alias("net"))
    )
    return ordered(out, "nation", "net")


@query(
    "tpcds_q46",
    oracle="WITH "
    + _DS_SQL
    + """,
    tickets AS (
      SELECT order_sk, cust_sk, store_sk,
             SUM(ext_cents) AS amt, SUM(profit_cp) AS profit
      FROM store_sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY order_sk, cust_sk, store_sk
    )
    SELECT cust_sk AS cust, order_sk AS ticket, amt, profit
    FROM tickets
    JOIN store ON store_sk = s_store_sk
    JOIN customer ON cust_sk = c_custkey
    WHERE s_state <> CASE c_nationkey % 6
                       WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'TX'
                       WHEN 3 THEN 'NY' WHEN 4 THEN 'OH' ELSE 'GA' END
    ORDER BY cust NULLS LAST, ticket NULLS LAST, amt NULLS LAST,
             profit NULLS LAST
    """,
)
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q46 (out-of-town shoppers: per-TICKET totals for
    customers whose home state differs from the store's state). The
    shape TPC-DS adds here is the composite-key ticket rollup — the
    fact aggregates to (ticket, customer, store) grain FIRST, and the
    dimension joins + the cross-dimension INEQUALITY predicate apply
    to the rollup, orders of magnitude smaller than line grain. Home
    state synthesizes from c_nationkey through the same 6-state
    rotation the store dim uses (documented fixture substitution).
    100 TB: one shuffle to ticket grain (the natural pre-aggregation a
    vendor pushes below dimension joins), store + customer broadcast,
    the inequality is a projection-level comparison, never a join
    condition explosion."""
    ss = _channel(spark, sf_dir, "store").filter(F.year("sold_date") == 1996)
    tickets = ss.groupBy("order_sk", "cust_sk", "store_sk").agg(
        F.sum("ext_cents").alias("amt"),
        F.sum("profit_cp").alias("profit"),
    )
    st = _store(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    home = F.element_at(
        F.array(*[F.lit(s) for s in _STATES]),
        (F.col("c_nationkey") % 6 + 1).cast("int"),
    )
    out = (
        tickets.join(F.broadcast(st), tickets.store_sk == st.s_store_sk)
        .join(F.broadcast(cust), tickets.cust_sk == cust.c_custkey)
        .filter(F.col("s_state") != home)
        .select(
            F.col("cust_sk").alias("cust"),
            F.col("order_sk").alias("ticket"),
            "amt",
            "profit",
        )
    )
    return ordered(out, "cust", "ticket", "amt", "profit")


@query(
    "tpcds_q48",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qty
    FROM lineitem
    WHERE (l_orderkey * 7 + l_linenumber) % 4 <= 1
      AND ((l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN 0.00 AND 0.03)
        OR (l_quantity BETWEEN 16 AND 30 AND l_discount BETWEEN 0.04 AND 0.07)
        OR (l_quantity BETWEEN 31 AND 50 AND l_discount BETWEEN 0.08 AND 0.10))
    """,
)
def tpcds_q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q48 (one aggregate under a DISJUNCTION of AND-triples —
    the DNF-selection query vendors use to test OR pushdown). The
    bands land on RAW columns (l_quantity, l_discount), so the whole
    OR tree is parquet-translatable and reaches the scan as ONE pushed
    Or filter — row groups whose min/max stats exclude every branch
    never decompress (pinned in tests/test_plan_shapes.py). The
    non-translatable channel conjunct (key arithmetic) stays a data
    filter WITHOUT poisoning the pushable disjunction, because
    conjuncts translate independently. TPC-H quantities are integral,
    so raw-column bands equal the derived qty bands exactly. 100 TB:
    this is the predicate shape where scan pruning pays the most —
    a non-pushed DNF reads every byte."""
    li = load_table(spark, sf_dir, "lineitem")
    q, d = F.col("l_quantity"), F.col("l_discount")
    dnf = (
        (q.between(1, 15) & d.between(0.00, 0.03))
        | (q.between(16, 30) & d.between(0.04, 0.07))
        | (q.between(31, 50) & d.between(0.08, 0.10))
    )
    chan = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4 <= 1
    out = li.filter(chan & dnf).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(q + 0.5).cast("long")).alias("qty"),
    )
    return ordered(out, "n", "qty")


@query(
    "tpcds_q75",
    oracle="WITH "
    + _DS_SQL
    + """,
    net AS (
      SELECT YEAR(sold_date) AS yr, item_sk,
             SUM(CASE WHEN returned THEN 0 ELSE qty END) AS net_qty
      FROM (SELECT * FROM store_sales UNION ALL
            SELECT * FROM catalog_sales UNION ALL
            SELECT * FROM web_sales)
      WHERE YEAR(sold_date) IN (1995, 1996)
      GROUP BY YEAR(sold_date), item_sk
    ),
    brands AS (
      SELECT i_brand AS brand, yr, SUM(net_qty) AS bq
      FROM net JOIN item ON item_sk = i_item_sk
      GROUP BY i_brand, yr
    )
    SELECT a.brand AS brand, a.bq AS prev_qty, b.bq AS cur_qty
    FROM brands a
    JOIN brands b ON a.brand = b.brand AND a.yr = 1995 AND b.yr = 1996
    WHERE 10 * b.bq < 9 * a.bq
    ORDER BY brand NULLS LAST, prev_qty NULLS LAST, cur_qty NULLS LAST
    """,
)
def tpcds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q75 (brands whose net-of-returns volume DECLINED more
    than 10 % year over year, across all three channels). The
    reference UNION ALLs sales-minus-returns per channel then
    self-joins current against prior year; here returns net out at the
    LINE (the returned flag zeroes the quantity — the fixtures' fold
    of the *_returns tables), the three channels union below ONE
    aggregate, and the year-over-year comparison is a conditional
    PIVOT in that same pass (both years' totals + per-year presence
    counts as CASE sums) — the first cut's self-join of the brand
    aggregate replayed the whole fact chain twice (measured 5.2x at
    10x; AQE exchange reuse did not dedup it), the pivot halves that
    by construction. The 10 % decline gate is cross-multiplied exact:
    10*cur < 9*prev. 100 TB: ONE fact-grain shuffle, no join above
    the aggregate at all."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date").isin(1995, 1996))
    it = _item(spark, sf_dir).select("i_item_sk", "i_brand")
    y = F.year("sold_date")
    netq = F.when(F.col("returned"), F.lit(0)).otherwise(F.col("qty"))
    # conditional pivot: ONE fact pass yields both years' totals AND
    # the per-year presence counts (the inner self-join's "brand exists
    # in both years" becomes n95 > 0 AND n96 > 0 — a zero-total year
    # with sales rows still counts as present, exactly like the join).
    # The ORACLE keeps the reference's self-join formulation, so the
    # hash compare doubles as an equivalence proof of this rewrite.
    brands = (
        s.join(F.broadcast(it), s.item_sk == it.i_item_sk)
        .groupBy(F.col("i_brand").alias("brand"))
        .agg(
            F.sum(F.when(y == 1995, netq).otherwise(0)).alias("prev_qty"),
            F.sum(F.when(y == 1996, netq).otherwise(0)).alias("cur_qty"),
            F.sum(F.when(y == 1995, 1).otherwise(0)).alias("n95"),
            F.sum(F.when(y == 1996, 1).otherwise(0)).alias("n96"),
        )
    )
    out = brands.filter(
        (F.col("n95") > 0)
        & (F.col("n96") > 0)
        & (10 * F.col("cur_qty") < 9 * F.col("prev_qty"))
    ).select("brand", "prev_qty", "cur_qty")
    return ordered(out, "brand", "prev_qty", "cur_qty")


@query(
    "tpcds_q18",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT c_nationkey AS nation, c_mktsegment AS segment,
           GROUPING(c_nationkey) + 2 * GROUPING(c_mktsegment) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(qty) AS qty, SUM(qty * qty) AS qty_sq,
           SUM(ext_cents) AS ext
    FROM catalog_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996
    GROUP BY ROLLUP(c_nationkey, c_mktsegment)
    ORDER BY nation NULLS LAST, segment NULLS LAST, gid NULLS LAST,
             n NULLS LAST, qty NULLS LAST, qty_sq NULLS LAST, ext NULLS LAST
    """,
)
def tpcds_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q18 (catalog demographics report: AVG quantities per
    customer attribute ROLLUP). The reference averages seven measures
    over ROLLUP(country, state, county); the fixtures' demographic
    axes are (nation, segment), and every AVG is carried as exact
    integer moments (COUNT + SUM + SUM of squares) so the rollup's
    super-aggregate rows — where both engines must combine partial
    groups — compare bit-exactly; GROUPING() ids disambiguate NULL
    group values from rollup NULLs. 100 TB: the Expand for the rollup
    multiplies AGGREGATE inputs only after the broadcast customer
    join; moments are map-side combinable at every grouping level."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        F.year("sold_date") == 1996
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    j = cs.join(F.broadcast(cust), cs.cust_sk == cust.c_custkey)
    out = (
        j.rollup("c_nationkey", "c_mktsegment")
        .agg(
            (
                F.grouping("c_nationkey") + 2 * F.grouping("c_mktsegment")
            ).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").alias("qty"),
            F.sum(F.col("qty") * F.col("qty")).alias("qty_sq"),
            F.sum("ext_cents").alias("ext"),
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "gid",
            "n",
            "qty",
            "qty_sq",
            "ext",
        )
    )
    return ordered(out, "nation", "segment", "gid", "n", "qty", "qty_sq", "ext")


@query(
    "tpcds_q21",
    oracle="WITH "
    + _DS_SQL
    + """,
    buckets AS (
      SELECT store_sk AS wh, item_sk,
             SUM(CASE WHEN sold_date <  DATE '1996-07-01' THEN qty
                      ELSE 0 END) AS before_qty,
             SUM(CASE WHEN sold_date >= DATE '1996-07-01' THEN qty
                      ELSE 0 END) AS after_qty
      FROM store_sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY store_sk, item_sk
    )
    SELECT wh, item_sk AS item, before_qty, after_qty
    FROM buckets
    WHERE before_qty > 0 AND after_qty > 0
      AND 2 * before_qty <= 3 * after_qty
      AND 2 * after_qty <= 3 * before_qty
    ORDER BY wh NULLS LAST, item NULLS LAST, before_qty NULLS LAST,
             after_qty NULLS LAST
    """,
)
def tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q21 (warehouse/item pairs whose demand before and after
    a pivot date stays within a 2:3 band — the inventory-balance
    check). One conditional-aggregation pass produces BOTH temporal
    buckets (the reference's CASE-on-date pair), and the band
    before/after ∈ [2/3, 3/2] is the symmetric cross-multiplied
    integer pair 2*before <= 3*after AND 2*after <= 3*before — no
    division, no float. 100 TB: one shuffle to (wh, item); the date
    CASE is scan-local; the band filter runs on aggregate output."""
    ss = _channel(spark, sf_dir, "store").filter(
        F.year("sold_date") == 1996
    )
    pivot = F.lit("1996-07-01").cast("timestamp")
    b = ss.groupBy(
        F.col("store_sk").alias("wh"), F.col("item_sk").alias("item")
    ).agg(
        F.sum(
            F.when(F.col("sold_date") < pivot, F.col("qty")).otherwise(0)
        ).alias("before_qty"),
        F.sum(
            F.when(F.col("sold_date") >= pivot, F.col("qty")).otherwise(0)
        ).alias("after_qty"),
    )
    out = b.filter(
        (F.col("before_qty") > 0)
        & (F.col("after_qty") > 0)
        & (2 * F.col("before_qty") <= 3 * F.col("after_qty"))
        & (2 * F.col("after_qty") <= 3 * F.col("before_qty"))
    )
    return ordered(out, "wh", "item", "before_qty", "after_qty")


@query(
    "tpcds_q50",
    oracle="WITH "
    + _DS_SQL
    + """,
    lagged AS (
      SELECT l_suppkey % 12 AS wh,
             DATEDIFF('day', o_orderdate, l_shipdate) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE (l_orderkey * 7 + l_linenumber) % 4 <= 1
        AND l_returnflag = 'R' AND YEAR(o_orderdate) = 1996
    )
    SELECT s_store_sk AS store, s_state AS state,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lag_days BETWEEN 31 AND 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days BETWEEN 61 AND 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days BETWEEN 91 AND 120 THEN 1 ELSE 0 END)
                AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END)
                AS BIGINT) AS d120p
    FROM lagged JOIN store ON wh = s_store_sk
    GROUP BY s_store_sk, s_state
    ORDER BY store NULLS LAST, state NULLS LAST, d30 NULLS LAST,
             d60 NULLS LAST, d90 NULLS LAST, d120 NULLS LAST,
             d120p NULLS LAST
    """,
)
def tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q50 (return-lag histogram PER STORE: how long after the
    sale do returns come back, five day-buckets wide). The reference
    joins store_sales to store_returns on (ticket, item, customer) and
    datediffs the two date keys; the fixtures fold returns into the
    line (returned flag) and carry one date pair, so the lag is
    order→ship on RETURNED lines — same bucket census, one join fewer
    (documented substitution). Needs raw l_shipdate, so it builds from
    lineitem directly rather than the `sales` projection; the returned
    + year filters push to the scans. vs Q62: Q62 buckets globally by
    lag alone; Q50's grain is the STORE dimension join — 12 broadcast
    rows — with the five buckets as conditional counts. 100 TB: one
    fact pass, one 12-key shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    f = li.filter(
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4 <= 1)
        & (F.col("l_returnflag") == "R")
    ).join(o, F.col("l_orderkey") == o.o_orderkey)
    f = f.filter(F.year("o_orderdate") == 1996).select(
        (F.col("l_suppkey") % 12).alias("wh"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "lag_days"
        ),
    )
    st = _store(spark)
    lag = F.col("lag_days")

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    out = (
        f.join(F.broadcast(st), f.wh == st.s_store_sk)
        .groupBy(
            F.col("s_store_sk").alias("store"), F.col("s_state").alias("state")
        )
        .agg(
            bucket(lag <= 30, "d30"),
            bucket(lag.between(31, 60), "d60"),
            bucket(lag.between(61, 90), "d90"),
            bucket(lag.between(91, 120), "d120"),
            bucket(lag > 120, "d120p"),
        )
    )
    return ordered(out, "store", "state", "d30", "d60", "d90", "d120", "d120p")


@query(
    "tpcds_q66",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT store_sk AS wh,
    """
    + ", ".join(
        f"SUM(CASE WHEN MONTH(sold_date) = {m} AND item_sk % 2 = 0 "
        f"THEN qty ELSE 0 END) AS air_m{m:02d}, "
        f"SUM(CASE WHEN MONTH(sold_date) = {m} AND item_sk % 2 = 1 "
        f"THEN qty ELSE 0 END) AS truck_m{m:02d}"
        for m in range(1, 13)
    )
    + """
    FROM (SELECT * FROM catalog_sales UNION ALL SELECT * FROM web_sales)
    WHERE YEAR(sold_date) = 1996
    GROUP BY store_sk
    ORDER BY wh NULLS LAST
    """,
)
def tpcds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q66 (the warehouse shipping report: a WIDE PIVOT — 24
    monthly quantity columns, 12 months x 2 carriers, per warehouse,
    over the catalog+web union). The reference UNION ALLs two
    per-channel 24-column aggregates and re-aggregates; here the
    channels union BELOW one aggregate pass, and the 24 columns are
    conditional sums in that single pass — the pivot never becomes 24
    scans or a (month, carrier) shuffle key explosion. Carrier
    synthesizes from key arithmetic (item_sk parity → AIR/TRUCK), the
    same fixture convention as the channel split. Ordering on the
    warehouse key alone is total (GROUP BY key). 100 TB: one shuffle
    on the 12-value warehouse key; 24 partial sums combine map-side —
    the wide-aggregation shape where map-side combine matters most."""
    s = _sales(spark, sf_dir).filter(
        (F.col("chan") >= 2) & (F.year("sold_date") == 1996)
    )
    aggs = []
    for m in range(1, 13):
        mo = F.month("sold_date") == m
        even = F.col("item_sk") % 2 == 0
        aggs.append(
            F.sum(F.when(mo & even, F.col("qty")).otherwise(0)).alias(
                f"air_m{m:02d}"
            )
        )
        aggs.append(
            F.sum(F.when(mo & ~even, F.col("qty")).otherwise(0)).alias(
                f"truck_m{m:02d}"
            )
        )
    out = s.groupBy(F.col("store_sk").alias("wh")).agg(*aggs)
    return ordered(out, "wh")


@query(
    "tpcds_q69",
    oracle="WITH "
    + _DS_SQL
    + """,
    st AS (SELECT DISTINCT cust_sk FROM store_sales
           WHERE YEAR(sold_date) = 1996),
    wb AS (SELECT DISTINCT cust_sk FROM web_sales
           WHERE YEAR(sold_date) = 1996),
    ct AS (SELECT DISTINCT cust_sk FROM catalog_sales
           WHERE YEAR(sold_date) = 1996)
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey IN (SELECT cust_sk FROM st)
      AND c_custkey NOT IN (SELECT cust_sk FROM wb)
      AND c_custkey NOT IN (SELECT cust_sk FROM ct)
    GROUP BY c_mktsegment
    ORDER BY segment NULLS LAST, n NULLS LAST
    """,
)
def tpcds_q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q69 (store-ONLY customers: bought in a store but through
    NEITHER direct channel — Q10's disjunctive-EXISTS census inverted
    into NOT-EXISTS gates). EXISTS decorrelates to a broadcast LEFT
    SEMI as before; each NOT EXISTS becomes a broadcast LEFT ANTI on
    the channel's distinct customer set — the key-set form is safe
    here precisely because the sets are NOT NULL (distinct keys of an
    inner join), where a raw NOT IN over a nullable column would have
    three-valued-logic traps. 100 TB: three dimension-sized key sets
    broadcast; the customer dim is scanned once and never shuffles
    before the census aggregate."""
    y = F.year("sold_date")

    def custs(chan):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == 1996)
            .select("cust_sk")
            .distinct()
        )

    cust = load_table(spark, sf_dir, "customer")
    gated = cust.join(
        F.broadcast(custs("store")),
        cust.c_custkey == F.col("cust_sk"),
        "left_semi",
    )
    for chan in ("web", "catalog"):
        ch = custs(chan)
        gated = gated.join(
            F.broadcast(ch), gated.c_custkey == ch.cust_sk, "left_anti"
        )
    out = gated.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return ordered(out, "segment", "n")


@query(
    "tpcds_q95",
    oracle="WITH "
    + _DS_SQL
    + """,
    per_order AS (
      SELECT order_sk,
             COUNT(DISTINCT store_sk) AS nwh,
             MAX(CASE WHEN returned THEN 1 ELSE 0 END) AS has_ret,
             SUM(net_cp) AS net
      FROM web_sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY order_sk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders, SUM(net) AS net
    FROM per_order
    WHERE nwh >= 2 AND has_ret = 1
    """,
)
def tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q95 (web orders shipped from MORE THAN ONE warehouse
    that also had a return — the reference phrases both conditions as
    correlated self-EXISTS over web_sales: 'another row, same order,
    different warehouse' and 'a matching web_returns row'). Both
    decorrelate into ONE grouped pass at order grain: a distinct-
    warehouse count replaces the inequality self-join (which at scale
    explodes quadratically within hot orders) and a MAX(flag) replaces
    the returns semi-join. vs Q16 (its catalog NOT-EXISTS dual): the
    gate here is existence, and both land in the same aggregate. The
    order-grain totals then reduce to the single report row. 100 TB:
    one shuffle to order grain; COUNT(DISTINCT wh) within an order is
    bounded by the 12-warehouse dimension, so no hot-key blowup."""
    ws = _channel(spark, sf_dir, "web").filter(F.year("sold_date") == 1996)
    per_order = ws.groupBy("order_sk").agg(
        F.count_distinct(F.col("store_sk")).alias("nwh"),
        F.max(F.when(F.col("returned"), 1).otherwise(0)).alias("has_ret"),
        F.sum("net_cp").alias("net"),
    )
    out = per_order.filter(
        (F.col("nwh") >= 2) & (F.col("has_ret") == 1)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("net").alias("net"),
    )
    return ordered(out, "n_orders", "net")


@query(
    "tpcds_q05",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT CASE WHEN chan <= 1 THEN 'store'
                WHEN chan = 2 THEN 'catalog' ELSE 'web' END AS channel,
           GROUPING(CASE WHEN chan <= 1 THEN 'store'
                         WHEN chan = 2 THEN 'catalog' ELSE 'web' END) AS gid,
           SUM(CASE WHEN returned THEN 0 ELSE ext_cents END) AS sales_cents,
           SUM(CASE WHEN returned THEN ext_cents ELSE 0 END) AS ret_cents,
           SUM(profit_cp) AS profit_cp
    FROM sales
    WHERE YEAR(sold_date) = 1996
    GROUP BY ROLLUP(CASE WHEN chan <= 1 THEN 'store'
                         WHEN chan = 2 THEN 'catalog' ELSE 'web' END)
    ORDER BY channel NULLS LAST, gid NULLS LAST, sales_cents NULLS LAST,
             ret_cents NULLS LAST, profit_cp NULLS LAST
    """,
)
def tpcds_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q5 (the channel P&L report: sales, returns, and profit
    per channel with a grand-total rollup). The reference UNION ALLs
    three per-channel salesreturns CTEs and re-aggregates under
    ROLLUP(channel, id); the fixtures' single fact already carries the
    channel, so the union disappears — one pass, returns split out by
    the flag, ROLLUP over the derived channel label, GROUPING()
    disambiguating the total row. 100 TB: the rollup Expand doubles a
    4-value grouping column only — the fact is read once and the
    aggregate is map-side combinable at both levels."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date") == 1996)
    channel = (
        F.when(F.col("chan") <= 1, "store")
        .when(F.col("chan") == 2, "catalog")
        .otherwise("web")
    )
    out = (
        s.withColumn("channel", channel)
        .rollup("channel")
        .agg(
            F.grouping("channel").alias("gid"),
            F.sum(
                F.when(F.col("returned"), 0).otherwise(F.col("ext_cents"))
            ).alias("sales_cents"),
            F.sum(
                F.when(F.col("returned"), F.col("ext_cents")).otherwise(0)
            ).alias("ret_cents"),
            F.sum("profit_cp").alias("profit_cp"),
        )
    )
    return ordered(out, "channel", "gid", "sales_cents", "ret_cents",
                   "profit_cp")


@query(
    "tpcds_q13",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(qty) AS qty, SUM(ext_cents) AS ext, SUM(net_cp) AS net
    FROM store_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996
      AND ((c_mktsegment = 'BUILDING'
              AND qty BETWEEN 1 AND 20 AND disc_pct BETWEEN 0 AND 5)
        OR (c_mktsegment = 'MACHINERY'
              AND qty BETWEEN 21 AND 35 AND disc_pct BETWEEN 3 AND 8)
        OR (c_nationkey IN (1, 2, 3)
              AND qty BETWEEN 36 AND 50 AND disc_pct BETWEEN 6 AND 10))
    """,
)
def tpcds_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q13 (average store-sale statistics under an OR of
    (demographic AND fact-band) triples — Q48's DNF selection with the
    disjuncts SPANNING the dimension join). Because each disjunct
    mixes customer attributes with fact bands, nothing pushes below
    the join; the scale property is instead that the dimension
    BROADCASTS and the DNF evaluates post-join in one codegen stage —
    never three fact passes unioned (the naive per-disjunct plan). The
    reference's AVGs are the exact COUNT/SUM pairs. 100 TB: one fact
    scan, one broadcast, one 1-row aggregate."""
    ss = _channel(spark, sf_dir, "store").filter(F.year("sold_date") == 1996)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    j = ss.join(F.broadcast(cust), ss.cust_sk == cust.c_custkey)
    q, d, seg = F.col("qty"), F.col("disc_pct"), F.col("c_mktsegment")
    dnf = (
        ((seg == "BUILDING") & q.between(1, 20) & d.between(0, 5))
        | ((seg == "MACHINERY") & q.between(21, 35) & d.between(3, 8))
        | (F.col("c_nationkey").isin(1, 2, 3)
           & q.between(36, 50) & d.between(6, 10))
    )
    out = j.filter(dnf).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").alias("qty"),
        F.sum("ext_cents").alias("ext"),
        F.sum("net_cp").alias("net"),
    )
    return ordered(out, "n", "qty", "ext", "net")


@query(
    "tpcds_q28",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT
    """
    + ", ".join(
        f"CAST(SUM(CASE WHEN qty BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_b{i}, "
        f"CAST(COUNT(DISTINCT CASE WHEN qty BETWEEN {lo} AND {hi}"
        f" THEN ext_cents END) AS BIGINT) AS d_b{i}, "
        f"SUM(CASE WHEN qty BETWEEN {lo} AND {hi} THEN ext_cents"
        f" ELSE 0 END) AS s_b{i}"
        for i, (lo, hi) in enumerate(
            [(1, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)],
            start=1,
        )
    )
    + """
    FROM store_sales
    """,
)
def tpcds_q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q28 (six price-band blocks, each reporting a row count,
    a DISTINCT count, and an average — the multi-DISTINCT aggregate).
    The reference cross-joins six single-row subqueries; all six
    collapse into ONE aggregate carrying six COUNT(DISTINCT CASE ...)
    columns — the shape that forces Spark's Expand-based
    multi-distinct plan: the input replicates once per distinct group
    (6x here), partials still combine map-side within each group, and
    the counts land in one row. That replication is the documented
    cost of exact multi-distinct; sketch alternatives live in
    plans/sketches.py. AVG ships as the exact (count, sum) pair.
    100 TB: one scan, 6x Expand on the aggregate input, one shuffle."""
    ss = _channel(spark, sf_dir, "store")
    aggs = []
    for i, (lo, hi) in enumerate(
        [(1, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)], start=1
    ):
        band = F.col("qty").between(lo, hi)
        aggs += [
            F.sum(F.when(band, 1).otherwise(0)).cast("long").alias(f"n_b{i}"),
            F.count_distinct(
                F.when(band, F.col("ext_cents"))
            ).alias(f"d_b{i}"),
            F.sum(
                F.when(band, F.col("ext_cents")).otherwise(0)
            ).alias(f"s_b{i}"),
        ]
    out = ss.agg(*aggs)
    return ordered(out, *[c for c in out.columns])


@query(
    "tpcds_q14",
    oracle="WITH "
    + _DS_SQL
    + """,
    cross_items AS (
      -- INDEPENDENT FORM (round 13): the Spark side INTERSECTs three
      -- per-channel key sets; this side runs ONE grouped census over
      -- the unified fact and keeps items whose distinct channel-group
      -- count reaches 3 — set intersection re-derived as a HAVING on
      -- a distinct count, so a shared misreading of the channel
      -- slicing cannot hash-match
      SELECT item_sk FROM sales
      WHERE YEAR(sold_date) = 1996
      GROUP BY item_sk
      HAVING COUNT(DISTINCT CASE WHEN chan <= 1 THEN 1
                                 WHEN chan = 2 THEN 2 ELSE 3 END) = 3
    )
    SELECT i_category AS category, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(ext_cents) AS sales_cents
    FROM store_sales
    JOIN cross_items USING (item_sk)
    JOIN item ON item_sk = i_item_sk
    WHERE YEAR(sold_date) = 1997
    GROUP BY i_category
    ORDER BY category NULLS LAST, n NULLS LAST, sales_cents NULLS LAST
    """,
)
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 (cross-channel items: next year's store revenue
    restricted to items that sold through ALL THREE channels — the
    INTERSECT-chain gate; the reference's full query wraps this in a
    sales-above-average ROLLUP, whose rollup/average shapes q36/q67/
    q32 already pin). INTERSECT of three key sets is set semantics on
    a DIMENSION-cardinality domain: Spark plans each leg as a
    left-semi under distinct aggregation, the result broadcasts into
    the fact gate. The fixture channels are slices of one fact, so the
    three legs share the scan subtree; at 100 TB with separate fact
    tables each leg is an independent column-pruned scan feeding a
    dimension-sized distinct. One fact pass for the 1997 census."""
    y = F.year("sold_date")

    def items(chan, yr):
        return (
            _channel(spark, sf_dir, chan)
            .filter(y == yr)
            .select("item_sk")
        )

    cross = (
        items("store", 1996)
        .intersect(items("catalog", 1996))
        .intersect(items("web", 1996))
    )
    ss = _channel(spark, sf_dir, "store").filter(y == 1997)
    ss = ss.join(F.broadcast(cross), "item_sk", "left_semi")
    it = _item(spark, sf_dir).select("i_item_sk", "i_category")
    out = (
        ss.join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy(F.col("i_category").alias("category"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ext_cents").alias("sales_cents"),
        )
    )
    return ordered(out, "category", "n", "sales_cents")


# ---------------------------------------------------------------------
# Round 12: the COVERAGE.md shape-matrix tail — converting the 35 IOU
# rows into oracled queries. Same fixture derivation, same integer-
# money discipline, same plan disciplines (dimension broadcasts, one
# fact shuffle, cross-multiplied thresholds). d_week_seq / d_dow are
# the round-12 cross-engine-exact calendar columns (epoch-day
# arithmetic — see _date_dim), closing the two documented divergence
# edges that had blocked q2/q43/q96-class shapes.


_DOW_NAMES = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]


def _weekly_pivot_sql(year: int) -> str:
    cases = ",\n         ".join(
        f"SUM(CASE WHEN d_dow = {i} THEN ext_cents ELSE 0 END) AS {n}"
        for i, n in enumerate(_DOW_NAMES)
    )
    return f"""
      SELECT d_week_seq,
         {cases}
      FROM wscs JOIN date_dim ON sold_date = d_date
      WHERE d_year = {year}
      GROUP BY d_week_seq
    """


@query(
    "tpcds_q02",
    oracle="WITH "
    + _DS_SQL
    + f""",
    wscs AS (
      SELECT sold_date, ext_cents FROM web_sales
      UNION ALL
      SELECT sold_date, ext_cents FROM catalog_sales
    ),
    wk1 AS ({_weekly_pivot_sql(1995)}),
    wk2 AS ({_weekly_pivot_sql(1996)})
    SELECT wk1.d_week_seq AS week_seq,
           {", ".join(
               f"CASE WHEN wk1.{n} > 0 THEN CAST(wk2.{n} AS DOUBLE) / wk1.{n} END AS r_{n}"
               for n in _DOW_NAMES
           )}
    FROM wk1 JOIN wk2 ON wk1.d_week_seq + 52 = wk2.d_week_seq
    ORDER BY week_seq NULLS LAST
    """,
)
def tpcds_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q2 (week-over-year growth of combined web+catalog sales,
    per day of week). The LAST divergence-blocked shape: week and
    day-of-week come from the explicit epoch-day arithmetic in
    _date_dim (d_week_seq Monday-anchored buckets, d_dow 0=Sunday) so
    both engines bucket identically — weekofyear()/dayofweek()
    builtins are never used. The per-week day columns are conditional
    aggregation (no PIVOT operator needed), the YoY join aligns week
    N with week N+52, and each ratio guards its zero denominator with
    NULL. 100 TB: the union'd fact aggregates map-side to (week, dow)
    grain — ~dimension-sized — so the YoY self-join is tiny; one fact
    shuffle total."""
    wscs = _sales(spark, sf_dir).filter(F.col("chan") >= 2)
    dd = _date_dim(spark, sf_dir)
    j = wscs.join(F.broadcast(dd), wscs.sold_date == dd.d_date)

    def weekly(year: int) -> DataFrame:
        return (
            j.filter(F.col("d_year") == year)
            .groupBy("d_week_seq")
            .agg(
                *[
                    F.sum(
                        F.when(F.col("d_dow") == i, F.col("ext_cents"))
                        .otherwise(0)
                    ).alias(n)
                    for i, n in enumerate(_DOW_NAMES)
                ]
            )
        )

    wk1, wk2 = weekly(1995).alias("wk1"), weekly(1996).alias("wk2")
    out = wk1.join(
        wk2, F.col("wk1.d_week_seq") + 52 == F.col("wk2.d_week_seq")
    ).select(
        F.col("wk1.d_week_seq").alias("week_seq"),
        *[
            F.when(
                F.col(f"wk1.{n}") > 0,
                F.col(f"wk2.{n}").cast("double") / F.col(f"wk1.{n}"),
            ).alias(f"r_{n}")
            for n in _DOW_NAMES
        ],
    )
    return ordered(out, "week_seq")


@query(
    "tpcds_q08",
    oracle="WITH "
    + _DS_SQL
    + """,
    pref AS (
      SELECT c_nationkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
      GROUP BY c_nationkey
      HAVING COUNT(*) >= 13
    )
    SELECT store_sk AS store, SUM(profit_cp) AS net_profit
    FROM store_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996 AND QUARTER(sold_date) = 2
      AND c_nationkey IN (SELECT c_nationkey FROM pref)
    GROUP BY store_sk
    ORDER BY store NULLS LAST, net_profit NULLS LAST
    """,
)
def tpcds_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q8 (store net profit restricted to stores whose zip
    neighborhoods hold enough preferred customers). Substitutions: the
    zip-prefix geography becomes c_nationkey and "preferred" becomes
    the AUTOMOBILE segment; the >=10-preferred-customers HAVING gate
    becomes >=13 at the nation grain (selective-but-non-empty at sf0.01: 8 of 25 nations pass). The shape under test (per the
    matrix row: q6's dimension-side gate + q34's HAVING band census)
    is a gate computed ENTIRELY on the customer dimension — aggregate,
    band-filter, then semi-gate the fact — so the expensive side never
    touches a fact row. 100 TB: the gated nation set is tiny
    (broadcast semi into the already-broadcast customer join); one
    fact shuffle for the store census."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    pref = (
        cust.filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 13)
        .select("c_nationkey")
    )
    ss = _channel(spark, sf_dir, "store").filter(
        (F.year("sold_date") == 1996) & (F.quarter("sold_date") == 2)
    )
    gated_cust = cust.join(F.broadcast(pref), "c_nationkey", "left_semi")
    out = (
        ss.join(F.broadcast(gated_cust), ss.cust_sk == gated_cust.c_custkey)
        .groupBy(F.col("store_sk").alias("store"))
        .agg(F.sum("profit_cp").alias("net_profit"))
    )
    return ordered(out, "store", "net_profit")


@query(
    "tpcds_q11",
    oracle="WITH "
    + _DS_SQL
    + """,
    yt AS (
      SELECT cust_sk,
             SUM(CASE WHEN chan <= 1 AND YEAR(sold_date) = 1995
                      THEN ext_cents ELSE 0 END) AS s1,
             SUM(CASE WHEN chan <= 1 AND YEAR(sold_date) = 1996
                      THEN ext_cents ELSE 0 END) AS s2,
             SUM(CASE WHEN chan = 3 AND YEAR(sold_date) = 1995
                      THEN ext_cents ELSE 0 END) AS w1,
             SUM(CASE WHEN chan = 3 AND YEAR(sold_date) = 1996
                      THEN ext_cents ELSE 0 END) AS w2
      FROM sales
      WHERE YEAR(sold_date) IN (1995, 1996)
      GROUP BY cust_sk
    )
    SELECT cust_sk AS cust, s1, s2, w1, w2
    FROM yt
    WHERE s1 > 0 AND w1 > 0
      AND CAST(w2 AS HUGEINT) * s1 > CAST(s2 AS HUGEINT) * w1
    ORDER BY cust NULLS LAST
    """,
)
def tpcds_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q11 (customers whose web spending grew faster than their
    store spending year-over-year — Q4's two-channel special case, per
    the matrix row). Same pivot rewrite as q4: the reference's
    four-way year_total self-join collapses to ONE conditional-
    aggregation pass; the ratio comparison w2/w1 > s2/s1 cross-
    multiplies in 128-bit exact types (Spark decimal(38,0), DuckDB
    HUGEINT). The year totals ride along in the output so the oracle
    pins the aggregates, not just the survivor set. 100 TB: one
    shuffle to customer grain."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date").isin(1995, 1996))

    def cs(chan_cond, yr):
        return F.sum(
            F.when(
                chan_cond & (F.year("sold_date") == yr), F.col("ext_cents")
            ).otherwise(0)
        )

    store, web = F.col("chan") <= 1, F.col("chan") == 3
    yt = s.groupBy("cust_sk").agg(
        cs(store, 1995).alias("s1"),
        cs(store, 1996).alias("s2"),
        cs(web, 1995).alias("w1"),
        cs(web, 1996).alias("w2"),
    )

    def d(c):
        return F.col(c).cast("decimal(38,0)")

    out = yt.filter(
        (F.col("s1") > 0)
        & (F.col("w1") > 0)
        & (d("w2") * d("s1") > d("s2") * d("w1"))
    ).select(F.col("cust_sk").alias("cust"), "s1", "s2", "w1", "w2")
    return ordered(out, "cust")


def _revenue_ratio_query(
    spark: SparkSession,
    sf_dir: str,
    chan: str,
    cats: list[str],
    d_lo: str,
    d_hi: str,
) -> DataFrame:
    """Shared body for q12 (web) / q20 (catalog): revenue share of each
    item within its class, over a 30-day window and a category subset
    — q98's ratio-to-class window on a different channel + a BETWEEN
    date gate. 100 TB: one grouped shuffle on (item, class); the
    window re-uses the class prefix; item and the date gate broadcast."""
    ch = _channel(spark, sf_dir, chan)
    dd = _date_dim(spark, sf_dir).filter(F.col("d_date").between(d_lo, d_hi))
    it = _item(spark, sf_dir).filter(F.col("i_category").isin(cats))
    rev = (
        ch.join(F.broadcast(dd), ch.sold_date == dd.d_date)
        .join(F.broadcast(it), ch.item_sk == it.i_item_sk)
        .groupBy("i_item_sk", "i_category", "i_class")
        .agg(F.sum("ext_cents").alias("itemrevenue"))
    )
    w = Window.partitionBy("i_class")
    out = rev.select(
        "i_item_sk",
        "i_category",
        "i_class",
        "itemrevenue",
        (
            F.col("itemrevenue").cast("double")
            * 100
            / F.sum("itemrevenue").over(w)
        ).alias("revenueratio"),
    )
    return ordered(out, "i_category", "i_class", "i_item_sk")


def _revenue_ratio_sql(chan_table: str, cats: str, d_lo: str, d_hi: str) -> str:
    return f""",
    rev AS (
      SELECT i_item_sk, i_category, i_class, SUM(ext_cents) AS itemrevenue
      FROM {chan_table}
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE i_category IN ({cats})
        AND d_date BETWEEN TIMESTAMP '{d_lo} 00:00:00'
                       AND TIMESTAMP '{d_hi} 00:00:00'
      GROUP BY i_item_sk, i_category, i_class
    )
    SELECT i_item_sk, i_category, i_class, itemrevenue,
           CAST(itemrevenue AS DOUBLE) * 100
             / SUM(itemrevenue) OVER (PARTITION BY i_class) AS revenueratio
    FROM rev
    ORDER BY i_category, i_class, i_item_sk
    """


@query(
    "tpcds_q12",
    oracle="WITH "
    + _DS_SQL
    + _revenue_ratio_sql(
        "web_sales", "'ECONOMY', 'PROMO', 'STANDARD'",
        "1996-05-01", "1996-05-30",
    ),
)
def tpcds_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q12 (web item revenue share within class, for a category
    subset over a 30-day window — q98's ratio-to-class shape + the
    BETWEEN date gate, per the matrix row). See _revenue_ratio_query
    for the shared plan discipline."""
    return _revenue_ratio_query(
        spark, sf_dir, "web",
        ["ECONOMY", "PROMO", "STANDARD"], "1996-05-01", "1996-05-30",
    )


@query(
    "tpcds_q20",
    oracle="WITH "
    + _DS_SQL
    + _revenue_ratio_sql(
        "catalog_sales", "'SMALL', 'MEDIUM', 'LARGE'",
        "1995-08-01", "1995-08-30",
    ),
)
def tpcds_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q20 (catalog twin of Q12: item revenue share within
    class for a category subset over a 30-day window). See
    _revenue_ratio_query."""
    return _revenue_ratio_query(
        spark, sf_dir, "catalog",
        ["SMALL", "MEDIUM", "LARGE"], "1995-08-01", "1995-08-30",
    )


@query(
    "tpcds_q15",
    oracle="WITH "
    + _DS_SQL
    + """,
    hot AS (
      SELECT i_item_sk FROM item WHERE i_manufact_id IN (13, 113, 213)
    )
    SELECT c_nationkey AS nation, SUM(ext_cents) AS ext
    FROM catalog_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE YEAR(sold_date) = 1996 AND QUARTER(sold_date) = 1
      AND (c_nationkey IN (2, 4, 6)
           OR qty >= 45
           OR item_sk IN (SELECT i_item_sk FROM hot))
    GROUP BY c_nationkey
    ORDER BY nation NULLS LAST, ext NULLS LAST
    """,
)
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q15 (catalog revenue census where the row qualifies by
    geography OR a big-ticket local predicate OR an item subquery — the
    disjunction-of-local-predicate-and-IN-subquery shape, per the
    matrix row it shares with q45). Same existence-join rewrite: a
    semi-join can't express the OR, a UNION would double-count rows
    matching both arms; the broadcast hot-item key set left-joins with
    a match flag and the filter takes the disjunction. 100 TB: flag
    side and customer broadcast; one census shuffle."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        (F.year("sold_date") == 1996) & (F.quarter("sold_date") == 1)
    )
    hot = (
        _item(spark, sf_dir)
        .filter(F.col("i_manufact_id").isin(13, 113, 213))
        .select(F.col("i_item_sk").alias("hot_sk"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    flagged = cs.join(
        F.broadcast(hot.withColumn("hot", F.lit(True))),
        cs.item_sk == F.col("hot_sk"),
        "left",
    )
    out = (
        flagged.join(F.broadcast(cust), flagged.cust_sk == cust.c_custkey)
        .filter(
            F.col("c_nationkey").isin(2, 4, 6)
            | (F.col("qty") >= 45)
            | F.col("hot").isNotNull()
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.sum("ext_cents").alias("ext"))
    )
    return ordered(out, "nation", "ext")


@query(
    "tpcds_q26",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT i_item_sk AS item,
           FLOOR(CAST(SUM(qty) * 100 AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_qty,
           FLOOR(CAST(SUM(ext_cents) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_price,
           FLOOR(CAST(SUM(disc_pct) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_disc,
           COUNT(*) AS n
    FROM catalog_sales
    JOIN customer ON cust_sk = c_custkey
    JOIN item ON item_sk = i_item_sk
    WHERE c_mktsegment = 'MACHINERY' AND i_manufact_id >= 900
    GROUP BY i_item_sk
    ORDER BY item NULLS LAST, avg_qty NULLS LAST, avg_price NULLS LAST,
             avg_disc NULLS LAST, n NULLS LAST
    """,
)
def tpcds_q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q26 (q7's catalog twin, per the matrix row: per-item
    averages for a demographic slice through the catalog channel).
    Same avg_exact discipline — floor-rounded double division of
    identical integer sums. 100 TB: item broadcasts; customer joins
    once; one grouped shuffle."""
    cs = _channel(spark, sf_dir, "catalog")
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    it = _item(spark, sf_dir).filter(F.col("i_manufact_id") >= 900)
    cnt = F.count(F.lit(1))
    out = (
        cs.join(cu, cs.cust_sk == cu.c_custkey)
        .join(F.broadcast(it), cs.item_sk == it.i_item_sk)
        .groupBy(F.col("i_item_sk").alias("item"))
        .agg(
            (
                F.floor((F.sum("qty") * 100).cast("double") / cnt + 0.5) / 100
            ).alias("avg_qty"),
            (F.floor(F.sum("ext_cents").cast("double") / cnt + 0.5) / 100).alias(
                "avg_price"
            ),
            (F.floor(F.sum("disc_pct").cast("double") / cnt + 0.5) / 100).alias(
                "avg_disc"
            ),
            cnt.alias("n"),
        )
    )
    return ordered(out, "item", "avg_qty", "avg_price", "avg_disc", "n")


# ------------------------------------------------------------ inventory
# Synthesized inventory-on-hand time series (VERDICT r11 item 4 — the
# one fixture-blocked TPC-DS row, unlocked the way partsupp was for
# TPC-H): weekly snapshots per (item subset × 4 warehouses), every
# value a pure function of (item_sk, week_seq, warehouse) so BOTH
# engines derive the identical relation. The week spine is date_dim's
# d_week_seq (itself exact epoch-day arithmetic), so inventory weeks
# align with sale weeks by construction.


def _inventory(
    spark: SparkSession, sf_dir: str, weeks: DataFrame | None = None
) -> DataFrame:
    """inv(inv_week_seq, inv_item_sk, inv_wh_sk, inv_qoh): items with
    i_item_sk % 5 == 0 (a 20 % stocked subset keeps the synthesized
    relation |item|/5 × |weeks| × 4 — bounded, dimension-shaped), 4
    warehouses, qoh = (item*13 + week*7 + wh*3) % 1000 (hits 0 —
    out-of-stock rows exist for the q72 shape). The fan-outs are a
    broadcast nested-loop over the tiny week spine and an explode over
    the 4-row warehouse axis — pure projections plus one broadcast,
    nothing fact-sized.

    ``weeks`` (optional, one ``d_week_seq`` column) scopes the spine
    BEFORE the fan-out: a join predicate on the fanned output cannot
    prune the cross-join's build side, so a query probing one year's
    snapshots passes its needed weeks here and the synthesis builds
    only that slice — measured 11.2 s → ~4 s on tpcds_q72 at the 10×
    fixture (the full spine fanned 55M rows for a 52-week probe).
    Each value is a pure function of (item, week, wh), so any slice of
    the full relation is identical to the full relation filtered —
    the DuckDB oracle keeps the unscoped form and the hashes match."""
    spine = _date_dim(spark, sf_dir).select("d_week_seq").distinct()
    if weeks is not None:
        spine = spine.join(
            F.broadcast(weeks.select("d_week_seq").distinct()),
            "d_week_seq",
            "left_semi",
        )
    weeks = spine
    items = (
        _item(spark, sf_dir)
        .filter(F.col("i_item_sk") % 5 == 0)
        .select("i_item_sk")
    )
    fanned = (
        items.crossJoin(F.broadcast(weeks))
        .select(
            "i_item_sk",
            "d_week_seq",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("wh"),
        )
    )
    return fanned.select(
        F.col("d_week_seq").alias("inv_week_seq"),
        F.col("i_item_sk").alias("inv_item_sk"),
        F.col("wh").cast("long").alias("inv_wh_sk"),
        (
            (
                F.col("i_item_sk") * 13
                + F.col("d_week_seq") * 7
                + F.col("wh") * 3
            )
            % 1000
        ).alias("inv_qoh"),
    )


_INV_SQL = """,
weeks AS (SELECT DISTINCT d_week_seq FROM date_dim),
inventory AS (
  SELECT w.d_week_seq AS inv_week_seq,
         i.i_item_sk AS inv_item_sk,
         CAST(t.wh AS BIGINT) AS inv_wh_sk,
         (i.i_item_sk * 13 + w.d_week_seq * 7 + t.wh * 3) % 1000 AS inv_qoh
  FROM weeks w, item i, (VALUES (0), (1), (2), (3)) t(wh)
  WHERE i.i_item_sk % 5 = 0
)
"""


@query(
    "tpcds_q22",
    oracle="WITH "
    + _DS_SQL
    + _INV_SQL
    + """
    SELECT i_category AS category, i_brand AS brand,
           GROUPING(i_category) + 2 * GROUPING(i_brand) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n, SUM(inv_qoh) AS qoh
    FROM inventory
    JOIN item ON inv_item_sk = i_item_sk
    WHERE inv_week_seq IN (SELECT d_week_seq FROM date_dim
                           WHERE d_year = 1996)
    GROUP BY ROLLUP(i_category, i_brand)
    ORDER BY category NULLS LAST, brand NULLS LAST, gid NULLS LAST,
             n NULLS LAST, qoh NULLS LAST
    """,
)
def tpcds_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q22 (average quantity on hand by item hierarchy ROLLUP
    over a year of inventory — the matrix row's q18-rollup + integer-
    moments shape, now on the REAL inventory relation). AVG is carried
    as exact moments (COUNT + SUM) per the q18 discipline so rollup
    super-aggregates compare bit-exactly; the year's week set comes
    from date_dim (identical on both engines). 100 TB: inventory is
    week×item×warehouse grain — the rollup Expand multiplies aggregate
    inputs only; item broadcasts."""
    wk96 = (
        _date_dim(spark, sf_dir)
        .filter(F.col("d_year") == 1996)
        .select("d_week_seq")
        .distinct()
    )
    inv = _inventory(spark, sf_dir, weeks=wk96)
    it = _item(spark, sf_dir).select("i_item_sk", "i_category", "i_brand")
    j = inv.join(F.broadcast(it), F.col("inv_item_sk") == it.i_item_sk)
    out = (
        j.rollup("i_category", "i_brand")
        .agg(
            (F.grouping("i_category") + 2 * F.grouping("i_brand")).alias(
                "gid"
            ),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("inv_qoh").alias("qoh"),
        )
        .select(
            F.col("i_category").alias("category"),
            F.col("i_brand").alias("brand"),
            "gid",
            "n",
            "qoh",
        )
    )
    return ordered(out, "category", "brand", "gid", "n", "qoh")


def _inv_band_items(
    spark: SparkSession,
    sf_dir: str,
    chan: str,
    price_lo: int,
    price_hi: int,
    year: int,
) -> DataFrame:
    """Shared body for q37 (catalog) / q82 (store): items in a price
    band whose on-hand inventory sits in [100, 500] somewhere in the
    target year, AND which actually sold through the channel — the
    matrix row's broadcast-semi gate + q21 band. DISTINCT item output.
    100 TB: the inventory band and price band prune dimension-side;
    the only fact touch is a LEFT SEMI (existence), which AQE
    broadcasts when the surviving item set is small."""
    it = _item(spark, sf_dir).filter(
        F.col("i_price_cents").between(price_lo, price_hi)
    )
    wk = (
        _date_dim(spark, sf_dir)
        .filter(F.col("d_year") == year)
        .select("d_week_seq")
        .distinct()
    )
    inv = _inventory(spark, sf_dir, weeks=wk).filter(
        F.col("inv_qoh").between(100, 500)
    )
    stocked = (
        inv.select(F.col("inv_item_sk").alias("i_item_sk")).distinct()
    )
    gated = it.join(stocked, "i_item_sk", "left_semi")
    sold = _channel(spark, sf_dir, chan).filter(F.year("sold_date") == year)
    out = gated.join(
        sold, gated.i_item_sk == sold.item_sk, "left_semi"
    ).select("i_item_sk", "i_brand", "i_price_cents")
    return ordered(out, "i_item_sk", "i_brand", "i_price_cents")


def _inv_band_sql(chan_table: str, price_lo: int, price_hi: int, year: int) -> str:
    return f"""
    SELECT DISTINCT i_item_sk, i_brand, i_price_cents
    FROM item
    WHERE i_price_cents BETWEEN {price_lo} AND {price_hi}
      AND i_item_sk IN (
        SELECT inv_item_sk FROM inventory
        WHERE inv_qoh BETWEEN 100 AND 500
          AND inv_week_seq IN (SELECT d_week_seq FROM date_dim
                               WHERE d_year = {year}))
      AND i_item_sk IN (
        SELECT item_sk FROM {chan_table}
        WHERE YEAR(sold_date) = {year})
    ORDER BY i_item_sk NULLS LAST, i_brand NULLS LAST,
             i_price_cents NULLS LAST
    """


@query(
    "tpcds_q37",
    oracle="WITH " + _DS_SQL + _INV_SQL
    + _inv_band_sql("catalog_sales", 50000, 150000, 1996),
)
def tpcds_q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q37 (catalog-channel items in a price band with on-hand
    inventory in [100, 500] during the year, that actually sold). See
    _inv_band_items for the shared plan discipline."""
    return _inv_band_items(spark, sf_dir, "catalog", 50000, 150000, 1996)


@query(
    "tpcds_q82",
    oracle="WITH " + _DS_SQL + _INV_SQL
    + _inv_band_sql("store_sales", 95000, 98000, 1995),
)
def tpcds_q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q82 (store twin of Q37: price-banded items with banded
    inventory that sold through the store channel). See
    _inv_band_items."""
    return _inv_band_items(spark, sf_dir, "store", 95000, 98000, 1995)


@query(
    "tpcds_q72",
    oracle="WITH "
    + _DS_SQL
    + _INV_SQL
    + """
    SELECT cs.item_sk AS item, d.d_week_seq AS week_seq,
           CAST(COUNT(*) AS BIGINT) AS total_cnt,
           CAST(SUM(CASE WHEN cs.order_sk % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS promo,
           CAST(SUM(CASE WHEN cs.order_sk % 5 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS no_promo
    FROM catalog_sales cs
    JOIN date_dim d ON cs.sold_date = d.d_date
    JOIN inventory inv
      ON inv.inv_item_sk = cs.item_sk
     AND inv.inv_wh_sk = cs.store_sk % 4
     AND inv.inv_week_seq = d.d_week_seq + 1
    WHERE d.d_year = 1996 AND inv.inv_qoh < cs.qty
    GROUP BY cs.item_sk, d.d_week_seq
    ORDER BY item NULLS LAST, week_seq NULLS LAST, total_cnt NULLS LAST,
             promo NULLS LAST, no_promo NULLS LAST
    """,
)
def tpcds_q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q72 (catalog demand that next week's warehouse stock
    cannot cover, split by promotion — the inventory-on-hand date-
    spine join that was the one fixture-blocked row). Substitutions:
    warehouse = store_sk % 4, promotion flag = order_sk % 5 == 0 (the
    reference's promotion dim is a key-gated flag — same conditional-
    count shape). The spine: each sale resolves its week through
    date_dim, then probes NEXT week's inventory snapshot for the same
    (item, warehouse); the out-of-stock predicate inv_qoh < qty rides
    the join. 100 TB: the sale-week resolution is a broadcast; the
    inventory probe co-shuffles on (item, wh, week) — key grain, never
    all-pairs; counts are map-side combinable."""
    cs = _channel(spark, sf_dir, "catalog")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1996)
    # the probe touches NEXT week's snapshots only: scope the synth to
    # {sale week + 1} so the fan-out builds the probed slice, not the
    # whole spine (see _inventory's weeks contract)
    wk_needed = dd.select(
        (F.col("d_week_seq") + 1).alias("d_week_seq")
    ).distinct()
    inv = _inventory(spark, sf_dir, weeks=wk_needed)
    j = (
        cs.join(F.broadcast(dd), cs.sold_date == dd.d_date)
        .join(
            inv,
            (inv.inv_item_sk == cs.item_sk)
            & (inv.inv_wh_sk == cs.store_sk % 4)
            & (inv.inv_week_seq == dd.d_week_seq + 1),
        )
        .filter(F.col("inv_qoh") < F.col("qty"))
    )
    promo = F.col("order_sk") % 5 == 0
    out = (
        j.groupBy(
            F.col("item_sk").alias("item"),
            F.col("d_week_seq").alias("week_seq"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_cnt"),
            F.sum(F.when(promo, 1).otherwise(0)).cast("long").alias("promo"),
            F.sum(F.when(~promo, 1).otherwise(0))
            .cast("long")
            .alias("no_promo"),
        )
    )
    return ordered(out, "item", "week_seq", "total_cnt", "promo", "no_promo")


@query(
    "tpcds_q24",
    oracle="WITH "
    + _DS_SQL
    + """,
    cls96 AS (
      -- INDEPENDENT FORM (round 13): the Spark side gates with a
      -- LEFT SEMI join (the oracle previously used the same-shaped
      -- EXISTS); this side materializes the distinct (customer,
      -- class) pairs and INNER-joins them — set-join algebra instead
      -- of correlated existence, same rows because the pair set is
      -- distinct (no fan-out)
      SELECT DISTINCT cust_sk, item_sk % 100 AS cls
      FROM catalog_sales WHERE YEAR(sold_date) = 1996
    ),
    paid AS (
      SELECT sr.cust_sk, i_brand AS brand, SUM(sr.net_cp) AS paid_cp
      FROM store_sales sr
      JOIN cls96 ON cls96.cust_sk = sr.cust_sk
                AND cls96.cls = sr.item_sk % 100
      JOIN item ON sr.item_sk = i_item_sk
      WHERE sr.returned AND YEAR(sr.sold_date) = 1996
      GROUP BY sr.cust_sk, i_brand
    )
    -- global-total gate via window functions, not a 1-row cross join
    SELECT cust_sk AS cust, brand, paid_cp
    FROM (SELECT cust_sk, brand, paid_cp,
                 SUM(paid_cp) OVER () AS g_sum,
                 CAST(COUNT(*) OVER () AS BIGINT) AS g_n
          FROM paid)
    WHERE 20 * paid_cp * g_n > g_sum
    ORDER BY cust NULLS LAST, brand NULLS LAST, paid_cp NULLS LAST
    """,
)
def tpcds_q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q24 (customers whose returned-merchandise refund for a
    brand exceeds 5 % of the average refund — the matrix row's q17
    sale→return→cross-channel chain composed with q70's global-total
    HAVING). The cross-channel leg is the q17 class-grain existence
    (cust, item_sk % 100) semi-join; the 5 %-of-average gate
    cross-multiplies to exact integers (20·paid·g_n > g_sum) and
    attaches as a 1-row broadcast (bounded BNLJ, linter-sanctioned).
    100 TB: one shuffle to (cust, brand) grain; the global total is a
    second pass over the GROUPED output, not the fact."""
    sr = _channel(spark, sf_dir, "store").filter(
        F.col("returned") & (F.year("sold_date") == 1996)
    )
    cs = (
        _channel(spark, sf_dir, "catalog")
        .filter(F.year("sold_date") == 1996)
        .select("cust_sk", (F.col("item_sk") % 100).alias("item_cls"))
    )
    sr = sr.withColumn("item_cls", F.col("item_sk") % 100).join(
        cs, ["cust_sk", "item_cls"], "left_semi"
    )
    it = _item(spark, sf_dir).select("i_item_sk", "i_brand")
    paid = (
        sr.join(F.broadcast(it), sr.item_sk == it.i_item_sk)
        .groupBy(F.col("cust_sk"), F.col("i_brand").alias("brand"))
        .agg(F.sum("net_cp").alias("paid_cp"))
    )
    tot = paid.agg(
        F.sum("paid_cp").alias("g_sum"),
        F.count(F.lit(1)).cast("long").alias("g_n"),
    )
    out = paid.join(
        F.broadcast(tot),
        20 * F.col("paid_cp") * F.col("g_n") > F.col("g_sum"),
    ).select(F.col("cust_sk").alias("cust"), "brand", "paid_cp")
    return ordered(out, "cust", "brand", "paid_cp")


@query(
    "tpcds_q25",
    oracle="WITH "
    + _DS_SQL
    + """,
    sold AS (
      SELECT item_sk, SUM(profit_cp) AS sold_profit
      FROM store_sales WHERE NOT returned AND YEAR(sold_date) = 1998
      GROUP BY item_sk
    ),
    ret AS (
      SELECT item_sk, SUM(net_cp) AS ret_net
      FROM store_sales WHERE returned AND YEAR(sold_date) = 1998
      GROUP BY item_sk
    ),
    rebought AS (
      SELECT item_sk, SUM(profit_cp) AS cat_profit
      FROM catalog_sales WHERE YEAR(sold_date) IN (1998, 1999)
      GROUP BY item_sk
    )
    SELECT s.item_sk AS item, s.sold_profit, r.ret_net, b.cat_profit
    FROM sold s
    JOIN ret r ON s.item_sk = r.item_sk
    JOIN rebought b ON s.item_sk = b.item_sk
    ORDER BY item NULLS LAST, sold_profit NULLS LAST, ret_net NULLS LAST,
             cat_profit NULLS LAST
    """,
)
def tpcds_q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q25 (q29's buy → return → catalog-re-buy chain with SUM
    of money for SUM of quantity, per the matrix row): three
    per-channel item aggregates — store profit, returned net, catalog
    profit — joined on the item key. 100 TB: all three aggregates
    shuffle on the SAME key; AQE co-partitions the joins."""
    ss = _channel(spark, sf_dir, "store")
    y = F.year("sold_date")
    sold = (
        ss.filter(~F.col("returned") & (y == 1998))
        .groupBy("item_sk")
        .agg(F.sum("profit_cp").alias("sold_profit"))
    )
    ret = (
        ss.filter(F.col("returned") & (y == 1998))
        .groupBy("item_sk")
        .agg(F.sum("net_cp").alias("ret_net"))
    )
    rebought = (
        _channel(spark, sf_dir, "catalog")
        .filter(y.isin(1998, 1999))
        .groupBy("item_sk")
        .agg(F.sum("profit_cp").alias("cat_profit"))
    )
    out = (
        sold.join(ret, on="item_sk")
        .join(rebought, on="item_sk")
        .select(
            F.col("item_sk").alias("item"),
            "sold_profit",
            "ret_net",
            "cat_profit",
        )
    )
    return ordered(out, "item", "sold_profit", "ret_net", "cat_profit")


@query(
    "tpcds_q27",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT s_state AS state, store_sk AS store,
           GROUPING(s_state) + 2 * GROUPING(store_sk) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(qty) AS qty, SUM(qty * qty) AS qty_sq,
           SUM(ext_cents) AS ext
    FROM store_sales
    JOIN customer ON cust_sk = c_custkey
    JOIN store ON store_sk = s_store_sk
    WHERE YEAR(sold_date) = 1997 AND c_mktsegment = 'HOUSEHOLD'
    GROUP BY ROLLUP(s_state, store_sk)
    ORDER BY state NULLS LAST, store NULLS LAST, gid NULLS LAST,
             n NULLS LAST, qty NULLS LAST, qty_sq NULLS LAST, ext NULLS LAST
    """,
)
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q27 (store demographics report: quantity/price moments
    per ROLLUP over the STORE geography axis — the matrix row's q18
    rollup transplanted from the customer axis to state/store). AVGs
    carried as exact integer moments; GROUPING() ids disambiguate
    rollup NULLs. 100 TB: customer and the 12-row store dim broadcast;
    the Expand multiplies aggregate inputs only."""
    ss = _channel(spark, sf_dir, "store").filter(F.year("sold_date") == 1997)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "HOUSEHOLD"
    )
    st = _store(spark)
    j = ss.join(F.broadcast(cust), ss.cust_sk == cust.c_custkey).join(
        F.broadcast(st), ss.store_sk == st.s_store_sk
    )
    out = (
        j.rollup("s_state", "store_sk")
        .agg(
            (F.grouping("s_state") + 2 * F.grouping("store_sk")).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").alias("qty"),
            F.sum(F.col("qty") * F.col("qty")).alias("qty_sq"),
            F.sum("ext_cents").alias("ext"),
        )
        .select(
            F.col("s_state").alias("state"),
            F.col("store_sk").alias("store"),
            "gid",
            "n",
            "qty",
            "qty_sq",
            "ext",
        )
    )
    return ordered(out, "state", "store", "gid", "n", "qty", "qty_sq", "ext")


@query(
    "tpcds_q30",
    oracle="WITH "
    + _DS_SQL
    + """,
    ctr AS (
      SELECT w.cust_sk, c_nationkey AS nation, SUM(w.net_cp) AS ctr_total
      FROM web_sales w JOIN customer ON w.cust_sk = c_custkey
      WHERE w.returned AND YEAR(w.sold_date) = 1996
      GROUP BY w.cust_sk, c_nationkey
    ),
    win AS (
      SELECT cust_sk, nation, ctr_total,
             SUM(ctr_total) OVER (PARTITION BY nation) AS nat_sum,
             CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS nat_n
      FROM ctr
    )
    SELECT cust_sk AS cust, nation, ctr_total
    FROM win
    WHERE 5 * nat_n * ctr_total > 6 * nat_sum
    ORDER BY cust NULLS LAST, nation NULLS LAST, ctr_total NULLS LAST
    """,
)
def tpcds_q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q30 (customers whose WEB return total exceeds 1.2× their
    geography's per-customer average — the matrix row: q1's
    decorrelated window gate on the web returns slice, geography for
    store). Same rewrite: the correlated AVG decorrelates to
    SUM/COUNT windows partitioned by nation over the one per-(cust,
    nation) aggregate; 1.2× cross-multiplies exactly. 100 TB: one
    shuffle to (cust, nation); the window re-uses the nation prefix;
    customer broadcasts."""
    ws = _channel(spark, sf_dir, "web").filter(
        F.col("returned") & (F.year("sold_date") == 1996)
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    ctr = (
        ws.join(F.broadcast(cust), ws.cust_sk == cust.c_custkey)
        .groupBy("cust_sk", F.col("c_nationkey").alias("nation"))
        .agg(F.sum("net_cp").alias("ctr_total"))
    )
    w = Window.partitionBy("nation")
    out = (
        ctr.select(
            "*",
            F.sum("ctr_total").over(w).alias("nat_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("nat_n"),
        )
        .filter(5 * F.col("nat_n") * F.col("ctr_total") > 6 * F.col("nat_sum"))
        .select(F.col("cust_sk").alias("cust"), "nation", "ctr_total")
    )
    return ordered(out, "cust", "nation", "ctr_total")


def _three_channel_sum(
    spark: SparkSession,
    sf_dir: str,
    item_pred,
    year: int,
    moy: int,
    group_col: str,
    group_alias: str,
) -> DataFrame:
    """Shared body for q33/q56 (q60's 3-channel union shape with a
    different item gate and output grain). Each channel aggregates its
    slice before the union; the re-aggregate sees 3 small inputs.
    100 TB: item and the month's date_dim broadcast into each branch;
    Spark reuses the shared sales exchange under AQE."""
    dd = _date_dim(spark, sf_dir).filter(
        (F.col("d_year") == year) & (F.col("d_moy") == moy)
    )
    it = _item(spark, sf_dir).filter(item_pred)

    def branch(chan: str) -> DataFrame:
        c = _channel(spark, sf_dir, chan)
        return (
            c.join(F.broadcast(it), c.item_sk == it.i_item_sk)
            .join(F.broadcast(dd), c.sold_date == dd.d_date)
            .groupBy(F.col(group_col).alias(group_alias))
            .agg(F.sum("ext_cents").alias("total_cents"))
        )

    uni = branch("store").unionByName(branch("catalog")).unionByName(
        branch("web")
    )
    out = uni.groupBy(group_alias).agg(
        F.sum("total_cents").alias("total_cents")
    )
    return ordered(out, group_alias, "total_cents")


def _three_channel_sum_sql(
    part_where: str, year: int, moy: int, group_expr: str, group_alias: str
) -> str:
    """INDEPENDENT FORM (round 13): the Spark side unions three
    per-channel aggregates through the item/date_dim views; the
    channels PARTITION the fact, so the union re-aggregated equals ONE
    pass over the unified ``sales`` — computed here with item
    attributes derived from raw ``part`` and dates via direct
    YEAR/MONTH, bypassing the shared channel/item/date_dim prelude
    views entirely."""
    return f"""
    SELECT {group_expr} AS {group_alias}, SUM(s.ext_cents) AS total_cents
    FROM sales s JOIN part ON s.item_sk = p_partkey
    WHERE {part_where}
      AND YEAR(s.sold_date) = {year} AND MONTH(s.sold_date) = {moy}
    GROUP BY {group_expr}
    ORDER BY {group_alias} NULLS LAST, total_cents NULLS LAST
    """


@query(
    "tpcds_q33",
    oracle="WITH " + _DS_SQL
    + _three_channel_sum_sql(
        "p_type = 'PROMO'", 1998, 3, "p_partkey % 1000", "manufact"
    ),
)
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q33 (per-MANUFACTURER revenue for one category-month
    summed across the three channels — the matrix row's q60 shape at
    manufacturer grain). See _three_channel_sum."""
    return _three_channel_sum(
        spark, sf_dir, F.col("i_category") == "PROMO", 1998, 3,
        "i_manufact_id", "manufact",
    )


@query(
    "tpcds_q56",
    oracle="WITH " + _DS_SQL
    + _three_channel_sum_sql(
        "('c' || CAST(p_partkey % 8 AS VARCHAR)) IN ('c1', 'c3', 'c5')",
        1997, 6, "s.item_sk", "item",
    ),
)
def tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q56 (per-item revenue for a CLASS subset — the
    reference's color in-list — for one month, summed across the three
    channels; q60's shape with the other dimension gate). See
    _three_channel_sum."""
    return _three_channel_sum(
        spark, sf_dir, F.col("i_class").isin("c1", "c3", "c5"), 1997, 6,
        "item_sk", "item",
    )


@query(
    "tpcds_q43",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT store_sk AS store,
           SUM(CASE WHEN d_dow = 0 THEN ext_cents ELSE 0 END) AS sun_sales,
           SUM(CASE WHEN d_dow = 1 THEN ext_cents ELSE 0 END) AS mon_sales,
           SUM(CASE WHEN d_dow = 2 THEN ext_cents ELSE 0 END) AS tue_sales,
           SUM(CASE WHEN d_dow = 3 THEN ext_cents ELSE 0 END) AS wed_sales,
           SUM(CASE WHEN d_dow = 4 THEN ext_cents ELSE 0 END) AS thu_sales,
           SUM(CASE WHEN d_dow = 5 THEN ext_cents ELSE 0 END) AS fri_sales,
           SUM(CASE WHEN d_dow = 6 THEN ext_cents ELSE 0 END) AS sat_sales
    FROM store_sales JOIN date_dim ON sold_date = d_date
    WHERE d_year = 1996
    GROUP BY store_sk
    ORDER BY store NULLS LAST
    """,
)
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q43 (per-store revenue pivoted by day of week — the
    day-of-week census that was blocked on the dow divergence edge,
    now riding _date_dim's cross-engine-exact d_dow). Conditional
    aggregation produces all seven day columns in ONE fact pass.
    100 TB: the dow tag rides the broadcast date_dim; one shuffle to
    store grain."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1996)
    j = ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
    out = j.groupBy(F.col("store_sk").alias("store")).agg(
        *[
            F.sum(
                F.when(F.col("d_dow") == i, F.col("ext_cents")).otherwise(0)
            ).alias(f"{n}_sales")
            for i, n in enumerate(_DOW_NAMES)
        ]
    )
    return ordered(out, "store")


@query(
    "tpcds_q96",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT d_dow AS dow, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM store_sales JOIN date_dim ON sold_date = d_date
    WHERE d_year = 1996 AND qty BETWEEN 20 AND 40
    GROUP BY d_dow
    ORDER BY dow NULLS LAST, cnt NULLS LAST
    """,
)
def tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q96 (the store-traffic count census at a fixed schedule
    slot — the reference counts 8-8:30pm household-demographic sales;
    the fixtures carry no time-of-day, so the slot axis is the
    cross-engine-exact d_dow and the demographic band is the quantity
    band). Grouping by dow keeps the census non-degenerate (a single
    global count would hash-match trivially). 100 TB: broadcast date
    gate, one tiny 7-group aggregate."""
    ss = _channel(spark, sf_dir, "store").filter(
        F.col("qty").between(20, 40)
    )
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == 1996)
    out = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .groupBy(F.col("d_dow").alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return ordered(out, "dow", "cnt")


@query(
    "tpcds_q40",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT site_sk AS wh, item_sk AS item,
           SUM(CASE WHEN sold_date < TIMESTAMP '1996-07-01 00:00:00'
                    THEN CASE WHEN returned THEN -net_cp ELSE net_cp END
                    ELSE 0 END) AS before_net,
           SUM(CASE WHEN sold_date >= TIMESTAMP '1996-07-01 00:00:00'
                    THEN CASE WHEN returned THEN -net_cp ELSE net_cp END
                    ELSE 0 END) AS after_net
    FROM catalog_sales JOIN item ON item_sk = i_item_sk
    WHERE YEAR(sold_date) = 1996
      AND i_price_cents BETWEEN 92000 AND 98000
    GROUP BY site_sk, item_sk
    ORDER BY wh NULLS LAST, item NULLS LAST, before_net NULLS LAST,
             after_net NULLS LAST
    """,
)
def tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q40 (catalog revenue by warehouse/item before and after
    a pivot date, with returns NETTED line-level — the matrix row's
    q21 temporal buckets composed with q75's returns netting). The
    reference LEFT-joins catalog_returns and subtracts refunds; the
    fixtures' returns feed is the flag, so the netting is a signed
    CASE inside the same conditional aggregation that buckets the
    dates — ONE fact pass, no join. 100 TB: price band prunes
    dimension-side; one shuffle to (warehouse, item)."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        F.year("sold_date") == 1996
    )
    it = _item(spark, sf_dir).filter(
        F.col("i_price_cents").between(92000, 98000)
    )
    pivot = F.lit("1996-07-01").cast("timestamp")
    signed = F.when(F.col("returned"), -F.col("net_cp")).otherwise(
        F.col("net_cp")
    )
    out = (
        cs.join(F.broadcast(it), cs.item_sk == it.i_item_sk)
        .groupBy(
            F.col("site_sk").alias("wh"), F.col("item_sk").alias("item")
        )
        .agg(
            F.sum(
                F.when(F.col("sold_date") < pivot, signed).otherwise(0)
            ).alias("before_net"),
            F.sum(
                F.when(F.col("sold_date") >= pivot, signed).otherwise(0)
            ).alias("after_net"),
        )
    )
    return ordered(out, "wh", "item", "before_net", "after_net")


def _monthly_deviation(
    spark: SparkSession,
    sf_dir: str,
    item_pred,
    year: int,
    group_col: str,
) -> DataFrame:
    """Shared body for q53/q63 (q89's windowed-average deviation at a
    different grain + item gate): monthly sums per item-attribute
    group, window AVG per group, keep months deviating >10 %. AVG of
    exact BIGINTs — both engines divide identical integers. 100 TB:
    one grouped shuffle; the window re-uses the group prefix."""
    ss = _channel(spark, sf_dir, "store")
    dd = _date_dim(spark, sf_dir).filter(F.col("d_year") == year)
    it = _item(spark, sf_dir).filter(item_pred)
    ms = (
        ss.join(F.broadcast(dd), ss.sold_date == dd.d_date)
        .join(F.broadcast(it), ss.item_sk == it.i_item_sk)
        .groupBy(group_col, "d_moy")
        .agg(F.sum("net_cp").alias("net"))
    )
    w = Window.partitionBy(group_col)
    out = (
        ms.withColumn("avg_monthly", F.avg("net").over(w))
        .filter(
            (F.col("avg_monthly") > 0)
            & (
                F.abs(F.col("net") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.1
            )
        )
        .select(group_col, "d_moy", "net", "avg_monthly")
    )
    return ordered(out, group_col, "d_moy")


def _monthly_deviation_sql(item_where: str, year: int, group_col: str) -> str:
    return f""",
    ms AS (
      SELECT {group_col}, d_moy, SUM(net_cp) AS net
      FROM store_sales
      JOIN date_dim ON sold_date = d_date
      JOIN item ON item_sk = i_item_sk
      WHERE d_year = {year} AND {item_where}
      GROUP BY {group_col}, d_moy
    )
    SELECT {group_col}, d_moy, net, avg_monthly
    FROM (
      SELECT {group_col}, d_moy, net,
             AVG(net) OVER (PARTITION BY {group_col}) AS avg_monthly
      FROM ms
    )
    WHERE avg_monthly > 0 AND ABS(net - avg_monthly) / avg_monthly > 0.1
    ORDER BY {group_col}, d_moy
    """


@query(
    "tpcds_q53",
    oracle="WITH " + _DS_SQL
    + _monthly_deviation_sql("i_manufact_id % 50 = 3", 1996, "i_manufact_id"),
)
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q53 (manufacturer-months deviating >10 % from the
    manufacturer's average — the matrix row's q89 deviation shape at
    manufacturer grain with the reference's manufact-id modulus gate).
    See _monthly_deviation."""
    return _monthly_deviation(
        spark, sf_dir, F.col("i_manufact_id") % 50 == 3, 1996,
        "i_manufact_id",
    )


@query(
    "tpcds_q63",
    oracle="WITH " + _DS_SQL
    + _monthly_deviation_sql("i_category = 'STANDARD'", 1997, "i_brand"),
)
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q63 (manager/brand twin of Q53: brand-months deviating
    >10 % from the brand average within one category). See
    _monthly_deviation."""
    return _monthly_deviation(
        spark, sf_dir, F.col("i_category") == "STANDARD", 1997, "i_brand"
    )


@query(
    "tpcds_q64",
    oracle="WITH "
    + _DS_SQL
    + """,
    yrs AS (
      -- INDEPENDENT FORM (round 13): the Spark side self-joins two
      -- year slices of one grouped aggregate; this side pivots both
      -- years in ONE conditional-FILTER pass and expresses the
      -- "present in both years" the inner join implied as cnt>0 —
      -- a shared misreading of the self-join shape cannot hash-match
      SELECT item_sk % 100 AS cls,
             CAST(COUNT(*) FILTER (WHERE YEAR(sold_date) = 1995)
                  AS BIGINT) AS cnt1,
             CAST(COUNT(*) FILTER (WHERE YEAR(sold_date) = 1996)
                  AS BIGINT) AS cnt2,
             SUM(net_cp) FILTER (WHERE YEAR(sold_date) = 1995) AS net1,
             SUM(net_cp) FILTER (WHERE YEAR(sold_date) = 1996) AS net2
      FROM store_sales
      WHERE NOT returned AND YEAR(sold_date) IN (1995, 1996)
      GROUP BY item_sk % 100
    )
    SELECT cls, cnt1, cnt2, net1, net2
    FROM yrs y
    WHERE cnt1 > 0 AND cnt2 > 0 AND cnt2 >= cnt1
      AND EXISTS (SELECT 1 FROM catalog_sales cs
                  WHERE cs.returned AND YEAR(cs.sold_date) = 1996
                    AND cs.item_sk % 100 = y.cls)
    ORDER BY cls NULLS LAST, cnt1 NULLS LAST, cnt2 NULLS LAST,
             net1 NULLS LAST, net2 NULLS LAST
    """,
)
def tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64 (the composite: item classes bought in consecutive
    years where the second year's volume held up, gated on a
    cross-channel return — the matrix row composes the q17 chain key
    (item class), the q4 year-pair comparison, and the q46 pre-
    aggregate-before-join discipline). The reference's 2-purchase
    self-join of a 12-dimension CTE keeps its STRUCTURE: aggregate
    once to (class, year) grain, self-join the two years, gate on the
    returns channel. 100 TB: both self-join sides come from the SAME
    grouped shuffle (exchange reuse); the returns gate is a broadcast
    semi of a dimension-sized distinct."""
    ss = _channel(spark, sf_dir, "store").filter(
        ~F.col("returned") & F.year("sold_date").isin(1995, 1996)
    )
    s = ss.groupBy(
        (F.col("item_sk") % 100).alias("cls"),
        F.year("sold_date").alias("y"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("net_cp").alias("net"),
    )
    rep = (
        _channel(spark, sf_dir, "catalog")
        .filter((F.year("sold_date") == 1996) & F.col("returned"))
        .select((F.col("item_sk") % 100).alias("cls"))
        .distinct()
    )
    s1 = s.filter(F.col("y") == 1995).alias("s1")
    s2 = s.filter(F.col("y") == 1996).alias("s2")
    out = (
        s1.join(s2, F.col("s1.cls") == F.col("s2.cls"))
        .filter(F.col("s2.cnt") >= F.col("s1.cnt"))
        .join(F.broadcast(rep), F.col("s1.cls") == rep.cls, "left_semi")
        .select(
            F.col("s1.cls").alias("cls"),
            F.col("s1.cnt").alias("cnt1"),
            F.col("s2.cnt").alias("cnt2"),
            F.col("s1.net").alias("net1"),
            F.col("s2.net").alias("net2"),
        )
    )
    return ordered(out, "cls", "cnt1", "cnt2", "net1", "net2")


@query(
    "tpcds_q68",
    oracle="WITH "
    + _DS_SQL
    + """,
    tickets AS (
      SELECT order_sk, cust_sk, store_sk,
             SUM(ext_cents) AS amt, SUM(profit_cp) AS profit
      FROM store_sales
      WHERE YEAR(sold_date) = 1997
      GROUP BY order_sk, cust_sk, store_sk
    )
    SELECT cust_sk AS cust, order_sk AS ticket, amt, profit
    FROM tickets
    JOIN store ON store_sk = s_store_sk
    JOIN customer ON cust_sk = c_custkey
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND s_state <> CASE c_nationkey % 6
                       WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'TX'
                       WHEN 3 THEN 'NY' WHEN 4 THEN 'OH' ELSE 'GA' END
      AND amt > 400000
    ORDER BY cust NULLS LAST, ticket NULLS LAST, amt NULLS LAST,
             profit NULLS LAST
    """,
)
def tpcds_q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q68 (q46's city variant, per the matrix row:
    out-of-town big-ticket shoppers in target demographic segments).
    Same ticket-rollup-first discipline as q46, plus the segment gate
    and the ticket-amount band the reference's extended_price filter
    supplies. 100 TB: one shuffle to ticket grain; dims broadcast; the
    amount band filters the ROLLUP, not the fact."""
    ss = _channel(spark, sf_dir, "store").filter(F.year("sold_date") == 1997)
    tickets = (
        ss.groupBy("order_sk", "cust_sk", "store_sk")
        .agg(
            F.sum("ext_cents").alias("amt"),
            F.sum("profit_cp").alias("profit"),
        )
        .filter(F.col("amt") > 400000)
    )
    st = _store(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    home = F.element_at(
        F.array(*[F.lit(s) for s in _STATES]),
        (F.col("c_nationkey") % 6 + 1).cast("int"),
    )
    out = (
        tickets.join(F.broadcast(st), tickets.store_sk == st.s_store_sk)
        .join(F.broadcast(cust), tickets.cust_sk == cust.c_custkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            & (F.col("s_state") != home)
        )
        .select(
            F.col("cust_sk").alias("cust"),
            F.col("order_sk").alias("ticket"),
            "amt",
            "profit",
        )
    )
    return ordered(out, "cust", "ticket", "amt", "profit")


@query(
    "tpcds_q71",
    oracle="""
    SELECT event_type, HOUR(ts) AS hh, CAST(COUNT(*) AS BIGINT) AS cnt,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS amt_cents
    FROM events
    WHERE HOUR(ts) BETWEEN 6 AND 11 OR HOUR(ts) BETWEEN 18 AND 23
    GROUP BY event_type, HOUR(ts)
    ORDER BY event_type NULLS LAST, hh NULLS LAST, cnt NULLS LAST,
             amt_cents NULLS LAST
    """,
)
def tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q71 (brand revenue by hour across the am/pm windows —
    the matrix row's q90 hour census composed with q76's channel
    union). The events stream stands in for the three channels' time
    joins (the fixtures' sales carry no time-of-day); event_type plays
    the channel axis, the am/pm windows come straight from the
    reference, and money follows the FLOOR(x*100+0.5) cent discipline.
    One conditional scan, one (type, hour) aggregate — no join.
    100 TB: hour(ts) is not a parquet-convertible predicate (it prunes
    nothing at the scan on any engine), and the events table's
    nanos-timestamp guard blocks the inferred isnotnull from pushing —
    the lint allowance documents this computed-predicate class."""
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    out = (
        ev.filter(h.between(6, 11) | h.between(18, 23))
        .groupBy("event_type", h.alias("hh"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("amt_cents"),
        )
    )
    return ordered(out, "event_type", "hh", "cnt", "amt_cents")


@query(
    "tpcds_q80",
    oracle="WITH "
    + _DS_SQL
    + """,
    labeled AS (
      SELECT CASE WHEN chan <= 1 THEN 'store'
                  WHEN chan = 2 THEN 'catalog' ELSE 'web' END AS channel,
             i_category, returned, ext_cents, profit_cp
      FROM sales JOIN item ON item_sk = i_item_sk
      WHERE YEAR(sold_date) = 1997
    ),
    detail AS (
      SELECT channel, i_category,
             SUM(CASE WHEN returned THEN 0 ELSE ext_cents END)
               AS sales_cents,
             SUM(CASE WHEN returned THEN ext_cents ELSE 0 END)
               AS ret_cents,
             SUM(profit_cp) AS profit_cp
      FROM labeled GROUP BY channel, i_category
    )
    -- INDEPENDENT FORM (round 13): the Spark side GROUP BY
    -- ROLLUP(channel, i_category) + GROUPING() ids; this side spells
    -- the three grouping levels out as explicit UNION ALL
    -- re-aggregations of the detail grain, with the gid literals the
    -- GROUPING arithmetic would produce (0, 2, 3)
    SELECT channel, i_category, 0 AS gid,
           sales_cents, ret_cents, profit_cp
    FROM detail
    UNION ALL
    SELECT channel, NULL, 2, SUM(sales_cents), SUM(ret_cents),
           SUM(profit_cp)
    FROM detail GROUP BY channel
    UNION ALL
    SELECT NULL, NULL, 3, SUM(sales_cents), SUM(ret_cents),
           SUM(profit_cp)
    FROM detail
    ORDER BY channel NULLS LAST, i_category NULLS LAST, gid NULLS LAST,
             sales_cents NULLS LAST, ret_cents NULLS LAST,
             profit_cp NULLS LAST
    """,
)
def tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q80 (the channel P&L report at channel × item grain with
    a ROLLUP — the matrix row composes q5's channel rollup with q77's
    per-channel ratios axis). Same union-collapse as q5: the unified
    fact already carries the channel, so the reference's three
    salesreturns CTEs become one labeled pass; returns split by flag;
    GROUPING() ids disambiguate subtotal rows. 100 TB: item
    broadcasts; the rollup Expand multiplies aggregate input only; the
    aggregate is map-side combinable at every level."""
    s = _sales(spark, sf_dir).filter(F.year("sold_date") == 1997)
    it = _item(spark, sf_dir).select("i_item_sk", "i_category")
    channel = (
        F.when(F.col("chan") <= 1, "store")
        .when(F.col("chan") == 2, "catalog")
        .otherwise("web")
    )
    out = (
        s.join(F.broadcast(it), s.item_sk == it.i_item_sk)
        .withColumn("channel", channel)
        .rollup("channel", "i_category")
        .agg(
            (F.grouping("channel") + 2 * F.grouping("i_category")).alias(
                "gid"
            ),
            F.sum(
                F.when(F.col("returned"), 0).otherwise(F.col("ext_cents"))
            ).alias("sales_cents"),
            F.sum(
                F.when(F.col("returned"), F.col("ext_cents")).otherwise(0)
            ).alias("ret_cents"),
            F.sum("profit_cp").alias("profit_cp"),
        )
    )
    return ordered(
        out, "channel", "i_category", "gid", "sales_cents", "ret_cents",
        "profit_cp",
    )


@query(
    "tpcds_q81",
    oracle="WITH "
    + _DS_SQL
    + """,
    ctr AS (
      SELECT c.cust_sk, c_nationkey AS nation, SUM(c.net_cp) AS ctr_total
      FROM catalog_sales c JOIN customer ON c.cust_sk = c_custkey
      WHERE c.returned AND YEAR(c.sold_date) = 1997
      GROUP BY c.cust_sk, c_nationkey
    ),
    win AS (
      SELECT cust_sk, nation, ctr_total,
             SUM(ctr_total) OVER (PARTITION BY nation) AS nat_sum,
             CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS nat_n
      FROM ctr
    )
    SELECT cust_sk AS cust, nation, ctr_total
    FROM win
    WHERE 5 * nat_n * ctr_total > 6 * nat_sum
    ORDER BY cust NULLS LAST, nation NULLS LAST, ctr_total NULLS LAST
    """,
)
def tpcds_q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q81 (q30's decorrelated 1.2×-average return gate on the
    CATALOG returns slice, per the matrix row — q1's window rewrite,
    third channel). One shuffle to (cust, nation); window re-uses the
    nation prefix; customer broadcasts."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        F.col("returned") & (F.year("sold_date") == 1997)
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    ctr = (
        cs.join(F.broadcast(cust), cs.cust_sk == cust.c_custkey)
        .groupBy("cust_sk", F.col("c_nationkey").alias("nation"))
        .agg(F.sum("net_cp").alias("ctr_total"))
    )
    w = Window.partitionBy("nation")
    out = (
        ctr.select(
            "*",
            F.sum("ctr_total").over(w).alias("nat_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("nat_n"),
        )
        .filter(5 * F.col("nat_n") * F.col("ctr_total") > 6 * F.col("nat_sum"))
        .select(F.col("cust_sk").alias("cust"), "nation", "ctr_total")
    )
    return ordered(out, "cust", "nation", "ctr_total")


@query(
    "tpcds_q83",
    oracle="WITH "
    + _DS_SQL
    + """,
    sr AS (SELECT item_sk, SUM(qty) AS s_qty FROM store_sales
           WHERE returned AND YEAR(sold_date) = 1996 GROUP BY item_sk),
    cr AS (SELECT item_sk, SUM(qty) AS c_qty FROM catalog_sales
           WHERE returned AND YEAR(sold_date) = 1996 GROUP BY item_sk),
    wr AS (SELECT item_sk, SUM(qty) AS w_qty FROM web_sales
           WHERE returned AND YEAR(sold_date) = 1996 GROUP BY item_sk)
    SELECT sr.item_sk AS item, s_qty, c_qty, w_qty,
           s_qty + c_qty + w_qty AS total_qty
    FROM sr
    JOIN cr ON sr.item_sk = cr.item_sk
    JOIN wr ON sr.item_sk = wr.item_sk
    WHERE 10 * ABS(3 * s_qty - (s_qty + c_qty + w_qty))
            <= 2 * (s_qty + c_qty + w_qty)
      AND 10 * ABS(3 * c_qty - (s_qty + c_qty + w_qty))
            <= 2 * (s_qty + c_qty + w_qty)
      AND 10 * ABS(3 * w_qty - (s_qty + c_qty + w_qty))
            <= 2 * (s_qty + c_qty + w_qty)
    ORDER BY item NULLS LAST, s_qty NULLS LAST, c_qty NULLS LAST,
             w_qty NULLS LAST, total_qty NULLS LAST
    """,
)
def tpcds_q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q83 (items returned in BALANCED volume through all three
    channels — the matrix row composes q75's returns netting across
    channels with q58's balance gate: every channel within ±20 % of
    the three-channel mean). The reference divides each channel by
    total/3; here the balance gate cross-multiplies to exact integers
    (10·|3x − total| ≤ 2·total ⟺ |x/(total/3) − 1| ≤ 0.2). 100 TB: the
    three per-channel aggregates shuffle on the SAME item key — AQE
    co-partitions the joins; no float crosses engines."""
    y = F.year("sold_date")

    def returns(chan: str, alias: str) -> DataFrame:
        return (
            _channel(spark, sf_dir, chan)
            .filter(F.col("returned") & (y == 1996))
            .groupBy("item_sk")
            .agg(F.sum("qty").alias(alias))
        )

    sr = returns("store", "s_qty")
    cr = returns("catalog", "c_qty")
    wr = returns("web", "w_qty")
    total = F.col("s_qty") + F.col("c_qty") + F.col("w_qty")

    def balanced(col: str):
        return 10 * F.abs(3 * F.col(col) - total) <= 2 * total

    out = (
        sr.join(cr, on="item_sk")
        .join(wr, on="item_sk")
        .filter(balanced("s_qty") & balanced("c_qty") & balanced("w_qty"))
        .select(
            F.col("item_sk").alias("item"),
            "s_qty",
            "c_qty",
            "w_qty",
            total.alias("total_qty"),
        )
    )
    return ordered(out, "item", "s_qty", "c_qty", "w_qty", "total_qty")


@query(
    "tpcds_q84",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT DISTINCT c_custkey AS cust, c_name AS name
    FROM customer
    JOIN store_sales ON cust_sk = c_custkey
    WHERE c_nationkey BETWEEN 5 AND 9
      AND c_acctbal < 2000.0
      AND returned
    ORDER BY cust NULLS LAST, name NULLS LAST
    """,
)
def tpcds_q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q84 (the customer directory listing: identities of
    customers in a geography with a low income band who returned store
    merchandise — the matrix row's synthetic-demographic join + band
    predicate shape). c_nationkey plays the city, c_acctbal the income
    band; the returned slice is the store_returns feed. The DISTINCT
    collapses the fact fan-out AFTER a semi-style join. 100 TB: the
    banded customer dim broadcasts; one fact pass; DISTINCT shuffles
    customer-grain output only."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").between(5, 9) & (F.col("c_acctbal") < 2000.0)
    )
    ss = _channel(spark, sf_dir, "store").filter(F.col("returned"))
    out = (
        ss.join(F.broadcast(cust), ss.cust_sk == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("cust"), F.col("c_name").alias("name")
        )
        .distinct()
    )
    return ordered(out, "cust", "name")


@query(
    "tpcds_q85",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT order_sk % 8 AS reason,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(qty) AS qty, SUM(qty * qty) AS qty_sq,
           SUM(net_cp) AS refund_cp
    FROM web_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE returned AND YEAR(sold_date) = 1996
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND qty BETWEEN 10 AND 40
    GROUP BY order_sk % 8
    ORDER BY reason NULLS LAST, n NULLS LAST, qty NULLS LAST,
             qty_sq NULLS LAST, refund_cp NULLS LAST
    """,
)
def tpcds_q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q85 (web returns by return REASON with demographic and
    band gates — the matrix row's q13/q35-class synthetic-demographic
    join + band predicates). The reason dimension synthesizes from the
    order key (order_sk % 8 — the reference's reason table is a small
    key-coded dim); AVGs carried as exact moments per the q18
    discipline. 100 TB: customer broadcasts; the band predicates are
    scan-local; one 8-group aggregate."""
    ws = _channel(spark, sf_dir, "web").filter(
        F.col("returned")
        & (F.year("sold_date") == 1996)
        & F.col("qty").between(10, 40)
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    out = (
        ws.join(F.broadcast(cust), ws.cust_sk == cust.c_custkey)
        .groupBy((F.col("order_sk") % 8).alias("reason"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").alias("qty"),
            F.sum(F.col("qty") * F.col("qty")).alias("qty_sq"),
            F.sum("net_cp").alias("refund_cp"),
        )
    )
    return ordered(out, "reason", "n", "qty", "qty_sq", "refund_cp")


@query(
    "tpcds_q91",
    oracle="WITH "
    + _DS_SQL
    + """
    SELECT store_sk AS call_center, c_mktsegment AS segment,
           SUM(net_cp) AS loss_cp
    FROM catalog_sales
    JOIN customer ON cust_sk = c_custkey
    WHERE returned AND YEAR(sold_date) = 1996 AND MONTH(sold_date) = 11
      AND c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')
    GROUP BY store_sk, c_mktsegment
    ORDER BY call_center NULLS LAST, segment NULLS LAST, loss_cp NULLS LAST
    """,
)
def tpcds_q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q91 (call-center losses from catalog returns in one
    month, split by customer demographic — the matrix row's
    demographic join + band shape at the call-center axis; store_sk
    plays the call center the way it plays the warehouse elsewhere).
    100 TB: customer broadcasts; month gate is scan-local; one small
    (center, segment) aggregate."""
    cs = _channel(spark, sf_dir, "catalog").filter(
        F.col("returned")
        & (F.year("sold_date") == 1996)
        & (F.month("sold_date") == 11)
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE")
    )
    out = (
        cs.join(F.broadcast(cust), cs.cust_sk == cust.c_custkey)
        .groupBy(
            F.col("store_sk").alias("call_center"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum("net_cp").alias("loss_cp"))
    )
    return ordered(out, "call_center", "segment", "loss_cp")


@query(
    "tpcds_q92",
    oracle="WITH "
    + _DS_SQL
    + """,
    ia AS (
      SELECT item_sk, SUM(disc_pct) AS sum_disc,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM web_sales GROUP BY item_sk
    )
    SELECT SUM(s.ext_cents * s.disc_pct) AS excess_disc_cp
    FROM web_sales s JOIN ia ON s.item_sk = ia.item_sk
    WHERE YEAR(s.sold_date) = 1996
      AND 10 * s.disc_pct * ia.cnt > 13 * ia.sum_disc
    """,
)
def tpcds_q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q92 (q32's web twin, per the matrix row: money
    discounted on web lines whose discount exceeds 1.3× the item's
    average — the correlated scalar-AVG decorrelated to a per-item
    aggregate broadcast back, comparison cross-multiplied to exact
    integers). 100 TB: the per-item aggregate is map-side partial and
    item-sized; the fact never shuffles."""
    ws = _channel(spark, sf_dir, "web")
    ia = ws.groupBy("item_sk").agg(
        F.sum("disc_pct").alias("sum_disc"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    s = ws.filter(F.year("sold_date") == 1996)
    out = (
        s.join(
            F.broadcast(ia.withColumnRenamed("item_sk", "ia_item")),
            s.item_sk == F.col("ia_item"),
        )
        .filter(10 * F.col("disc_pct") * F.col("cnt") > 13 * F.col("sum_disc"))
        .agg(
            F.sum(F.col("ext_cents") * F.col("disc_pct")).alias(
                "excess_disc_cp"
            )
        )
    )
    return out


@query(
    "tpcds_q93",
    oracle="WITH "
    + _DS_SQL
    + """,
    netted AS (
      SELECT cust_sk,
             SUM(CASE WHEN returned AND order_sk % 8 = 3 THEN -net_cp
                      WHEN returned THEN 0
                      ELSE net_cp END) AS act_cp
      FROM store_sales
      GROUP BY cust_sk
    )
    SELECT cust_sk AS cust, act_cp
    FROM netted
    WHERE act_cp > 50000000
    ORDER BY cust NULLS LAST, act_cp NULLS LAST
    """,
)
def tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q93 (actual customer value after refunding returns
    attributed to one REASON — the matrix row's q75 line-level returns
    netting at customer grain). The reference LEFT-joins store_returns
    and subtracts matched refunds for the reason; the fixtures' flag
    feed makes the netting a signed CASE (reason = order_sk % 8, as
    q85): refunded lines subtract, other returned lines contribute
    nothing, kept lines add. ONE fact pass, one customer-grain
    shuffle; the value floor is absolute in integer cent·pct units.
    100 TB: no join at all — the reference's two-fact join collapses
    into the flag CASE."""
    ss = _channel(spark, sf_dir, "store")
    signed = (
        F.when(
            F.col("returned") & (F.col("order_sk") % 8 == 3),
            -F.col("net_cp"),
        )
        .when(F.col("returned"), F.lit(0))
        .otherwise(F.col("net_cp"))
    )
    out = (
        ss.groupBy(F.col("cust_sk").alias("cust"))
        .agg(F.sum(signed).alias("act_cp"))
        .filter(F.col("act_cp") > 50_000_000)
    )
    return ordered(out, "cust", "act_cp")


@query(
    "tpcds_q94",
    oracle="""
    WITH webline AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, l_returnflag
      FROM lineitem
      WHERE (l_orderkey * 7 + l_linenumber) % 4 = 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS total_cents
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-03-01'
      AND o.o_orderdate < TIMESTAMP '1996-05-01'
      AND EXISTS (SELECT 1 FROM webline l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      AND (SELECT COUNT(DISTINCT l.l_suppkey) FROM webline l
           WHERE l.l_orderkey = o.o_orderkey) >= 2
      AND NOT EXISTS (SELECT 1 FROM webline l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
    """,
)
def tpcds_q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q94 (q16's WEB twin, per the matrix row — late-shipped
    multi-supplier web orders with no returns; q16 + q95 pin both
    EXISTS polarities on the store/full fact, this pins them on the
    web line slice). Same hand-decorrelation: the three correlated
    subqueries become ONE aggregation pass over the web lines (late
    flag, distinct suppliers, returned flag) joined once against the
    date-filtered orders — per-row re-scans are quadratic death at
    100 TB. The web slice reuses the module's line-level channel
    assignment ((l_orderkey·7 + l_linenumber) % 4 = 3)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-05-01").cast("timestamp"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4 == 3)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_returnflag")
    )
    j = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    per_order = j.groupBy("o_orderkey").agg(
        F.max(
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).cast("int")
        ).alias("late"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret"),
    )
    hits = per_order.filter(
        (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("ret") == 0)
    )
    out = hits.join(
        o.select(
            F.col("o_orderkey").alias("ok"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        ),
        hits.o_orderkey == F.col("ok"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )
    return out


@query(
    "tpcds_q99",
    oracle="""
    SELECT l_suppkey % 12 AS wh,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days > 90 AND lag_days <= 120
                         THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS dmore
    FROM (
      SELECT l_suppkey, DATEDIFF('day', o_orderdate, l_shipdate) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE YEAR(o_orderdate) = 1998
        AND (l_orderkey * 7 + l_linenumber) % 4 = 2
    ) t
    GROUP BY l_suppkey % 12
    ORDER BY wh NULLS LAST
    """,
)
def tpcds_q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q99 (q62's CATALOG twin, per the matrix row: the
    shipping-lag bucket census on the catalog line slice, pivoted per
    warehouse — l_suppkey % 12, the module's warehouse assignment).
    Five CASE sums in one aggregation pass; day arithmetic is exact
    integer datediff on both engines. 100 TB: channel + year predicates
    are scan-local; one 12-group aggregate."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4 == 2)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1998)
        .select("o_orderkey", "o_orderdate")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (F.col("l_suppkey") % 12).alias("wh"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "lag_days"
        ),
    )

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    lag = F.col("lag_days")
    out = j.groupBy("wh").agg(
        band(lag <= 30, "d30"),
        band((lag > 30) & (lag <= 60), "d60"),
        band((lag > 60) & (lag <= 90), "d90"),
        band((lag > 90) & (lag <= 120), "d120"),
        band(lag > 120, "dmore"),
    )
    return ordered(out, "wh")
