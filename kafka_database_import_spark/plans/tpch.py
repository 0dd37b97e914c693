"""The public TPC-H 22-query suite, adapted to the fixture schema and
registered as fully-oracled catalog entries (VERDICT r4 item 2).

The fixtures are deliberately TPC-H-*ish* (TESTDATA.md): same core
tables and join graph, but no ``partsupp`` table and several columns
missing (``l_commitdate``/``l_receiptdate``/``l_shipmode``,
``o_comment``/``o_shippriority``, ``p_mfgr``/``p_container``, customer
phone/address). Every query here keeps the REFERENCE QUERY'S STRUCTURE
— its join graph, correlation pattern, aggregation shape, and predicate
style — with documented deterministic substitutions:

* ``partsupp`` is SYNTHESIZED identically on both engines: 4 suppliers
  per part via ``ps_suppkey = (p_partkey + i·⌊S/4⌋) mod S`` (distinct
  for i<4 whenever S ≥ 8; S = |supplier|, which scales with SF), with
  integer ``ps_availqty`` and integer-cents ``ps_supplycost`` derived
  from the keys — so Q2/Q9/Q11/Q16/Q20 exercise their real shapes.
* ``l_commitdate``/``l_receiptdate`` become integer day offsets from
  ``l_shipdate`` derived from the line's keys, compared in
  days-since-epoch arithmetic (identical integer math on both engines);
  ``l_shipmode`` is a 7-way CASE over the keys.
* Comment-based filters (Q13's ``o_comment NOT LIKE``) map to
  ``o_orderpriority`` predicates; phone country codes (Q22) map to
  ``c_nationkey MOD 10``; containers (Q17/Q19) map to ``p_size``
  ranges. Date windows shift into the fixtures' 1995–2001 span.

Cross-engine exactness follows the repo's standard discipline
(FIXTURES.md "Oracle canonicalization"): all money arithmetic runs in
integer cents / cent·percent units (``FLOOR(x·100+0.5)`` lossless on
the exact-2dp fixture doubles), sums are therefore order-independent
BIGINTs, and doubles appear only in final projections where both
engines divide identical integers — bit-identical by construction.

100 TB design notes are per-query; the common spine: dimension joins
broadcast (region/nation/supplier/part at TPC-H's dim/fact ratios),
the lineitem⋈orders join is the one real shuffle, aggregations are
partial-agg friendly (integer sums), and every filter lands on the
parquet scan (plan-linted with the rest of the catalog).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


def _days(d: str) -> int:
    """Days since epoch for a YYYY-MM-DD literal (Python-side constant,
    mirrored in SQL as ``DATE 'd' - DATE '1970-01-01'``)."""
    y, m, dd = map(int, d.split("-"))
    return (_dt.date(y, m, dd) - _dt.date(1970, 1, 1)).days


def _ts(d: str):
    return F.lit(d).cast("timestamp")


def _cents(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _lx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem with the suite's derived columns — integer cents/pct
    money, days-since-epoch ship/commit/receipt, synthesized shipmode.
    One projection over the scan; everything stays codegen'd."""
    li = load_table(spark, sf_dir, "lineitem")
    ship_days = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        _cents("l_extendedprice").alias("ext_cents"),
        _cents("l_discount").alias("disc_pct"),
        _cents("l_tax").alias("tax_pct"),
        ship_days.alias("ship_days"),
        (ship_days + (F.col("l_orderkey") % 40) - 10).alias("commit_days"),
        (ship_days + (F.col("l_suppkey") + F.col("l_linenumber")) % 30 + 1).alias(
            "receipt_days"
        ),
        _shipmode_case().alias("shipmode"),
    )


def _shipmode_case():
    """Built lazily — Column construction needs an active session, and
    the registry imports this module before tests create one."""
    k = (F.col("l_suppkey") + F.col("l_orderkey")) % 7
    return (
        F.when(k == 0, "MAIL")
        .when(k == 1, "SHIP")
        .when(k == 2, "AIR")
        .when(k == 3, "TRUCK")
        .when(k == 4, "RAIL")
        .when(k == 5, "FOB")
        .otherwise("REG AIR")
    )

# SQL twin of _lx (DuckDB): DATE-DATE subtraction yields integer days.
_LX_SQL = """
lx AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_returnflag, l_linestatus, l_shipdate,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS ext_cents,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
         CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS ship_days,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
           + (l_orderkey % 40) - 10 AS commit_days,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
           + (l_suppkey + l_linenumber) % 30 + 1 AS receipt_days,
         CASE (l_suppkey + l_orderkey) % 7
           WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
           WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'FOB'
           ELSE 'REG AIR' END AS shipmode
  FROM lineitem
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic ``partsupp``: 4 suppliers per part (TPC-H's own
    fan-out), keys/quantities/costs pure functions of (p_partkey, i, S)
    so both engines derive the identical relation. The supplier count S
    is a one-row aggregate collected driver-side (bounded by
    construction, like the zorder/graph scalars audited in VERDICT r3);
    the 4-row fan-out is a broadcast of ``range(4)``."""
    ns = load_table(spark, sf_dir, "supplier").count()
    q = ns // 4
    part = load_table(spark, sf_dir, "part")
    suppkey = (F.col("p_partkey") + F.col("i") * q) % ns
    # 4-way fan-out as explode(array literal) — a pure projection
    # (Generate node), not a join: nothing for the planner to misorder
    # and nothing for the cartesian linter to flag.
    fanned = part.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
    )
    return fanned.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 3) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("p_partkey") * 31 + suppkey * 7) % 100000 + 100
        ).alias("ps_cost_cents"),
    )


_PS_SQL = """
ns AS (SELECT COUNT(*) AS n FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + t.i * (ns.n // 4)) % ns.n AS ps_suppkey,
         (p_partkey * 7 + t.i * 3) % 9999 + 1 AS ps_availqty,
         (p_partkey * 31
            + ((p_partkey + t.i * (ns.n // 4)) % ns.n) * 7) % 100000 + 100
           AS ps_cost_cents
  FROM part, ns, (VALUES (0), (1), (2), (3)) t(i)
)
"""


@query(
    "tpch_q01",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT l_returnflag, l_linestatus,
           SUM(qty) AS sum_qty,
           CAST(SUM(ext_cents) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE) / 10000
             AS sum_disc_price,
           CAST(SUM(ext_cents * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE)
             / 1000000 AS sum_charge,
           FLOOR(CAST(SUM(qty) AS DOUBLE) / COUNT(*) * 100 + 0.5) / 100
             AS avg_qty,
           FLOOR(CAST(SUM(ext_cents) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_price,
           FLOOR(CAST(SUM(disc_pct) AS DOUBLE) / COUNT(*) + 0.5) / 100
             AS avg_disc,
           COUNT(*) AS count_order
    FROM lx
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, sum_qty NULLS LAST,
             sum_base_price NULLS LAST, sum_disc_price NULLS LAST,
             sum_charge NULLS LAST, avg_qty NULLS LAST, avg_price NULLS LAST,
             avg_disc NULLS LAST, count_order NULLS LAST
    """,
)
def tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, one 6-group hash aggregate.
    The 100 TB plan: map-side partial aggregation collapses 60 G rows to
    6 per task before the (tiny) shuffle; all sums are integer cent/pct
    units so the distributed sum is exact and order-free. Averages are
    computed as floor-rounded double divisions of those integers — the
    repo's avg_exact discipline."""
    lx = _lx(spark, sf_dir).filter(F.col("l_shipdate") <= _ts("2000-09-02"))
    cnt = F.count(F.lit(1))
    out = lx.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        (F.sum("ext_cents").cast("double") / 100).alias("sum_base_price"),
        (
            F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast("double")
            / 10000
        ).alias("sum_disc_price"),
        (
            F.sum(
                F.col("ext_cents")
                * (100 - F.col("disc_pct"))
                * (100 + F.col("tax_pct"))
            ).cast("double")
            / 1000000
        ).alias("sum_charge"),
        (F.floor(F.sum("qty").cast("double") / cnt * 100 + 0.5) / 100).alias(
            "avg_qty"
        ),
        (F.floor(F.sum("ext_cents").cast("double") / cnt + 0.5) / 100).alias(
            "avg_price"
        ),
        (F.floor(F.sum("disc_pct").cast("double") / cnt + 0.5) / 100).alias(
            "avg_disc"
        ),
        cnt.alias("count_order"),
    )
    return ordered(out)


@query(
    "tpch_q02",
    oracle="WITH "
    + _PS_SQL
    + """
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           'Manufacturer#' || CAST(p.p_partkey % 5 AS VARCHAR) AS p_mfgr,
           ps.ps_cost_cents
    FROM partsupp ps
    JOIN part p     ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.ps_cost_cents = (
        SELECT MIN(ps2.ps_cost_cents)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal NULLS LAST, s_name NULLS LAST, n_name NULLS LAST,
             p_partkey NULLS LAST, p_mfgr NULLS LAST, ps_cost_cents NULLS LAST
    """,
)
def tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: the correlated MIN subquery is
    decorrelated Spark-side into a grouped MIN over the region-filtered
    partsupp, joined back on (partkey, mincost) — the exact rewrite
    Catalyst would aim for, stated declaratively. partsupp is 4·|part|;
    supplier/nation/region broadcast. p_mfgr is the documented derived
    substitute (fixtures carry no mfgr column)."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu_ps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    min_cost = (
        eu_ps.groupBy("ps_partkey")
        .agg(F.min("ps_cost_cents").alias("min_cost"))
        .select(F.col("ps_partkey").alias("mc_partkey"), "min_cost")
    )
    out = (
        eu_ps.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_cost_cents") == F.col("min_cost")),
        )
        .join(F.broadcast(part), eu_ps.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.concat(
                F.lit("Manufacturer#"), (F.col("p_partkey") % 5).cast("string")
            ).alias("p_mfgr"),
            "ps_cost_cents",
        )
    )
    return ordered(out)


@query(
    "tpch_q03",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT lx.l_orderkey,
           CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE) / 10000
             AS revenue,
           epoch_us(o.o_orderdate) AS odate_us
    FROM lx
    JOIN orders o   ON lx.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND lx.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY lx.l_orderkey, o.o_orderdate
    ORDER BY l_orderkey NULLS LAST, revenue NULLS LAST, odate_us NULLS LAST
    """,
)
def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: segment-filtered customer broadcasts
    into orders, the filtered orders side then joins lineitem — at scale
    the o_orderdate predicate halves the orders build side before the
    one big shuffle. (o_shippriority is constant in TPC-H and absent in
    the fixtures; dropped from the projection, documented.)"""
    lx = _lx(spark, sf_dir).filter(F.col("l_shipdate") > _ts("1997-03-15"))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1997-03-15")
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    out = (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (
                F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast(
                    "double"
                )
                / 10000
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.unix_micros("o_orderdate").alias("odate_us")
        )
    )
    return ordered(out)


@query(
    "tpch_q04",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lx
        WHERE lx.l_orderkey = o.o_orderkey
          AND lx.commit_days < lx.receipt_days)
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority NULLS LAST, order_count NULLS LAST
    """,
)
def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking: EXISTS becomes a LEFT SEMI
    join — Spark's native decorrelation target — against the late-lines
    subset (commit < receipt on the derived day columns). The quarter
    filter prunes the orders scan; the semi join never widens rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    late = _lx(spark, sf_dir).filter(
        F.col("commit_days") < F.col("receipt_days")
    )
    out = (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    return ordered(out)


@query(
    "tpch_q05",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT n.n_name,
           CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE) / 10000
             AS revenue
    FROM lx
    JOIN orders o   ON lx.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON lx.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY n_name NULLS LAST, revenue NULLS LAST
    """,
)
def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume — the classic star join with the
    twist that customer and supplier must share a nation (the
    c_nationkey = s_nationkey condition rides on the supplier join).
    lineitem⋈orders is the one shuffle; customer/supplier/nation/region
    broadcast."""
    lx = _lx(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    out = (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (lx.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast(
                    "double"
                )
                / 10000
            ).alias("revenue")
        )
    )
    return ordered(out)


@query(
    "tpch_q06",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT CAST(SUM(ext_cents * disc_pct) AS DOUBLE) / 10000 AS revenue
    FROM lx
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND disc_pct BETWEEN 5 AND 7
      AND qty < 24
    ORDER BY revenue NULLS LAST
    """,
)
def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: pure scan-filter-aggregate,
    zero shuffle beyond the final 1-row reduce. The discount BETWEEN is
    evaluated on the integer pct column (5..7), sidestepping the classic
    double-equality trap on 0.05/0.07 literals."""
    lx = _lx(spark, sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & F.col("disc_pct").between(5, 7)
        & (F.col("qty") < 24)
    )
    out = lx.agg(
        (F.sum(F.col("ext_cents") * F.col("disc_pct")).cast("double") / 10000).alias(
            "revenue"
        )
    )
    return ordered(out)


@query(
    "tpch_q07",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol_e4) AS DOUBLE) / 10000 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(lx.l_shipdate) AS l_year,
             ext_cents * (100 - disc_pct) AS vol_e4
      FROM lx
      JOIN orders o   ON lx.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON lx.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND lx.l_shipdate >= TIMESTAMP '1996-01-01'
        AND lx.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation NULLS LAST, cust_nation NULLS LAST,
             l_year NULLS LAST, revenue NULLS LAST
    """,
)
def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, both directions.
    The nation-pair disjunction is applied AFTER both nation broadcasts
    so it stays one scan; year() grouping exercises the
    expression-group-by path."""
    lx = _lx(spark, sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    out = (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), lx.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (
                F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast(
                    "double"
                )
                / 10000
            ).alias("revenue")
        )
    )
    return ordered(out)


@query(
    "tpch_q08",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_e4 ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(vol_e4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT YEAR(o.o_orderdate) AS o_year,
             ext_cents * (100 - disc_pct) AS vol_e4,
             n2.n_name AS nation
      FROM lx
      JOIN part p     ON lx.l_partkey = p.p_partkey
      JOIN orders o   ON lx.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON lx.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year NULLS LAST, mkt_share NULLS LAST
    """,
)
def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: the share division runs over two
    exact integer sums (cent·pct units), so the double ratio is
    bit-identical across engines with no rounding step. Seven-table
    join, dims broadcast, one fact shuffle."""
    lx = _lx(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("ext_cents") * (100 - F.col("disc_pct"))
    out = (
        lx.join(F.broadcast(part), lx.l_partkey == part.p_partkey)
        .join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supp), lx.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )
    return ordered(out)


@query(
    "tpch_q09",
    oracle="WITH "
    + _LX_SQL
    + ", "
    + _PS_SQL.strip().lstrip()
    + """
    SELECT nation, o_year,
           CAST(SUM(amount_e4) AS DOUBLE) / 10000 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
             ext_cents * (100 - disc_pct)
               - ps.ps_cost_cents * qty * 100 AS amount_e4
      FROM lx
      JOIN part p     ON lx.l_partkey = p.p_partkey
      JOIN supplier s ON lx.l_suppkey = s.s_suppkey
      JOIN partsupp ps ON ps.ps_partkey = lx.l_partkey
                      AND ps.ps_suppkey = lx.l_suppkey
      JOIN orders o   ON lx.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%e%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation NULLS LAST, o_year NULLS LAST, sum_profit NULLS LAST
    """,
)
def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit: profit = revenue − supply cost, in
    exact cent·pct integer units (ps_cost·qty is scaled ×100 to match).
    The partsupp join is (partkey, suppkey) — 4 rows per part —
    broadcast alongside part/supplier/nation; lineitem⋈orders is the
    shuffle. An inner join on the synthesized partsupp keeps only
    matching (part, supplier) pairs, mirroring the oracle exactly."""
    lx = _lx(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    supp = load_table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("ext_cents") * (100 - F.col("disc_pct")) - F.col(
        "ps_cost_cents"
    ) * F.col("qty") * 100
    out = (
        lx.join(F.broadcast(part), lx.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), lx.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(ps),
            (F.col("ps_partkey") == lx.l_partkey)
            & (F.col("ps_suppkey") == lx.l_suppkey),
        )
        .join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg((F.sum(amount).cast("double") / 10000).alias("sum_profit"))
    )
    return ordered(out)


@query(
    "tpch_q10",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE) / 10000
             AS revenue,
           c.c_acctbal, n.n_name
    FROM lx
    JOIN orders o   ON lx.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND lx.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY c_custkey NULLS LAST, c_name NULLS LAST, revenue NULLS LAST,
             c_acctbal NULLS LAST, n_name NULLS LAST
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: returnflag filter lands on
    the lineitem scan (PushedFilters), the quarter filter on orders;
    group-by carries the customer attributes through the aggregate —
    the wide-group-key pattern. (c_address/c_phone/c_comment don't
    exist in the fixtures; projection documented.)"""
    lx = _lx(spark, sf_dir).filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    out = (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            (
                F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast(
                    "double"
                )
                / 10000
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
    return ordered(out)


@query(
    "tpch_q11",
    oracle="WITH "
    + _PS_SQL
    + """
    , nat_ps AS (
      SELECT ps.ps_partkey, ps.ps_cost_cents * ps.ps_availqty AS value_cents
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey,
           CAST(SUM(value_cents) AS DOUBLE) / 100 AS value
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING CAST(SUM(value_cents) AS DOUBLE)
         > (2.0 / (SELECT COUNT(*) FROM part))
           * (SELECT CAST(SUM(value_cents) AS DOUBLE) FROM nat_ps)
    ORDER BY ps_partkey NULLS LAST, value NULLS LAST
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: the HAVING-against-global-total
    scalar subquery becomes a broadcast join of the 1-row total with
    the inequality as the join condition — a bounded
    BroadcastNestedLoopJoin WITH a condition, which the plan linter
    correctly distinguishes from a cartesian. value arithmetic is pure
    integer cents; the threshold fraction is 2/|part| — twice the
    average per-part share — mirroring the spec's 0.0001/SF scaling so
    the HAVING stays selective-but-nonempty at every fixture scale
    (a fixed 0.001 went empty at 10×; caught in the r5 scale sweep).
    Both engines multiply a double cast of the identical integer."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat_ps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("sum_cents")
    )
    total = nat_ps.agg(F.sum("value_cents").alias("total_cents"))
    n_parts = load_table(spark, sf_dir, "part").count()  # bounded scalar
    out = per_part.join(
        F.broadcast(total),
        per_part.sum_cents.cast("double")
        > (2.0 / n_parts) * total.total_cents.cast("double"),
    ).select(
        "ps_partkey", (F.col("sum_cents").cast("double") / 100).alias("value")
    )
    return ordered(out)


@query(
    "tpch_q12",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT shipmode,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lx
    JOIN orders o ON lx.l_orderkey = o.o_orderkey
    WHERE shipmode IN ('MAIL', 'SHIP')
      AND commit_days < receipt_days
      AND ship_days < commit_days
      AND receipt_days >= (DATE '1996-01-01' - DATE '1970-01-01')
      AND receipt_days < (DATE '1997-01-01' - DATE '1970-01-01')
    GROUP BY shipmode
    ORDER BY shipmode NULLS LAST, high_line_count NULLS LAST,
             low_line_count NULLS LAST
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping modes / order priority: the three derived-day
    comparisons (ship < commit < receipt, receipt in-year) are pure
    integer predicates evaluated in the lineitem projection; the join
    to orders only fetches the priority column. Conditional counts are
    map-side-combinable integer sums."""
    lo = _days("1996-01-01")
    hi = _days("1997-01-01")
    lx = _lx(spark, sf_dir).filter(
        F.col("shipmode").isin("MAIL", "SHIP")
        & (F.col("commit_days") < F.col("receipt_days"))
        & (F.col("ship_days") < F.col("commit_days"))
        & (F.col("receipt_days") >= lo)
        & (F.col("receipt_days") < hi)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
    return ordered(out)


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY c_count NULLS LAST, custdist NULLS LAST
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER with the
    filter INSIDE the join condition (customers with zero qualifying
    orders must survive with count 0), then a double aggregation. The
    o_comment NOT LIKE filter of the spec maps to an o_orderpriority
    predicate (fixtures carry no comment column — documented). At scale
    the first aggregate shuffles on custkey (same key as the join — one
    exchange), the histogram aggregate is tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    out = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )
    return ordered(out)


@query(
    "tpch_q14",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT 100 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN ext_cents * (100 - disc_pct)
                               ELSE 0 END) AS DOUBLE)
               / CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE)
             AS promo_revenue
    FROM lx
    JOIN part p ON lx.l_partkey = p.p_partkey
    WHERE lx.l_shipdate >= TIMESTAMP '1996-09-01'
      AND lx.l_shipdate < TIMESTAMP '1996-10-01'
    ORDER BY promo_revenue NULLS LAST
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: the month filter prunes the scan,
    part broadcasts, and the promo share is a double ratio of two exact
    integer sums — bit-identical across engines without rounding."""
    lx = _lx(spark, sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("ext_cents") * (100 - F.col("disc_pct"))
    out = lx.join(F.broadcast(part), lx.l_partkey == part.p_partkey).agg(
        (
            100
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0)).cast(
                "double"
            )
            / F.sum(vol).cast("double")
        ).alias("promo_revenue")
    )
    return ordered(out)


@query(
    "tpch_q15",
    oracle="WITH "
    + _LX_SQL
    + """
    , revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(ext_cents * (100 - disc_pct)) AS total_e4
      FROM lx
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_e4 AS DOUBLE) / 10000 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_e4 = (SELECT MAX(total_e4) FROM revenue)
    ORDER BY s_suppkey NULLS LAST, s_name NULLS LAST, total_revenue NULLS LAST
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the spec's revenue VIEW is a grouped
    aggregate; the scalar MAX subquery becomes an equi-join against the
    broadcast 1-row max — exact because revenue is an integer sum
    (cent·pct), so the max comparison has no float-tie hazard."""
    lx = _lx(spark, sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = lx.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).alias("total_e4")
    )
    mx = revenue.agg(F.max("total_e4").alias("max_e4"))
    supp = load_table(spark, sf_dir, "supplier")
    out = (
        revenue.join(F.broadcast(mx), F.col("total_e4") == F.col("max_e4"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_e4").cast("double") / 10000).alias("total_revenue"),
        )
    )
    return ordered(out)


@query(
    "tpch_q16",
    oracle="WITH "
    + _PS_SQL
    + """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 50 = 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY p_brand NULLS LAST, p_type NULLS LAST, p_size NULLS LAST,
             supplier_cnt NULLS LAST
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: NOT IN over a key subquery
    becomes a LEFT ANTI join (safe here — s_suppkey is never NULL, the
    NOT IN null-trap doesn't bite); count-distinct over the group. The
    spec's complaint-comment filter maps to a deterministic key
    predicate (s_suppkey % 50 = 0 — documented substitution)."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9)
    )
    complained = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 50 == 0
    )
    out = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(complained),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )
    return ordered(out)


@query(
    "tpch_q17",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT CAST(SUM(ext_cents) AS DOUBLE) / 100 / 7.0 AS avg_yearly
    FROM lx
    JOIN part p ON p.p_partkey = lx.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size = 7
      AND qty * 5 * (SELECT COUNT(*) FROM lx l2
                     WHERE l2.l_partkey = lx.l_partkey)
          < (SELECT SUM(l2.qty) FROM lx l2
             WHERE l2.l_partkey = lx.l_partkey)
    ORDER BY avg_yearly NULLS LAST
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated
    0.2·AVG(l_quantity) subquery is decorrelated into a per-part
    (SUM, COUNT) aggregate joined back, and the threshold test
    ``qty < 0.2·avg`` is algebraically rearranged to the ALL-INTEGER
    comparison ``qty·5·count < sum`` — no float division anywhere, so
    both engines agree exactly. The container predicate of the spec
    maps to p_size (fixtures have no container — documented)."""
    lx = _lx(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") == 7)
    )
    per_part = lx.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    out = (
        lx.join(F.broadcast(part), lx.l_partkey == part.p_partkey)
        .join(per_part, lx.l_partkey == F.col("pp_key"))
        .filter(F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum("ext_cents").cast("double") / 100 / 7.0).alias("avg_yearly")
        )
    )
    return ordered(out)


@query(
    "tpch_q18",
    oracle="WITH "
    + _LX_SQL
    + """
    , big AS (
      SELECT l_orderkey, SUM(qty) AS sum_qty
      FROM lx GROUP BY l_orderkey HAVING SUM(qty) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS odate_us,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY c_name NULLS LAST, c_custkey NULLS LAST, o_orderkey NULLS LAST,
             odate_us NULLS LAST, o_totalprice NULLS LAST, sum_qty NULLS LAST
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: the IN-subquery over a HAVING
    aggregate becomes an aggregate-then-join — the filtered key set
    (orders with > 300 total quantity) is tiny, so it broadcasts into
    orders and customer. Integer quantity sums; o_totalprice passes
    through untouched (no arithmetic → raw double is hash-stable)."""
    lx = _lx(spark, sf_dir)
    big = (
        lx.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    out = (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("odate_us"),
            "o_totalprice",
            "sum_qty",
        )
    )
    return ordered(out)


@query(
    "tpch_q19",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT CAST(SUM(ext_cents * (100 - disc_pct)) AS DOUBLE) / 10000
             AS revenue
    FROM lx
    JOIN part p ON p.p_partkey = lx.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND qty BETWEEN 1 AND 11 AND shipmode IN ('AIR', 'REG AIR'))
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
           AND qty BETWEEN 10 AND 20 AND shipmode IN ('AIR', 'REG AIR'))
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND qty BETWEEN 20 AND 30 AND shipmode IN ('AIR', 'REG AIR'))
    ORDER BY revenue NULLS LAST
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: the three OR'd brand/size/quantity
    brackets evaluate after the part broadcast join (mixed-table OR
    can't pre-split cleanly); the shipmode leg is the derived column.
    Container predicates map to p_size ranges (documented)."""
    lx = _lx(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    air = F.col("shipmode").isin("AIR", "REG AIR")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("qty").between(1, 11)
            & air
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & F.col("qty").between(10, 20)
            & air
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("qty").between(20, 30)
            & air
        )
    )
    out = (
        lx.join(F.broadcast(part), lx.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            (
                F.sum(F.col("ext_cents") * (100 - F.col("disc_pct"))).cast(
                    "double"
                )
                / 10000
            ).alias("revenue")
        )
    )
    return ordered(out)


@query(
    "tpch_q20",
    oracle="WITH "
    + _LX_SQL
    + ", "
    + _PS_SQL.strip()
    + """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_4'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
          AND ps.ps_availqty * 2 > (
            SELECT COALESCE(SUM(lx.qty), 0) FROM lx
            WHERE lx.l_partkey = ps.ps_partkey
              AND lx.l_suppkey = ps.ps_suppkey
              AND lx.l_shipdate >= TIMESTAMP '1996-01-01'
              AND lx.l_shipdate < TIMESTAMP '1997-01-01'))
    ORDER BY s_suppkey NULLS LAST, s_name NULLS LAST
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: the nested correlated
    subquery chain decorrelates into (1) a per-(part,supplier) shipped
    quantity aggregate over the year, (2) a LEFT join from the
    name-filtered partsupp (missing shipment = 0 via COALESCE), (3) the
    all-integer threshold ``2·availqty > shipped``, (4) a semi join
    into the nation-filtered suppliers. Every aggregate is an integer
    sum; no float appears anywhere."""
    lx = _lx(spark, sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = lx.groupBy(
        F.col("l_partkey").alias("sp_part"), F.col("l_suppkey").alias("sp_supp")
    ).agg(F.sum("qty").alias("shipped_qty"))
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%o%")
    )
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(parts.select("p_partkey")),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    qualifying = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("sp_part"))
            & (F.col("ps_suppkey") == F.col("sp_supp")),
            "left",
        )
        .filter(
            F.col("ps_availqty") * 2
            > F.coalesce(F.col("shipped_qty"), F.lit(0))
        )
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_4"
    )
    out = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
    return ordered(out)


@query(
    "tpch_q21",
    oracle="WITH "
    + _LX_SQL
    + """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lx l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_2'
      AND l1.receipt_days > l1.commit_days
      AND EXISTS (
        SELECT 1 FROM lx l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lx l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.receipt_days > l3.commit_days)
    GROUP BY s.s_name
    ORDER BY s_name NULLS LAST, numwait NULLS LAST
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the EXISTS /
    NOT EXISTS pair over the same fact table becomes one LEFT SEMI and
    one LEFT ANTI join, both on l_orderkey with the ``other supplier``
    condition riding along — three same-key joins that co-locate under
    one orderkey exchange at scale. Lateness is the integer
    receipt > commit comparison on the derived day columns."""
    lx = _lx(spark, sf_dir)
    late1 = lx.filter(F.col("receipt_days") > F.col("commit_days")).select(
        "l_orderkey", "l_suppkey"
    )
    others = lx.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = (
        lx.filter(F.col("receipt_days") > F.col("commit_days"))
        .select(
            F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    out = (
        late1.join(orders, late1.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), late1.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            others,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return ordered(out)


@query(
    "tpch_q22",
    oracle="""
    WITH cx AS (
      SELECT c_custkey, c_nationkey % 10 AS cntrycode,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
      FROM customer
    ),
    threshold AS (
      SELECT CAST(SUM(acct_cents) AS DOUBLE) / COUNT(*) AS avg_cents
      FROM cx
      WHERE acct_cents > 0 AND cntrycode IN (1, 2, 3, 4, 5, 6, 7)
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(acct_cents) AS DOUBLE) / 100 AS totacctbal
    FROM cx, threshold
    WHERE cntrycode IN (1, 2, 3, 4, 5, 6, 7)
      AND CAST(acct_cents AS DOUBLE) > threshold.avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = cx.c_custkey
          AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode NULLS LAST, numcust NULLS LAST, totacctbal NULLS LAST
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: phone country codes map to
    ``c_nationkey MOD 10`` (fixtures carry no phone — documented).
    Account balances run in integer cents; the scalar AVG threshold is
    a broadcast 1-row join whose comparison both engines evaluate on
    identical (sum, count) integers. NOT EXISTS → LEFT ANTI; the spec's
    "no orders in 7 years" becomes "no 1-URGENT orders" (every fixture
    customer has at least one order — documented substitution)."""
    # cntrycode ∈ {1..7} rewritten as a RAW c_nationkey IN-list (codes
    # repeat every 10; nationkeys are < 30) so the predicate reaches
    # PushedFilters — the modulo form is non-convertible and would read
    # every row group.
    raw_codes = [k for k in range(30) if k % 10 in (1, 2, 3, 4, 5, 6, 7)]
    cx = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(raw_codes))
        .select(
            "c_custkey",
            (F.col("c_nationkey") % 10).alias("cntrycode"),
            _cents("c_acctbal").alias("acct_cents"),
            "c_acctbal",
        )
    )
    eligible = cx.drop("c_acctbal")
    # redundant raw c_acctbal > 0 bound pushes to the scan; the integer
    # form stays as the exact semantic filter (no 2dp value lies in
    # (0, 0.005), so the pair is equivalent)
    threshold = cx.filter(
        (F.col("c_acctbal") > 0.0) & (F.col("acct_cents") > 0)
    ).agg(
        (F.sum("acct_cents").cast("double") / F.count(F.lit(1))).alias(
            "avg_cents"
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    out = (
        eligible.join(
            F.broadcast(threshold),
            F.col("acct_cents").cast("double") > F.col("avg_cents"),
        )
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("acct_cents").cast("double") / 100).alias("totacctbal"),
        )
    )
    return ordered(out)
