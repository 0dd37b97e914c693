"""SQLancer-style differential fuzzing (SURVEY §5.2 t2, generalized):
seeded random predicate/aggregation queries rendered to ONE SQL text
that runs verbatim on Spark SQL and DuckDB, results compared by the
same canonicalize-and-hash the driver uses. Where a hand-written oracle
checks one plan, the fuzzer samples the expression space — comparison
chains over mixed types, AND/OR/NOT nesting, NULL-propagating
arithmetic — where engine disagreements (coercion, three-valued logic,
rounding) actually live. Deterministic: fixed seeds, sorted output,
integer-or-exact-decimal arithmetic only (no float noise by
construction)."""

from __future__ import annotations

import random

import pytest

from kafka_database_import_spark import oracle
from kafka_database_import_spark.sources.readers import load_table

# Columns usable in generated predicates: (name, kind)
LINEITEM_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
]
STR_LITERALS = ["'A'", "'N'", "'R'", "'O'", "'F'", "''"]
CMP = ["=", "<>", "<", "<=", ">", ">="]


def _num_expr(rng: random.Random, depth: int = 0) -> str:
    """Integer-safe numeric expression over lineitem columns: +, -, *,
    CASE — never /, never floats, so both engines compute identically."""
    if depth >= 2 or rng.random() < 0.5:
        col, kind = rng.choice([c for c in LINEITEM_COLS if c[1] in ("int", "num")])
        if kind == "num":
            # exact decimal scaled to integer cents
            return f"CAST(CAST({col} AS DECIMAL(12,2)) * 100 AS BIGINT)"
        return col
    op = rng.choice(["+", "-", "*"])
    a, b = _num_expr(rng, depth + 1), _num_expr(rng, depth + 1)
    if op == "*":
        b = str(rng.randint(0, 7))  # bound growth
    return f"({a} {op} {b})"


def _predicate(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.random() < 0.4:
        if rng.random() < 0.25:
            col, _ = rng.choice([c for c in LINEITEM_COLS if c[1] == "str"])
            return f"({col} {rng.choice(CMP)} {rng.choice(STR_LITERALS)})"
        lhs = _num_expr(rng)
        rhs = rng.choice([_num_expr(rng), str(rng.randint(-1000, 1_000_000))])
        return f"({lhs} {rng.choice(CMP)} {rhs})"
    kind = rng.random()
    if kind < 0.4:
        return f"({_predicate(rng, depth + 1)} AND {_predicate(rng, depth + 1)})"
    if kind < 0.8:
        return f"({_predicate(rng, depth + 1)} OR {_predicate(rng, depth + 1)})"
    return f"(NOT {_predicate(rng, depth + 1)})"


def _query(seed: int) -> str:
    rng = random.Random(seed)
    pred = _predicate(rng)
    agg_target = _num_expr(rng)
    group_col = rng.choice(["l_returnflag", "l_linestatus", "l_linenumber"])
    return (
        f"SELECT {group_col} AS g, COUNT(*) AS n, SUM({agg_target}) AS s,"
        f" MIN({agg_target}) AS mn, MAX({agg_target}) AS mx"
        f" FROM lineitem WHERE {pred} GROUP BY {group_col}"
        f" ORDER BY g NULLS LAST, n NULLS LAST, s NULLS LAST,"
        f" mn NULLS LAST, mx NULLS LAST"
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_query_agrees_across_engines(spark, sf_dir, seed):
    sql = _query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzz_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


ORDERS_COLS = [
    ("o_custkey", "int"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
]


def _join_query(seed: int) -> str:
    """Random LEFT/INNER equi-join + mixed-side predicate + group agg.
    LEFT joins put NULLs into right-side columns, so the predicate
    exercises three-valued logic — the classic engine-divergence zone."""
    rng = random.Random(seed + 10_000)
    join_type = rng.choice(["JOIN", "LEFT JOIN"])
    pool = LINEITEM_COLS + ORDERS_COLS

    def pred(depth=0):
        if depth >= 3 or rng.random() < 0.4:
            col, kind = rng.choice(pool)
            if kind == "str":
                lits = STR_LITERALS + ["'1-URGENT'", "'5-LOW'"]
                return f"({col} {rng.choice(CMP)} {rng.choice(lits)})"
            if kind == "num":
                lhs = f"CAST(CAST({col} AS DECIMAL(14,2)) * 100 AS BIGINT)"
            else:
                lhs = col
            return f"({lhs} {rng.choice(CMP)} {rng.randint(-10, 30_000_000)})"
        k = rng.random()
        if k < 0.4:
            return f"({pred(depth + 1)} AND {pred(depth + 1)})"
        if k < 0.8:
            return f"({pred(depth + 1)} OR {pred(depth + 1)})"
        return f"(NOT {pred(depth + 1)})"

    group_col = rng.choice(["l_returnflag", "l_linenumber", "o_orderstatus"])
    return (
        f"SELECT {group_col} AS g, COUNT(*) AS n,"
        f" COUNT(o_custkey) AS n_matched,"
        f" MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx"
        f" FROM lineitem {join_type} orders ON l_orderkey = o_orderkey"
        f" WHERE {pred()} GROUP BY {group_col}"
        f" ORDER BY g NULLS LAST, n NULLS LAST, n_matched NULLS LAST,"
        f" mn NULLS LAST, mx NULLS LAST"
    )


@pytest.mark.parametrize("seed", range(25))
def test_random_join_query_agrees_across_engines(spark, sf_dir, seed):
    sql = _join_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzjoin_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _window_query(seed: int) -> str:
    """Random windowed aggregation with an explicit ROWS frame.
    Frame-boundary semantics and running-aggregate state are
    engine-divergence zones. The fixture's (l_orderkey, l_linenumber)
    is NOT unique (the fuzzer itself caught this: tie-dependent frames
    diverged between engines — a generator bug, not an engine bug), so
    the window orders by the join keys PLUS the aggregation target:
    rows still tied are then fully interchangeable for the frame
    aggregate, making the sorted-output comparison well-defined."""
    rng = random.Random(seed + 20_000)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey"])
    target = _num_expr(rng)
    lo = rng.randint(0, 5)
    hi_choices = ["CURRENT ROW", f"{rng.randint(0, 3)} FOLLOWING"]
    frame = f"ROWS BETWEEN {lo} PRECEDING AND {rng.choice(hi_choices)}"
    fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
    order = f"l_orderkey, l_linenumber, l_partkey, l_suppkey, {target}"
    return (
        f"SELECT l_orderkey, l_linenumber,"
        f" {fn}({target}) OVER (PARTITION BY {part}"
        f" ORDER BY {order} {frame}) AS w"
        f" FROM lineitem WHERE l_orderkey < 3000"
        f" ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST,"
        f" w NULLS LAST"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_window_query_agrees_across_engines(spark, sf_dir, seed):
    sql = _window_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzwin_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _distinct_having_query(seed: int) -> str:
    """Random COUNT(DISTINCT expr) + HAVING over a random predicate —
    distinct-aggregate rewrite (expand/two-phase) and post-aggregation
    filtering are additional planner paths the plain fuzzer misses."""
    rng = random.Random(seed + 30_000)
    pred = _predicate(rng)
    target = _num_expr(rng)
    group_col = rng.choice(["l_returnflag", "l_linestatus", "l_linenumber"])
    having = rng.choice(
        [f"COUNT(*) > {rng.randint(0, 2000)}",
         f"COUNT(DISTINCT {target}) >= {rng.randint(1, 50)}"]
    )
    return (
        f"SELECT {group_col} AS g, COUNT(*) AS n,"
        f" COUNT(DISTINCT {target}) AS nd,"
        f" SUM({target}) AS s"
        f" FROM lineitem WHERE {pred} GROUP BY {group_col}"
        f" HAVING {having}"
        f" ORDER BY g NULLS LAST, n NULLS LAST, nd NULLS LAST, s NULLS LAST"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_distinct_having_agrees_across_engines(spark, sf_dir, seed):
    sql = _distinct_having_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzdh_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"
