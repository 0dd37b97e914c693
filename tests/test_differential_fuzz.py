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

import os
import random

import pytest

# Seed-count multiplier: default 1 keeps CI fast; KDIS_FUZZ_SCALE=3
# triples every family's seed range for deep sweeps (new seeds explore
# NEW queries — the generators key off the seed value, so scale-up
# extends coverage rather than re-running the same inputs).
_FUZZ_SCALE = max(1, int(os.environ.get("KDIS_FUZZ_SCALE", "1")))


def _seeds(n: int) -> range:
    return range(n * _FUZZ_SCALE)

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


@pytest.mark.parametrize("seed", _seeds(40))
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


@pytest.mark.parametrize("seed", _seeds(25))
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


@pytest.mark.parametrize("seed", _seeds(15))
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


@pytest.mark.parametrize("seed", _seeds(15))
def test_random_distinct_having_agrees_across_engines(spark, sf_dir, seed):
    sql = _distinct_having_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzdh_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _null_join_query(seed: int) -> str:
    """Random LEFT/RIGHT/FULL OUTER join whose join keys are made
    genuinely NULL on BOTH sides (NULLIF over a modulus) — NULL keys
    never match under `=` but DO pair under IS NOT DISTINCT FROM, and
    outer rows then flow through COALESCE'd grouping: three-valued
    logic, null-safe equality, and outer-row padding in one query — the
    classic engine-divergence pit the plain join fuzzer never reaches
    (fixture keys are never NULL)."""
    rng = random.Random(seed + 40_000)
    join_type = rng.choice(["LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    # small key domains force many-to-many groups AND a meaningful
    # NULL share (1/k of rows per side)
    kl, kr = rng.randint(4, 12), rng.randint(4, 12)
    null_safe = rng.random() < 0.4
    on = (
        "l.jk IS NOT DISTINCT FROM r.jk"
        if null_safe
        else "l.jk = r.jk"
    )
    extra = rng.choice(
        ["", f" AND l.v {rng.choice(CMP)} {rng.randint(0, 500_000)}"]
    )
    return (
        f"WITH l AS (SELECT NULLIF(l_suppkey % {kl}, 0) AS jk, l_orderkey,"
        f" CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v"
        f" FROM lineitem WHERE l_orderkey < 2000),"
        f" r AS (SELECT NULLIF(o_custkey % {kr}, 0) AS jk, o_orderkey"
        f" FROM orders WHERE o_orderkey < 2000)"
        f" SELECT COALESCE(l.jk, -1) AS gl, COALESCE(r.jk, -2) AS gr,"
        f" COUNT(*) AS n, COUNT(l.l_orderkey) AS nl,"
        f" COUNT(r.o_orderkey) AS nr, SUM(l.v) AS s"
        f" FROM l {join_type} r ON {on}{extra}"
        f" GROUP BY COALESCE(l.jk, -1), COALESCE(r.jk, -2)"
        f" ORDER BY gl NULLS LAST, gr NULLS LAST, n NULLS LAST,"
        f" nl NULLS LAST, nr NULLS LAST, s NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(60))
def test_random_null_outer_join_agrees_across_engines(spark, sf_dir, seed):
    sql = _null_join_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzznj_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _range_frame_query(seed: int) -> str:
    """Random RANGE BETWEEN window frame over a numeric sort key —
    value-based frames include ALL peers of the boundary rows (unlike
    ROWS), so tie handling is deterministic by definition but the
    peer-inclusion semantics themselves are an engine-divergence zone
    (and exactly what the ROWS fuzzer cannot test). Mixes bounded
    offsets, UNBOUNDED, and CURRENT ROW (= peer group, not row) ends;
    NULL sort keys are injected via NULLIF to exercise the
    NULLS-sort-placement interaction with frame evaluation. NULL
    placement is pinned EXPLICITLY (and randomized): the engines'
    defaults disagree — Spark windows sort NULLS FIRST for ASC, DuckDB
    NULLS LAST — so bare `ORDER BY key` is ambiguous SQL whose
    UNBOUNDED frames legitimately differ (this fuzzer's first catch:
    8/45 initial seeds diverged exactly this way)."""
    rng = random.Random(seed + 50_000)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey % 7"])
    target = _num_expr(rng)
    # numeric sort key, sometimes NULL
    key = rng.choice(
        ["l_partkey", "l_suppkey * 3", f"NULLIF(l_partkey % {rng.randint(50, 500)}, 1)"]
    )
    key = f"{key} {rng.choice(['NULLS FIRST', 'NULLS LAST'])}"
    lo = rng.choice(
        ["UNBOUNDED PRECEDING", f"{rng.randint(0, 800)} PRECEDING", "CURRENT ROW"]
    )
    hi = rng.choice([f"{rng.randint(0, 800)} FOLLOWING", "CURRENT ROW"])
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        hi = "100 FOLLOWING"
    fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
    return (
        f"SELECT l_orderkey, l_linenumber,"
        f" {fn}({target}) OVER (PARTITION BY {part}"
        f" ORDER BY {key} RANGE BETWEEN {lo} AND {hi}) AS w"
        f" FROM lineitem WHERE l_orderkey < 3000"
        f" ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST,"
        f" w NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(45))
def test_random_range_frame_agrees_across_engines(spark, sf_dir, seed):
    sql = _range_frame_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzrf_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _nullable_scalar(rng: random.Random, kind: str) -> str:
    """Small-cardinality, NULL-injecting scalar of a FIXED kind —
    set-op semantics only bite when branches overlap AND carry NULLs
    (set ops treat NULLs as equal; WHERE treats them as unknown — the
    classic divergence pit). The kind is pinned per output column
    because cross-branch INT-vs-STRING coercion is a dialect choice
    (Spark picks BIGINT and ANSI-fails on 'A'; DuckDB picks VARCHAR) —
    a generator that mixes them fuzzes the dialect, not the engine."""
    if kind == "str":
        return (
            f"CASE WHEN CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" > {rng.randint(500, 4000)} THEN l_returnflag END"
        )
    if rng.random() < 0.5:
        return f"NULLIF(l_linenumber % {rng.randint(2, 5)}, {rng.randint(0, 2)})"
    return f"(l_suppkey % {rng.randint(2, 7)})"


def _setop_query(seed: int) -> str:
    rng = random.Random(seed)
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    )
    kx, ky = rng.choice(["int", "str"]), rng.choice(["int", "str"])
    x1, y1 = _nullable_scalar(rng, kx), _nullable_scalar(rng, ky)
    # branch 2 reuses branch 1's shape ~half the time so the set op has
    # real overlap to dedup/subtract
    if rng.random() < 0.5:
        x2, y2 = x1, y1
    else:
        x2, y2 = _nullable_scalar(rng, kx), _nullable_scalar(rng, ky)
    p1, p2 = _predicate(rng), _predicate(rng)
    return (
        f"SELECT x, y FROM ("
        f"(SELECT {x1} AS x, {y1} AS y FROM lineitem WHERE {p1})"
        f" {op} "
        f"(SELECT {x2} AS x, {y2} AS y FROM lineitem WHERE {p2})"
        f") t ORDER BY x NULLS LAST, y NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(60))
def test_random_set_operation_agrees_across_engines(spark, sf_dir, seed):
    """UNION/INTERSECT/EXCEPT [ALL] with NULL-bearing, overlapping
    branches: NULL-equality in set semantics, ALL-multiplicity
    bookkeeping, and mixed-type branch coercion."""
    sql = _setop_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzz_setop_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _grouping_sets_query(seed: int) -> str:
    rng = random.Random(seed)
    # one NULL-injected key: its NULL-key groups are distinguishable
    # from super-aggregate rows ONLY via GROUPING() — the pit this
    # generator aims at
    keys = [
        f"NULLIF(l_linenumber, {rng.randint(1, 4)})",
        "l_returnflag",
        f"(l_suppkey % {rng.randint(2, 4)})",
    ]
    rng.shuffle(keys)
    a, b, c = keys
    # every pool entry's UNION covers all three keys: Spark rejects
    # GROUPING(x) for x absent from the grouping columns
    sets_pool = [
        f"(({a}, {b}, {c}), ({a}, {b}), ({a}), ())",
        f"(({a}, {b}), ({b}, {c}), ({a}, {c}))",
        f"(({a}), ({b}), ({c}))",
        f"(({a}, {b}, {c}), ({c}), ())",
    ]
    sets = rng.choice(sets_pool)
    agg = _num_expr(rng)
    pred = _predicate(rng)
    sql = (
        f"SELECT {a} AS ka, {b} AS kb, {c} AS kc,"
        f" GROUPING({a}) AS ga, GROUPING({b}) AS gb, GROUPING({c}) AS gc,"
        f" COUNT(*) AS n, SUM({agg}) AS s"
        f" FROM lineitem WHERE {pred}"
        f" GROUP BY GROUPING SETS {sets}"
        f" ORDER BY ka NULLS LAST, kb NULLS LAST, kc NULLS LAST,"
        f" ga NULLS LAST, gb NULLS LAST, gc NULLS LAST,"
        f" n NULLS LAST, s NULLS LAST"
    )
    return sql, sets.endswith("())"), pred


@pytest.mark.parametrize("seed", _seeds(40))
def test_random_grouping_sets_agrees_across_engines(spark, sf_dir, seed):
    """GROUPING SETS where one key is NULL-injected: the NULL-as-value
    vs NULL-as-super-aggregate-marker distinction must agree, including
    GROUPING() bits and duplicate grouping sets.

    FOUND DIVERGENCE (this fuzzer, round 4): over an EMPTY filtered
    input, DuckDB emits the () super-aggregate row (COUNT=0, standard
    UNION-ALL-of-sets semantics) while Spark emits no rows at all —
    inconsistently with Spark's own plain ungrouped aggregate, which
    does return the 0-count row. Pinned in
    test_empty_input_grouping_sets_divergence_is_pinned; seeds whose
    predicate filters everything assert that exact shape instead."""
    sql, has_empty_set, pred = _grouping_sets_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    base_n = spark.sql(f"SELECT COUNT(*) AS n FROM lineitem WHERE {pred}").collect()[0]["n"]
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzz_gsets_{seed}", s_df, sql, con)
    if base_n == 0:
        assert r.spark_rows == 0, f"seed={seed}: Spark changed empty-input behavior"
        assert r.oracle_rows == (1 if has_empty_set else 0), (
            f"seed={seed}: oracle shape changed\nsql={sql}"
        )
        return
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def test_empty_input_grouping_sets_divergence_is_pinned(spark):
    """The divergence the grouping-sets fuzzer caught, pinned so a
    future Spark that fixes it fails loudly here (then drop the guard
    in the random test): GROUPING SETS (()) over an empty relation
    yields 0 rows in Spark but the standard one 0-count row in DuckDB
    — and Spark's own ungrouped aggregate DOES yield that row."""
    import duckdb

    empty_gs = spark.sql(
        "SELECT COUNT(*) AS n FROM (SELECT 1 AS x WHERE false) "
        "GROUP BY GROUPING SETS (())"
    ).collect()
    plain = spark.sql(
        "SELECT COUNT(*) AS n FROM (SELECT 1 AS x WHERE false)"
    ).collect()
    duck = duckdb.sql(
        "SELECT COUNT(*) AS n FROM (SELECT 1 AS x WHERE false) "
        "GROUP BY GROUPING SETS (())"
    ).fetchall()
    assert empty_gs == []          # Spark: no rows
    assert [r["n"] for r in plain] == [0]  # Spark plain agg: the 0 row
    assert duck == [(0,)]          # DuckDB: the standard 0 row


def _subquery_query(seed: int) -> str:
    """Random scalar + correlated-membership subqueries: (NOT) EXISTS /
    (NOT) IN against a correlated lineitem subquery, a correlated
    scalar COUNT/MAX in the SELECT list, and optionally an uncorrelated
    scalar-aggregate comparison in WHERE. Decorrelation (subquery →
    join rewrite) and NOT IN's three-valued NULL semantics are the two
    places engines classically diverge; every construct here forces
    one of those rewrites. Arithmetic is integer-only by construction."""
    rng = random.Random(seed + 70_000)

    def li_pred():
        col, kind = rng.choice([c for c in LINEITEM_COLS if c[1] != "num"])
        if kind == "str":
            return f"(l.{col} {rng.choice(CMP)} {rng.choice(STR_LITERALS)})"
        return f"(l.{col} {rng.choice(CMP)} {rng.randint(0, 40)})"

    membership = rng.choice(["EXISTS", "NOT EXISTS", "IN", "NOT IN"])
    if membership in ("EXISTS", "NOT EXISTS"):
        member = (
            f"{membership} (SELECT 1 FROM lineitem l"
            f" WHERE l.l_orderkey = o.o_orderkey AND {li_pred()})"
        )
    else:
        # membership over a key subquery; NOT IN exercises 3VL if the
        # inner side were NULL-able — engines must agree either way
        member = (
            f"o.o_custkey {membership} (SELECT c_custkey FROM customer"
            f" WHERE c_mktsegment {rng.choice(CMP)} 'HOUSEHOLD')"
        )
    scalar_kind = rng.choice(["count", "max", "min"])
    if scalar_kind == "count":
        scalar = (
            "(SELECT COUNT(*) FROM lineitem l"
            f" WHERE l.l_orderkey = o.o_orderkey AND {li_pred()})"
        )
    else:
        agg = "MAX" if scalar_kind == "max" else "MIN"
        scalar = (
            f"COALESCE((SELECT {agg}(l.l_linenumber * 100 + l.l_suppkey)"
            f" FROM lineitem l WHERE l.l_orderkey = o.o_orderkey"
            f" AND {li_pred()}), -1)"
        )
    where = [f"o.o_orderkey % {rng.choice([83, 97, 113])} = {rng.randint(0, 3)}", member]
    if rng.random() < 0.5:
        # Uncorrelated scalar-aggregate comparison. The mean threshold
        # is Σcents/COUNT with BOTH operands exact integers promoted to
        # double at the division — bit-identical across engines. (NOT
        # CAST(AVG(..) AS BIGINT): Spark truncates double→bigint where
        # DuckDB rounds, a guaranteed divergence at a boundary collision.)
        where.append(
            "CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) >"
            " (SELECT CAST(SUM(CAST(CAST(o2.o_totalprice AS DECIMAL(14,2))"
            " * 100 AS BIGINT)) AS BIGINT) FROM orders o2)"
            " / (SELECT COUNT(*) FROM orders o2)"
        )
    return (
        f"SELECT o.o_orderkey, o.o_custkey, {scalar} AS sc"
        f" FROM orders o WHERE {' AND '.join(where)}"
        f" ORDER BY o_orderkey NULLS LAST, o_custkey NULLS LAST, sc NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(50))
def test_random_subquery_agrees_across_engines(spark, sf_dir, seed):
    sql = _subquery_query(seed)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzsubq_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def _collation_queries(seed: int) -> tuple[str, str]:
    """(spark_sql, duckdb_sql) pair: random per-row re-casing of a
    string key, then case-insensitive GROUP BY — Spark via COLLATE
    UTF8_LCASE (collation-aware hashing/equality), DuckDB via the
    classic lower() rewrite. ASCII domain by construction, so the two
    formulations must agree exactly; divergence would mean collated
    grouping and lower()-grouping partition rows differently."""
    rng = random.Random(seed + 80_000)
    key = rng.choice(["o_orderstatus", "o_orderpriority"])
    casing = rng.choice(
        [
            f"CASE o_custkey % 3 WHEN 0 THEN upper({key}) WHEN 1 THEN lower({key}) ELSE {key} END",
            f"CASE o_orderkey % 2 WHEN 0 THEN lower({key}) ELSE upper({key}) END",
        ]
    )
    having = rng.randint(0, 3)
    spark_sql = (
        f"SELECT lower(CAST(g AS STRING)) AS gk, COUNT(*) AS n,"
        f" MIN(o_orderkey) AS mn FROM ("
        f"  SELECT {casing} COLLATE UTF8_LCASE AS g, o_orderkey FROM orders)"
        f" GROUP BY g HAVING COUNT(*) > {having}"
        f" ORDER BY gk NULLS LAST, n NULLS LAST, mn NULLS LAST"
    )
    duck_sql = (
        f"SELECT lower(g) AS gk, COUNT(*) AS n, MIN(o_orderkey) AS mn FROM ("
        f"  SELECT {casing} AS g, o_orderkey FROM orders)"
        f" GROUP BY lower(g) HAVING COUNT(*) > {having}"
        f" ORDER BY gk NULLS LAST, n NULLS LAST, mn NULLS LAST"
    )
    return spark_sql, duck_sql


@pytest.mark.parametrize("seed", _seeds(20))
def test_random_collated_grouping_agrees_with_lower_rewrite(spark, sf_dir, seed):
    spark_sql, duck_sql = _collation_queries(seed)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    s_df = spark.sql(spark_sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzcoll_{seed}", s_df, duck_sql, con)
    assert r.match, f"seed={seed}\nspark={spark_sql}\nduck={duck_sql}\ndiff={r.sample_diff[:400]}"


def _string_expr(rng: random.Random, depth: int = 0) -> str:
    """Random string expression over orders string columns. Arguments
    stay inside the CROSS-ENGINE-AGREEING domain: substr offsets >= 1
    and lengths >= 0, left/right lengths >= 0 — the divergent edges
    (offset 0, negative lengths) are pinned separately in
    test_string_function_divergences_are_pinned."""
    if depth >= 2 or rng.random() < 0.45:
        return rng.choice(
            ["o_orderstatus", "o_orderpriority", "'URGENT'", "'x'", "''"]
        )
    inner = lambda: _string_expr(rng, depth + 1)
    k = rng.randrange(9)
    if k == 0:
        return f"substr({inner()}, {rng.randint(1, 4)}, {rng.randint(0, 5)})"
    if k == 1:
        return f"lpad({inner()}, {rng.randint(0, 8)}, 'ab')"
    if k == 2:
        return f"rpad({inner()}, {rng.randint(0, 8)}, 'yz')"
    if k == 3:
        return f"replace({inner()}, 'R', 'Q')"
    if k == 4:
        return f"translate({inner()}, 'LOW', 'low')"
    if k == 5:
        return f"reverse({inner()})"
    if k == 6:
        return f"concat_ws('-', {inner()}, {inner()})"
    if k == 7:
        return f"right({inner()}, {rng.randint(0, 4)})"
    return f"split_part({inner()}, '-', {rng.randint(1, 2)})"


def _string_query(seed: int) -> str:
    rng = random.Random(seed + 90_000)
    e1, e2 = _string_expr(rng), _string_expr(rng)
    return (
        f"SELECT {e1} AS s1, COUNT(*) AS n, MIN({e2}) AS m2,"
        f" MAX(length({e2})) AS l2"
        f" FROM orders WHERE o_orderkey % 7 = {rng.randint(0, 6)}"
        f" GROUP BY {e1}"
        f" ORDER BY s1 NULLS LAST, n NULLS LAST, m2 NULLS LAST, l2 NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(40))
def test_random_string_functions_agree_across_engines(spark, sf_dir, seed):
    sql = _string_query(seed)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzstr_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


def test_string_function_divergences_are_pinned(spark, sf_dir):
    """The string-function edges where Spark and DuckDB genuinely
    disagree — documented so the fuzzer's domain restriction is
    auditable, and so a future Spark/DuckDB upgrade that RESOLVES one
    shows up as a failure here:
    - substr(s, 0, n): Spark treats offset 0 as 1 → 'abc'; DuckDB
      counts position 0 against the length → 'ab'.
    - substr(s, 2, -1): Spark → '' (negative length = empty); DuckDB
      interprets it relative to the start → 'a'.
    - left(s, -1): Spark → ''; DuckDB → all-but-last → 'ab'."""
    con = oracle.duckdb_connection(sf_dir)
    cases = [
        ("substr('abcdef', 0, 3)", "abc", "ab"),
        ("substr('abcdef', 2, -1)", "", "a"),
        ("left('abc', -1)", "", "ab"),
    ]
    for expr, spark_want, duck_want in cases:
        got_s = spark.sql(f"SELECT {expr} AS v").collect()[0].v
        got_d = con.sql(f"SELECT {expr} AS v").fetchall()[0][0]
        assert got_s == spark_want, (expr, got_s)
        assert got_d == duck_want, (expr, got_d)
        assert got_s != got_d


def _datetime_query(seed: int) -> str:
    """Random date/time expression query over events.ts, projected
    through the repo's type-skew-proof conventions: truncations as
    epoch microseconds (epoch_us — registered on the DuckDB side /
    unix_micros-equivalent semantics), field extracts as small ints,
    date arithmetic via date_add on a CAST date. The divergent edges —
    dow numbering, DATE+INTERVAL type promotion, date_trunc return
    types — are excluded here and pinned in
    test_datetime_divergences_are_pinned."""
    rng = random.Random(seed + 100_000)
    trunc = rng.choice(["year", "quarter", "month", "week", "day", "hour"])
    fld = rng.choice(["year", "month", "day", "hour", "minute", "week"])
    nd = rng.randint(-40, 40)
    return (
        f"SELECT extract({fld} FROM CAST(ts AS TIMESTAMP)) AS f,"
        f" COUNT(*) AS n,"
        f" MIN(epoch_us(date_trunc('{trunc}', CAST(ts AS TIMESTAMP)))) AS tmin,"
        f" MAX(epoch_us(CAST(date_add(CAST(ts AS DATE), {nd}) AS TIMESTAMP)))"
        f"   AS dmax,"
        f" MAX(epoch_us(CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP))) AS ldmax"
        f" FROM events WHERE event_id % 11 = {rng.randint(0, 10)}"
        f" GROUP BY 1"
        f" ORDER BY f NULLS LAST, n NULLS LAST, tmin NULLS LAST,"
        f" dmax NULLS LAST, ldmax NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(30))
def test_random_datetime_functions_agree_across_engines(spark, sf_dir, seed):
    sql = _datetime_query(seed)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # Spark has no epoch_us / DuckDB has no unix_micros: register the
    # Spark-side shim as a SQL function so ONE text runs on both
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP) "
        "RETURNS BIGINT RETURN unix_micros(t)"
    )
    # DuckDB has no date_add(date, int): rewrite to (d + n), which it
    # evaluates identically; epoch_us exists natively there
    import re as _re

    duck_sql = _re.sub(
        r"date_add\(CAST\(ts AS DATE\), (-?\d+)\)",
        r"(CAST(ts AS DATE) + \1)",
        sql,
    )
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzdt_{seed}", s_df, duck_sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\nduck={duck_sql}\ndiff={r.sample_diff[:400]}"


def test_datetime_divergences_are_pinned(spark, sf_dir):
    """Date/time edges where the engines genuinely disagree (excluded
    from the fuzzer's domain; a future upgrade resolving one fails
    here):
    - extract(dow): Spark numbers Sunday=1..Saturday=7; DuckDB
      Sunday=0..Saturday=6 (2024-03-14 is a Thursday: 5 vs 4).
    - DATE + INTERVAL 1 MONTH: Spark stays DATE; DuckDB promotes to
      TIMESTAMP (visible through the string cast).
    - date_trunc('week', ts): Spark returns TIMESTAMP; DuckDB DATE."""
    con = oracle.duckdb_connection(sf_dir)
    dow_s = spark.sql("SELECT extract(dow FROM DATE '2024-03-14') AS v").collect()[0].v
    dow_d = con.sql("SELECT extract(dow FROM DATE '2024-03-14') AS v").fetchall()[0][0]
    assert (dow_s, dow_d) == (5, 4)
    pm_s = spark.sql(
        "SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS STRING) AS v"
    ).collect()[0].v
    pm_d = con.sql(
        "SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS VARCHAR) AS v"
    ).fetchall()[0][0]
    assert pm_s == "2024-02-29" and pm_d == "2024-02-29 00:00:00"
    tr_s = spark.sql(
        "SELECT typeof(date_trunc('week', TIMESTAMP '2024-03-14 10:11:12')) AS v"
    ).collect()[0].v
    tr_d = con.sql(
        "SELECT typeof(date_trunc('week', TIMESTAMP '2024-03-14 10:11:12')) AS v"
    ).fetchall()[0][0]
    assert tr_s == "timestamp" and tr_d == "DATE"


# ---------------------------------------------------------------------------
# Family 13 (round 5): multi-way join chains — 3/4-table chains with mixed
# inner/outer join types and random extra ON predicates. The classic
# optimizer-reordering divergence pit (VERDICT r4 item 6): outer-join
# reordering is only legal under precise null-rejection rules, ON-clause
# filters on the preserved side of an outer join must NOT become WHERE
# filters, and chained FULL joins defeat most reorderings entirely. Every
# query aggregates per-side match counts so a single wrongly-null-extended
# or wrongly-dropped row flips the hash.

CUSTOMER_COLS = [
    ("c_custkey", "int"),
    ("c_acctbal", "num"),
    ("c_mktsegment", "str"),
]


def _multijoin_query(seed: int) -> str:
    rng = random.Random(seed + 90_000)
    jts = [
        rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        for _ in range(3)
    ]
    four_way = rng.random() < 0.5

    def extra_on(col: str) -> str:
        # random extra ON predicate — the ON-vs-WHERE semantics trap
        if rng.random() < 0.5:
            return ""
        return f" AND ({col} % {rng.randint(2, 7)} <> {rng.randint(0, 1)})"

    pool = LINEITEM_COLS + ORDERS_COLS + CUSTOMER_COLS

    def pred(depth: int = 0) -> str:
        if depth >= 2 or rng.random() < 0.45:
            col, kind = rng.choice(pool)
            if kind == "str":
                lits = STR_LITERALS + ["'BUILDING'", "'MACHINERY'", "'2-HIGH'"]
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

    where = f" WHERE {pred()}" if rng.random() < 0.7 else ""
    group_col = rng.choice(
        ["l_returnflag", "o_orderstatus", "c_mktsegment", "l_linestatus"]
    )
    chain = (
        f"lineitem {jts[0]} orders"
        f" ON l_orderkey = o_orderkey{extra_on('o_orderkey')}"
        f" {jts[1]} customer"
        f" ON o_custkey = c_custkey{extra_on('c_custkey')}"
    )
    sel_supp = ""
    if four_way:
        chain += (
            f" {jts[2]} supplier"
            f" ON l_suppkey = s_suppkey{extra_on('s_suppkey')}"
        )
        sel_supp = " COUNT(s_suppkey) AS n_supp,"
    return (
        f"SELECT {group_col} AS g, COUNT(*) AS n,"
        f" COUNT(l_orderkey) AS n_li, COUNT(o_custkey) AS n_ord,"
        f" COUNT(c_custkey) AS n_cust,{sel_supp}"
        f" MIN(l_orderkey) AS mn, MAX(o_orderkey) AS mx"
        f" FROM {chain}{where} GROUP BY {group_col}"
        f" ORDER BY g NULLS LAST, n NULLS LAST, n_li NULLS LAST,"
        f" n_ord NULLS LAST, n_cust NULLS LAST, mn NULLS LAST, mx NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(50))
def test_random_multiway_join_chain_agrees_across_engines(spark, sf_dir, seed):
    sql = _multijoin_query(seed)
    for t in ("lineitem", "orders", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzmultijoin_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


# ---------------------------------------------------------------------------
# Family 14 (round 5): window functions OVER a join result — ranking and
# running aggregates computed after an inner/left join, where a join bug
# (dropped/duplicated row) shifts EVERY subsequent rank in the partition.
# Join types restricted to JOIN/LEFT JOIN so (l_orderkey, l_linenumber)
# stays a non-null unique tiebreak — ranking is total-ordered and
# deterministic by construction.


def _join_window_query(seed: int) -> str:
    rng = random.Random(seed + 95_000)
    jt = rng.choice(["JOIN", "LEFT JOIN"])
    part = rng.choice(["l_returnflag", "l_linestatus", "o_orderstatus"])
    func = rng.choice(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            "COUNT(*)",
            "SUM(l_orderkey)",
            "MIN(l_linenumber)",
        ]
    )
    desc = rng.choice(["ASC", "DESC"])
    k = rng.randint(1, 25)
    filt = rng.choice(
        [
            f"l_orderkey % {rng.randint(2, 9)} = 0",
            f"l_quantity >= {rng.randint(1, 40)}",
            f"o_orderstatus <> '{rng.choice(['F', 'O', 'P'])}'",
        ]
    )
    ranked = func in ("ROW_NUMBER()", "RANK()", "DENSE_RANK()")
    outer_filter = f" WHERE w <= {k}" if ranked else ""
    # part may be NULL under LEFT JOIN when partitioning on an orders
    # column — explicit NULLS LAST keeps both engines' partitions and
    # output order aligned
    return (
        f"SELECT g, l_orderkey, l_linenumber, w FROM ("
        f" SELECT {part} AS g, l_orderkey, l_linenumber,"
        f" {func} OVER (PARTITION BY {part}"
        f" ORDER BY l_orderkey {desc} NULLS LAST,"
        f" l_linenumber {desc} NULLS LAST) AS w"
        f" FROM lineitem {jt} orders ON l_orderkey = o_orderkey"
        f" WHERE {filt}) t{outer_filter}"
        f" ORDER BY g NULLS LAST, l_orderkey NULLS LAST,"
        f" l_linenumber NULLS LAST, w NULLS LAST"
    )


@pytest.mark.parametrize("seed", _seeds(50))
def test_random_window_over_join_agrees_across_engines(spark, sf_dir, seed):
    sql = _join_window_query(seed)
    for t in ("lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    s_df = spark.sql(sql)
    con = oracle.duckdb_connection(sf_dir)
    r = oracle.compare(f"fuzzjoinwindow_{seed}", s_df, sql, con)
    assert r.match, f"seed={seed}\nsql={sql}\ndiff={r.sample_diff[:400]}"


# --------------------------------------------------------------------------
# Family 15 (round 6): CDC changelog convergence. Random mixed
# upsert/delete changelogs, randomly partitioned into micro-batches
# applied in RANDOM ORDER in a random write strategy, must converge to
# DuckDB's sequence-ordered latest-change-per-key recompute — the
# apply_changes order-insensitivity law (within-batch dedup +
# stale-skip + delete tombstones) as a differential property.


def _cdc_changelog(seed: int):
    rng = random.Random(880_000 + seed)
    n = rng.randint(10, 40)
    rows = []
    for seq in range(1, n + 1):
        k = rng.randrange(12)
        op = "delete" if rng.random() < 0.35 else "upsert"
        rows.append((k, f"v{seq}" if op == "upsert" else None, seq, op))
    nb = rng.randint(1, 4)
    batches: list[list] = [[] for _ in range(nb)]
    for r in rows:
        batches[rng.randrange(nb)].append(r)
    order = list(range(nb))
    rng.shuffle(order)
    mode = rng.choice(["cow", "mor"])
    return rows, [batches[i] for i in order if batches[i]], mode


@pytest.mark.parametrize("seed", _seeds(8))
def test_random_cdc_changelog_converges_to_latest_per_key(
    spark, tmp_path, seed
):
    import duckdb

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    rows, batches, mode = _cdc_changelog(seed)
    tbl = SnapshotTable(str(tmp_path / f"cdc{seed}"))
    for b in batches:
        tbl.apply_changes(
            spark,
            spark.createDataFrame(b, "k long, v string, seq long, _op string"),
            ["k"],
            seq_col="seq",
            mode=mode,
        )
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    # the DECLARATIVE batch source must see the identical row set —
    # MOR-mode changelogs leave deletion vectors in the head manifest,
    # so this routes random DV-carrying tables through the DataSource's
    # executor-side position masking every run
    from kafka_database_import_spark.sources.snapshot_batch import register

    register(spark)
    via_ds = sorted(
        tuple(r)
        for r in spark.read.format("kdis_snapshot")
        .option("path", tbl.root)
        .load()
        .collect()
    )
    assert via_ds == got, (seed, mode)
    vals = ", ".join(
        f"({k}, {'NULL' if v is None else repr(v)}, {s}, '{op}')"
        for k, v, s, op in rows
    )
    con = duckdb.connect()  # keep a reference: a GC'd connection
    want = sorted(  # closes mid-query ("Connection has already been closed")
        tuple(r)
        for r in con.sql(
            f"WITH ch(k, v, seq, op) AS (VALUES {vals}), "
            f"latest AS (SELECT k, v, seq, op, ROW_NUMBER() OVER "
            f"(PARTITION BY k ORDER BY seq DESC) AS rn FROM ch) "
            f"SELECT k, v, seq FROM latest WHERE rn = 1 AND op = 'upsert'"
        ).fetchall()
    )
    assert got == want, (seed, mode, got, want)


# ---------------------------------------------------------------------------
# family 16: random RESTOREs interleaved with CDC apply batches (round 7).
# A restore rewinds the WHOLE sequencing state — live rows, stored seqs,
# and delete tombstones — so post-restore batches (including verbatim
# replays of pre-restore batches, which the rewound guards must accept
# again) converge to the model's state, not the pre-restore lineage's.


def _cdc_restore_script(seed: int):
    rng = random.Random(916_000 + seed)
    ops = []
    seq = 0
    n_ops = rng.randint(4, 8)
    past_batches: list[list] = []
    for _ in range(n_ops):
        kind = rng.random()
        if kind < 0.25 and ops:
            ops.append(("restore", None))
        elif kind < 0.40 and past_batches:
            ops.append(("replay", rng.choice(past_batches)))
        else:
            batch = []
            for _ in range(rng.randint(3, 8)):
                seq += 1
                k = rng.randrange(8)
                op = "delete" if rng.random() < 0.3 else "upsert"
                batch.append((k, f"v{seq}" if op == "upsert" else None, seq, op))
            past_batches.append(batch)
            ops.append(("apply", batch))
    return ops


def _model_apply(live, guards, batch):
    """Reference semantics of apply_changes: latest change per key in
    the batch (seqs are globally unique, so no tie-breaking), stale
    changes (seq <= stored guard, where tombstones keep guarding) are
    skipped."""
    winners = {}
    for k, v, s, op in batch:
        if k not in winners or s > winners[k][1]:
            winners[k] = (v, s, op)
    for k, (v, s, op) in winners.items():
        if k in guards and s <= guards[k]:
            continue
        guards[k] = s
        if op == "upsert":
            live[k] = (v, s)
        else:
            live.pop(k, None)


@pytest.mark.parametrize("seed", _seeds(8))
def test_random_restores_interleaved_with_cdc_converge(spark, tmp_path, seed):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    ops = _cdc_restore_script(seed)
    tbl = SnapshotTable(str(tmp_path / f"cdcr{seed}"))
    live: dict = {}
    guards: dict = {}
    states: dict[int, tuple] = {}
    rng = random.Random(917_000 + seed)
    for kind, payload in ops:
        if kind == "restore":
            if not states:
                continue
            target = rng.choice(sorted(states))
            newv = tbl.restore(target)
            live = dict(states[target][0])
            guards = dict(states[target][1])
            states[newv] = (dict(live), dict(guards))
        else:  # apply or replay
            res = tbl.apply_changes(
                spark,
                spark.createDataFrame(
                    payload, "k long, v string, seq long, _op string"
                ),
                ["k"],
                seq_col="seq",
            )
            _model_apply(live, guards, payload)
            if res["version"] is not None:
                states[res["version"]] = (dict(live), dict(guards))
    if tbl.latest_version() is None:
        assert not live
        return
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    want = sorted((k, v, s) for k, (v, s) in live.items())
    assert got == want, (seed, ops, got, want)


# ---------------------------------------------------------------------------
# family 17 (round 9): bloom-sidecar pruning is PLANNING-ONLY. The same
# random CDC changelog applied to a bloom_cols table and to a plain
# table must converge to the identical state, no matter how hostile the
# bloom configuration: deliberately tiny (saturated, ~100% fp) bits,
# tight rows-per-file (many files -> many per-file prune decisions),
# string or long keys, COW or MOR, and sidecars randomly deleted
# mid-stream (the crash-between-data-and-sidecar state). Any divergence
# would mean a false-negative prune — the one bug class the probe's
# exact-canon construction forbids. read_keys rides the same law.


@pytest.mark.parametrize("seed", _seeds(8))
def test_random_cdc_on_bloom_table_matches_plain(spark, tmp_path, seed):
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        _bloom_sidecar_path,
    )

    rows, batches, mode = _cdc_changelog(seed)
    rng = random.Random(990_000 + seed)
    bits = rng.choice([64, 1024, 65536])  # 64 bits = saturated on purpose
    as_str = rng.random() < 0.5

    def key(k):
        return f"key-{k:03d}" if as_str else k

    ktype = "string" if as_str else "long"
    plain = SnapshotTable(str(tmp_path / "plain"))
    bloom = SnapshotTable(
        str(tmp_path / "bloom"), bloom_cols=["k"], bloom_bits=bits
    )
    if rng.random() < 0.5:  # tight files -> more prune decisions
        mrpf = rng.randint(2, 6)
        plain.max_records_per_file = mrpf
        bloom.max_records_per_file = mrpf
    for b in batches:
        bdf = [(key(k), v, s, op) for k, v, s, op in b]
        schema = f"k {ktype}, v string, seq long, _op string"
        for t in (plain, bloom):
            t.apply_changes(
                spark,
                spark.createDataFrame(bdf, schema),
                ["k"],
                seq_col="seq",
                mode=mode,
            )
        if rng.random() < 0.5:  # simulate a sidecar-build crash
            files = bloom.manifest()["files"]
            if files:
                try:
                    os.unlink(
                        _bloom_sidecar_path(bloom.root, rng.choice(files))
                    )
                except FileNotFoundError:
                    pass
    got_b = sorted(tuple(r) for r in bloom.read(spark).collect())
    got_p = sorted(tuple(r) for r in plain.read(spark).collect())
    assert got_b == got_p, (seed, mode, bits, as_str)
    # same law through the declarative source, on the bloom table
    # (random sidecar deletions + MOR deletion vectors both in play)
    from kafka_database_import_spark.sources.snapshot_batch import register

    register(spark)
    via_ds = sorted(
        tuple(r)
        for r in spark.read.format("kdis_snapshot")
        .option("path", bloom.root)
        .load()
        .collect()
    )
    assert via_ds == got_b, (seed, mode, bits, as_str)
    # read_keys obeys the same law: identical to read().filter()
    probe = [key(k) for k in (0, 5, 11)]
    via_keys = sorted(
        tuple(r) for r in bloom.read_keys(spark, {"k": probe}).collect()
    )
    want = sorted(t for t in got_b if t[0] in set(probe))
    assert via_keys == want, (seed, mode, bits, as_str)


# family 18 (round 9): the DECLARATIVE WRITER is commit-equivalent.
# The same random batch sequence — appends, occasional overwrites,
# occasional subset-schema appends, random rows-per-file rolling,
# blooms on or off — lands once through df.write.format(
# "kdis_snapshot") and once through SnapshotTable.commit; the two
# tables must read identically, evolve identically under a subsequent
# DML, and expose the same public schema. Any divergence means the
# writer's manifest protocol drifted from the table's own (field ids,
# file lists, carried extras) — the one bug class interop tests with
# fixed shapes can miss.


@pytest.mark.parametrize("seed", _seeds(6))
def test_random_writer_sequence_matches_snapshot_commit(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_batch import register

    register(spark)
    rng = random.Random(870_000 + seed)
    ds_root = str(tmp_path / "ds")
    st_root = str(tmp_path / "st")
    mrpf = rng.choice([0, 37, 100])
    bloom = rng.random() < 0.5
    lo = 0
    evolved = False
    for i in range(rng.randint(2, 5)):
        n = rng.randint(1, 400)
        mode = "overwrite" if (i and rng.random() < 0.25) else "append"
        subset = bool(i) and mode == "append" and rng.random() < 0.3
        # random additive evolution (round 11): the ds side must land it
        # via option("mergeSchema") exactly as commit() lands it
        evolve = bool(i) and not subset and rng.random() < 0.35
        df = spark.range(lo, lo + n).selectExpr(
            "id AS k", "cast(id % 7 as string) AS s"
        )
        if evolve or (evolved and not subset):
            df = df.withColumn("e", (F.col("k") * 3).cast("long"))
            evolved = True
        lo += n
        if subset:
            df = df.select("k")
        w = df.write.format("kdis_snapshot").option("path", ds_root)
        if evolved:
            w = w.option("mergeSchema", "true")
        if mrpf:
            w = w.option("maxRecordsPerFile", str(mrpf))
        if bloom:
            w = w.option("bloomCols", "k").option("bloomBits", "4096")
        w.mode(mode).save()
        tbl = SnapshotTable(
            st_root,
            bloom_cols=["k"] if bloom else None,
            bloom_bits=4096,
        )
        if mrpf:
            tbl.max_records_per_file = mrpf
        tbl.commit(df, mode=mode)

    def rows(root):
        return sorted(
            tuple(r) for r in SnapshotTable(root).read(spark).collect()
        )

    assert rows(ds_root) == rows(st_root)
    # the manifest schemas must be BYTE-identical (field ids included)
    a = SnapshotTable(ds_root).manifest()["schema"]
    b = SnapshotTable(st_root).manifest()["schema"]
    assert a == b, (a, b)
    # both tables must take the same DML the same way afterwards
    for root in (ds_root, st_root):
        SnapshotTable(root).delete_where(spark, F.col("k") % 5 == 0)
    assert rows(ds_root) == rows(st_root)


# family 18b (round 11): the declarative writer under an ACTIVE
# PARTITION SPEC is commit-equivalent — same rows, same typed partition
# tuples in the manifest (the writer's Python transform mirror vs the
# table's Spark write expressions), same partition-pruned reads.


@pytest.mark.parametrize("seed", _seeds(5))
def test_random_partitioned_writer_matches_snapshot_commit(
    spark, tmp_path, seed
):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_batch import register

    register(spark)
    rng = random.Random(871_000 + seed)
    spec = rng.choice(
        [["s"], ["month(d)"], ["bucket(4, k)"], ["s", "truncate(50, k)"]]
    )
    ds_root = str(tmp_path / "ds")
    st_root = str(tmp_path / "st")
    lo = 0
    for i in range(rng.randint(2, 4)):
        n = rng.randint(1, 300)
        df = spark.range(lo, lo + n).selectExpr(
            "id AS k",
            "cast(id % 5 as string) AS s",
            "date_add(date'2024-01-01', cast(id % 75 as int)) AS d",
        )
        lo += n
        if i == 0:  # both tables born partitioned via SnapshotTable
            for root in (ds_root, st_root):
                SnapshotTable(root, partition_by=spec).commit(df)
            continue
        df.write.format("kdis_snapshot").option("path", ds_root).mode(
            "append"
        ).save()
        SnapshotTable(st_root).commit(df)

    def rows(root):
        return sorted(
            tuple(r) for r in SnapshotTable(root).read(spark).collect()
        )

    assert rows(ds_root) == rows(st_root), (seed, spec)
    ds_m, st_m = SnapshotTable(ds_root).manifest(), SnapshotTable(
        st_root
    ).manifest()
    tuples = lambda m: sorted(
        tuple(sorted(d.items())) for d in m["file_partitions"].values()
    )
    # same multiset of typed tuples => the two transform
    # implementations agree on every written value
    assert set(tuples(ds_m)) == set(tuples(st_m)), (seed, spec)
    assert set(ds_m["file_partitions"]) == set(ds_m["files"])
    # partition-pruned read equals exact recompute on the ds table
    probe = {"s": "2"} if "s" in spec else (
        {"d": "2024-02-10"} if "month(d)" in spec else {"k": 7}
    )
    got = SnapshotTable(ds_root).read_partition(spark, probe)
    col = next(iter(probe))
    want = SnapshotTable(ds_root).read(spark).filter(
        F.col(col) == probe[col]
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    ), (seed, spec)


# ---------------------------------------------------------------------------
# family 19 (round 11): incremental MV maintenance converges. Random base
# mutation scripts (multi-row appends, cow/mor deletes by predicate, merge
# upserts, compactions) with refreshes sprinkled at random points — after
# every refresh the view must equal a from-scratch recompute of the base
# head, for count/sum AND the non-self-maintainable min/max. The view table
# is ALSO read back through the declarative DataSource each time, so mode
# 'replace' manifests stay interop-covered.



def _nsort(rows):
    """Sort tuples that may carry None (NULL group keys)."""
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))

def _mv_script(seed: int):
    rng = random.Random(1_911_000 + seed)
    ops = []
    next_k = 100
    for _ in range(rng.randint(4, 8)):
        r = rng.random()
        if r < 0.35:
            n = rng.randint(2, 6)
            ops.append(
                (
                    "append",
                    [
                        (
                            rng.choice(["a", "b", "c", "d", None]),
                            next_k + i,
                            rng.randrange(-50, 100),
                        )
                        for i in range(n)
                    ],
                )
            )
            next_k += n
        elif r < 0.55:
            ops.append(("delete", rng.randrange(5), rng.choice(["cow", "mor"])))
        elif r < 0.7:
            ops.append(
                (
                    "merge",
                    [
                        (
                            rng.choice(["a", "b", "e", None]),
                            rng.randrange(next_k),  # any live-or-dead key
                            rng.randrange(-50, 100),
                        )
                        for _ in range(rng.randint(1, 3))
                    ],
                )
            )
        elif r < 0.8:
            ops.append(("compact",))
        else:
            ops.append(("refresh",))
    ops.append(("refresh",))
    return ops


@pytest.mark.parametrize("seed", _seeds(6))
def test_random_mutations_mv_refresh_converges(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.mv import MaterializedView
    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_batch import register

    register(spark)
    base = SnapshotTable(str(tmp_path / f"mvbase{seed}"))
    rng = random.Random(1_911_500 + seed)
    base.commit(
        spark.createDataFrame(
            [
                (rng.choice(["a", "b", "c", None]), k, rng.randrange(-50, 100))
                for k in range(100)
            ],
            "g string, k long, x long",
        )
    )
    mv = MaterializedView.create(
        spark,
        base,
        str(tmp_path / f"mv{seed}"),
        ["g"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "min", "col": "x", "alias": "mn"},
            {"fn": "max", "col": "x", "alias": "mx"},
            # round 13: bitmap-backed countd joins the insert-only
            # upgrade — pure-append windows below must STILL take
            # delta_insert_only with it in the mix (the OR-merge), and
            # every delete window's recompute must rewrite its state
            {"fn": "countd", "col": "x", "alias": "ndx"},
        ],
    )
    dedup_keys = set(range(100))

    def _recompute():
        return _nsort(
            tuple(r)
            for r in base.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
                F.count_distinct("x").alias("ndx"),
            )
            .collect()
        )

    window_pure_append = True  # round 12: no delete-capable op since
    # the last refresh -> the MIN/MAX view must take (or beat) the
    # delta_insert_only upgrade, never pay a recompute
    for i, op in enumerate(_mv_script(seed)):
        if op[0] == "append":
            base.commit(
                spark.createDataFrame(op[1], "g string, k long, x long")
            )
            dedup_keys.update(k for _, k, _ in op[1])
        elif op[0] == "delete":
            window_pure_append = False
            base.delete_where(
                spark, (F.col("k") % 5) == op[1], mode=op[2]
            )
        elif op[0] == "merge":
            window_pure_append = False
            # merge source needs unique keys per batch
            uniq = {k: (g, k, x) for g, k, x in op[1]}
            base.merge_rows(
                spark,
                spark.createDataFrame(
                    list(uniq.values()), "g string, k long, x long"
                ),
                key_cols=["k"],
            )
        elif op[0] == "compact":
            base.compact(spark, target_files=2)
        else:
            res = mv.refresh(spark)
            if window_pure_append:
                # one-directional: a window that MIGHT net deletes
                # (merge can be insert-only in practice) may still
                # upgrade, but a provably append-only window must
                assert res["noop"] or res["strategy"] == (
                    "delta_insert_only"
                ), (seed, i, res)
            window_pure_append = True
            got = _nsort(tuple(r) for r in mv.read(spark).collect())
            assert got == _recompute(), (seed, i)
            raw = (
                spark.read.format("kdis_snapshot")
                .option("path", mv.root)
                .load()
            )
            # the declarative source exposes the STORED table — since
            # round 13 that includes the countd bitmap state; a public
            # consumer sees the visible columns
            vis = [c for c in raw.columns if not c.startswith("__")]
            via_ds = _nsort(tuple(r) for r in raw.select(*vis).collect())
            assert via_ds == got, (seed, i, "datasource read diverged")
    assert mv.applied_base_version() == base.latest_version()


# family 19b (round 11; AVG added round 12): the DELTA fast path
# (all-COUNT/SUM/AVG views apply change rows arithmetically, never
# re-reading the base) must converge to the same state the recompute
# path / a from-scratch recompute produces — including NULL values in
# the summed column (SUM over zero non-null values must come back NULL,
# AVG likewise, both tracked by the hidden counters) and NULL group
# keys. The AVG expectation uses the exact-sum/count definition the
# view documents (identical to DuckDB AVG over integers).


@pytest.mark.parametrize("seed", _seeds(6))
def test_random_mutations_mv_delta_path_converges(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.mv import MaterializedView
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    base = SnapshotTable(str(tmp_path / f"mvdbase{seed}"))
    rng = random.Random(1_912_000 + seed)

    def _x():
        return None if rng.random() < 0.2 else rng.randrange(-50, 100)

    base.commit(
        spark.createDataFrame(
            [
                (rng.choice(["a", "b", "c", None]), k, _x())
                for k in range(60)
            ],
            "g string, k long, x long",
        )
    )
    mv = MaterializedView.create(
        spark,
        base,
        str(tmp_path / f"mvd{seed}"),
        ["g"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "avg", "col": "x", "alias": "ax"},
        ],
    )
    next_k = 60
    for i in range(5):
        r = rng.random()
        if r < 0.4:
            n = rng.randint(2, 6)
            base.commit(
                spark.createDataFrame(
                    [
                        (rng.choice(["a", "b", "d", None]), next_k + j, _x())
                        for j in range(n)
                    ],
                    "g string, k long, x long",
                )
            )
            next_k += n
        elif r < 0.7:
            base.delete_where(
                spark,
                (F.col("k") % 4) == rng.randrange(4),
                mode=rng.choice(["cow", "mor"]),
            )
        else:
            uniq = {
                k: (rng.choice(["a", "b", None]), k, _x())
                for k in [rng.randrange(next_k) for _ in range(3)]
            }
            base.merge_rows(
                spark,
                spark.createDataFrame(
                    list(uniq.values()), "g string, k long, x long"
                ),
                key_cols=["k"],
            )
        res = mv.refresh(spark)
        assert res["noop"] or res["strategy"] == "delta", (seed, i, res)
        got = _nsort(tuple(r) for r in mv.read(spark).collect())
        want = _nsort(
            tuple(r)
            for r in base.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
                F.when(
                    F.count("x") > 0,
                    F.sum("x").cast("double") / F.count("x"),
                ).alias("ax"),
            )
            .collect()
        )
        assert got == want, (seed, i)
    assert mv.applied_base_version() == base.latest_version()


# family 20 (round 11): replace_where_keys vs a pure-Python multiset
# model. Random single- and composite-key scoped replaces (empty scopes,
# empty replacements, NULL keys, replacements that shrink/grow groups)
# over a growing table — after every op the table equals the model, and
# the epoch stamp round-trips.


@pytest.mark.parametrize("seed", _seeds(6))
def test_random_scoped_replaces_match_model(spark, tmp_path, seed):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    rng = random.Random(1_920_000 + seed)
    key_cols = ["g"] if seed % 2 == 0 else ["g", "h"]
    schema = "g string, h long, k long, x long"

    def row(k):
        return (
            rng.choice(["a", "b", "c", None]),
            rng.randrange(3),
            k,
            rng.randrange(100),
        )

    model = [row(k) for k in range(25)]
    tbl = SnapshotTable(str(tmp_path / f"rwk{seed}"))
    tbl.commit(spark.createDataFrame(model, schema))
    next_k = 1000
    for i in range(rng.randint(3, 6)):
        n_keys = rng.randint(0, 3)
        scope = {
            tuple(
                (rng.choice(["a", "b", "c", "zzz", None]), rng.randrange(3))[
                    : len(key_cols)
                ]
            )
            for _ in range(n_keys)
        }
        n_repl = rng.randint(0, 4)
        repl = []
        for _ in range(n_repl):
            if not scope:
                break
            kt = rng.choice(sorted(scope, key=str))
            g = kt[0]
            h = kt[1] if len(key_cols) == 2 else rng.randrange(3)
            repl.append((g, h, next_k, rng.randrange(100)))
            next_k += 1
        key_schema = "g string" if len(key_cols) == 1 else "g string, h long"
        keys_df = spark.createDataFrame(
            sorted(scope, key=str), key_schema
        ) if scope else spark.createDataFrame([], key_schema)
        repl_df = spark.createDataFrame(repl, schema) if repl else (
            spark.createDataFrame([], schema)
        )
        epoch = 7000 + i
        res = tbl.replace_where_keys(
            spark, keys_df, repl_df, key_cols, epoch_id=epoch
        )
        # model: drop rows whose key tuple is in scope, append repl
        def kt_of(r):
            return tuple(r[: len(key_cols)])

        model = [r for r in model if kt_of(r) not in scope] + repl
        got = _nsort(tuple(r) for r in tbl.read(spark).collect())
        assert got == _nsort(model), (seed, i)
        if res["replaced_rows"] or res["inserted_rows"]:
            # a publishing replace stamps its epoch atomically
            assert tbl.manifest()["epoch_id"] == epoch


# -------------------------------------------- round-13: star-join MV fuzz


@pytest.mark.parametrize("seed", _seeds(5))
def test_random_mutations_star_mv_converges(spark, tmp_path, seed):
    """Random mutation scripts on FACT and DIM of a star view
    (VERDICT r12 item 1's fuzz family): after every refresh the view
    must equal a from-scratch fact ⋈ dim aggregate. Round-13 SCD-delta
    contract (ADVICE r13 docstring fix): a window carrying a LOGICAL
    dim change maintains INCREMENTALLY — the refresh result carries
    ``dim_delta`` (or is a noop when the change touched no fact row
    and no group) and ``rebuild_dims`` never fires; dim compaction
    alone must NOT register as a logical change. Half the seeds run a
    delta-eligible COUNT/SUM view, half a MIN/MAX (recompute) view,
    so both maintenance paths fuzz against both mutation sides. The
    view's rebuild-cost cap is pinned to 0 so the cost-based `auto`
    (round 14) keeps taking the structural SCD path under fuzz — the
    cost-based choice has its own deterministic tests."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.mv import MaterializedView
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    rng = random.Random(1_913_000 + seed)
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    attrs = ["w", "x", "y", "z"]
    dim.commit(
        spark.createDataFrame(
            [(i, rng.choice(attrs)) for i in range(8)],
            "d_id long, attr string",
        )
    )
    next_k = 60
    fact.commit(
        spark.createDataFrame(
            # d_id 0..9: ids 8,9 have NO dim row (inner-join drops)
            [
                (rng.randrange(10), k, rng.randrange(-50, 100))
                for k in range(next_k)
            ],
            "f_did long, k long, x long",
        )
    )
    aggs = (
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
        ]
        if seed % 2 == 0
        else [
            {"fn": "min", "col": "x", "alias": "mn"},
            {"fn": "max", "col": "x", "alias": "mx"},
        ]
    )
    mv = MaterializedView.create(
        spark,
        fact,
        str(tmp_path / "mv"),
        ["attr"],
        aggs,
        join_spec=[
            {
                "dim_root": dim.root,
                "fact_keys": ["f_did"],
                "dim_keys": ["d_id"],
                "cols": ["attr"],
                "how": "inner",
            }
        ],
    )
    # keep cost-based auto (round 14) from short-circuiting the SCD
    # delta on this tiny fixture — the structural path is what fuzzes
    mv.REBUILD_BYTES_CAP = 0

    def _recompute():
        j = fact.read(spark).join(
            dim.read(spark), F.col("f_did") == F.col("d_id")
        )
        exprs = [
            {
                "n": F.count(F.lit(1)).cast("long").alias("n"),
                "sx": F.sum("x").alias("sx"),
                "mn": F.min("x").alias("mn"),
                "mx": F.max("x").alias("mx"),
            }[a["alias"]]
            for a in aggs
        ]
        return _nsort(
            tuple(r)
            for r in j.groupBy("attr").agg(*exprs).collect()
        )

    dim_changed = False
    for step in range(12):
        r = rng.random()
        if r < 0.30:
            rows = [
                (rng.randrange(10), next_k + i, rng.randrange(-50, 100))
                for i in range(rng.randint(1, 6))
            ]
            next_k += len(rows)
            fact.commit(
                spark.createDataFrame(rows, "f_did long, k long, x long")
            )
        elif r < 0.45:
            fact.delete_where(
                spark,
                (F.col("k") % 5) == rng.randrange(5),
                mode=rng.choice(["cow", "mor"]),
            )
        elif r < 0.55:
            uniq = {
                k: (rng.randrange(10), k, rng.randrange(-50, 100))
                for k in rng.sample(range(next_k), 3)
            }
            fact.merge_rows(
                spark,
                spark.createDataFrame(
                    list(uniq.values()), "f_did long, k long, x long"
                ),
                key_cols=["k"],
            )
        elif r < 0.65:
            fact.compact(spark, target_files=2)
        elif r < 0.75:
            dim.merge_rows(
                spark,
                spark.createDataFrame(
                    [(rng.randrange(8), rng.choice(attrs))],
                    "d_id long, attr string",
                ),
                key_cols=["d_id"],
            )
            dim_changed = True
        elif r < 0.82:
            dim.compact(spark)
        else:
            res = mv.refresh(spark)
            if dim_changed:
                # round 13: a single changed dim maintains as an SCD
                # DELTA (delta/recompute/insert-only over the synthetic
                # change rows), never a full rebuild; noop only when
                # the change touched no fact row and no group
                assert res.get("dim_delta") or res["noop"], (
                    seed, step, res,
                )
            else:
                assert res.get("strategy") != "rebuild_dims" and not (
                    res.get("dim_delta")
                ), (seed, step, res)
            dim_changed = False
            assert (
                _nsort(tuple(r) for r in mv.read(spark).collect())
                == _recompute()
            ), (seed, step)
    res = mv.refresh(spark)
    if dim_changed:
        assert res.get("dim_delta") or res["noop"], (seed, res)
    assert (
        _nsort(tuple(r) for r in mv.read(spark).collect()) == _recompute()
    ), seed


# ---------------------------------------------------------------------
# family 21 (round 13, VERDICT r12 item 6): retention under CONCURRENT
# pinned readers. A reader that planned a version-pinned scan BEFORE
# vacuum/expire ran must either (a) return exactly that version's rows
# (its files may survive by reference from retained versions) or (b)
# fail with the documented loud error — NEVER silently wrong/partial
# rows. Re-pinning a dropped version afterwards must raise the
# retention-window FileNotFoundError.


@pytest.mark.parametrize("seed", _seeds(4))
def test_random_vacuum_under_pinned_readers_never_wrong(
    spark, tmp_path, seed
):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        expire_snapshots,
        vacuum,
    )

    rng = random.Random(1_913_500 + seed)
    tbl = SnapshotTable(str(tmp_path / "t"))
    next_k = 0

    def _rows(n):
        nonlocal next_k
        out = [
            (next_k + i, rng.choice("abc"), rng.randrange(100))
            for i in range(n)
        ]
        next_k += n
        return out

    def _snap():
        return _nsort(tuple(r) for r in tbl.read(spark).collect())

    tbl.commit(
        spark.createDataFrame(_rows(8), "k long, g string, x long")
    )
    # history NEVER forgets: the per-version ground truth a surviving
    # pinned read must still reproduce even after retention dropped
    # the version from the table's own window
    history = {tbl.latest_version(): _snap()}
    pinned = []  # (version, lazy DF planned BEFORE any later retention)
    for step in range(14):
        r = rng.random()
        if r < 0.35:
            tbl.commit(
                spark.createDataFrame(
                    _rows(rng.randint(1, 5)), "k long, g string, x long"
                )
            )
        elif r < 0.50:
            tbl.delete_where(
                spark, (F.col("k") % 4) == rng.randrange(4),
                mode=rng.choice(["cow", "mor"]),
            )
        elif r < 0.62:
            tbl.compact(spark, target_files=2)
        elif r < 0.80:
            # pin a reader at a random LIVE version (plan now, act later)
            v = rng.choice(tbl.versions())
            pinned.append((v, tbl.read(spark, version=v)))
        else:
            live = tbl.versions()
            if rng.random() < 0.5:
                vacuum(tbl, retain_last=rng.randint(1, max(1, len(live))))
            else:
                import time as _time

                expire_snapshots(tbl, int(_time.time() * 1000) + 1000)
            # every pre-planned pinned reader: right rows or loud error
            survivors = []
            for v, df in pinned:
                try:
                    got = _nsort(tuple(r) for r in df.collect())
                except Exception as e:
                    msg = f"{type(e).__name__}: {e}"
                    assert (
                        "expired/vacuumed" in msg
                        or "FileNotFound" in msg
                        or "FAILED_READ_FILE" in msg
                        or "PATH_NOT_FOUND" in msg
                    ), (seed, step, v, msg[:400])
                    continue  # loud documented failure — acceptable
                assert got == history[v], (
                    seed, step, v, "pinned read returned WRONG rows",
                )
                survivors.append((v, df))
            pinned = survivors
        v_now = tbl.latest_version()
        if v_now not in history:
            history[v_now] = _snap()
        assert _snap() == history[v_now], (seed, step)
    # re-pinning any dropped version raises the retention-window error
    retained = set(tbl.versions())
    for v in range(1, max(retained) + 1):
        if v not in retained:
            with pytest.raises(FileNotFoundError, match="retention"):
                tbl.read(spark, version=v)


# ---------------------------------------------------------- round 14:
# multi-dim star MV fuzz (VERDICT r13 item 3): 2–3 dimensions with
# RANDOM SIMULTANEOUS dim mutations + fact churn inside one refresh
# window — the chained one-SCD-pass-per-dim path is the round-13
# engine's most complex code, previously covered by a deterministic
# two-dim test only. Even seeds pin REBUILD_BYTES_CAP=0 (every window
# must converge through chained SCD passes; rebuild_dims must never
# fire); odd seeds keep the round-14 cost-based default (tiny fixture →
# auto may rebuild), so BOTH auto policies fuzz against the same
# scripts. After every refresh the view must equal a from-scratch
# fact ⋈ dims aggregate and the pins must sit at the dim heads.


@pytest.mark.parametrize("seed", _seeds(5))
def test_random_multi_dim_star_mv_converges(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.mv import MaterializedView
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    rng = random.Random(1_914_000 + seed)
    n_dims = 2 + (seed % 2)  # alternate 2- and 3-dim stars
    fact = SnapshotTable(str(tmp_path / "fact"))
    dims = [SnapshotTable(str(tmp_path / f"d{i}")) for i in range(n_dims)]
    attrs = ["w", "x", "y", "z"]
    for i, d in enumerate(dims):
        d.commit(
            spark.createDataFrame(
                [(k, rng.choice(attrs)) for k in range(6)],
                f"d{i}_id long, a{i} string",
            )
        )
    next_k = 50
    fact_schema = (
        ", ".join(f"f{i} long" for i in range(n_dims))
        + ", k long, x long"
    )

    def fact_rows(n):
        nonlocal next_k
        rows = [
            tuple(rng.randrange(7) for _ in range(n_dims))  # id 6 unmatched
            + (next_k + i, rng.randrange(-50, 100))
            for i in range(n)
        ]
        next_k += n
        return spark.createDataFrame(rows, fact_schema)

    fact.commit(fact_rows(next_k))
    aggs = (
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
        ]
        if seed % 4 < 2
        else [
            {"fn": "min", "col": "x", "alias": "mn"},
            {"fn": "max", "col": "x", "alias": "mx"},
        ]
    )
    group_cols = [f"a{i}" for i in range(n_dims)]
    mv = MaterializedView.create(
        spark,
        fact,
        str(tmp_path / "mv"),
        group_cols,
        aggs,
        join_spec=[
            {
                "dim_root": d.root,
                "fact_keys": [f"f{i}"],
                "dim_keys": [f"d{i}_id"],
                "cols": [f"a{i}"],
                "how": "inner",
            }
            for i, d in enumerate(dims)
        ],
    )
    structural = seed % 2 == 0
    if structural:
        mv.REBUILD_BYTES_CAP = 0

    def _expected():
        j = fact.read(spark)
        for i, d in enumerate(dims):
            j = j.join(
                d.read(spark), F.col(f"f{i}") == F.col(f"d{i}_id")
            )
        exprs = [
            {
                "n": F.count(F.lit(1)).cast("long").alias("n"),
                "sx": F.sum("x").alias("sx"),
                "mn": F.min("x").alias("mn"),
                "mx": F.max("x").alias("mx"),
            }[a["alias"]]
            for a in aggs
        ]
        return _nsort(
            tuple(r) for r in j.groupBy(*group_cols).agg(*exprs).collect()
        )

    for step in range(10):
        # one WINDOW: a random composite of simultaneous mutations —
        # each dim independently mutates with p=0.5 (so multi-dim
        # windows are common), fact churns with p=0.7
        for i, d in enumerate(dims):
            if rng.random() < 0.5:
                mut = {
                    k: (k, rng.choice(attrs))
                    for k in rng.sample(range(6), rng.randint(1, 3))
                }
                d.merge_rows(
                    spark,
                    spark.createDataFrame(
                        list(mut.values()), f"d{i}_id long, a{i} string"
                    ),
                    key_cols=[f"d{i}_id"],
                )
            elif rng.random() < 0.2:
                d.compact(spark)  # rewrite-only: logically neutral
        r = rng.random()
        if r < 0.4:
            fact.commit(fact_rows(rng.randint(1, 5)))
        elif r < 0.6:
            fact.delete_where(
                spark,
                (F.col("k") % 5) == rng.randrange(5),
                mode=rng.choice(["cow", "mor"]),
            )
        elif r < 0.7:
            uniq = {
                k: tuple(rng.randrange(7) for _ in range(n_dims))
                + (k, rng.randrange(-50, 100))
                for k in rng.sample(range(next_k), 2)
            }
            fact.merge_rows(
                spark,
                spark.createDataFrame(list(uniq.values()), fact_schema),
                key_cols=["k"],
            )
        res = mv.refresh(spark)
        if structural:
            assert res.get("strategy") != "rebuild_dims", (seed, step, res)
        assert _nsort(
            tuple(r) for r in mv.read(spark).collect()
        ) == _expected(), (seed, step, res)
        assert mv.applied_dim_pins() == {
            d.root: d.latest_version() for d in dims
        }, (seed, step)
        assert mv.applied_base_version() == fact.latest_version()
    # terminal replay from a fresh handle is a noop
    fresh = MaterializedView(mv.root)
    if structural:
        fresh.REBUILD_BYTES_CAP = 0
    assert fresh.refresh(spark)["noop"]
