"""DuckDB differential-testing harness (SURVEY §5.2 t2).

Runs a catalog query in Spark and its ANSI-SQL oracle in DuckDB over the
same parquet fixtures, canonicalizes both results (sort columns by name,
sort rows, stringify type-strictly) and compares value hashes — the same
shape as the driver's correctness gate.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from kafka_database_import_spark.sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written part-file directory
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        # Type-strict: keep the float marker (23.0 stays "23.0", never "23")
        # and full precision — the external driver's canonicalizer is
        # type-sensitive, so collapsing int-valued floats or rounding here
        # hides exactly the DOUBLE-vs-LONG skew it flags (q30, round 2).
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(rows: list[tuple], colnames: list[str]) -> list[str]:
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = ["|".join(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def result_hash(rows: list[tuple], colnames: list[str]) -> str:
    h = hashlib.sha256()
    for line in canonicalize(rows, colnames):
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class DiffResult:
    name: str
    spark_rows: int
    oracle_rows: int
    spark_hash: str
    oracle_hash: str
    match: bool
    sample_diff: str = ""


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: "duckdb.DuckDBPyConnection",
) -> DiffResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    o_rows = rel.fetchall()
    o_cols = [d[0] for d in rel.description]
    sh = result_hash(s_rows, s_cols)
    oh = result_hash(o_rows, o_cols)
    diff = ""
    if sh != oh:
        sc = canonicalize(s_rows, s_cols)
        oc = canonicalize(o_rows, o_cols)
        # sets hoisted: building them inside the comprehension predicate
        # re-evaluates set() PER ELEMENT — O(n²) — which turned a large
        # mismatch diff into a multi-hour hang (caught on the 10× sweep)
        oc_set, sc_set = set(oc), set(sc)
        only_s = [x for x in sc if x not in oc_set][:3]
        only_o = [x for x in oc if x not in sc_set][:3]
        diff = (
            f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)} "
            f"spark-only={only_s} oracle-only={only_o}"
        )
    return DiffResult(name, len(s_rows), len(o_rows), sh, oh, sh == oh, diff)


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[DiffResult]:
    from kafka_database_import_spark.plans.registry import all_queries

    con = duckdb_connection(sf_dir)
    results = []
    for name, q in all_queries().items():
        if names and name not in names:
            continue
        if q.oracle is None:
            continue
        df = q.fn(spark, sf_dir)
        results.append(compare(name, df, q.oracle, con))
    return results


def compare_checksum(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: "duckdb.DuckDBPyConnection",
    sum_cols: list[str],
) -> DiffResult:
    """Differential comparison for queries whose OUTPUT is too large to
    hash driver-side (q99k emits 313M rows at 10×): each engine
    aggregates its own result to ``COUNT(*)`` plus exact integer SUMs
    of ``sum_cols``, and only those few integers cross the wire.
    Column sums are order-insensitive and bit-exact for integer
    columns, so a count+sums match over hundreds of millions of rows
    is strong evidence at ~zero transfer cost; value-hash comparison
    (:func:`compare`) remains the method wherever results fit."""
    from pyspark.sql import functions as F

    # Sums run in DECIMAL(38,0): a bigint SUM over hundreds of millions
    # of large values (epoch micros × 4.5M rows ≈ 8×10²¹) overflows
    # int64 under ANSI — DuckDB silently widens to HUGEINT, Spark must
    # be told to. Both sides normalize to Python int before comparing.
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}") for c in sum_cols
    ]
    raw = spark_df.agg(*aggs).collect()[0]
    s = tuple(int(v) if v is not None else None for v in raw)
    sums = ", ".join(f"SUM({c})" for c in sum_cols)
    o_raw = con.sql(f"SELECT COUNT(*), {sums} FROM ({oracle_sql})").fetchone()
    o = tuple(int(v) if v is not None else None for v in o_raw)
    sh, oh = str(s), str(o)
    return DiffResult(name, s[0], o[0], sh, oh, s == o,
                      "" if s == o else f"spark={sh} oracle={oh}")
