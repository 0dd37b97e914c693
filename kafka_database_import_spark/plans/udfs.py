"""User-defined function surface (SURVEY §2.2 Q39–Q42): scalar Python
UDF, vectorized pandas UDF, grouped-agg pandas UDF, table function via
``mapInPandas``.

The reference has no UDFs; this is declared engine surface. Posture:
Arrow-batched pandas UDFs are the only sanctioned Python path for hot
data (10–100× over row-at-a-time); the one row-at-a-time UDF below
(Q39, the API must exist) is deliberately applied to a small dimension
table and documented as the slow path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


# --- Q39: scalar Python UDF (row-at-a-time — the slow path) -----------


@F.udf(returnType=T.StringType())
def _balance_tier(bal: float) -> str:
    if bal is None:
        return "unknown"
    if bal >= 5000:
        return "high"
    if bal >= 0:
        return "mid"
    return "low"


@query(
    "q39_scalar_udf",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal IS NULL THEN 'unknown'
                WHEN c_acctbal >= 5000 THEN 'high'
                WHEN c_acctbal >= 0 THEN 'mid'
                ELSE 'low' END AS tier
    FROM customer
    ORDER BY c_custkey NULLS LAST, tier NULLS LAST
    """,
)
def q39_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (Q39). Row-at-a-time serialization — kept OFF
    fact tables by policy; it exists because the API surface must, and
    runs here on the small customer dimension. The same logic in
    production belongs in ``F.when`` (Catalyst-visible, codegen'd)."""
    cust = load_table(spark, sf_dir, "customer")
    return ordered(cust.select("c_custkey", _balance_tier("c_acctbal").alias("tier")))


# --- Q40: vectorized scalar pandas UDF --------------------------------


@pandas_udf(T.DoubleType())
def _charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    # float64 arithmetic, identical expression order to the SQL twin
    import numpy as np

    return np.floor(price * (1.0 - disc) * (1.0 + tax) * 100 + 0.5) / 100


@query(
    "q40_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
             AS charge
    FROM lineitem
    ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, charge NULLS LAST
    """,
)
def q40_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Q40): Arrow columnar transfer, NumPy
    float64 kernel — the sanctioned Python fast path. The multiply-round
    is the same float64 op sequence as the oracle, so results are
    bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.select(
        "l_orderkey",
        "l_linenumber",
        _charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )
    return ordered(out)


# --- Q41: grouped-aggregate pandas UDF --------------------------------


@pandas_udf(T.DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    import numpy as np

    s = float((price.to_numpy(dtype="float64") * qty.to_numpy(dtype="float64")).sum())
    w = float(qty.to_numpy(dtype="float64").sum())
    return float(np.floor(s / w * 100 + 0.5) / 100) if w else 0.0


@query(
    "q41_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           FLOOR(SUM(l_extendedprice * l_quantity) / SUM(l_quantity) * 100 + 0.5) / 100
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag NULLS LAST, wavg_price NULLS LAST
    """,
)
def q41_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (Q41): quantity-weighted average price per
    return flag. Whole groups arrive as Arrow batches; the kernel is
    NumPy. (Float sums are order-sensitive in the last bits; the
    multiply-round makes both engines agree at 2 decimals.)"""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        _weighted_avg_price("l_extendedprice", "l_quantity").alias("wavg_price")
    )
    return ordered(out)


# --- Q42: table function via mapInPandas ------------------------------

_TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("token", T.StringType()),
    ]
)


@query(
    "q42_udtf_tokenize",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(unnest(range(1, len(t) + 1)) AS INTEGER) AS pos,
           unnest(t) AS token
    FROM toks
    ORDER BY doc_id NULLS LAST, pos NULLS LAST, token NULLS LAST
    """,
)
def q42_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-mapping table function (Q42) via ``mapInPandas``: one input
    document row → many (doc_id, pos, token) rows. Arrow-batched; the
    1→N fan-out shape generalizes to chunking/windowing documents for
    training. (For pure tokenization ``explode`` is the built-in answer
    — q42 exists to exercise the UDTF path itself.)"""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)

    def _tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.lower().str.split(r"\s+", regex=True)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(toks.map(len)),
                    "pos": [i + 1 for t in toks for i in range(len(t))],
                    "token": [w for t in toks for w in t],
                }
            )
            out["pos"] = out["pos"].astype("int32")
            yield out

    out = docs.select("doc_id", "text").mapInPandas(_tokenize, schema=_TOKEN_SCHEMA)
    return ordered(out)


@query(
    "q67_cogroup_merge",
    oracle="""
    WITH e AS (
      SELECT user_id AS uid, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    o AS (
      SELECT o_custkey AS uid, COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(e.uid, o.uid) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(total_cents, 0) AS total_cents
    FROM e FULL OUTER JOIN o ON e.uid = o.uid
    ORDER BY user_id NULLS LAST, n_events NULLS LAST, n_orders NULLS LAST,
             total_cents NULLS LAST
    """,
)
def q67_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: two tables grouped on the same key,
    each key's row sets handed to one Arrow-batched pandas function —
    the escape hatch for per-entity logic that needs BOTH sides at once
    (feature assembly, custom reconciliation). Here the merge is
    deliberately SQL-expressible (two aggregates + full outer join) so
    the DuckDB twin checks the cogroup machinery end-to-end.

    Scale design: the cogroup key is a HASH BUCKET of the entity id,
    not the entity id itself. ``cogroup().applyInPandas`` makes one
    Python call per key — per-entity keys mean per-entity calls, and
    the ~ms call overhead dominates everything (measured 24 s for 15 k
    users at sf0.1, 1.6 ms/key, data volume irrelevant). Bucketing to
    ~4× core count collapses that to a few hundred calls that each
    merge thousands of entities with vectorized pandas groupbys: 1.4 s
    on the same input, and at 100 TB the bucket count scales with the
    cluster, not the entity count. Money is summed in integer cents:
    float summation order inside a pandas group is not deterministic
    cross-engine."""
    n_buckets = 256
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.pmod("user_id", F.lit(n_buckets)).alias("bucket"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        "o_totalprice",
        F.pmod("o_custkey", F.lit(n_buckets)).alias("bucket"),
    )

    def merge(events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame) -> pd.DataFrame:
        # nested: cloudpickled by value (module-ref functions break on
        # foreign-session workers; see streaming/runner.py)
        import numpy as np

        n_ev = (
            events_pdf.groupby("uid").size()
            if len(events_pdf)
            else pd.Series(dtype="int64")
        )
        if len(orders_pdf):
            cents = np.floor(
                orders_pdf["o_totalprice"].to_numpy() * 100 + 0.5
            ).astype("int64")
            by_user = (
                pd.DataFrame({"uid": orders_pdf["uid"], "cents": cents})
                .groupby("uid")["cents"]
                .agg(["size", "sum"])
            )
        else:
            by_user = pd.DataFrame(columns=["size", "sum"])
        idx = n_ev.index.union(by_user.index)
        return pd.DataFrame(
            {
                "user_id": idx.astype("int64"),
                "n_events": n_ev.reindex(idx, fill_value=0).astype("int64"),
                "n_orders": (
                    by_user["size"].reindex(idx, fill_value=0).astype("int64")
                    if len(by_user)
                    else 0
                ),
                "total_cents": (
                    by_user["sum"].reindex(idx, fill_value=0).astype("int64")
                    if len(by_user)
                    else 0
                ),
            }
        )

    out = (
        ev.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(
            merge,
            schema="user_id bigint, n_events bigint, n_orders bigint, "
            "total_cents bigint",
        )
    )
    return ordered(out)


@query(
    "q84_chunk_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id, k AS chunk_id,
           array_to_string(t[k*20+1 : k*20+20], ' ') AS chunk_text
    FROM t, unnest(range(0, (len(t) + 19) // 20)) AS u(k)
    ORDER BY doc_id NULLS LAST, chunk_id NULLS LAST, chunk_text NULLS LAST
    """,
)
def q84_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking (fixed 20-token windows — the RAG/pretraining
    context-window splitter) through Spark 4's real Python UDTF surface
    (``@udtf`` class, 1→N rows per input). The chunking itself is
    JVM-expressible (the oracle is exactly that form in DuckDB); the
    catalog runs it as a UDTF to cover the table-function API — and
    documents the cost honestly: Python UDTFs evaluate row-at-a-time,
    so on a fact table prefer the q42 ``mapInPandas`` Arrow-batched
    shape or pure JVM `posexplode`; this is the escape hatch for
    genuinely iterator-shaped logic (stateful parsers, generators)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, chunk_id int, chunk_text string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            import re

            toks = re.split(r"\s+", text)
            for k in range(0, (len(toks) + 19) // 20):
                yield doc_id, k, " ".join(toks[k * 20 : k * 20 + 20])

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("docs_to_chunk")
    spark.udtf.register("chunk_doc", Chunker)
    out = spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.chunk_text "
        "FROM docs_to_chunk d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )
    return ordered(out)


@query(
    "q99zr_grouped_map",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_mktsegment AS segment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    g AS (
      SELECT c_custkey, segment, cents,
             SUM(cents) OVER (PARTITION BY segment) AS seg_cents,
             COUNT(*) OVER (PARTITION BY segment) AS seg_n,
             RANK() OVER (PARTITION BY segment ORDER BY cents) AS bal_rank
      FROM t
    )
    SELECT c_custkey, segment,
           cents * seg_n - seg_cents AS dev_scaled,
           CAST(bal_rank AS BIGINT) AS bal_rank
    FROM g
    ORDER BY c_custkey NULLS LAST, segment NULLS LAST,
             dev_scaled NULLS LAST, bal_rank NULLS LAST
    """,
)
def q99zr_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``groupBy().applyInPandas`` — the per-group pandas
    transform API (one pandas frame per group), completing the Q39–Q42
    UDF family alongside the grouped-AGG (q41) and COGROUPED (q67)
    variants. Each market segment arrives as one frame; the function
    emits an integer-exact within-group deviation (``cents·n − Σcents``
    — no float mean, so both engines agree bit-for-bit) and a min-rank.
    Scale note: groups here are the 5 segments — fine for a demo, but
    the operator contract at 100 TB is the same as q67's: key the
    grouping by a HASH BUCKET when real groups are unbounded, since
    one group must fit one executor's memory."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["cents"]
        n = len(pdf)
        out = pdf[["c_custkey", "segment"]].copy()
        out["dev_scaled"] = cents * n - cents.sum()
        out["bal_rank"] = cents.rank(method="min").astype("int64")
        return out

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    out = cust.groupBy("segment").applyInPandas(
        per_group,
        schema="c_custkey long, segment string, dev_scaled long, bal_rank long",
    )
    return ordered(out, "c_custkey", "segment", "dev_scaled", "bal_rank")


@query(
    "q99zs_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS q100,
           CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) % 7 AS bucket7
    FROM lineitem
    WHERE l_quantity > 45
    ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST,
             q100 NULLS LAST, bucket7 NULLS LAST
    """,
)
def q99zs_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy Arrow-native batch API (one
    ``pyarrow.RecordBatch`` in/out, no pandas conversion), the fastest
    Python escape hatch when an operator needs columnar compute Spark
    lacks. The batch function runs entirely in ``pyarrow.compute``
    kernels (C++ SIMD), showing the pattern: filter/compute stay in
    Arrow memory end-to-end. The predicate is applied BEFORE the
    Python boundary so Parquet pushdown still sees it."""

    def arrow_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            col = {n: b.column(i) for i, n in enumerate(b.schema.names)}
            t = pa.table(
                {
                    "l_orderkey": col["l_orderkey"],
                    "l_linenumber": col["l_linenumber"],
                    "q100": pc.cast(
                        pc.floor(
                            pc.add(pc.multiply(col["l_quantity"], pa.scalar(100.0)), pa.scalar(0.5))
                        ),
                        pa.int64(),
                    ),
                }
            )
            t = t.append_column(
                "bucket7",
                pc.subtract(
                    t.column("q100"),
                    pc.multiply(
                        pc.cast(
                            pc.floor(pc.divide(pc.cast(t.column("q100"), pa.float64()), pa.scalar(7.0))),
                            pa.int64(),
                        ),
                        pa.scalar(7, pa.int64()),
                    ),
                ),
            )
            for out in t.to_batches():
                yield out

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    out = li.mapInArrow(
        arrow_batches,
        schema="l_orderkey long, l_linenumber int, q100 long, bucket7 long",
    )
    return ordered(out, "l_orderkey", "l_linenumber", "q100", "bucket7")


@query(
    "q99zzm_sql_udf",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_totalprice >= 200000 THEN 'high'
                  WHEN o_totalprice >= 50000 THEN 'mid'
                  ELSE 'low' END AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n, SUM(cents) AS total_cents
    FROM t GROUP BY bucket
    ORDER BY bucket NULLS LAST, n NULLS LAST, total_cents NULLS LAST
    """,
)
def q99zzm_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-DEFINED FUNCTIONS (``CREATE FUNCTION ... RETURN
    expr`` — SQL UDFs, not Python): a scalar ``kdis_cents`` and a
    scalar ``kdis_bucket`` declared in pure SQL and used in a grouped
    aggregate. The decisive property vs every Python UDF in this module
    (q39–q42): the function body INLINES into the Catalyst plan —
    whole-stage codegen, predicate-transparent, zero serialization —
    so 'user-defined' here costs nothing at 100 TB. That inlining is
    exactly why the oracle can state the same expressions directly.
    The q84-style table-valued SQL function is exercised in the test
    suite (a TVF's lateral join shape is covered by q42/q84)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kdis_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kdis_bucket(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x >= 200000 THEN 'high' "
        "WHEN x >= 50000 THEN 'mid' ELSE 'low' END"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "kdis_sqludf_orders"
    )
    out = spark.sql(
        """
        SELECT kdis_bucket(o_totalprice) AS bucket, COUNT(*) AS n,
               SUM(kdis_cents(o_totalprice)) AS total_cents
        FROM kdis_sqludf_orders GROUP BY kdis_bucket(o_totalprice)
        """
    )
    return ordered(out, "bucket", "n", "total_cents")
