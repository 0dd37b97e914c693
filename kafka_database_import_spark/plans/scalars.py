"""Scalar expression surface: string / date / math / array / JSON
functions (SURVEY §2.2 Q28–Q32).

All JVM-side built-ins (pyspark.sql.functions) — no Python in the hot
path; every expression stays inside whole-stage codegen. The JSON query
(Q32) is the analog of the reference's dynamic BSON payload handling
(kafka-database-import.go:192-204): keep the raw JSON string as source
of truth, project typed views on demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_database_import_spark.functions.numeric import mround
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


@query(
    "q28_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           TRIM('  ' || c_mktsegment || ' ') AS seg_trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           split_part(c_name, '#', 2) AS name_suffix
    FROM customer
    ORDER BY c_custkey NULLS LAST, seg_upper NULLS LAST, name_lower NULLS LAST,
             name_prefix NULLS LAST, name_len NULLS LAST, seg_trimmed NULLS LAST,
             name_digits NULLS LAST, name_suffix NULLS LAST
    """,
)
def q28_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: concat, substr, upper/lower, trim, length,
    regexp_extract, split."""
    cust = load_table(spark, sf_dir, "customer")
    out = cust.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_suffix"),
    )
    return ordered(out)


@query(
    "q29_date_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS o_year,
           MONTH(o_orderdate) AS o_month,
           DAY(o_orderdate) AS o_day,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
           date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS days_to_eoy,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_secs,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date_str
    FROM orders
    ORDER BY o_orderkey NULLS LAST, o_year NULLS LAST, o_month NULLS LAST,
             o_day NULLS LAST, month_start_us NULLS LAST, days_to_eoy NULLS LAST,
             unix_secs NULLS LAST, o_date_str NULLS LAST
    """,
)
def q29_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: year/month/day, date_trunc, datediff, epoch
    seconds, to_date. Timestamps exported as epoch micros / ISO date
    strings so both engines hash identically (UTC session tz binding)."""
    orders = load_table(spark, sf_dir, "orders")
    out = orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.unix_micros(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month_start_us"
        ),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.to_date("o_orderdate")
        ).alias("days_to_eoy"),
        F.unix_timestamp("o_orderdate").alias("unix_secs"),
        F.to_date("o_orderdate").cast("string").alias("o_date_str"),
    )
    return ordered(out)


@query(
    "q30_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CAST(l_extendedprice AS DECIMAL(12,2)), 1)::DOUBLE AS price_r1,
           FLOOR(ABS(l_discount - 0.05) * 100 + 0.5) / 100 AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
           ROUND(POWER(l_quantity, 2), 2) AS qty_sq,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, price_r1 NULLS LAST,
             disc_dev NULLS LAST, qty_ceil NULLS LAST, qty_div7 NULLS LAST,
             qty_sq NULLS LAST, key_mod NULLS LAST
    """,
)
def q30_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round, abs, ceil/floor, power, modulo."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 1)
        .cast("double")
        .alias("price_r1"),
        mround(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )
    return ordered(out)


@query(
    "q31_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS first_elem,
           FLOOR(list_sum(CAST(embedding AS DOUBLE[])) * 100 + 0.5) / 100 AS sum_elems,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           FLOOR(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x * x))) * 100 + 0.5) / 100 AS l2_norm
    FROM embeddings
    ORDER BY vec_id NULLS LAST, dim NULLS LAST, first_elem NULLS LAST,
             sum_elems NULLS LAST, n_pos NULLS LAST, l2_norm NULLS LAST
    """,
)
def q31_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings: size, element_at,
    filter, transform, aggregate — all JVM-side, no UDF. Elements cast to
    double before accumulation so both engines sum in float64."""
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    out = emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        mround(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
        mround(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x)).alias(
            "sum_elems"
        ),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        mround(
            F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x))
        ).alias("l2_norm"),
    )
    return ordered(out)


@query(
    "q32_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
    FROM events
    ORDER BY event_id NULLS LAST, k_str NULLS LAST, k_int NULLS LAST,
             prop_keys NULLS LAST, has_k NULLS LAST
    """,
)
def q32_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the dynamic ``props`` payload — the analog of
    the reference's schemaless BSON ``data`` (kafka-database-import.go:192-204).
    Raw JSON string stays the source of truth; typed access via
    get_json_object / from_json (never global schema inference)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    out = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.array_join(F.map_keys(parsed), ",").alias("prop_keys"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1)
        .otherwise(0)
        .alias("has_k"),
    )
    return ordered(out)


@query(
    "q83_map_funcs",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    agg AS (
      SELECT user_id,
             COALESCE(string_agg(event_type || ':' || (n * 2), ','
                        ORDER BY event_type) FILTER (WHERE n >= 2), '')
               AS packed,
             COUNT(*) FILTER (WHERE n >= 2) AS n_keys,
             COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0)
               AS click_n
      FROM c GROUP BY user_id
    )
    SELECT user_id, packed, n_keys, click_n FROM agg
    ORDER BY user_id NULLS LAST, packed NULLS LAST, n_keys NULLS LAST,
             click_n NULLS LAST
    """,
)
def q83_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a per-user ``map<event_type, count>``
    (``map_from_entries`` over an entry list sorted for deterministic
    iteration order), then ``map_filter`` (counts ≥ 2),
    ``transform_values`` (×2), ``element_at`` lookup with a null
    default, and ``map_entries`` projection back to a comparable packed
    string. Maps shuffle like any other column; the discipline is the
    SAME as order-sensitive aggregation (q57): sort entries before
    constructing, because map iteration order is construction order and
    nothing else is deterministic under parallelism."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = c.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    filtered = F.map_filter("m", lambda k, v: v >= 2)
    doubled = F.transform_values(filtered, lambda k, v: v * 2)
    packed = F.array_join(
        F.transform(
            F.map_entries(doubled),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    out = m.select(
        "user_id",
        packed.alias("packed"),
        F.size(doubled).alias("n_keys"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("click_n"),
    )
    return ordered(out)


@query(
    "q99w_variant_payload",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0
    ORDER BY event_id NULLS LAST, k NULLS LAST, k_band NULLS LAST,
             absent NULLS LAST
    """,
)
def q99w_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads as VARIANT (Spark 4): the reference's
    schemaless BSON ``data`` documents (SURVEY §7.3 "dynamic payloads")
    parse once into the binary variant encoding, then typed projections
    are ``variant_get`` path extractions — columnar-friendly, no global
    schema inference, missing paths are NULL not errors (try_variant_get
    mirrors the reference's tolerant decode). Predicate on an extracted
    field still prunes: the filter runs post-parse but scan-local.
    Oracle: DuckDB json_extract over the same raw strings."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    out = v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.when(F.variant_get("v", "$.k", "bigint") >= 50, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("k_band"),
        F.try_variant_get("v", "$.missing", "bigint").alias("absent"),
    ).filter(F.col("k") % 7 == 0)
    return ordered(out)


@query(
    "q99zx_try_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             / NULLIF(o_custkey % 5, 0) AS safe_ratio,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CASE WHEN o_custkey % 5 = 0 THEN NULL
                ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                     // (o_custkey % 5) END AS safe_int_div
    FROM orders
    ORDER BY o_orderkey NULLS LAST, safe_ratio NULLS LAST,
             prio_int NULLS LAST, prio_digit NULLS LAST,
             safe_int_div NULLS LAST
    """,
)
def q99zx_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant scalar family (``try_divide`` / ``try_cast`` /
    ``div`` guarded): the NULL-on-failure arithmetic an ingest pipeline
    uses instead of job-failing exceptions (and instead of disabling
    ANSI mode globally). ``try_divide`` → NULL on zero divisor;
    ``try_cast`` → NULL on malformed input ('1-URGENT' is not an INT,
    its first character is). DuckDB expresses the same semantics with
    NULLIF guards and TRY_CAST — the hash match pins the engines to
    identical NULL-propagation, including double vs integer division
    paths."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    divisor = F.col("o_custkey") % 5
    out = orders.select(
        "o_orderkey",
        F.try_divide(cents, divisor).alias("safe_ratio"),
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.when(divisor == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr(
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) div (o_custkey % 5)"
        ))
        .alias("safe_int_div"),
    )
    return ordered(
        out, "o_orderkey", "safe_ratio", "prio_int", "prio_digit", "safe_int_div"
    )
