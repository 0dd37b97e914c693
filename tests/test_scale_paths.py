"""Scale-technique demonstrations the fixture sizes can't motivate but
whose plan shapes must be right (the brief's checklist: salting for
skew, bucketing for co-located joins, partition pruning). Each test
asserts the *physical plan property* that matters at 100 TB, plus
result equivalence with the naive formulation."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.operators.skew import salted_join
from kafka_database_import_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be a pure physical rewrite: same rows out."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, ev.user_id == cust.c_custkey, "inner").drop("c_custkey")
    salted = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_semi_equals_plain_semi(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    plain = ev.join(cust, ev.user_id == cust.c_custkey, "left_semi")
    salted = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8, how="left_semi")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_outer():
    with pytest.raises(ValueError, match="inner/left_semi"):
        salted_join(None, None, "a", "b", how="left")


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key → sort-merge join with NO
    Exchange above either scan: the co-location survives restarts and
    is the 100 TB answer to repeated fact-fact joins on one key."""
    suffix = uuid.uuid4().hex[:8]
    ev_t, cust_t = f"ev_b_{suffix}", f"cust_b_{suffix}"
    load_table(spark, sf_dir, "events").select("event_id", "user_id").write.bucketBy(
        8, "user_id"
    ).sortBy("user_id").mode("overwrite").saveAsTable(ev_t)
    load_table(spark, sf_dir, "customer").select("c_custkey").write.bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").mode("overwrite").saveAsTable(cust_t)
    try:
        # disable auto-broadcast so the join exercises the bucketed path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ev, cust = spark.table(ev_t), spark.table(cust_t)
        joined = ev.join(cust, ev.user_id == cust.c_custkey)
        joined.count()
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "32m")
        spark.sql(f"DROP TABLE IF EXISTS {ev_t}")
        spark.sql(f"DROP TABLE IF EXISTS {cust_t}")


def test_partition_pruning_reaches_scan(spark, sf_dir):
    """Writing partitioned by a derived date column and filtering on it
    must prune at the file-listing level (PartitionFilters in the scan,
    not a post-scan Filter over all partitions)."""
    out = os.path.join(tempfile.mkdtemp(prefix="kdis_part_"), "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly the partition's rows
    expected = (
        load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
    )
    assert df.count() == expected


def test_bloom_runtime_filter_injected(spark, sf_dir):
    """Runtime bloom-filter join pruning: a selective predicate on the
    small (creation) side of a shuffle join gets turned into a bloom
    filter applied at the big side's scan, cutting the shuffled volume
    to ~the matching rows. This is free Catalyst machinery at 100 TB;
    the fixture is far below the production size thresholds, so the
    test drops them to 0 to prove the rewrite fires and that results
    are unchanged."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "4GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # keep the join on the shuffle path so the bloom filter matters
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity"
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan
        n_bloom = joined.count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    n_plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n_bloom == n_plain


def test_zorder_write_narrows_per_file_spans(spark, sf_dir, tmp_path):
    """Z-ordered layout must give files that are narrow in BOTH key
    dimensions; a 1-D sort leaves the second dimension's per-file span
    at ~full range. Compares mean normalized span of user_id across
    files between the two layouts."""
    import pyspark.sql.functions as F

    from kafka_database_import_spark.operators.zorder import zorder_write
    from kafka_database_import_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted1d")
    zorder_write(ev, zpath, "user_id", "event_id", n_files=16)
    (
        ev.repartitionByRange(16, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(spath)
    )

    def mean_user_span(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max("user_id") - F.min("user_id")).alias("span"))
        )
        row = per_file.agg(F.avg("span").alias("m"), F.count("*").alias("n")).collect()[0]
        assert row.n >= 16
        return row.m

    full = ev.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    z_span = mean_user_span(zpath) / full
    s_span = mean_user_span(spath) / full
    # 1-D event_id sort leaves user_id unclustered (~full span per file);
    # z-order must at least halve it.
    assert s_span > 0.9, s_span
    assert z_span < 0.5 * s_span, (z_span, s_span)


def test_neardup_banded_store_read_prunes_partitions(spark, tmp_path):
    """The banded near-dup store layout must actually PRUNE: a
    single-doc batch (≤4 distinct pb values) against a K=16 store
    reads strictly fewer files than the store holds — partition
    pruning at planning time, the property that bounds the
    O(store)-per-batch scan documented in operators/dedup."""
    import os

    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.dedup import (
        incremental_neardup_sink,
        minhash_signatures,
        signature_band_rows,
    )

    store = str(tmp_path / "store")
    K = 16
    sink = incremental_neardup_sink(store, banded_layout_k=K)
    corpus = [
        (i, " ".join(f"tok{i}x{j}" for j in range(20))) for i in range(200)
    ]
    sink(spark.createDataFrame(corpus, "doc_id long, text string"), 0)
    sig_dir = os.path.join(store, "signatures")

    probe = spark.createDataFrame([(999, corpus[7][1])], "doc_id long, text string")
    bands = signature_band_rows(
        minhash_signatures(probe, "doc_id", "text"), "doc_id"
    ).withColumn("pb", F.pmod(F.col("band_hash"), F.lit(K)))
    pbs = [r.pb for r in bands.select("pb").distinct().collect()]
    assert 1 <= len(pbs) <= 4

    full = spark.read.option("basePath", sig_dir).parquet(
        os.path.join(sig_dir, "epoch=*")
    )
    pruned = full.filter(F.col("pb").isin(pbs))
    # inputFiles() lists BEFORE partition pruning; count what the scan
    # actually reads, and assert the pruning predicate reached the scan
    n_full = len(full.inputFiles())
    n_read = pruned.select(F.input_file_name()).distinct().count()
    assert n_read < n_full, (n_read, n_full)
    assert n_read <= len(pbs)  # exactly the probed partitions
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pb" in plan
