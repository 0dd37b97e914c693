"""Physical-plan regression tests: the scale properties of the headline
queries, asserted against the executed plan. Correctness tests prove
the answers; these prove the answers are computed the way a 1000-executor
cluster needs them to be — a plan regression (lost broadcast, lost
pushdown, lost partial top-k) changes no rows but 100×es the cost."""

from __future__ import annotations

import pytest

from kafka_database_import_spark.plans.registry import all_queries

_QS = all_queries()


def _plan(spark, sf_dir, name) -> str:
    df = _QS[name].fn(spark, sf_dir)
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q48_semi_join_broadcasts_filter_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q48_reference_pipeline")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the events side must not shuffle for the join
    assert "Exchange hashpartitioning(user_id" not in plan


def test_q48_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q48_reference_pipeline")
    assert "PushedFilters: [IsNotNull(user_id)]" in plan
    # column pruning: props/event_id/user_id only, never the full row
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint,props:string>" in plan


def test_q25_topk_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q25_topk_per_group")
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_q24_sort_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q24_sort_limit")
    assert "TakeOrderedAndProject" in plan  # never a full global sort


def test_q16_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_agg_hash")
    assert "partial_" in plan  # map-side combine before the one shuffle


def test_q54_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q54_tpch_shape")
    # three dimension joins broadcast; only lineitem join orders may shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_q99r_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted skew join (bench HEADLINE since round 11) must be a
    real shuffle join whose exchange keys INCLUDE the salt — that is
    the mechanism spreading one hot key over 16 partitions. A plan
    that broadcasts the dim (losing the salted shuffle this query
    watches) or shuffles on the bare key (hot key back on one
    partition) changes no rows but dies at 100×."""
    import re

    plan = _plan(spark, sf_dir, "q99r_salted_skew_join")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert m and "__salt" in m.group(1), plan[:2000]


def test_q45_brute_force_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q45_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan  # corpus never shuffles for the join
    assert "WindowGroupLimit" in plan


def test_q09_exercises_real_shuffle_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q09_join_shuffle")
    assert "SortMergeJoin" in plan  # the merge hint holds against AQE demotion


@pytest.mark.parametrize("name", ["q06_project_compute", "q07_filter_predicates"])
def test_no_python_in_relational_hot_paths(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q61_token_hash_pass_not_reinlined(spark, sf_dir):
    """The Generate barrier must keep the token poly-hash pass at one
    evaluation per consumer side — CollapseProject re-inlining it into
    per-element lambdas was a measured 70x regression (SCALE.md)."""
    df = _QS["q61_decontamination"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate( per join side (bench + corpus), never per element
    assert plan.count("aggregate(") <= 2, plan.count("aggregate(")


def test_q67_cogroup_is_bucketed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q67_cogroup_merge")
    assert "FlatMapCoGroupsInPandas" in plan
    # cogroup key is the hash bucket, not the raw entity id
    assert "pmod" in plan or "bucket" in plan


def test_q81_funnel_single_user_shuffle(spark, sf_dir):
    """Three stacked windows + per-user collapse must share ONE
    user_id exchange; only the final 3-number agg adds another."""
    plan = _plan(spark, sf_dir, "q81_funnel")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert plan.count("Window") >= 3


def test_q77_zorder_interleave_stays_codegen(spark, sf_dir):
    """The Morton interleave is unrolled shift/mask arithmetic — no
    higher-order function (HOFs evaluate interpreted)."""
    plan = _plan(spark, sf_dir, "q77_zorder_layout")
    assert "lambdafunction" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q99k_editdist_join_is_blocked_not_nested_loop(spark, sf_dir):
    """The string-similarity join must key on the block (equi-join →
    hash/sort-merge on blk), never fall back to a nested-loop over all
    pairs; levenshtein must run post-join in codegen, not as a join
    condition that forces BNLJ."""
    plan = _plan(spark, sf_dir, "q99k_editdist_blocked_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_q99o_bloom_probe_prunes_before_join(spark, sf_dir):
    """The bloom membership test must sit in a Filter on the fact scan
    BELOW the semi-join (that is the whole point: survivors-only reach
    the join), and stay JVM-side (no Python eval in the plan)."""
    plan = _plan(spark, sf_dir, "q99o_bloom_prune_join")
    assert "shiftright" in plan  # the bit probe made it into the plan
    join_at = plan.index("Join")
    probe_at = plan.index("shiftright")
    assert probe_at > join_at  # executedPlan prints top-down: filter below join
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q99l_regression_is_one_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99l_grouped_regression")
    assert "partial_" in plan  # sufficient statistics combine map-side
    # one aggregation pass: no join, no window, no second shuffle
    assert "Join" not in plan and "Window" not in plan


def test_q99n_rebalance_never_shuffles_corpus(spark, sf_dir):
    """The keep-filter applies scan-local: the corpus must reach the
    decision via broadcast joins only (counts + global min are the tiny
    sides), with no hashpartitioning exchange of doc rows."""
    plan = _plan(spark, sf_dir, "q99n_source_rebalance")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_q99x_quality_checks_share_scans(spark, sf_dir):
    """Five checks, two fact scans: the three lineitem expectations run
    as conditional aggregates in ONE pass, and the orders FK-orphan +
    uniqueness checks share ONE joined pass."""
    plan = _plan(spark, sf_dir, "q99x_data_quality_checks")
    assert plan.count("Location: InMemoryFileIndex") <= 3  # lineitem + orders + customer


def test_q99t_centroids_one_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99t_embedding_centroids")
    assert "partial_" in plan  # integer sums combine map-side
    assert "Join" not in plan


def test_q99y_ivm_merge_is_full_outer_of_two_aggs(spark, sf_dir):
    """The IVM merge must aggregate base and delta separately and join
    the two aggregates — never union raw rows into one aggregation
    (that would be the full re-scan IVM exists to avoid)."""
    plan = _plan(spark, sf_dir, "q99y_incremental_view_maintenance")
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert plan.count("HashAggregate") >= 4  # 2 aggs x (partial+final)
    assert "Union" not in plan


def test_q99zg_bitmap_distinct_partial_aggregates(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99zg_bitmap_distinct")
    # bitmaps OR together map-side before the one (type, bucket) shuffle
    assert "partial_bitmap_construct_agg" in plan
    # and the state shuffled is bitmaps, never raw user_ids (no Expand
    # plan as in q17's exact count-distinct)
    assert "Expand" not in plan


def test_q99zi_cdc_apply_is_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99zi_cdc_apply")
    # last-writer-wins must ride the partial top-1 machinery: rank-1
    # filter pushed into the sort, one shuffle on the key
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning(k") <= 2  # window + order


def test_q99zl_target_encode_single_category_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99zl_target_encode_loo")
    # one unbounded window over segment: no self-join, no extra exchange
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(segment") == 1


def test_q99zs_filter_pushed_before_arrow_boundary(spark, sf_dir):
    """mapInArrow must not defeat pushdown: the l_quantity predicate
    sits BEFORE the Python boundary, so it must reach the parquet scan
    (survivors-only cross the Arrow transfer)."""
    plan = _plan(spark, sf_dir, "q99zs_map_in_arrow")
    assert "MapInArrow" in plan or "MapInPandas" in plan
    assert "PushedFilters" in plan and "GreaterThan(l_quantity,45" in plan


def test_q99zr_grouped_map_single_exchange(spark, sf_dir):
    """Grouped-map applyInPandas: exactly one hash exchange (the
    group-by key); the pandas stage must not add another."""
    plan = _plan(spark, sf_dir, "q99zr_grouped_map")
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q99zq_xml_roundtrip_scan_local(spark, sf_dir):
    """to_xml→from_xml is per-row Catalyst expression work — the plan
    must contain no exchange at all before the final order-by and no
    Python evaluation anywhere."""
    plan = _plan(spark, sf_dir, "q99zq_xml_roundtrip")
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "Exchange hashpartitioning" not in plan  # only the sort's range exchange


def test_media_extractors_are_single_pass_no_shuffle(spark, sf_dir):
    """Audio decode: synth → WAV encode → decode → features is one
    Arrow pipeline over the 200-doc slice; the only exchanges are the
    bounded TakeOrdered limit and final sort, never a payload
    repartition."""
    plan = _plan(spark, sf_dir, "q99zn_audio_decode")
    assert plan.count("MapInPandas") == 2  # synth + extract, fused scan between
    assert "Exchange hashpartitioning(payload" not in plan


# ----------------------------------------------------------- TPC-H suite


def test_tpch_q01_partial_agg_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q01")
    assert "partial_" in plan  # 60G rows -> 6 per task map-side
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_tpch_q05_dims_broadcast_one_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q05")
    # customer/supplier/nation/region broadcast; lineitem⋈orders is the
    # only candidate for a shuffle join
    assert plan.count("BroadcastHashJoin") >= 4


def test_tpch_q09_partsupp_is_generate_not_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q09")
    assert "Generate explode" in plan  # 4-way fan-out is a projection
    assert "CartesianProduct" not in plan


def test_tpch_q18_having_filter_survives_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q18")
    assert "sum_qty" in plan and "partial_" in plan


def test_tpch_q21_semi_and_anti_on_same_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_tpch_suite_complete_and_oracled():
    names = [f"tpch_q{i:02d}" for i in range(1, 23)]
    for n in names:
        assert n in _QS, f"missing {n}"
        assert _QS[n].oracle, f"{n} lacks an oracle"


def test_bm25_topk_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q99zzf_bm25_ranked_retrieval")
    assert "WindowGroupLimit" in plan  # partial per-query top-k
    assert "CartesianProduct" not in plan


def test_native_runtime_bloom_filter_injects(spark, sf_dir):
    """Spark's runtime bloom filter (VERDICT r4 item 5): with the
    shuffle-join preconditions met, the optimizer injects
    might_contain(bloom_filter_agg(dim keys)) into the FACT scan's
    filter — the native analogue of operators/bloom.py. Pinned so a
    Spark upgrade or conf drift that silently loses the injection is
    caught (the thresholds are why: application side must exceed
    applicationSideScanSizeThreshold, default 10GB)."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.readers import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = load_table(spark, sf_dir, "lineitem")
        dim = load_table(spark, sf_dir, "supplier").filter(
            F.col("s_acctbal") > 9000
        )
        df = fact.join(dim, fact.l_suppkey == dim.s_suppkey, "left_semi")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # and the hand-built path still agrees row-for-row
        from kafka_database_import_spark.operators.bloom import (
            bloom_prune_semi_join,
        )

        assert (
            df.count()
            == bloom_prune_semi_join(
                fact, "l_suppkey", dim, "s_suppkey"
            ).count()
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_injects_on_partitioned_fact(
    spark, sf_dir, tmp_path
):
    """Dynamic partition pruning — the partition-table analogue of the
    runtime bloom filter: joining a hive-partitioned fact against a
    filtered dim injects a dynamicpruning subquery into the fact scan's
    PartitionFilters, so only the dim-selected partitions are ever
    listed/read. At 100 TB this is the difference between scanning one
    status partition and scanning the table; pinned here (with
    broadcast disabled to force the general path) so conf drift or a
    partitioned-sink change that silently loses DPP is caught. The
    engine's partitioned sink (operators/maintenance.py) writes exactly
    this layout."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.readers import load_table

    pdir = str(tmp_path / "dpp_orders")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(pdir)
    fact = spark.read.parquet(pdir)
    dim = spark.createDataFrame(
        [("F", 1), ("O", 2)], "st string, w int"
    ).filter(F.col("w") == 1)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = fact.join(dim, fact.o_orderstatus == dim.st).groupBy("st").count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        assert df.collect()[0]["count"] > 0  # and it still computes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_mor_read_broadcasts_deletion_vectors(spark, tmp_path):
    """The merge-on-read scan applies deletion vectors as a BROADCAST
    anti-join — the DV side is small by contract (bytes per deleted
    row); a shuffle anti-join here would re-shuffle the whole table on
    every read. Pinned against plan drift."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k long, v string"
        )
    )
    tbl.delete_where(spark, "k % 10 = 0", mode="mor")
    df = tbl.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert df.count() == 90


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """Spark 4 SQL UDFs (q99zzm): the function body must INLINE into
    the Catalyst plan — no BatchEvalPython/ArrowEvalPython node ever
    appears, unlike every Python UDF path. Also exercises the
    table-valued form (RETURNS TABLE) end-to-end."""
    plan = _plan(spark, sf_dir, "q99zzm_sql_udf")
    assert "Python" not in plan and "partial_" in plan
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kdis_upto(n INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))"
    )
    rows = spark.sql("SELECT SUM(i) AS s FROM kdis_upto(100)").collect()
    assert rows[0]["s"] == 5050


def test_tpcds_q03_broadcasts_both_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q03")
    # filtered item + date_dim broadcast into the fact scan; the only
    # sort-merge-worthy join is lineitem x orders
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_tpcds_q36_rollup_expands_after_filter_and_windows_tiny(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q36")
    assert "Expand" in plan           # rollup expansion present...
    assert "Window" in plan           # ...with the rank over the aggregate
    # tree prints top-down: the rank Window sits ABOVE the Expand+agg,
    # i.e. it runs over the tiny aggregate, never the fact rows
    assert plan.index("Window") < plan.index("Expand")
    assert "BroadcastHashJoin" in plan


def test_tpcds_q97_full_outer_is_sort_merge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q97")
    # the pair-distinct sides co-shuffle into a sort-merge FULL OUTER —
    # a broadcast would be wrong (both sides scale with the fact)
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_tpcds_q67_rank_rides_above_rollup_expand(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q67")
    assert "Expand" in plan           # the ROLLUP expansion
    assert "Window" in plan           # rank over the rollup output
    # window input is the O(groups) aggregate, never the fact rows
    assert plan.index("Window") < plan.index("Expand")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q70_having_total_is_conditioned_bnlj(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q70")
    assert "Expand" in plan and "Window" in plan
    assert plan.index("Window") < plan.index("Expand")
    # the HAVING fraction attaches the 1-row global total via a
    # broadcast nested-loop join WITH a condition — never a cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q99zzzd_bucketed_join_no_exchange(spark, sf_dir):
    """The bucketed co-located join must plan ZERO shuffles: both scan
    sides read pre-bucketed tables (bucketBy(8, key), one file per
    bucket), so the SortMergeJoin consumes bucket-local partitions
    directly. The in-query assert already fails the build on a plan
    regression; this pins it in the suite too, plus the bucketed-scan
    marker on both sides."""
    plan = _plan(spark, sf_dir, "q99zzzd_bucketed_colocated_join")
    # the aggregate after the join owns the only exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, plan


def test_tpcds_q47_windows_ride_one_monthly_aggregate(spark, sf_dir):
    """Q47's reference is a 3-way self-join of the same CTE; the plan
    under test collapses it to LAG/LEAD windows over ONE monthly
    aggregate — the item dim broadcasts, and there is no self-join of
    the fact (at most the agg exchange plus the two window
    re-partitionings)."""
    plan = _plan(spark, sf_dir, "tpcds_q47")
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1  # fact scanned ONCE
    assert plan.count("Exchange hashpartitioning") <= 3, plan.count(
        "Exchange hashpartitioning"
    )
    assert "CartesianProduct" not in plan


def test_tpcds_q57_windows_ride_one_monthly_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q57")
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "CartesianProduct" not in plan


def test_tpcds_q34_band_filters_before_customer_join(spark, sf_dir):
    """The basket-size band must apply to the ticket aggregate BELOW
    the customer join (plan prints top-down: the band filter appears
    after the join node), and the dim side broadcasts."""
    plan = _plan(spark, sf_dir, "tpcds_q34")
    assert "BroadcastHashJoin" in plan
    band_at = plan.index(">= 3)")
    join_at = plan.index("BroadcastHashJoin")
    assert band_at > join_at, "band filter floated above the join"


def test_tpcds_q16_exists_decorrelates_to_one_lineitem_pass(spark, sf_dir):
    """Three correlated subqueries (EXISTS late-ship, COUNT DISTINCT
    suppliers, NOT EXISTS returns) must decorrelate into ONE pass over
    lineitem — a per-row re-scan plan would be quadratic at scale."""
    plan = _plan(spark, sf_dir, "tpcds_q16")
    assert plan.count("lineitem.parquet") == 1, plan.count(
        "lineitem.parquet"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpcds_q41_never_touches_a_fact_table(spark, sf_dir):
    """The dimension-only self-join must stay dimension-only: a
    broadcast left-semi over part, zero fact scans."""
    plan = _plan(spark, sf_dir, "tpcds_q41")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "lineitem.parquet" not in plan
    assert "orders.parquet" not in plan


def test_tpcds_q32_item_average_broadcasts_back(spark, sf_dir):
    """The correlated scalar-AVG decorrelates to a per-item aggregate
    BROADCAST back onto the fact — the fact never shuffles for the
    join (the aggregate side is item-sized)."""
    plan = _plan(spark, sf_dir, "tpcds_q32")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan  # per-item aggregate combines map-side


def test_tpcds_q62_census_is_one_pass(spark, sf_dir):
    """Five lag buckets, one aggregation pass — no per-bucket scans."""
    plan = _plan(spark, sf_dir, "tpcds_q62")
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1
    assert "partial_" in plan


def test_tpcds_q90_pushes_type_filter_no_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q90")
    assert "PushedFilters" in plan and "event_type" in plan
    assert "Join" not in plan


def test_tpcds_q61_promo_share_single_fact_scan(spark, sf_dir):
    """Two scalar aggregates (promo, total) must ride ONE fact scan as
    conditional sums — the reference's 1x1 cross join of two subquery
    scans is the anti-pattern."""
    plan = _plan(spark, sf_dir, "tpcds_q61")
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpcds_q10_disjunctive_exists_is_two_semis(spark, sf_dir):
    """EXISTS store AND (EXISTS web OR EXISTS catalog) must plan as
    exactly TWO broadcast left-semi joins (the OR legs union into one
    key set) — never a correlated re-scan or an existence-join
    explosion."""
    plan = _plan(spark, sf_dir, "tpcds_q10")
    assert plan.count("LeftSemi") == 2, plan.count("LeftSemi")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q78_left_joins_ride_aggregate_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q78")
    assert "LeftOuter" in plan
    # three aggregates shuffle on the SAME (cust, item) key; the two
    # left joins must reuse that partitioning, not add exchanges
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 3, (n_ex, plan[:1500])


def test_tpcds_q01_group_average_gate_is_one_window(spark, sf_dir):
    """The correlated per-store average must decorrelate to a window
    over the one (cust, store) aggregate — one hash aggregate, one
    Window, the 12-row store dim broadcast — never a second aggregate
    joined back."""
    plan = _plan(spark, sf_dir, "tpcds_q01")
    assert "Window" in plan
    assert plan.count("HashAggregate") <= 4  # partial+final of ONE agg (+AQE dup)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q06_dimension_gate_never_scans_fact_twice(spark, sf_dir):
    """The category-average price gate computes on the item DIMENSION
    (window over item) and broadcasts a LEFT SEMI key set into the
    single fact pass; customer broadcasts too."""
    plan = _plan(spark, sf_dir, "tpcds_q06")
    assert "LeftSemi" in plan
    assert "Window" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # exactly one lineitem scan feeds the query
    assert plan.count("lineitem.parquet") <= 1 or plan.count("lineitem") <= 2


def test_tpcds_q09_fifteen_subqueries_one_pass(spark, sf_dir):
    """All 15 scalar subqueries collapse into ONE conditional
    aggregation pass: the only join is the lineitem |x| orders sales
    spine, no Window, one global aggregate (partial + final)."""
    plan = _plan(spark, sf_dir, "tpcds_q09")
    assert plan.count("Join") == 1, plan.count("Join")
    assert "CartesianProduct" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") == 2


def test_tpcds_q17_cross_channel_join_copartitions(spark, sf_dir):
    """The sale->return->repurchase chain shuffles BOTH fact legs on
    the composite (cust, item) key (sort-merge or shuffled-hash, never
    broadcast of a fact side at scale is the claim; at fixture scale
    AQE may elect broadcast — pin that the dims broadcast and nothing
    is cartesian)."""
    plan = _plan(spark, sf_dir, "tpcds_q17")
    assert plan.count("BroadcastHashJoin") >= 2  # item + store dims
    assert "CartesianProduct" not in plan


def test_tpcds_q39_self_join_is_broadcast_of_aggregate(spark, sf_dir):
    """The adjacent-month self-join runs over the (wh, moy) aggregate
    (144 rows/year): its join must be a broadcast, and the variance
    gate must sit above the aggregate, not trigger extra shuffles."""
    plan = _plan(spark, sf_dir, "tpcds_q39")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q44_rank_meet_windows_ride_one_aggregate(spark, sf_dir):
    """Two opposite-order ROW_NUMBERs over the per-item aggregate,
    rnk<=10 filtered BEFORE the positional join (a 10-row broadcast).
    The global windows are the documented dimension-sized total-order
    allowance (like q79_ntile)."""
    plan = _plan(spark, sf_dir, "tpcds_q44")
    assert plan.count("Window") >= 2
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q04_six_self_joins_collapse_to_one_pass(spark, sf_dir):
    """The reference's six references to the year_total CTE must plan
    as ONE aggregate over one fact scan (conditional pivot) — no self
    join, no window."""
    plan = _plan(spark, sf_dir, "tpcds_q04")
    assert plan.count("Join") == 1  # only the lineitem |x| orders spine
    assert "Window" not in plan and "CartesianProduct" not in plan


def test_tpcds_q45_or_of_exists_is_existence_flag_join(spark, sf_dir):
    """The (local-pred OR IN-subquery) disjunction must plan as a
    LEFT OUTER flag join against the broadcast item key set — never a
    UNION double-scan of the fact, never a cartesian."""
    plan = _plan(spark, sf_dir, "tpcds_q45")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert plan.count("Union") == 0
    assert "CartesianProduct" not in plan


def test_tpcds_q46_dims_join_the_ticket_rollup_not_lines(spark, sf_dir):
    """The (ticket, cust, store) rollup aggregates BELOW the broadcast
    dimension joins: tree prints top-down, so the final aggregate's
    HashAggregate must appear (as the rollup) UNDER the projection but
    the dim joins must consume aggregate output — pinned by exchange
    count: one fact shuffle to ticket grain, no second fact exchange
    for the joins."""
    plan = _plan(spark, sf_dir, "tpcds_q46")
    assert plan.count("BroadcastHashJoin") >= 2  # store + customer
    # grain shuffle + (AQE variants) — but never a join-side exchange
    assert plan.count("Exchange hashpartitioning") <= 2, plan.count(
        "Exchange hashpartitioning"
    )


def test_tpcds_q48_dnf_pushes_to_scan(spark, sf_dir):
    """The OR-of-AND-triples on raw columns must reach the parquet
    scan as a pushed Or filter; the computed channel conjunct must not
    poison it (conjuncts translate independently)."""
    df = _QS["tpcds_q48"].fn(spark, sf_dir)
    scan = df._jdf.queryExecution().executedPlan().toString()
    pushed = scan[scan.find("PushedFilters") :][:400]
    assert "Or(" in pushed and "And(" in pushed, pushed
    assert "Join" not in scan  # single-table scan query


def test_tpcds_q75_yoy_pivot_scans_fact_once(spark, sf_dir):
    """The YoY comparison is a conditional pivot in ONE aggregate
    pass: exactly two joins (sales spine + item broadcast), each
    appearing once — a self-join of the brand aggregate would replay
    the whole fact chain twice (measured 5.2x at 10x)."""
    plan = _plan(spark, sf_dir, "tpcds_q75")
    assert plan.count("Join") == 2, plan.count("Join")
    assert plan.count("lineitem") <= 2  # one scan subtree
    assert "CartesianProduct" not in plan


def test_tpcds_q18_rollup_expands_after_customer_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q18")
    assert "Expand" in plan and "BroadcastHashJoin" in plan
    assert "partial_" in plan  # moments combine map-side at every level
    assert "CartesianProduct" not in plan


def test_tpcds_q21_band_is_one_conditional_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q21")
    assert plan.count("Join") == 1  # lineitem |x| orders spine only
    assert "Window" not in plan and "CartesianProduct" not in plan


def test_tpcds_q50_buckets_ride_the_store_broadcast(spark, sf_dir):
    """Five lag buckets as conditional counts, the 12-row store dim
    broadcast, and the returnflag filter PUSHED to the lineitem scan."""
    plan = _plan(spark, sf_dir, "tpcds_q50")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan  # pushed, not post-scan
    assert "CartesianProduct" not in plan


def test_tpcds_q66_wide_pivot_is_one_pass(spark, sf_dir):
    """24 pivot columns must be ONE aggregate (partial+final), never
    24 scans or a (month, carrier) key explosion."""
    plan = _plan(spark, sf_dir, "tpcds_q66")
    assert plan.count("Join") == 1  # the sales spine
    assert plan.count("HashAggregate") == 2
    assert "Expand" not in plan


def test_tpcds_q69_anti_gates_are_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q69")
    assert plan.count("LeftAnti") == 2 and plan.count("LeftSemi") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q95_self_exists_is_one_grouped_pass(spark, sf_dir):
    """The two correlated self-EXISTS must NOT plan as self-joins of
    the fact: one aggregate to order grain (expand for the distinct),
    no join beyond the sales spine."""
    plan = _plan(spark, sf_dir, "tpcds_q95")
    assert plan.count("Join") == 1
    assert "CartesianProduct" not in plan


def test_tpcds_q05_channel_rollup_is_one_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpcds_q05")
    assert "Expand" in plan  # the ROLLUP over the derived channel
    assert plan.count("Join") == 1  # sales spine; no per-channel union
    assert "partial_" in plan


def test_tpcds_q13_dnf_spans_broadcast_join_one_pass(spark, sf_dir):
    """Disjuncts mix dim and fact attributes: nothing can push below
    the join, so the pin is the single fact pass + broadcast dim +
    post-join codegen filter — never three unioned fact passes."""
    plan = _plan(spark, sf_dir, "tpcds_q13")
    assert "BroadcastHashJoin" in plan
    assert "Union" not in plan
    assert plan.count("lineitem") <= 2  # one scan subtree


def test_tpcds_q28_multi_distinct_uses_expand(spark, sf_dir):
    """Six COUNT(DISTINCT CASE...) columns must plan as ONE aggregate
    via the Expand-based multi-distinct strategy — not six self-joined
    subqueries (the reference's formulation)."""
    plan = _plan(spark, sf_dir, "tpcds_q28")
    assert "Expand" in plan
    assert plan.count("Join") == 1  # only the sales spine


def test_tpcds_q14_intersect_gate_broadcasts(spark, sf_dir):
    """The three-channel INTERSECT must resolve to dimension-sized
    semi joins whose result broadcasts into the fact gate — no
    cartesian, no fact-fact shuffle join for the set operation."""
    plan = _plan(spark, sf_dir, "tpcds_q14")
    assert plan.count("LeftSemi") >= 3  # 2 intersect legs + the gate
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------- round-12 TPC-DS tail


def test_tpcds_q02_single_fact_shuffle_conditional_pivot(spark, sf_dir):
    """The weekly YoY dow pivot must aggregate the union'd fact to
    (week, dow) grain map-side — seven conditional sums in ONE
    aggregate, no per-day scans — and the YoY self-join must run on
    the week-grain output, never the fact."""
    plan = _plan(spark, sf_dir, "tpcds_q02")
    assert "partial_" in plan  # map-side combine on the fact aggregate
    # the pivot is conditional aggregation: no Expand (that would be a
    # rollup/pivot expansion multiplying fact rows)
    assert "Expand" not in plan


def test_tpcds_q72_inventory_probe_is_keyed_join(spark, sf_dir):
    """The inventory-on-hand date-spine probe must be a KEYED join on
    (item, warehouse, week) — hash or sort-merge, never a nested-loop
    over the snapshots — with the sale-week resolution broadcast."""
    plan = _plan(spark, sf_dir, "tpcds_q72")
    assert "BroadcastHashJoin" in plan  # date spine resolution
    assert (
        "SortMergeJoin" in plan
        or plan.count("BroadcastHashJoin") >= 2
    )  # the (item, wh, week) probe is key-based either way
    assert "CartesianProduct" not in plan


def test_tpcds_q22_rollup_expands_after_gates(spark, sf_dir):
    """The on-hand rollup's Expand must sit above the week semi-gate
    and the item broadcast join (aggregate inputs only) — an Expand
    below the joins would multiply the inventory relation 3× before
    filtering."""
    plan = _plan(spark, sf_dir, "tpcds_q22")
    assert "Expand" in plan
    # rollup output is grouped map-side before the final exchange
    assert "partial_" in plan


def test_tpcds_q94_decorrelates_to_one_aggregate(spark, sf_dir):
    """q94 (like q16) must compute all three EXISTS polarities in ONE
    aggregation pass over the web lines — a correlated rewrite would
    show repeated lineitem scans per predicate."""
    plan = _plan(spark, sf_dir, "tpcds_q94")
    assert "CartesianProduct" not in plan
    # one grouped pass: late flag, distinct suppliers, returned flag
    # aggregate together (expand for count-distinct is fine — it is
    # aggregate-side, not a rescan)
    assert plan.count("FileScan parquet") <= 4  # lineitem + orders ×2 legs


def test_q44_minhash_signature_plan_shape_pinned(spark, sf_dir):
    """Round 15 rebuilt q44's three expression lists as parsed SQL
    strings to cut driver plan-build py4j chatter; the physical plan
    must stay the explode→min-agg shape (the in-code comment documents
    a 170× regression from the transform-collapse alternative) with
    the signature subtree evaluated once per side, never inlined per
    minhash. Pin the load-bearing facts: the shingle explode appears a
    BOUNDED number of times (once per band-side scan, not 16× per
    signature), the band explode carries the 4-band struct array, and
    the per-doc aggregation computes all 16 min(xxhash64(...)) in one
    HashAggregate (partial + final => map-side combine survives)."""
    plan = _plan(spark, sf_dir, "q44_minhash_lsh")
    # the regression shape computed signatures as 16 array_min(
    # transform(...)) projections whose shingle subtree Catalyst
    # inlined per reference — it must never reappear
    assert "array_min(transform" not in plan
    # signatures are min(xxhash64(...)) aggregates over EXPLODED
    # shingle rows, with map-side partial aggregation
    assert "partial_min(xxhash64(concat(shingle" in plan
    assert "Generate explode" in plan
    # the plan string prints reused subtrees inline; the explode count
    # is bounded by plan printing, not by N_HASHES — 16 inlined
    # signature pipelines would put it in the hundreds
    assert plan.count("Generate explode") < 40
