"""Materialized views (sources/mv.py) and the replace_where_keys table
primitive: the view must equal a full recompute after every kind of
base mutation, refresh cost must be change-driven, and the swap must
be atomic (one commit carrying data + applied-version stamp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.mv import MaterializedView
from kafka_database_import_spark.sources.snapshot import SnapshotTable


@pytest.fixture(autouse=True)
def _structural_auto(monkeypatch):
    """Pin 'auto' to the STRUCTURAL maintenance choice for this file's
    tests: round 14's cost-based auto would legitimately answer every
    dimension change on these tiny fixtures with the full rebuild
    (manifest bytes < REBUILD_BYTES_CAP), short-circuiting exactly the
    SCD-delta machinery the tests exist to exercise. The cost-based
    choice itself is pinned by the test_cost_based_auto_* tests below,
    which raise the cap back per-instance."""
    monkeypatch.setattr(MaterializedView, "REBUILD_BYTES_CAP", 0)


def _base_rows(spark, rows):
    return spark.createDataFrame(rows, "g string, k long, x long")


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


AGGS = [
    {"fn": "count", "alias": "n"},
    {"fn": "sum", "col": "x", "alias": "sx"},
    {"fn": "min", "col": "x", "alias": "mn"},
    {"fn": "max", "col": "x", "alias": "mx"},
]


def _expected(spark, tbl):
    return (
        tbl.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
    )


def _mk(spark, tmp_path, rows):
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, rows))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )
    return base, mv


def test_create_equals_full_recompute(spark, tmp_path):
    base, mv = _mk(
        spark, tmp_path, [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]
    )
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    assert mv.applied_base_version() == 1


def test_refresh_after_append_new_and_changed_groups(spark, tmp_path):
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    base.commit(_base_rows(spark, [("a", 3, 7), ("c", 4, 99)]))
    res = mv.refresh(spark)
    assert not res["noop"]
    assert res["groups_touched"] == 2  # a changed, c new; b untouched
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    assert mv.applied_base_version() == base.latest_version()


def test_refresh_after_delete_shrinks_and_removes_groups(spark, tmp_path):
    base, mv = _mk(
        spark, tmp_path,
        [("a", 1, 10), ("a", 2, 20), ("gone", 3, 1), ("b", 4, 4)],
    )
    base.delete_where(spark, F.col("k").isin(2, 3))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    # the fully-deleted group's row must be GONE, not zeroed
    assert mv.read(spark).filter(F.col("g") == "gone").count() == 0


def test_refresh_minmax_exact_under_update(spark, tmp_path):
    """The delta-maintenance killer: shrinking a group's MAX needs the
    base rows — affected-group recompute gets it exact."""
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("a", 2, 99)])
    base.merge_rows(
        spark,
        _base_rows(spark, [("a", 2, 3)]),  # max row 99 -> 3
        key_cols=["k"],
    )
    mv.refresh(spark)
    [row] = mv.read(spark).filter(F.col("g") == "a").collect()
    assert (row["mn"], row["mx"], row["n"]) == (3, 10, 2)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_refresh_after_mor_delete(spark, tmp_path):
    base, mv = _mk(
        spark, tmp_path, [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]
    )
    base.delete_where(spark, F.col("k") == 2, mode="mor")
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_refresh_noop_and_restart_handle(spark, tmp_path):
    base, mv = _mk(spark, tmp_path, [("a", 1, 10)])
    v = mv.table.latest_version()
    res = mv.refresh(spark)
    assert res["noop"] and mv.table.latest_version() == v
    # a fresh handle (process restart) recovers the applied version
    # from the manifests alone
    mv2 = MaterializedView(mv.root)
    assert mv2.applied_base_version() == base.latest_version()
    assert mv2.refresh(spark)["noop"]


def test_refresh_survives_view_compaction(spark, tmp_path):
    """Compacting the VIEW table inserts an epoch-less rewrite_only
    manifest; applied_base_version must walk past it."""
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    base.commit(_base_rows(spark, [("a", 3, 7)]))
    mv.refresh(spark)
    mv.table.compact(spark)
    assert mv.applied_base_version() == base.latest_version()
    base.commit(_base_rows(spark, [("b", 4, 1)]))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_null_group_key_is_maintained(spark, tmp_path):
    """NULL is a legitimate GROUP BY value; the null-safe key joins
    must keep the NULL group addressable across refreshes."""
    base, mv = _mk(spark, tmp_path, [(None, 1, 10), ("a", 2, 5)])
    base.commit(_base_rows(spark, [(None, 3, 32)]))
    mv.refresh(spark)
    [row] = mv.read(spark).filter(F.col("g").isNull()).collect()
    assert (row["n"], row["sx"]) == (2, 42)
    base.delete_where(spark, F.col("g").isNull())
    mv.refresh(spark)
    assert mv.read(spark).filter(F.col("g").isNull()).count() == 0
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_replace_cost_is_change_driven(spark, tmp_path):
    """Files holding no scoped key are carried by REFERENCE: replacing
    one key of a two-file table rewrites one file and carries the
    other untouched (the property that makes MV refresh O(affected
    groups), not O(view))."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1), ("a", 2, 2)]).coalesce(1))
    tbl.commit(_base_rows(spark, [("b", 3, 3), ("c", 4, 4)]).coalesce(1))
    before = set(tbl.manifest()["files"])
    assert len(before) == 2
    keys = spark.createDataFrame([("a",)], "g string")
    res = tbl.replace_where_keys(
        spark, keys, _base_rows(spark, [("a", 9, 9)]), ["g"]
    )
    assert res["rewritten_files"] == 1 and res["kept_files"] == 1
    carried = set(tbl.manifest()["files"]) & before
    assert len(carried) == 1
    assert _rows(tbl.read(spark)) == [("a", 9, 9), ("b", 3, 3), ("c", 4, 4)]


def test_refresh_is_idempotent_under_replay(spark, tmp_path):
    """Crash-sim: re-applying a refresh's work AFTER it committed (the
    worst replay) must converge, because the post-image is recomputed
    from the base head, not delta-added."""
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    base.commit(_base_rows(spark, [("a", 3, 7)]))
    last = mv.applied_base_version()
    mv.refresh(spark)
    # replay the SAME range by hand (as if the epoch stamp was lost)
    from kafka_database_import_spark.sources.snapshot import row_changes

    delta = row_changes(base, spark, last, base.latest_version())
    keys = delta.select("g").distinct()
    post = (
        base.read(spark)
        .join(keys, "g", "left_semi")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
    )
    mv.table.replace_where_keys(
        spark, keys, post, ["g"], epoch_id=base.latest_version()
    )
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_mini_fuzz_mv_equals_recompute(spark, tmp_path):
    """Seeded op sequence (append / cow delete / mor delete / merge
    update) with a refresh after each op: view ≡ recompute always."""
    import random

    rng = random.Random(11)
    base = SnapshotTable(str(tmp_path / "base"))
    rows = [(f"g{rng.randrange(5)}", k, rng.randrange(100)) for k in range(30)]
    base.commit(_base_rows(spark, rows))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )
    next_k = 1000
    for step in range(6):
        op = rng.choice(["append", "delete", "mor", "merge"])
        if op == "append":
            new = [
                (f"g{rng.randrange(6)}", next_k + i, rng.randrange(100))
                for i in range(4)
            ]
            next_k += 4
            base.commit(_base_rows(spark, new))
        elif op in ("delete", "mor"):
            lo = rng.randrange(30)
            base.delete_where(
                spark,
                (F.col("k") % 7) == (lo % 7),
                mode="cow" if op == "delete" else "mor",
            )
        else:
            ks = [r[1] for r in rows[: rng.randrange(1, 5)]]
            src = _base_rows(
                spark,
                [(f"g{rng.randrange(5)}", k, rng.randrange(100)) for k in ks],
            )
            base.merge_rows(spark, src, key_cols=["k"])
        mv.refresh(spark)
        assert _rows(mv.read(spark)) == _rows(_expected(spark, base)), (
            step,
            op,
        )


# ------------------------------------------------- replace_where_keys unit


def test_replace_validate_rejects_stray_replacement(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1), ("b", 2, 2)]))
    keys = spark.createDataFrame([("a",)], "g string")
    repl = _base_rows(spark, [("b", 9, 9)])  # outside scope
    with pytest.raises(ValueError, match="outside the keys scope"):
        tbl.replace_where_keys(spark, keys, repl, ["g"])


def test_replace_deletes_scope_with_empty_replacement(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1), ("b", 2, 2)]))
    keys = spark.createDataFrame([("a",)], "g string")
    repl = _base_rows(spark, []).limit(0)
    res = tbl.replace_where_keys(spark, keys, repl, ["g"])
    assert res["replaced_rows"] == 1 and res["inserted_rows"] == 0
    assert _rows(tbl.read(spark)) == [("b", 2, 2)]


def test_replace_on_fresh_table_is_insert(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    keys = spark.createDataFrame([("a",)], "g string")
    repl = _base_rows(spark, [("a", 1, 1)])
    res = tbl.replace_where_keys(spark, keys, repl, ["g"], epoch_id=7)
    assert res["version"] == 1 and res["inserted_rows"] == 1
    assert tbl.manifest()["epoch_id"] == 7


def test_replace_nothing_matched_nothing_inserted_is_noop(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1)]))
    keys = spark.createDataFrame([("zzz",)], "g string")
    repl = _base_rows(spark, []).limit(0)
    res = tbl.replace_where_keys(spark, keys, repl, ["g"])
    assert res["version"] == 1  # head unchanged, no new manifest
    assert tbl.latest_version() == 1


def test_replace_commit_is_atomic_one_version(spark, tmp_path):
    """Delete + insert publish as ONE version: no intermediate state
    where the scope is deleted but the replacement absent."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1), ("b", 2, 2)]))
    keys = spark.createDataFrame([("a",)], "g string")
    repl = _base_rows(spark, [("a", 10, 10), ("a", 11, 11)])
    res = tbl.replace_where_keys(spark, keys, repl, ["g"], epoch_id=42)
    assert res["version"] == 2 and tbl.latest_version() == 2
    assert tbl.manifest()["epoch_id"] == 42
    assert tbl.manifest()["mode"] == "replace"
    assert _rows(tbl.read(spark)) == [
        ("a", 10, 10),
        ("a", 11, 11),
        ("b", 2, 2),
    ]
    # time travel below the replace still sees the old group
    assert ("a", 1, 1) in _rows(tbl.read(spark, version=1))


# ------------------------------------------------------- delta fast path


DELTA_AGGS = [
    {"fn": "count", "alias": "n"},
    {"fn": "sum", "col": "x", "alias": "sx"},
]


def _expected_delta(spark, tbl):
    return (
        tbl.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
    )


def test_delta_refresh_no_base_reread(spark, tmp_path):
    """An all-COUNT/SUM view refreshes arithmetically: strategy
    reports 'delta', the result matches recompute, and hidden columns
    never leak through read()."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], DELTA_AGGS
    )
    assert mv.read(spark).columns == ["g", "n", "sx"]
    base.commit(_base_rows(spark, [("a", 4, 7), ("c", 5, 1)]))
    base.delete_where(spark, F.col("k") == 1)
    res = mv.refresh(spark)
    assert res["strategy"] == "delta"
    assert _rows(mv.read(spark)) == _rows(_expected_delta(spark, base))


def test_delta_refresh_drops_emptied_group(spark, tmp_path):
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("gone", 1, 10), ("b", 2, 5)]))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], DELTA_AGGS
    )
    base.delete_where(spark, F.col("g") == "gone")
    res = mv.refresh(spark)
    assert res["strategy"] == "delta"
    assert mv.read(spark).filter(F.col("g") == "gone").count() == 0
    assert _rows(mv.read(spark)) == _rows(_expected_delta(spark, base))


def test_delta_refresh_null_sum_semantics(spark, tmp_path):
    """SQL SUM is NULL over zero non-null values. Delete every non-null
    x of a group (rows remain): running arithmetic would report 0; the
    hidden non-null counter must take the sum back to NULL."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(spark, [("a", 1, 10), ("a", 2, None), ("b", 3, 5)])
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], DELTA_AGGS
    )
    base.delete_where(spark, F.col("k") == 1)  # a's only non-null x
    res = mv.refresh(spark)
    assert res["strategy"] == "delta"
    [row] = mv.read(spark).filter(F.col("g") == "a").collect()
    assert row["n"] == 1 and row["sx"] is None
    assert _rows(mv.read(spark)) == _rows(_expected_delta(spark, base))
    # and an insert of a non-null value revives the sum
    base.commit(_base_rows(spark, [("a", 9, 4)]))
    mv.refresh(spark)
    [row] = mv.read(spark).filter(F.col("g") == "a").collect()
    assert row["n"] == 2 and row["sx"] == 4


def test_delta_strategy_forcing(spark, tmp_path):
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10)]))
    eligible = MaterializedView.create(
        spark, base, str(tmp_path / "mv1"), ["g"], DELTA_AGGS
    )
    full = MaterializedView.create(
        spark, base, str(tmp_path / "mv2"), ["g"], AGGS
    )
    base.commit(_base_rows(spark, [("a", 2, 1)]))
    # recompute forced on an eligible view still matches
    res = eligible.refresh(spark, strategy="recompute")
    assert res["strategy"] == "recompute"
    assert _rows(eligible.read(spark)) == _rows(_expected_delta(spark, base))
    # delta demanded of a min/max view refuses
    with pytest.raises(ValueError, match="all-COUNT/SUM"):
        full.refresh(spark, strategy="delta")
    assert not full.refresh(spark)["noop"]


def test_delta_refresh_on_update_via_merge(spark, tmp_path):
    """merge_rows surfaces as delete(old)+insert(new) in the change
    feed; the arithmetic nets to the value difference."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("a", 2, 99)]))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], DELTA_AGGS
    )
    base.merge_rows(spark, _base_rows(spark, [("a", 2, 3)]), key_cols=["k"])
    res = mv.refresh(spark)
    assert res["strategy"] == "delta"
    [row] = mv.read(spark).collect()
    assert (row["n"], row["sx"]) == (2, 13)


# --------------------------------------------------- stream-driven upkeep


def test_maintain_stream_catches_up_append_only_base(spark, tmp_path):
    """The changes stream drives refreshes: appends committed before
    the drain all land in the view; a second drain with no new
    versions leaves the view version unchanged (refreshes are noops,
    not re-applies)."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("b", 2, 5)]))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], DELTA_AGGS
    )
    base.commit(_base_rows(spark, [("a", 3, 7), ("c", 4, 99)]))
    base.commit(_base_rows(spark, [("c", 5, 1)]))
    q = mv.maintain_stream(spark, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)
    assert mv.applied_base_version() == base.latest_version()
    assert _rows(mv.read(spark)) == _rows(_expected_delta(spark, base))
    v = mv.table.latest_version()
    q2 = mv.maintain_stream(spark, str(tmp_path / "ckpt"))
    assert q2.awaitTermination(120)
    assert mv.table.latest_version() == v  # nothing new: no new version


# ----------------------------------------- pruned recompute (declarative)


def test_recompute_uses_pruned_declarative_scan(spark, tmp_path):
    """Single-column groups inline the touched keys into a pushed IN
    on the version-pinned declarative source: a partitioned base
    refreshes from the affected partitions only. Pinned here:
    correctness on a PARTITIONED base (min/max spec → recompute path),
    including a NULL group key riding the isNull disjunct."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("b", 0, 2)]))  # spec needs a table
    base.set_partition_spec(["g"])
    base.commit(
        _base_rows(
            spark,
            [("a", 1, 10), ("a", 2, 99), ("b", 3, 5), (None, 4, 7)],
        ).repartition("g")
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )
    base.merge_rows(spark, _base_rows(spark, [("a", 2, 3)]), key_cols=["k"])
    base.commit(_base_rows(spark, [(None, 5, 1)]))
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    [row] = mv.read(spark).filter(F.col("g").isNull()).collect()
    assert (row["n"], row["sx"], row["mn"], row["mx"]) == (2, 8, 1, 7)


def test_recompute_fallback_above_inline_cap(spark, tmp_path):
    """Key sets beyond the inline cap use the broadcast semi-join
    fallback — same answers."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(spark, [(f"g{i}", i, i * 3 % 17) for i in range(20)])
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )
    base.delete_where(spark, F.col("k") % 2 == 0)
    mv._INLINE_KEY_CAP = 3  # force the fallback
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


# -------------------------------------------------- retention vs marker


def test_expire_clamps_to_marker_version(spark, tmp_path):
    """View retention must never drop the newest epoch-carrying
    manifest: compact (epoch-less head), then expire EVERYTHING by
    time — the marker version survives via the clamp and the applied
    version still resolves; a further refresh works."""
    import time

    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    base.commit(_base_rows(spark, [("a", 3, 7)]))
    mv.refresh(spark)
    mv.table.compact(spark)  # head now epoch-less
    res = mv.expire(older_than_ms=int(time.time() * 1000) + 10_000)
    assert res["dropped_versions"] >= 1
    assert mv.applied_base_version() == base.latest_version()
    base.commit(_base_rows(spark, [("b", 4, 1)]))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_raw_expire_orphan_is_detected_loudly(spark, tmp_path):
    """The failure mode the clamp prevents: raw expire_snapshots on an
    epoch-less head drops the marker — the walk must raise the
    explicit rebuild error, never return a stale/None answer."""
    import time

    from kafka_database_import_spark.sources.snapshot import (
        expire_snapshots,
    )

    base, mv = _mk(spark, tmp_path, [("a", 1, 10)])
    base.commit(_base_rows(spark, [("a", 2, 3)]))
    mv.refresh(spark)
    mv.table.compact(spark)
    expire_snapshots(mv.table, int(time.time() * 1000) + 10_000)
    with pytest.raises(ValueError, match="expired|marker"):
        mv.applied_base_version()


def test_composite_group_keys_refresh_exactly(spark, tmp_path):
    """Composite group keys: the pruning scope is a cross-product
    SUPERSET of the touched tuples, so the exact semi-join must keep
    untouched combinations out of the swap (a post-row for ('a', 2)
    when only ('a', 1) and ('b', 2) changed would insert a duplicate)."""
    rows = spark.createDataFrame(
        [("a", 1, 1, 10), ("a", 2, 2, 20), ("b", 2, 3, 5), ("b", 1, 4, 7)],
        "g string, h long, k long, x long",
    )
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(rows)
    mv = MaterializedView.create(
        spark,
        base,
        str(tmp_path / "mv"),
        ["g", "h"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "max", "col": "x", "alias": "mx"},  # recompute path
        ],
    )
    # touch ('a',1) and ('b',2): the cross-product scope also covers
    # ('a',2) and ('b',1), which must NOT be re-emitted
    base.commit(
        spark.createDataFrame(
            [("a", 1, 5, 99), ("b", 2, 6, 1)],
            "g string, h long, k long, x long",
        )
    )
    # force recompute: this test pins the composite-key SUPERSET
    # pruning (an insert-only window would otherwise upgrade itself to
    # the round-12 delta_insert_only merge and never exercise it)
    res = mv.refresh(spark, strategy="recompute")
    assert res["strategy"] == "recompute"
    assert res["groups_touched"] == 2
    got = _rows(mv.read(spark))
    want = _rows(
        base.read(spark)
        .groupBy("g", "h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("x").alias("mx"),
        )
    )
    assert got == want
    # no duplicated (g, h) rows snuck in through the superset scope
    assert mv.read(spark).groupBy("g", "h").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_concurrent_refresh_loser_raises_table_stays_consistent(
    spark, tmp_path
):
    """Two maintainers racing: the commit protocol lets one win; the
    loser surfaces ConcurrentCommitError (documented contract) and the
    view still equals a recompute — never a torn or doubled state."""
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
    )

    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    base.commit(_base_rows(spark, [("a", 3, 7)]))
    mv2 = MaterializedView(mv.root)  # second maintainer handle
    mv.refresh(spark)
    # the second handle replays the same range against the already-
    # advanced view: either it sees the new marker (noop) or its swap
    # loses the race; both leave a consistent view
    try:
        mv2.refresh(spark)
    except ConcurrentCommitError:
        pass
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


# ------------------------------------------- round-12 hardening fixes


def test_recompute_huge_key_set_drops_broadcast_hint(spark, tmp_path):
    """VERDICT r11: above _BROADCAST_KEY_CAP touched keys the recompute
    fallback must NOT force F.broadcast (a backfill touching ~all
    groups of a high-cardinality view would OOM the driver) — plain
    semi-join, AQE decides. Below the cap the hint stays. Same answers
    either way."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(spark, [(f"g{i}", i, i * 3 % 17) for i in range(20)])
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )
    base.delete_where(spark, F.col("k") % 2 == 0)
    head = base.latest_version()
    from kafka_database_import_spark.sources.mv import row_changes

    delta = row_changes(
        base, spark, from_version=mv.applied_base_version(),
        to_version=head,
    )
    keys = delta.select("g").distinct()
    n = keys.count()
    assert n > 0

    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    mv._INLINE_KEY_CAP = 0  # force the semi-join fallback
    # small key set (<= broadcast cap): hint present
    small = mv._recompute_post_image(spark, base, keys, head, n_groups=n)
    assert "ResolvedHint" in analyzed(small)
    # huge key set (> broadcast cap): hint dropped
    mv._BROADCAST_KEY_CAP = n - 1
    big = mv._recompute_post_image(spark, base, keys, head, n_groups=n)
    assert "ResolvedHint" not in analyzed(big)
    # and the end-to-end refresh with the tiny caps is still exact
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_create_refuses_orphan_table_without_spec(spark, tmp_path):
    """ADVICE r11 (mv.py create): a crash between the full-aggregate
    commit and the spec write leaves a spec-less table; re-running
    create must refuse (it would append a SECOND full aggregate,
    duplicating every group), not silently proceed."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("b", 2, 5)]))
    mv_root = str(tmp_path / "mv")
    # simulate the crash: data committed, no mv.json
    orphan = SnapshotTable(mv_root)
    orphan.commit(
        spark.createDataFrame([("a", 1, 10, 10, 10)],
                              "g string, n long, sx long, mn long, mx long"),
        epoch_id=1,
    )
    with pytest.raises(ValueError, match="crashed between|no view spec"):
        MaterializedView.create(spark, base, mv_root, ["g"], AGGS)
    # the orphan table was not appended to
    assert orphan.latest_version() == 1


def test_refresh_advances_marker_when_replace_publishes_nothing(
    spark, tmp_path
):
    """ADVICE r11 (mv.py:368): when the touched groups' post-image is
    empty AND the view holds no matching rows, replace_where_keys
    publishes no version — the applied marker must still advance via a
    rewrite_only marker commit, or every later refresh re-diffs the
    same range forever."""
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    # construct the divergent state the advice describes: the view is
    # missing group 'a' (e.g. a foreign writer removed it), and the
    # base then deletes all of 'a' — refresh touches {'a'}, computes an
    # empty post-image, and matches nothing in the view
    mv.table.delete_where(spark, F.col("g") == "a")
    base.delete_where(spark, F.col("g") == "a")
    head = base.latest_version()
    res = mv.refresh(spark)
    assert not res["noop"]
    assert res["groups_touched"] == 1
    assert mv.applied_base_version() == head  # marker advanced
    assert mv.refresh(spark)["noop"]  # and stays advanced
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_racing_epoch_stamped_insert_only_replaces_dont_double_insert(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 medium (snapshot.py rebase): an insert-only
    epoch-stamped replace (affected file set EMPTY — e.g. an MV refresh
    whose delta only adds new groups) that loses the version race must
    NOT rebase-and-republish when the winner already stamped the same
    epoch: that double-inserts the group rows. The loser must raise
    ConcurrentCommitError."""
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_base_rows(spark, [("a", 1, 1)]))
    keys = spark.createDataFrame([("new",)], "g string")
    repl = _base_rows(spark, [("new", 9, 9)])  # insert-only: no file hit

    orig_publish = SnapshotTable._publish
    state = {"raced": False}

    def racy_publish(self, version, man):
        if not state["raced"] and man.get("mode") == "replace":
            state["raced"] = True
            # a competing maintainer lands the SAME refresh first
            winner = SnapshotTable(self.root)
            winner.replace_where_keys(
                spark, keys, repl, ["g"], epoch_id=7, validate=False
            )
        return orig_publish(self, version, man)

    monkeypatch.setattr(SnapshotTable, "_publish", racy_publish)
    with pytest.raises(ConcurrentCommitError, match="epoch"):
        tbl.replace_where_keys(
            spark, keys, repl, ["g"], epoch_id=7, validate=False
        )
    monkeypatch.undo()
    # exactly ONE copy of the new group's rows — never two
    assert _rows(tbl.read(spark)) == [("a", 1, 1), ("new", 9, 9)]
    # a replace carrying a NEWER epoch (a legitimately later refresh)
    # still rebases and lands
    res = tbl.replace_where_keys(
        spark,
        spark.createDataFrame([("new2",)], "g string"),
        _base_rows(spark, [("new2", 3, 3)]),
        ["g"],
        epoch_id=8,
        validate=False,
    )
    assert res["inserted_rows"] == 1


def test_avg_delta_fast_path(spark, tmp_path):
    """VERDICT r11 #7: AVG views maintain on the DELTA path via the
    hidden exact-SUM + non-null-COUNT decomposition — no base re-read;
    NULL semantics (all values deleted → AVG NULL; group emptied →
    row dropped) ride the counters."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 3, None), ("b", 4, 6),
             ("gone", 5, 9)],
            "g string, k long, x long",
        )
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "avg", "col": "x", "alias": "ax"},
        ],
    )

    def expected():
        return _rows(
            base.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.when(
                    F.count("x") > 0,
                    F.sum("x").cast("double") / F.count("x"),
                ).alias("ax"),
            )
        )

    assert _rows(mv.read(spark)) == expected()
    # mutate: change a's mean, null out b's only non-null value (AVG ->
    # NULL), empty 'gone' entirely (row must drop), add new group c
    base.merge_rows(
        spark,
        spark.createDataFrame(
            [("a", 2, 50), ("b", 4, None)], "g string, k long, x long"
        ),
        key_cols=["k"],
    )
    base.delete_where(spark, F.col("g") == "gone")
    base.commit(
        spark.createDataFrame([("c", 6, 7)], "g string, k long, x long")
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta"
    assert _rows(mv.read(spark)) == expected()
    [brow] = mv.read(spark).filter(F.col("g") == "b").collect()
    assert brow["ax"] is None and brow["n"] == 2
    assert mv.read(spark).filter(F.col("g") == "gone").count() == 0
    # forcing recompute on the same view agrees (shared hidden schema)
    base.commit(
        spark.createDataFrame([("a", 7, None)], "g string, k long, x long")
    )
    res2 = mv.refresh(spark, strategy="recompute")
    assert res2["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()


def test_insert_only_window_upgrades_minmax_to_delta(spark, tmp_path):
    """Round 12: an INSERT-ONLY change window keeps MIN/MAX
    self-maintainable — refresh merges the inserts arithmetically
    (strategy 'delta_insert_only', no base re-read); a window carrying
    a delete falls back to recompute. NULL values and new/NULL group
    keys covered."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 3, None), (None, 4, 5)],
            "g string, k long, x long",
        )
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS
    )

    # pure-insert window: new rows for an existing group (raising max,
    # lowering min), an all-NULL-value insert, a brand-new group
    base.commit(
        spark.createDataFrame(
            [("a", 5, -7), ("b", 6, None), ("c", 7, 99), (None, 8, 2)],
            "g string, k long, x long",
        )
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    [brow] = mv.read(spark).filter(F.col("g") == "b").collect()
    assert (brow["sx"], brow["mn"], brow["mx"]) == (None, None, None)

    # a window with a delete must NOT take the arithmetic path
    base.delete_where(spark, F.col("k") == 5)
    res2 = mv.refresh(spark)
    assert res2["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))

    # an update (merge) surfaces as delete+insert -> recompute too
    base.merge_rows(
        spark,
        spark.createDataFrame([("c", 7, 1)], "g string, k long, x long"),
        key_cols=["k"],
    )
    res3 = mv.refresh(spark)
    assert res3["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))

    # forcing recompute always wins over the upgrade
    base.commit(
        spark.createDataFrame([("d", 9, 4)], "g string, k long, x long")
    )
    res4 = mv.refresh(spark, strategy="recompute")
    assert res4["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))


def test_partitioned_view_refresh_prunes_view_scans(spark, tmp_path):
    """Round 12: partition_cols on create partitions the VIEW table,
    so the arithmetic paths' touched-group view reads plan only the
    affected partitions' files — observable via last_partition_counts
    — and refresh stays exact across both strategies."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(
            spark,
            [(g, i * 10 + j, i * 7 + j)
             for i, g in enumerate("abcdefgh") for j in range(3)],
        )
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"], AGGS,
        partition_cols=["g"],
    )
    assert mv.table.partition_spec()  # spec live on the view table
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    # append-only window touching ONE group: the insert-only path's
    # view read must plan a strict subset of the view's files
    base.commit(_base_rows(spark, [("c", 100, 99)]))
    res = mv.refresh(spark)
    assert res["strategy"] == "delta_insert_only"
    planned, total = mv.table.last_partition_counts
    assert total > 1 and planned < total, (planned, total)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    # a delete window (recompute) also stays exact on the
    # partitioned view
    base.delete_where(spark, F.col("g") == "h")
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    # rejected: partitioning on an aggregate output
    with pytest.raises(ValueError, match="subset of group_cols"):
        MaterializedView.create(
            spark, base, str(tmp_path / "mv2"), ["g"], AGGS,
            partition_cols=["sx"],
        )


def test_pre_upgrade_view_heals_before_taking_delta_path(spark, tmp_path):
    """Round-12 review finding: a view created BEFORE its aggregates
    became delta-eligible (hand-built here: full aggregate with NO
    hidden counters + mv.json) gets schema-WIDENED by its first
    recompute — touched groups gain counters, untouched rows read
    NULL. Column presence alone would then route later refreshes onto
    the arithmetic path, coalescing NULL counters to 0 (wrong
    averages, live groups dropped). The NULL-counter probe must force
    recompute for any window touching an unhealed group, and the view
    converges to the delta path as groups heal."""
    import json as _json
    import os as _os

    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(
            spark,
            [("a", 1, 10), ("a", 2, 20), ("b", 3, 6), ("b", 4, 2),
             ("c", 5, 9)],
        )
    )
    # hand-build the OLD on-disk state: visible columns only
    mv_root = str(tmp_path / "mv")
    old_full = base.read(spark).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.when(
            F.count("x") > 0, F.sum("x").cast("double") / F.count("x")
        ).alias("ax"),
    )
    tbl = SnapshotTable(mv_root)
    tbl.commit(old_full, epoch_id=base.latest_version())
    with open(_os.path.join(mv_root, "mv.json"), "w") as fh:
        _json.dump(
            {
                "base_root": _os.path.abspath(base.root),
                "group_cols": ["g"],
                "aggs": [
                    {"fn": "count", "alias": "n"},
                    {"fn": "avg", "col": "x", "alias": "ax"},
                ],
            },
            fh,
        )
    mv = MaterializedView(mv_root)

    def expected():
        return _rows(
            base.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.when(
                    F.count("x") > 0,
                    F.sum("x").cast("double") / F.count("x"),
                ).alias("ax"),
            )
        )

    # window 1 touches only 'a': no counters anywhere -> recompute;
    # the swap widens the schema and heals 'a'
    base.commit(_base_rows(spark, [("a", 6, 30)]))
    res1 = mv.refresh(spark)
    assert res1["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # window 2 touches UNHEALED 'b' with a delete — arithmetic against
    # NULL counters would drop the still-live group / corrupt ax
    base.delete_where(spark, F.col("k") == 3)
    res2 = mv.refresh(spark)
    assert res2["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    [brow] = mv.read(spark).filter(F.col("g") == "b").collect()
    assert (brow["n"], brow["ax"]) == (1, 2.0)  # alive, exact
    # window 3 touches only HEALED groups -> the delta path engages
    base.commit(_base_rows(spark, [("a", 7, None), ("b", 8, 4)]))
    res3 = mv.refresh(spark)
    assert res3["strategy"] == "delta"
    assert _rows(mv.read(spark)) == expected()


def test_insert_only_window_never_wipes_hidden_counters(spark, tmp_path):
    """ADVICE r12: on a counter-BEARING COUNT/SUM view, an insert-only
    window touching an unhealed group must take the recompute that
    actually heals — the delta_insert_only post-image carries no
    __nn__* columns, so letting it intercept would NULL-fill healthy
    counters on every touched group (un-healing group 'a' below) and
    keep the view off the delta path indefinitely under append-only
    traffic. Pinned: window 2 recomputes; window 3 (all groups healed)
    takes the plain delta path, proving the counters survived."""
    import json as _json
    import os as _os

    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        _base_rows(spark, [("a", 1, 10), ("b", 2, 6), ("b", 3, 2)])
    )
    # hand-build the pre-upgrade on-disk state: visible columns only
    mv_root = str(tmp_path / "mv")
    old_full = base.read(spark).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
    )
    tbl = SnapshotTable(mv_root)
    tbl.commit(old_full, epoch_id=base.latest_version())
    with open(_os.path.join(mv_root, "mv.json"), "w") as fh:
        _json.dump(
            {
                "base_root": _os.path.abspath(base.root),
                "group_cols": ["g"],
                "aggs": [
                    {"fn": "count", "alias": "n"},
                    {"fn": "sum", "col": "x", "alias": "sx"},
                ],
            },
            fh,
        )
    mv = MaterializedView(mv_root)

    def expected():
        return _rows(
            base.read(spark).groupBy("g").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
            )
        )

    # window 1: a DELETE forces recompute, which widens the schema and
    # heals 'a' (a counter-less view under pure appends legitimately
    # stays on the insert-only merge — correct, just never healing;
    # only a recompute introduces the counters at all)
    base.delete_where(spark, F.col("k") == 1)
    assert mv.refresh(spark)["strategy"] == "recompute"
    # window 2: INSERT-ONLY, touches healed 'a' AND unhealed 'b' — the
    # arithmetic upgrade would wipe 'a''s counters; must recompute
    base.commit(_base_rows(spark, [("a", 5, 1), ("b", 6, None)]))
    res2 = mv.refresh(spark)
    assert res2["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # window 3: both groups now healed -> full delta path engages,
    # which only works if window 2 left the counters intact
    base.commit(_base_rows(spark, [("a", 7, 2), ("b", 8, 3)]))
    res3 = mv.refresh(spark)
    assert res3["strategy"] == "delta"
    assert _rows(mv.read(spark)) == expected()
    # and a delete keeps SQL NULL/liveness semantics via the counters
    base.delete_where(spark, F.col("k").isin(2, 3, 6, 8))
    mv.refresh(spark)
    assert mv.read(spark).filter(F.col("g") == "b").count() == 0
    assert _rows(mv.read(spark)) == expected()


def test_create_rejects_hidden_prefix_aliases(spark, tmp_path):
    """Aliases (or group cols) named like the hidden counters would be
    silently stripped by read() or collide with maintenance columns —
    refused at create."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 1)]))
    with pytest.raises(ValueError, match="hidden"):
        MaterializedView.create(
            spark, base, str(tmp_path / "mv"), ["g"],
            [{"fn": "sum", "col": "x", "alias": "__sum__x"}],
        )


# ---------------------------------------------- round-13: star-join views


def _star_fixture(spark, tmp_path, how="inner"):
    """fact(f_did, k, x) ⋈ dim(d_id, color, region): d_id 9 has no dim
    row (inner drops it, left NULL-extends it); dim rows carry two
    attributes so group cols can mix fact- and dim-side."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame(
            [(1, "red", "east"), (2, "blue", "west"), (3, "red", "west")],
            "d_id long, color string, region string",
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(1, 1, 10), (1, 2, 20), (2, 3, 5), (3, 4, None), (9, 5, 99)],
            "f_did long, k long, x long",
        )
    )
    js = [
        {
            "dim_root": dim.root,
            "fact_keys": ["f_did"],
            "dim_keys": ["d_id"],
            "cols": ["color", "region"],
            "how": how,
        }
    ]
    return fact, dim, js


def _star_expected(spark, fact, dim, group_cols, how="inner"):
    j = fact.read(spark).join(
        dim.read(spark), F.col("f_did") == F.col("d_id"), how
    )
    return _rows(
        j.groupBy(*group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
    )


_STAR_AGGS = [
    {"fn": "count", "alias": "n"},
    {"fn": "sum", "col": "x", "alias": "sx"},
]


def test_star_view_full_lifecycle(spark, tmp_path):
    """Create ⋈ dim, fact append (delta), fact delete (delta), dim
    compaction (no rebuild), dim mutation (SCD delta at new pins),
    post-change fact append (plain delta again) — the view equals a
    from-scratch join+aggregate after every window."""
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )

    def check():
        assert _rows(mv.read(spark)) == _star_expected(
            spark, fact, dim, ["color"]
        )

    check()
    assert mv.applied_dim_pins() == {dim.root: 1}
    fact.commit(
        spark.createDataFrame(
            [(2, 6, 100), (1, 7, None)], "f_did long, k long, x long"
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta"
    check()
    fact.delete_where(spark, F.col("x") == 10)
    assert mv.refresh(spark)["strategy"] == "delta"
    check()
    # compaction is rewrite-only: the pin advances silently, no rebuild
    dim.compact(spark)
    res = mv.refresh(spark)
    assert res["noop"] and res.get("strategy") != "rebuild_dims"
    check()
    # a LOGICAL dim change: round 13 handles a SINGLE changed dim as an
    # SCD DELTA (remove old-attr contributions, add new-attr ones for
    # just the changed keys' fact rows) — arithmetic path for this
    # counter-backed COUNT/SUM view, pins advanced atomically
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(1, "green", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and res.get("dim_delta")
    assert mv.applied_dim_pins() == {dim.root: dim.latest_version()}
    check()
    # strict strategy='delta' SUCCEEDS across a dim change on this view
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(2, "red", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark, strategy="delta")
    assert res["strategy"] == "delta" and res.get("dim_delta")
    check()
    # fact-only window afterwards is a plain (non-dim) delta
    fact.commit(
        spark.createDataFrame([(3, 8, 7)], "f_did long, k long, x long")
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and not res.get("dim_delta")
    check()


def test_star_left_join_null_attribute_groups(spark, tmp_path):
    """how='left': unmatched fact rows form the NULL-attribute group
    and must survive every maintenance path (the delta arithmetic
    groups NULL-safely; recompute skips dimension-driven pruning for
    left dims because the NULL group's contributors are exactly the
    unmatched rows)."""
    fact, dim, js = _star_fixture(spark, tmp_path, how="left")
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"],
        _STAR_AGGS + [{"fn": "max", "col": "x", "alias": "mx"}],
        join_spec=js,
    )

    def expected():
        j = fact.read(spark).join(
            dim.read(spark), F.col("f_did") == F.col("d_id"), "left"
        )
        return _rows(
            j.groupBy("color").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
                F.max("x").alias("mx"),
            )
        )

    assert _rows(mv.read(spark)) == expected()
    assert mv.read(spark).filter(F.col("color").isNull()).count() == 1
    # append another unmatched row (insert-only window, MIN/MAX view)
    fact.commit(
        spark.createDataFrame([(42, 9, 3)], "f_did long, k long, x long")
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()
    # delete from the NULL group -> recompute (MAX shrink), still exact
    fact.delete_where(spark, F.col("x") == 99)
    assert mv.refresh(spark)["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # SCD dim delta under a LEFT join: inserting dim key 42 migrates
    # its fact rows OUT of the NULL-attribute group into 'white' — the
    # synthetic remove side must debit the NULL group (unmatched-at-old
    # rows join to NULL attrs), the add side credits the new one
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(42, "white", "north")],
            "d_id long, color string, region string",
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res.get("dim_delta"), res
    assert _rows(mv.read(spark)) == expected()
    assert (
        mv.read(spark).filter(F.col("color") == "white").count() == 1
    )


def test_star_join_spec_validation(spark, tmp_path):
    fact, dim, _ = _star_fixture(spark, tmp_path)
    mk = lambda js, n: MaterializedView.create(  # noqa: E731
        spark, fact, str(tmp_path / n), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    with pytest.raises(ValueError, match="dim_root"):
        mk([{"fact_keys": ["f_did"], "dim_keys": ["d_id"]}], "m1")
    with pytest.raises(ValueError, match="same length"):
        mk(
            [{"dim_root": dim.root, "fact_keys": ["f_did"],
              "dim_keys": ["d_id", "color"], "cols": ["color"]}],
            "m2",
        )
    with pytest.raises(ValueError, match="inner/left"):
        mk(
            [{"dim_root": dim.root, "fact_keys": ["f_did"],
              "dim_keys": ["d_id"], "cols": ["color"], "how": "full"}],
            "m3",
        )
    with pytest.raises(ValueError, match="shadow"):
        mk(
            [{"dim_root": dim.root, "fact_keys": ["f_did"],
              "dim_keys": ["d_id"], "cols": ["k"]}],  # clashes with fact
            "m4",
        )
    with pytest.raises(ValueError, match="empty"):
        mk(
            [{"dim_root": str(tmp_path / "nope"), "fact_keys": ["f_did"],
              "dim_keys": ["d_id"], "cols": []}],
            "m5",
        )


def test_star_delta_path_broadcasts_dim(spark, tmp_path):
    """VERDICT r12 'done' criterion: plan pin showing the dim side
    BROADCASTS in the delta path — the fact (and its change rows)
    never shuffle for a dimension lookup. _join_dims is the one join
    constructor every maintenance path routes through."""
    from kafka_database_import_spark.sources.mv import _join_dims

    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    joined = _join_dims(
        spark, fact.read(spark), mv.spec["join_spec"], mv.applied_dim_pins()
    )
    joined.count()  # let AQE finalize
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_star_recompute_prunes_fact_by_dim_keys(spark, tmp_path):
    """Dimension-driven fact pruning: a recompute touching groups
    keyed by a DIM attribute must plan only the fact partitions whose
    join keys the touched dim rows map to — observable through
    last_partition_counts on a fact partitioned by its join key."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame(
            [(i, f"c{i % 4}") for i in range(8)], "d_id long, color string"
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(i % 8, i, i * 3) for i in range(64)],
            "f_did long, k long, x long",
        )
    )
    fact.set_partition_spec(["f_did"])
    fact.compact(spark)
    js = [{"dim_root": dim.root, "fact_keys": ["f_did"],
           "dim_keys": ["d_id"], "cols": ["color"], "how": "inner"}]
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"],
        [{"fn": "max", "col": "x", "alias": "mx"}], join_spec=js,
    )
    # touch ONE color (= two d_ids = two fact partitions of eight)
    fact.delete_where(spark, (F.col("f_did") == 1) & (F.col("k") == 57))
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute"
    # refresh used its own handle; re-derive the pruning observation by
    # calling the recompute builder directly with OUR handle
    keys = spark.createDataFrame([("c1",)], "color string")
    post = mv._recompute_post_image_star(
        spark, fact, keys, fact.latest_version(),
        mv.applied_dim_pins(), n_groups=1,
    )
    rows = {tuple(r) for r in post.collect()}
    planned, total = fact.last_partition_counts
    assert total >= 8 and planned < total, (planned, total)
    expect = {
        tuple(r)
        for r in fact.read(spark)
        .join(dim.read(spark), F.col("f_did") == F.col("d_id"))
        .filter(F.col("color") == "c1")
        .groupBy("color")
        .agg(F.max("x").alias("mx"))
        .collect()
    }
    assert rows == expect, (rows, expect)
    assert _rows(mv.read(spark)) == _rows(
        fact.read(spark)
        .join(dim.read(spark), F.col("f_did") == F.col("d_id"))
        .groupBy("color")
        .agg(F.max("x").alias("mx"))
    )


def test_star_avg_view_delta_and_rebuild(spark, tmp_path):
    """AVG star view: the hidden SUM+COUNT decomposition must survive
    the join path and the dimension rebuild re-emits counters (the
    rebuild writes with _agg_exprs(with_nn=True))."""
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["region"],
        [{"fn": "avg", "col": "x", "alias": "ax"}], join_spec=js,
    )

    def expected():
        j = fact.read(spark).join(
            dim.read(spark), F.col("f_did") == F.col("d_id")
        )
        return _rows(
            j.groupBy("region").agg(
                F.when(
                    F.count("x") > 0,
                    F.sum("x").cast("double") / F.count("x"),
                ).alias("ax")
            )
        )

    assert _rows(mv.read(spark)) == expected()
    fact.commit(
        spark.createDataFrame(
            [(3, 10, 8), (3, 11, None)], "f_did long, k long, x long"
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta"
    assert _rows(mv.read(spark)) == expected()
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(3, "red", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and res.get("dim_delta")
    assert _rows(mv.read(spark)) == expected()
    # counters maintained through the dim delta: next fact window delta
    fact.delete_where(spark, F.col("k") == 10)
    assert mv.refresh(spark)["strategy"] == "delta"
    assert _rows(mv.read(spark)) == expected()


# ------------------------------------- round-13: bitmap-backed countd


def test_countd_bitmap_insert_only_and_recompute(spark, tmp_path):
    """COUNT-DISTINCT views persist mergeable bitmap state: insert-only
    windows OR-merge (strategy delta_insert_only, duplicate values
    never double-count, negatives/NULLs exact), delete windows
    recompute and REWRITE the state so the next append window is
    incremental again."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 10), ("a", 3, None), ("b", 4, 7),
             (None, 5, -3)],
            "g string, k long, u long",
        )
    )
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"],
        [
            {"fn": "countd", "col": "u", "alias": "nd"},
            {"fn": "count", "alias": "n"},
        ],
    )

    def expected():
        return _rows(
            base.read(spark).groupBy("g").agg(
                F.count_distinct("u").alias("nd"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    assert _rows(mv.read(spark)) == expected()
    # hidden state exists but is stripped from the public read
    assert "__bm__nd" in mv.table.read(spark).columns
    assert "__bm__nd" not in mv.read(spark).columns
    # insert-only: dups (10), new values, NULL, negative, new groups
    base.commit(
        spark.createDataFrame(
            [("a", 6, 10), ("a", 7, 99), ("b", 8, None), ("c", 9, 1),
             (None, 10, -3)],
            "g string, k long, u long",
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()
    base.commit(
        spark.createDataFrame(
            [("a", 11, 99), ("c", 12, 1), ("c", 13, 2)],
            "g string, k long, u long",
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()
    # delete -> recompute (bitmaps cannot subtract), state rewritten
    base.delete_where(spark, F.col("k").isin(2, 7, 9))
    assert mv.refresh(spark)["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # post-delete append -> bitmap path again
    base.commit(
        spark.createDataFrame(
            [("a", 14, 55), ("b", 15, 7)], "g string, k long, u long"
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()


def test_countd_non_integral_stays_recompute(spark, tmp_path):
    """A countd over a non-integral column gets NO bitmap state (the
    bitmap functions index by long; hashing strings would lose
    exactness) — every window recomputes, results stay exact."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 1), ("a", 2, 2)]))
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"],
        [{"fn": "countd", "col": "g", "alias": "ndg"}],
    )
    assert not any(
        c.startswith("__bm__") for c in mv.table.read(spark).columns
    )
    base.commit(_base_rows(spark, [("a", 3, 3), ("b", 4, 1)]))
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == _rows(
        base.read(spark).groupBy("g").agg(
            F.count_distinct("g").alias("ndg")
        )
    )


def test_countd_pre_bitmap_view_heals_group_by_group(spark, tmp_path):
    """A hand-built pre-bitmap countd view (visible column only) gets
    schema-widened by its first recompute; an insert-only window
    touching an UNHEALED group (NULL map beside a live count) must
    recompute — OR-merging into missing state would undercount — and
    the view converges to the bitmap path as groups heal."""
    import json as _json
    import os as _os

    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("b", 2, 7)]))
    mv_root = str(tmp_path / "mv")
    old_full = base.read(spark).groupBy("g").agg(
        F.count_distinct("x").alias("nd")
    )
    tbl = SnapshotTable(mv_root)
    tbl.commit(old_full, epoch_id=base.latest_version())
    with open(_os.path.join(mv_root, "mv.json"), "w") as fh:
        _json.dump(
            {
                "base_root": _os.path.abspath(base.root),
                "group_cols": ["g"],
                "aggs": [{"fn": "countd", "col": "x", "alias": "nd"}],
            },
            fh,
        )
    mv = MaterializedView(mv_root)

    def expected():
        return _rows(
            base.read(spark).groupBy("g").agg(
                F.count_distinct("x").alias("nd")
            )
        )

    # insert-only window, NO state anywhere -> recompute widens+heals
    base.commit(_base_rows(spark, [("a", 3, 11)]))
    assert mv.refresh(spark)["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # healed 'a' alone -> bitmap path engages
    base.commit(_base_rows(spark, [("a", 4, 12)]))
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()
    # unhealed 'b' in an insert-only window -> recompute (heals b)
    base.commit(_base_rows(spark, [("a", 5, 13), ("b", 6, 8)]))
    assert mv.refresh(spark)["strategy"] == "recompute"
    assert _rows(mv.read(spark)) == expected()
    # now everything is healed -> bitmap path for all groups
    base.commit(_base_rows(spark, [("a", 7, 10), ("b", 8, 9)]))
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()


def test_countd_star_view_with_bitmaps(spark, tmp_path):
    """countd composes with star joins: state rides the joined frame,
    dim changes rebuild state along with everything else."""
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["region"],
        [{"fn": "countd", "col": "x", "alias": "nd"}],
        join_spec=js,
    )

    def expected():
        j = fact.read(spark).join(
            dim.read(spark), F.col("f_did") == F.col("d_id")
        )
        return _rows(
            j.groupBy("region").agg(F.count_distinct("x").alias("nd"))
        )

    assert _rows(mv.read(spark)) == expected()
    fact.commit(
        spark.createDataFrame(
            [(1, 10, 10), (2, 11, 5)], "f_did long, k long, x long"
        )
    )
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(2, "blue", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    # countd view: the synthetic dim delta carries deletes, so it lands
    # on the touched-group recompute (bitmaps cannot subtract) — still
    # O(changed keys' fact rows + touched groups), never O(base)
    res = mv.refresh(spark)
    assert res["strategy"] == "recompute" and res.get("dim_delta")
    assert _rows(mv.read(spark)) == expected()
    fact.commit(
        spark.createDataFrame([(3, 12, 42)], "f_did long, k long, x long")
    )
    assert mv.refresh(spark)["strategy"] == "delta_insert_only"
    assert _rows(mv.read(spark)) == expected()


def test_star_dim_vacuumed_history_rebuilds_not_crashes(spark, tmp_path):
    """Round-13 review finding: retention on a DIMENSION can remove the
    manifests between the applied pin and the head — the rewrite-only
    neutrality walk then cannot run. Refresh must answer with a sound
    rebuild at the new pins, never an unhandled FileNotFoundError."""
    from kafka_database_import_spark.sources.snapshot import vacuum

    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    # dim advances twice (one real change), then loses its history
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(1, "green", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    dim.compact(spark)
    vacuum(dim, retain_last=1)
    fact.commit(
        spark.createDataFrame([(2, 9, 4)], "f_did long, k long, x long")
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "rebuild_dims"
    assert _rows(mv.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )
    # pins re-established at the surviving head -> delta path resumes
    fact.commit(
        spark.createDataFrame([(3, 10, 1)], "f_did long, k long, x long")
    )
    assert mv.refresh(spark)["strategy"] == "delta"
    assert _rows(mv.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )


def test_dim_delta_fact_scan_prunes_by_join_key(spark, tmp_path):
    """The SCD delta's 100-TB bound is observable: with the fact
    partitioned on its join key, the changed-dim-keys fact scan must
    plan only the affected partitions' files (read_partition inline
    path — manifest pruning, exact for the equality IN)."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame(
            [(i, f"a{i % 3}") for i in range(8)], "d_id long, attr string"
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(i % 8, i, i * 2) for i in range(64)],
            "f_did long, k long, x long",
        )
    )
    fact.set_partition_spec(["f_did"])
    fact.compact(spark)
    js = [{"dim_root": dim.root, "fact_keys": ["f_did"],
           "dim_keys": ["d_id"], "cols": ["attr"], "how": "inner"}]
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["attr"], _STAR_AGGS,
        join_spec=js,
    )
    # change TWO of eight dim keys, then refresh (SCD delta)
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(1, "moved"), (5, "moved")], "d_id long, attr string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res.get("dim_delta") and res["strategy"] == "delta", res
    assert _rows(mv.read(spark)) == _rows(
        fact.read(spark)
        .join(dim.read(spark), F.col("f_did") == F.col("d_id"))
        .groupBy("attr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
    )
    # observable pruning: re-derive the changed-keys fact scan with OUR
    # handle (refresh used its own) and pin the planned-file subset
    kdf = spark.createDataFrame([(1,), (5,)], "d_id long")
    e = mv.spec["join_spec"][0]
    mv._fact_rows_for_dim_keys(
        spark, fact, fact.latest_version(), e, kdf
    ).count()
    planned, total = fact.last_partition_counts
    assert total >= 8 and planned < total, (planned, total)


def test_star_two_dims_change_sequential_scd(spark, tmp_path):
    """TWO dimensions changing in one window: refresh chains one SCD
    pass per dim (each an atomic swap advancing exactly that dim's
    pin) instead of rebuilding — the final state equals a from-scratch
    join at both heads, and a fresh-handle replay is a noop."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    d1 = SnapshotTable(str(tmp_path / "d1"))
    d2 = SnapshotTable(str(tmp_path / "d2"))
    d1.commit(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "a_id long, color string"
        )
    )
    d2.commit(
        spark.createDataFrame(
            [(10, "east"), (20, "west")], "b_id long, region string"
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(1, 10, 1, 5), (1, 20, 2, 7), (2, 10, 3, 11), (2, 20, 4, 2)],
            "fa long, fb long, k long, x long",
        )
    )
    js = [
        {"dim_root": d1.root, "fact_keys": ["fa"], "dim_keys": ["a_id"],
         "cols": ["color"], "how": "inner"},
        {"dim_root": d2.root, "fact_keys": ["fb"], "dim_keys": ["b_id"],
         "cols": ["region"], "how": "inner"},
    ]
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color", "region"],
        _STAR_AGGS, join_spec=js,
    )

    def expected():
        j = (
            fact.read(spark)
            .join(d1.read(spark), F.col("fa") == F.col("a_id"))
            .join(d2.read(spark), F.col("fb") == F.col("b_id"))
        )
        return _rows(
            j.groupBy("color", "region").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
            )
        )

    assert _rows(mv.read(spark)) == expected()
    # both dims mutate, plus a fact append, all in one window
    d1.merge_rows(
        spark,
        spark.createDataFrame([(1, "green")], "a_id long, color string"),
        key_cols=["a_id"],
    )
    d2.merge_rows(
        spark,
        spark.createDataFrame([(20, "north")], "b_id long, region string"),
        key_cols=["b_id"],
    )
    fact.commit(
        spark.createDataFrame(
            [(2, 20, 5, 100)], "fa long, fb long, k long, x long"
        )
    )
    res = mv.refresh(spark)
    assert res.get("dim_delta") and res["strategy"] == "delta", res
    assert _rows(mv.read(spark)) == expected()
    assert mv.applied_dim_pins() == {
        d1.root: d1.latest_version(), d2.root: d2.latest_version(),
    }
    # fresh handle: nothing left to apply
    assert MaterializedView(mv.root).refresh(spark)["noop"]
    # and a later fact-only window is a plain delta
    fact.commit(
        spark.createDataFrame(
            [(1, 10, 6, 3)], "fa long, fb long, k long, x long"
        )
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and not res.get("dim_delta")
    assert _rows(mv.read(spark)) == expected()


def test_create_never_reads_base_unpinned(spark, tmp_path, monkeypatch):
    """Round-13 review: create() stamps epoch_id = the head it
    captured, so every read it plans must be PINNED to that head — an
    unpinned read racing a concurrent append would fold newer rows
    into the aggregate and the next refresh would re-apply the same
    diff (double count). Pinned-only is asserted by interception."""
    base = SnapshotTable(str(tmp_path / "base"))
    base.commit(_base_rows(spark, [("a", 1, 10), ("b", 2, 5)]))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame([("a", "x"), ("b", "y")], "g string, attr string")
    )
    unpinned = []
    real_read = SnapshotTable.read

    def spy(self, spark_, version=None, **kw):
        if version is None:
            unpinned.append(self.root)
        return real_read(self, spark_, version=version, **kw)

    monkeypatch.setattr(SnapshotTable, "read", spy)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["attr"],
        [{"fn": "count", "alias": "n"}],
        join_spec=[{"dim_root": dim.root, "fact_keys": ["g"],
                    "dim_keys": ["g"], "cols": ["attr"]}],
    )
    assert not unpinned, unpinned
    monkeypatch.undo()
    assert _rows(mv.read(spark)) == [("x", 1), ("y", 1)]

# ------------------------------------------- round 14: cost-based auto


def test_cost_based_auto_rebuilds_small_base(spark, tmp_path):
    """VERDICT r13 item 2: a dimension-change window under
    strategy='auto' consults manifest stats (base data-file bytes, an
    os.stat over the manifest list — no scan) and picks the one-shot
    REBUILD when the base is under REBUILD_BYTES_CAP — SCALE.md's
    round-13 measurement showed the SCD delta's fixed multi-pass
    overhead costs ~10× a rebuild at fixture scale. The result is
    stamped ``rebuild_reason='cost'`` to distinguish it from the
    unprovable-history rebuild, and the view still equals a
    from-scratch join."""
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    mv.REBUILD_BYTES_CAP = 8 * 1024 * 1024  # restore the real default
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(1, "green", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "rebuild_dims", res
    assert res.get("rebuild_reason") == "cost", res
    assert mv.applied_dim_pins() == {dim.root: dim.latest_version()}
    assert _rows(mv.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )
    # a later fact-only window is a plain delta again (pins took)
    fact.commit(
        spark.createDataFrame([(2, 6, 100)], "f_did long, k long, x long")
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and not res.get("dim_delta"), res
    assert _rows(mv.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )


def test_cost_based_auto_respects_cap_and_strategy_forcing(
    spark, tmp_path
):
    """The cost probe is a POLICY knob, not a semantics change: with
    the cap at 0 (the 100-TB structural default for a base whose size
    clears it) the same window takes the SCD delta; strategy='delta'
    forces the structural path regardless of the cap; and a base whose
    manifest stats are unreadable (a file missing mid-probe) falls
    back to the structural delta — never a surprise O(base) rebuild on
    a table too big to rescan."""
    import os as _os

    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    # cap 0 (the autouse default): structural SCD delta
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(1, "green", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark)
    assert res["strategy"] == "delta" and res.get("dim_delta"), res
    # real cap but strategy='delta' forced: still the SCD delta
    mv.REBUILD_BYTES_CAP = 8 * 1024 * 1024
    dim.merge_rows(
        spark,
        spark.createDataFrame(
            [(2, "red", "east")], "d_id long, color string, region string"
        ),
        key_cols=["d_id"],
    )
    res = mv.refresh(spark, strategy="delta")
    assert res["strategy"] == "delta" and res.get("dim_delta"), res
    assert _rows(mv.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )
    # unreadable stats: the probe answers 'too big' -> structural delta
    missing = _os.path.join(fact.root, fact.manifest()["files"][0])
    saved = missing + ".probe_moved"
    _os.rename(missing, saved)
    try:
        assert mv._rebuild_cheaper(fact, fact.latest_version()) is False
    finally:
        _os.rename(saved, missing)


def test_noop_refresh_persists_advanced_dim_pins(spark, tmp_path):
    """ADVICE r13: a noop refresh (head == last) whose dim pins
    silently advanced past rewrite-only dim commits (compaction) must
    PERSIST the advanced pins via a marker commit — otherwise an idle
    view re-walks the dim manifest range on every refresh, and once
    dim retention expires that range it pays an O(base) rebuild (or
    strategy='delta' raises) despite no logical change."""
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    pinned = mv.applied_dim_pins()[dim.root]
    dim.compact(spark)  # rewrite-only: logically neutral
    assert dim.latest_version() > pinned
    res = mv.refresh(spark)
    assert res["noop"], res
    # the marker commit persisted the advanced pin
    assert mv.applied_dim_pins() == {dim.root: dim.latest_version()}
    # the persisted pin survives a fresh handle and expired dim history:
    # expire the dim's pre-compaction versions, then refresh again —
    # with the stale pin this walk range would be unprovable (rebuild);
    # with the persisted pin it is a plain noop
    from kafka_database_import_spark.sources.snapshot import vacuum

    vacuum(dim, retain_last=1)
    fresh = MaterializedView(mv.root)
    fresh.REBUILD_BYTES_CAP = 0
    res = fresh.refresh(spark, strategy="delta")  # raises if unprovable
    assert res["noop"], res
    assert _rows(fresh.read(spark)) == _star_expected(
        spark, fact, dim, ["color"]
    )


def test_join_spec_rejects_maintenance_internal_names(spark, tmp_path):
    """ADVICE r13: a dim projecting '_change_type' or a hidden-prefix
    name would collide with maintenance-internal columns in the joined
    change-row frame — create() must refuse up front, not fail at
    refresh time."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    fact.commit(
        spark.createDataFrame([(1, 1, 10)], "f_did long, k long, x long")
    )
    for bad in ("_change_type", "__nn__x", "__sum__x", "__bm__x"):
        dim = SnapshotTable(str(tmp_path / f"dim_{bad.strip('_')}"))
        dim.commit(
            spark.createDataFrame(
                [(1, "v")], f"d_id long, `{bad}` string"
            )
        )
        with pytest.raises(ValueError, match="maintenance-internal"):
            MaterializedView.create(
                spark, fact, str(tmp_path / f"mv_{bad.strip('_')}"),
                ["f_did"],
                [{"fn": "count", "alias": "n"}],
                join_spec=[{
                    "dim_root": dim.root, "fact_keys": ["f_did"],
                    "dim_keys": ["d_id"], "cols": [bad], "how": "inner",
                }],
            )


# --------------------------------- round 14: MV under schema evolution


def test_refresh_correct_across_additive_and_widening_evolution(
    spark, tmp_path
):
    """VERDICT r13 item 6: base schema evolution that is TRANSPARENT
    to the view definition — a new column appearing and the agg column
    widening int→bigint mid-maintenance-window — must leave refresh
    hash-correct on BOTH maintenance families (arithmetic delta and
    touched-group recompute)."""
    import pyspark.sql.types as T

    for name, aggs, strategies in (
        ("delta", [{"fn": "count", "alias": "n"},
                   {"fn": "sum", "col": "x", "alias": "sx"}],
         ("delta",)),
        ("recomp", [{"fn": "min", "col": "x", "alias": "mn"},
                    {"fn": "max", "col": "x", "alias": "mx"}],
         ("delta_insert_only", "recompute")),
    ):
        base = SnapshotTable(str(tmp_path / f"base_{name}"))
        base.commit(
            spark.createDataFrame(
                [("a", 1, 10), ("b", 2, 5)],
                T.StructType([
                    T.StructField("g", T.StringType()),
                    T.StructField("k", T.LongType()),
                    T.StructField("x", T.IntegerType()),  # narrow!
                ]),
            )
        )
        mv = MaterializedView.create(
            spark, base, str(tmp_path / f"mv_{name}"), ["g"], aggs
        )
        # window: new column AND x widened to bigint in one append
        base.commit(
            spark.createDataFrame(
                [("a", 3, 2**40, "new"), ("c", 4, 7, "new")],
                "g string, k long, x long, extra string",
            )
        )
        res = mv.refresh(spark)
        assert res["strategy"] in strategies, (name, res)
        got = _rows(mv.read(spark))
        exprs = {
            "n": F.count(F.lit(1)).cast("long").alias("n"),
            "sx": F.sum("x").alias("sx"),
            "mn": F.min("x").alias("mn"),
            "mx": F.max("x").alias("mx"),
        }
        expected = _rows(
            base.read(spark)
            .groupBy("g")
            .agg(*[exprs[a["alias"]] for a in aggs])
        )
        assert got == expected, (name, got, expected)
        # and a delete window AFTER the evolution (recompute re-reads
        # the evolved base under the widened schema)
        base.delete_where(spark, F.col("k") == 1)
        mv.refresh(spark)
        expected = _rows(
            base.read(spark)
            .groupBy("g")
            .agg(*[exprs[a["alias"]] for a in aggs])
        )
        assert _rows(mv.read(spark)) == expected, name


def test_refresh_refuses_dropped_or_renamed_referenced_columns(
    spark, tmp_path
):
    """Destructive evolution of a REFERENCED column (drop/rename) must
    fail refresh loudly in the view's vocabulary — never silently
    wrong aggregates. Unreferenced drops stay transparent."""
    base, mv = _mk(spark, tmp_path, [("a", 1, 10), ("b", 2, 5)])
    # dropping an UNreferenced column is fine
    base.commit(
        spark.createDataFrame(
            [("c", 3, 1, 9)], "g string, k long, x long, tmp long"
        )
    )
    base.drop_column("tmp")
    base.commit(_base_rows(spark, [("d", 4, 2)]))
    assert not mv.refresh(spark)["noop"]
    assert _rows(mv.read(spark)) == _rows(_expected(spark, base))
    # dropping the AGG column: loud refusal naming the column
    base.drop_column("x")
    base.commit(
        spark.createDataFrame([("e", 5)], "g string, k long")
    )
    with pytest.raises(ValueError, match="no longer provides.*'x'"):
        MaterializedView(mv.root).refresh(spark)


def test_refresh_refuses_dim_losing_projected_column(spark, tmp_path):
    fact, dim, js = _star_fixture(spark, tmp_path)
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"], _STAR_AGGS,
        join_spec=js,
    )
    dim.drop_column("color")
    with pytest.raises(ValueError, match="dimension.*color"):
        mv.refresh(spark)
    # the fact side losing a JOIN KEY is equally loud
    fact2, dim2, js2 = _star_fixture(
        spark, tmp_path / "second", how="inner"
    )
    mv2 = MaterializedView.create(
        spark, fact2, str(tmp_path / "second" / "mv"), ["color"],
        _STAR_AGGS, join_spec=js2,
    )
    fact2.drop_column("f_did")
    with pytest.raises(ValueError, match="fact join keys.*f_did"):
        mv2.refresh(spark)
