"""Named refs (tags) and the write-audit-publish workflow.

Tags are immutable named pointers into the version log with RETENTION
teeth: vacuum/expire keep a tagged version's manifest and files alive
regardless of the window (the production use — pin the compliance
snapshot, let the churn age out). WAP stages a commit's files and
manifest OUTSIDE the version log so an audit job can validate the
candidate state; publish links it in (rebasing a stale append
metadata-only), drop abandons it, and vacuum both pins staged files
and reclaims dropped ones.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    ConcurrentCommitError,
    SnapshotTable,
    StatsSnapshotTable,
    vacuum,
)


def _mkdf(spark, n=8, offset=0):
    return spark.createDataFrame(
        [(offset + i, f"u{i % 3}") for i in range(n)], "k long, v string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tag_create_read_immutability(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_mkdf(spark, 4))
    t.commit(_mkdf(spark, 4, offset=100))
    v = t.create_tag("audit-q1", 1)
    assert v == 1 and t.tags() == {"audit-q1": 1}
    assert t.create_tag("head-tag") == 2  # default: head
    assert _rows(t.read(spark, ref="audit-q1")) == _rows(_mkdf(spark, 4))
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("audit-q1", 2)
    with pytest.raises(KeyError, match="no ref"):
        t.resolve_ref("nope")
    with pytest.raises(ValueError, match="version OR ref"):
        t.read(spark, version=1, ref="audit-q1")
    t.drop_tag("head-tag")
    assert t.tags() == {"audit-q1": 1}
    with pytest.raises(ValueError, match="letters"):
        t.create_tag("../escape", 1)


def test_vacuum_pins_tagged_version(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(6):
        t.commit(_mkdf(spark, 4, offset=10 * i).coalesce(1))
    t.create_tag("pin", 2)
    res = vacuum(t, retain_last=2)
    assert 2 in res["retained_versions"]  # pinned through the window
    assert sorted(res["retained_versions"]) == [2, 5, 6]
    fresh = SnapshotTable(t.root)
    assert _rows(fresh.read(spark, ref="pin")) == _rows(
        _mkdf(spark, 4).union(_mkdf(spark, 4, offset=10))
    )
    with pytest.raises(FileNotFoundError):
        fresh.manifest(3)
    # the pinned version was delta-form with a dropped parent: vacuum
    # materialized it (non-contiguous keep set)
    with open(t._manifest_path(2)) as f:
        assert "delta_of" not in json.load(f)


def test_wap_stage_audit_publish(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_mkdf(spark, 6))
    t.stage(_mkdf(spark, 4, offset=100), "batch-42")
    assert t.staged() == ["batch-42"]
    # production readers untouched; audit sees the candidate state
    assert _rows(t.read(spark)) == _rows(_mkdf(spark, 6))
    assert _rows(t.read_staged(spark, "batch-42")) == _rows(
        _mkdf(spark, 6).union(_mkdf(spark, 4, offset=100))
    )
    v = t.publish_staged("batch-42")
    assert v == 2 and t.staged() == []
    assert _rows(t.read(spark)) == _rows(
        _mkdf(spark, 6).union(_mkdf(spark, 4, offset=100))
    )
    with pytest.raises(KeyError, match="no staged"):
        t.read_staged(spark, "batch-42")
    # duplicate name while staged is refused
    t.stage(_mkdf(spark, 2, offset=500), "x")
    with pytest.raises(ValueError, match="already exists"):
        t.stage(_mkdf(spark, 2, offset=600), "x")
    t.drop_staged("x")


def test_wap_publish_rebases_append_over_moved_head(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_mkdf(spark, 6))
    t.stage(_mkdf(spark, 4, offset=100), "slow-audit")
    t.commit(_mkdf(spark, 3, offset=200))  # head moves during the audit
    v = t.publish_staged("slow-audit")
    assert v == 3
    assert _rows(t.read(spark)) == _rows(
        _mkdf(spark, 6)
        .union(_mkdf(spark, 4, offset=100))
        .union(_mkdf(spark, 3, offset=200))
    )


def test_wap_overwrite_stale_and_schema_drift_refused(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_mkdf(spark, 6))
    t.stage(_mkdf(spark, 4, offset=100), "ow", mode="overwrite")
    t.commit(_mkdf(spark, 3, offset=200))
    with pytest.raises(ConcurrentCommitError, match="overwrite"):
        t.publish_staged("ow")
    t.drop_staged("ow")
    # append staged, schema evolves under it -> stale
    t.stage(_mkdf(spark, 4, offset=300), "ap")
    t.commit(
        _mkdf(spark, 2, offset=400).withColumn("extra", F.lit(1))
    )  # widening append
    with pytest.raises(ConcurrentCommitError, match="schema evolved"):
        t.publish_staged("ap")
    t.drop_staged("ap")


def test_vacuum_pins_staged_files_reclaims_dropped(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(3):
        t.commit(_mkdf(spark, 4, offset=10 * i).coalesce(1))
    sm = t.stage(_mkdf(spark, 4, offset=900).coalesce(1), "inflight")
    res = vacuum(t, retain_last=1)
    for f in sm["add_files"]:  # audit evidence survives the vacuum
        assert os.path.exists(os.path.join(t.root, f))
    assert _rows(t.read_staged(spark, "inflight")) == _rows(
        t.read(spark).union(_mkdf(spark, 4, offset=900))
    )
    t.drop_staged("inflight")
    res = vacuum(t, retain_last=1)
    assert res["removed_files"] >= 1  # the abandoned staged files
    for f in sm["add_files"]:
        assert not os.path.exists(os.path.join(t.root, f))


def test_wap_on_stats_and_partitioned_table(spark, tmp_path):
    """Staged commits carry complete stats and partition tuples, so the
    published manifest prunes exactly like a direct commit's."""
    t = StatsSnapshotTable(
        str(tmp_path / "t"), ["k"], partition_by=["v"]
    )
    t.commit(_mkdf(spark, 9))
    t.stage(_mkdf(spark, 9, offset=100), "s")
    v = t.publish_staged("s")
    m = t.manifest(v)
    assert set(m["stats"]) == set(m["files"])  # every file has stats
    assert set(m["file_partitions"]) == set(m["files"])
    got = t.read_partition(spark, {"v": "u1"})
    planned, total = t.last_partition_counts
    assert planned < total
    both = _mkdf(spark, 9).union(_mkdf(spark, 9, offset=100))
    assert _rows(got) == _rows(both.filter(F.col("v") == "u1"))
