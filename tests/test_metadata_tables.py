"""Metadata tables + COUNT(*) pushdown (round 9): per-file ``_nrows``/
``_bytes`` footer facts recorded in the manifest by StatsSnapshotTable
commits, surfaced as ``row_count()`` (metadata-only COUNT(*)),
``files_df`` (the files metadata table), and ``history_df`` (the
snapshots table). The load-bearing property is HONESTY: row_count
answers only when manifest arithmetic is exact — DVs or pre-upgrade
files make it return None, never a guess."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    StatsSnapshotTable,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_row_count_tracks_dml(spark, tmp_path):
    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    tbl.commit(_df(spark, [(i, f"v{i}") for i in range(100)]))
    tbl.commit(_df(spark, [(i, f"v{i}") for i in range(100, 150)]))
    assert tbl.row_count() == 150
    tbl.merge_rows(spark, _df(spark, [(5, "U"), (999, "NEW")]), ["k"])
    assert tbl.row_count() == 151 == tbl.read(spark).count()
    tbl.delete_where(spark, F.col("k") % 10 == 0)
    assert tbl.row_count() == tbl.read(spark).count()
    # time travel answers from the pinned manifest
    assert tbl.row_count(version=1) == 100


def test_row_count_declines_rather_than_guesses(spark, tmp_path):
    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    tbl.commit(_df(spark, [(i, f"v{i}") for i in range(40)]))
    # MOR delete hides rows behind a DV -> metadata can't be exact
    tbl.delete_where(spark, "k < 5", mode="mor")
    assert tbl.row_count() is None
    assert tbl.read(spark).count() == 35  # the scan fallback is exact
    # a pre-upgrade file (no _nrows recorded) also declines
    t2 = StatsSnapshotTable(str(tmp_path / "t2"), stats_cols=["k"])
    t2.commit(_df(spark, [(1, "a"), (2, "b")]))
    mp = t2._manifest_path(1)
    m = json.load(open(mp))
    for st in m["stats"].values():
        st.pop("_nrows", None)
    json.dump(m, open(mp, "w"))
    t2._man_cache.clear()
    assert t2.row_count() is None


def test_files_df_is_manifest_only(spark, tmp_path):
    tbl = StatsSnapshotTable(
        str(tmp_path / "t"), stats_cols=["k"], partition_by=["v"]
    )
    rows = [(i, "a" if i % 2 else "b") for i in range(60)]
    tbl.commit(_df(spark, rows))
    fdf = tbl.files_df(spark)
    m = tbl.manifest()
    assert fdf.count() == len(m["files"])
    assert not fdf.inputFiles()  # no table file is ever opened
    got = fdf.collect()
    assert sum(r["n_rows"] for r in got) == 60
    assert all(r["size_bytes"] > 0 for r in got)
    # recorded partition tuples ride along as JSON
    parts = {json.loads(r["partition"])["v"] for r in got}
    assert parts == {"a", "b"}
    # physical sizes agree with the recorded footer fact
    for r in got:
        assert os.path.getsize(os.path.join(tbl.root, r["file"])) == (
            r["size_bytes"]
        )


def test_files_df_on_plain_table_has_null_facts(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))
    rows = tbl.files_df(spark).collect()
    assert rows and all(
        r["n_rows"] is None and r["size_bytes"] is None for r in rows
    )


def test_history_df_mirrors_history(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    tbl.commit(_df(spark, [(2, "b")]))
    tbl.delete_where(spark, "k = 1")
    hdf = tbl.history_df(spark).orderBy("version").collect()
    assert [r["version"] for r in hdf] == tbl.versions()
    assert [r["mode"] for r in hdf] == ["append", "append", "delete"]
    assert all(r["committed_at_ms"] is not None for r in hdf)


def test_optimize_small_files_census_uses_manifest(spark, tmp_path):
    """The small-file census prefers the manifest's _nrows (O(manifest))
    and still bin-packs correctly."""
    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    for i in range(4):  # four 2-row files: all "small"
        tbl.commit(_df(spark, [(2 * i, "x"), (2 * i + 1, "y")]).coalesce(1))
    before = tbl.read(spark).count()
    res = tbl.optimize_small_files(spark, small_file_rows=10)
    assert res["compacted_files"] == 4
    assert tbl.read(spark).count() == before
    assert tbl.row_count() == before  # stats refreshed by the rewrite
