"""Bloom SIDECAR build + probe (sources/snapshot.py, VERDICT r8 item
1): per-file per-column bloom filters written at commit time and
consulted by the DML candidate-file discovery — the key-scoped
complement to partition/stats pruning for CDC targets not clustered by
their merge key. Covers the probe wiring (apply_changes / merge_rows /
delete_where bloom_probe), the conservative-keep contract (a missing
sidecar — also exactly the state a crash between data write and
sidecar write leaves — costs pruning, never correctness), the ~1%
false-positive rate the sizing docstring promises, the cross-engine
timestamp canonicalization (ADVICE r8: Arrow-collected probe values
must match the build side's pyarrow read under a non-UTC session
zone), vacuum's sidecar reclamation, and the by-value pickling of the
executor-side builder (the repo's foreign-cwd trap)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    _bloom_canon,
    _bloom_may_contain_any,
    _bloom_positions,
    _build_bloom_sidecar,
    _bloom_sidecar_path,
    _load_bloom_sidecar,
    vacuum,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def _ranged_table(spark, root, n_ranges=3, width=100):
    """One commit (= one file) per disjoint key range."""
    tbl = SnapshotTable(root, bloom_cols=["k"])
    for i in range(n_ranges):
        tbl.commit(
            _df(
                spark,
                [(j, f"v{j}") for j in range(i * width, (i + 1) * width)],
            ).coalesce(1)
        )
    return tbl


def _sidecars(root):
    return sorted(
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(root)
        for n in ns
        if n.endswith(".bloom")
    )


# ------------------------------------------------------------ build side


def test_bloom_bits_validation():
    for bad in (0, -8, 1001):
        with pytest.raises(ValueError, match="multiple of 8"):
            SnapshotTable("/tmp/never-created", bloom_cols=["k"],
                          bloom_bits=bad)


def test_sidecar_written_per_file_including_executor_path(spark, tmp_path):
    # > 4 files per commit takes the mapInPandas (executor) build path;
    # every data file must get a decodable sidecar carrying the column
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
    tbl.commit(
        _df(spark, [(i, f"v{i}") for i in range(600)]).repartition(6)
    )
    m = tbl.manifest()
    assert len(m["files"]) >= 6
    for f in m["files"]:
        sc = _load_bloom_sidecar(tbl.root, f)
        assert sc is not None and "k" in sc["blooms"], f
        assert sc["bits"] == 65536 and sc["k"] == 6


def test_bloom_builder_pickles_by_value():
    # ADVICE r8: the builder ships inside a mapInPandas closure; a
    # module-level qualname would make cloudpickle serialize it BY
    # REFERENCE and break on executors that can't import the package
    # (foreign-cwd trap). Factory-made (<locals>) functions go by value.
    for fn in (_build_bloom_sidecar, _bloom_canon, _bloom_positions):
        assert "<locals>" in fn.__qualname__, fn.__qualname__


# ------------------------------------------------------------ probe side


def test_apply_changes_bloom_prunes_candidates(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    batch = spark.createDataFrame(
        [(5, "UP5", "upsert"), (7, None, "delete")],
        "k long, v string, _op string",
    )
    res = tbl.apply_changes(spark, batch, ["k"])
    kept, before = tbl.last_bloom_pruned
    assert before == 3 and kept == 1, tbl.last_bloom_pruned
    assert tbl.last_apply_candidates == (1, 3)
    assert res["rewritten_files"] == 1 and res["deleted_rows"] == 1
    got = dict(_rows(tbl.read(spark)))
    assert got[5] == "UP5" and 7 not in got and len(got) == 299


def test_merge_rows_bloom_prunes_candidates(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    src = _df(spark, [(105, "M105"), (999, "NEW")])
    res = tbl.merge_rows(spark, src, ["k"])
    kept, before = tbl.last_bloom_pruned
    assert before == 3 and kept == 1, tbl.last_bloom_pruned
    assert res["rewritten_files"] == 1
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 1
    got = dict(_rows(tbl.read(spark)))
    assert got[105] == "M105" and got[999] == "NEW" and len(got) == 301


def test_merge_every_file_rejected_insert_only(spark, tmp_path):
    # all candidates bloom-rejected -> empty target scan branch; the
    # merge degenerates to a pure append
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    res = tbl.merge_rows(spark, _df(spark, [(9999, "NEW")]), ["k"])
    assert tbl.last_bloom_pruned == (0, 3)
    assert res["matched_rows"] == 0 and res["inserted_rows"] == 1
    assert res["rewritten_files"] == 0 and res["kept_files"] == 3
    assert dict(_rows(tbl.read(spark)))[9999] == "NEW"


def test_missing_sidecar_is_conservatively_kept(spark, tmp_path):
    # Also the crash story: dying between data write and sidecar write
    # leaves exactly this state — same answer, more files scanned.
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    for f in tbl.manifest()["files"]:
        os.unlink(_bloom_sidecar_path(tbl.root, f))
    batch = spark.createDataFrame(
        [(5, "UP5", "upsert")], "k long, v string, _op string"
    )
    res = tbl.apply_changes(spark, batch, ["k"])
    assert tbl.last_bloom_pruned == (3, 3)  # nothing prunable
    assert res["rewritten_files"] == 1  # discovery scan still exact
    assert dict(_rows(tbl.read(spark)))[5] == "UP5"


def test_delete_where_bloom_probe(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    res = tbl.delete_where(
        spark, F.col("k").isin(210, 220), bloom_probe={"k": [210, 220]}
    )
    assert tbl.last_bloom_pruned == (1, 3)
    assert res["rewritten_files"] == 1 and res["deleted_rows"] == 2
    assert res["kept_files"] == 2
    got = dict(_rows(tbl.read(spark)))
    assert 210 not in got and 220 not in got and len(got) == 298


def test_update_where_bloom_probe(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    res = tbl.update_where(
        spark, "k = 110", {"v": F.lit("X")}, bloom_probe={"k": [110]}
    )
    assert tbl.last_bloom_pruned == (1, 3)
    assert res["updated_rows"] == 1 and res["rewritten_files"] == 1
    assert dict(_rows(tbl.read(spark)))[110] == "X"


def test_bloom_probe_rejects_typos_and_empty(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not in this table's bloom_cols"):
        tbl.delete_where(spark, "k = 1", bloom_probe={"nope": [1]})
    with pytest.raises(ValueError, match="empty"):
        tbl.delete_where(spark, "k = 1", bloom_probe={"k": []})
    # a null probe value declines pruning on that column, never prunes
    res = tbl.delete_where(spark, "k = 1", bloom_probe={"k": [1, None]})
    assert tbl.last_bloom_pruned is None
    assert res["deleted_rows"] == 1


def test_timestamp_keys_survive_non_utc_session_zone(spark, tmp_path):
    # ADVICE r8 (canonicalization skew): the build side canonicalizes
    # pyarrow-read parquet timestamps to UTC wall-clock; the probe
    # collects the batch VIA ARROW so equal instants canonicalize
    # identically even when the session zone is not UTC. A skew here
    # would FALSE-REJECT the file holding the key (kept == 0) and the
    # upsert would duplicate instead of update.
    base = dt.datetime(2024, 3, 10, 12, 0, tzinfo=dt.timezone.utc)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()),
         T.StructField("v", T.StringType())]
    )
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["ts"])
    for part in range(3):
        rows = [
            (base + dt.timedelta(hours=part * 100 + i), f"v{part}-{i}")
            for i in range(50)
        ]
        tbl.commit(spark.createDataFrame(rows, schema).coalesce(1))
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        batch = spark.createDataFrame(
            [(base + dt.timedelta(hours=3), "UPDATED", "upsert")],
            T.StructType(schema.fields + [T.StructField("_op", T.StringType())]),
        )
        res = tbl.apply_changes(spark, batch, ["ts"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert tbl.last_bloom_pruned == (1, 3), tbl.last_bloom_pruned
    assert res["rewritten_files"] == 1
    got = {r["v"] for r in tbl.read(spark).collect()}
    assert "UPDATED" in got and "v0-3" not in got
    assert tbl.read(spark).count() == 150  # updated, not duplicated


def test_false_positive_rate_matches_sizing_docstring(spark, tmp_path):
    # 64 Ki bits / 6 k keys / k=6 -> ~1% fp promised at
    # sources/snapshot.py (_BLOOM_K); assert empirically < 3%.
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
    tbl.commit(
        spark.range(6000)
        .selectExpr("concat('key-', id) AS k", "CAST(id AS string) AS v")
        .coalesce(1)
    )
    [f] = tbl.manifest()["files"]
    sc = _load_bloom_sidecar(tbl.root, f)
    absent = [f"absent-{i}" for i in range(10_000)]
    fp = sum(
        _bloom_may_contain_any(sc, "k", [_bloom_canon(a)]) for a in absent
    )
    assert fp / len(absent) < 0.03, fp
    # sanity: every present key must hit (blooms have no false negatives)
    assert all(
        _bloom_may_contain_any(sc, "k", [_bloom_canon(f"key-{i}")])
        for i in range(0, 6000, 97)
    )


def test_read_keys_point_lookup(spark, tmp_path):
    """read_keys — the probe side's READ path (the __init__-promised
    API): plan only the files whose blooms may hold the keys, then
    filter exactly. Equality/IN, conjunctive across columns; absent
    keys plan to zero files."""
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    out = tbl.read_keys(spark, {"k": [5, 210]})
    assert _rows(out) == [(5, "v5"), (210, "v210")]
    assert tbl.last_keys_counts == (2, 3)
    # scalar form + miss: every file bloom-rejected, still exact
    assert tbl.read_keys(spark, {"k": 9999}).count() == 0
    assert tbl.last_keys_counts == (0, 3)
    # conjunctive second column (not bloomed -> filter-only)
    assert tbl.read_keys(spark, {"k": [5], "v": ["nope"]}).count() == 0
    assert tbl.read_keys(spark, {"k": [5], "v": ["v5"]}).count() == 1
    with pytest.raises(KeyError):
        tbl.read_keys(spark, {"zz": [1]})
    # result is identical to read().filter(...) by construction
    want = _rows(tbl.read(spark).filter(F.col("k").isin(5, 210)))
    assert _rows(tbl.read_keys(spark, {"k": [5, 210]})) == want


def test_read_keys_layers_stats_and_blooms(spark, tmp_path):
    """read_keys composes manifest min/max stats pruning (layer 2)
    with bloom pruning (layer 3) on a StatsSnapshotTable."""
    from kafka_database_import_spark.sources.snapshot import (
        StatsSnapshotTable,
    )

    tbl = StatsSnapshotTable(
        str(tmp_path / "t"), stats_cols=["k"], bloom_cols=["k"]
    )
    for i in range(3):
        tbl.commit(
            _df(
                spark, [(j, f"v{j}") for j in range(i * 100, i * 100 + 100)]
            ).coalesce(1)
        )
    # value outside every [min,max]: stats alone plan zero files,
    # before blooms are even consulted
    assert tbl.read_keys(spark, {"k": 100000}).count() == 0
    assert tbl.last_keys_counts == (0, 3)
    out = tbl.read_keys(spark, {"k": [105]})
    assert _rows(out) == [(105, "v105")]
    assert tbl.last_keys_counts == (1, 3)


def test_streaming_merge_sink_prunes_via_blooms(spark, tmp_path):
    """Integration: a CDC changelog STREAM (SnapshotMergeSink →
    apply_changes) into a bloom_cols table engages sidecar pruning
    mid-stream — batch 3 updates a key from batch 2's range only, so
    batch 1's file must be bloom-rejected from the candidate scan —
    and converges to the same state a plain table reaches."""
    import glob
    import shutil
    import tempfile

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotMergeSink,
        SnapshotTable,
    )

    schema = "k long, v string, seq long, _op string"
    batches = [
        [(1, "a", 1, "upsert"), (2, "b", 2, "upsert"), (3, "c", 3, "upsert")],
        [(11, "x", 4, "upsert"), (12, "y", 5, "upsert")],
        [(12, "y2", 6, "upsert"), (13, None, 7, "delete")],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        scratch = tempfile.mkdtemp(prefix="kdis_blcdc_")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(glob.glob(os.path.join(scratch, "part-*.parquet"))[0], dst)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(dst, (1_000 * (i + 1),) * 2)

    results = {}
    for label, tbl in (
        ("bloom", SnapshotTable(str(tmp_path / "tb"), bloom_cols=["k"])),
        ("plain", SnapshotTable(str(tmp_path / "tp"))),
    ):
        sink = SnapshotMergeSink(tbl, ["k"], seq_col="seq")
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{label}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results[label] = sorted(
            tuple(r) for r in tbl.read(spark).collect()
        )
        if label == "bloom":
            # last micro-batch probed keys {12, 13}: batch-1's file
            # (keys 1-3) must have been rejected from the candidates
            kept, before = tbl.last_bloom_pruned
            assert kept < before, tbl.last_bloom_pruned
    assert results["bloom"] == results["plain"]
    assert (12, "y2", 6) in results["bloom"]
    assert not any(r[0] == 13 for r in results["bloom"])


# ------------------------------------------------------------ lifecycle


def test_vacuum_reclaims_sidecars_and_bloomtmp(spark, tmp_path):
    tbl = _ranged_table(spark, str(tmp_path / "t"))
    n_live = len(tbl.manifest()["files"])
    # plant a crash leftover next to a live file
    live_dir = os.path.dirname(
        os.path.join(tbl.root, tbl.manifest()["files"][0])
    )
    with open(os.path.join(live_dir, "deadbeef.bloomtmp"), "w") as f:
        f.write("{}")
    tbl.commit(_df(spark, [(9999, "z")]), mode="overwrite")
    res = vacuum(tbl, retain_last=1)
    # ADVICE r8: reclaiming a data file must reclaim its sidecar (and
    # sweep crash leftovers) or bloom tables leak disk under churn
    assert res["removed_files"] == n_live
    assert res["removed_sidecars"] == n_live + 1
    leftovers = [
        n
        for dp, _d, ns in os.walk(tbl.root)
        for n in ns
        if n.endswith((".bloom", ".bloomtmp"))
    ]
    # only the overwrite's own (live) sidecars survive
    assert len(leftovers) == len(tbl.manifest()["files"])
    assert all(n.endswith(".parquet.bloom") for n in leftovers)
    assert _rows(tbl.read(spark)) == [(9999, "z")]


# ------------------------------------------- sm64 vectorized int path


def test_int_sidecar_uses_sm64_and_prunes_exactly(spark, tmp_path):
    """Round 14: integer bloom columns build through the vectorized
    splitmix64 path — the sidecar marks the column "sm64", present
    keys always probe True (no false negatives), disjoint-range keys
    prune, and negative keys round-trip (two's-complement uint64 on
    both sides)."""
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
    rows = [(j, f"v{j}") for j in range(100)] + [(-5, "neg"), (-6, "neg6")]
    tbl.commit(_df(spark, rows).coalesce(1))
    f = tbl.manifest()["files"][0]
    sc = _load_bloom_sidecar(tbl.root, f)
    assert sc["hashes"] == {"k": "sm64"}
    # zero false negatives over every stored key, including negatives
    for k, _v in rows:
        assert _bloom_may_contain_any(sc, "k", [_bloom_canon(k)])
    # a distant disjoint range is (overwhelmingly) rejected: with
    # 512Ki bits / ~100 keys the fp rate is ~0, but assert the
    # aggregate so a single unlucky collision can't flake the test
    misses = sum(
        _bloom_may_contain_any(sc, "k", [_bloom_canon(k)])
        for k in range(1_000_000, 1_000_200)
    )
    assert misses < 5
    # end-to-end: the DML discovery prunes through the sm64 sidecar
    tbl.commit(
        _df(spark, [(j, f"w{j}") for j in range(5000, 5100)]).coalesce(1)
    )
    batch = spark.createDataFrame(
        [(5050, "UP", "upsert")], "k long, v string, _op string"
    )
    res = tbl.apply_changes(spark, batch, ["k"])
    assert tbl.last_bloom_pruned == (1, 2)
    assert res["rewritten_files"] == 1
    assert dict(_rows(tbl.read(spark)))[5050] == "UP"


def test_string_sidecar_uses_fnv1a64_and_prunes_exactly(spark, tmp_path):
    """Round 15: string bloom columns build through the vectorized
    FNV-1a-64-over-Arrow-buffer path — the sidecar marks the column
    "fnv1a64", present keys always probe True (no false negatives,
    including empty and non-ASCII strings), disjoint keys prune, and
    the DML discovery prunes end-to-end through the new kind."""
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["v"])
    rows = [(j, f"v{j}") for j in range(100)] + [
        (100, ""),
        (101, "é-ünïcode-ключ"),
    ]
    tbl.commit(_df(spark, rows).coalesce(1))
    f = tbl.manifest()["files"][0]
    sc = _load_bloom_sidecar(tbl.root, f)
    assert sc["hashes"] == {"v": "fnv1a64"}
    # zero false negatives over every stored key, incl. "" and unicode
    for _k, v in rows:
        assert _bloom_may_contain_any(sc, "v", [_bloom_canon(v)])
    misses = sum(
        _bloom_may_contain_any(sc, "v", [_bloom_canon(f"absent{k}")])
        for k in range(200)
    )
    assert misses < 5
    # end-to-end: the DML discovery prunes through the fnv1a64 sidecar
    tbl.commit(
        _df(spark, [(j, f"w{j}") for j in range(5000, 5100)]).coalesce(1)
    )
    batch = spark.createDataFrame(
        [(9, "w5050", "upsert")], "k long, v string, _op string"
    )
    res = tbl.apply_changes(spark, batch, ["v"])
    assert tbl.last_bloom_pruned == (1, 2)
    assert res["rewritten_files"] == 1


def test_long_string_keys_keep_sha1(spark, tmp_path):
    """A string column whose longest value exceeds the 256-byte
    vectorization guard keeps the per-row sha1 format (no ``hashes``
    marker for it) and probes exactly."""
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["v"])
    long_key = "L" * 300
    tbl.commit(
        _df(spark, [(1, "short"), (2, long_key)]).coalesce(1)
    )
    f = tbl.manifest()["files"][0]
    sc = _load_bloom_sidecar(tbl.root, f)
    assert "v" not in sc["hashes"]  # sha1 fallback, no marker
    assert _bloom_may_contain_any(sc, "v", [_bloom_canon(long_key)])
    assert _bloom_may_contain_any(sc, "v", [_bloom_canon("short")])
    assert not _bloom_may_contain_any(sc, "v", [_bloom_canon("absent")])


def test_sha1_sidecars_still_probe_and_unknown_kinds_keep(spark, tmp_path):
    """Backward + forward compatibility: a pre-round-14 sidecar (no
    ``hashes`` key, bits built via sha1) probes via sha1 exactly as
    written; an unknown future hash kind is conservatively kept."""
    import base64 as _b64
    import json as _json
    import zlib as _zlib

    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k", "v"])
    tbl.commit(_df(spark, [(j, f"v{j}") for j in range(50)]).coalesce(1))
    f = tbl.manifest()["files"][0]
    p = _bloom_sidecar_path(tbl.root, f)
    raw = _json.load(open(p))
    assert raw["hashes"] == {"k": "sm64", "v": "fnv1a64"}
    sc = _load_bloom_sidecar(tbl.root, f)
    assert _bloom_may_contain_any(sc, "v", [_bloom_canon("v7")])
    assert not _bloom_may_contain_any(sc, "v", [_bloom_canon("absent")])
    # simulate a GENUINE v1 (pre-round-14) sidecar: rebuild both
    # columns' bits through the sha1 positions math, drop the marker
    bits = raw["bits"]
    v1_blooms = {}
    for col, vals in (
        ("k", [_bloom_canon(j) for j in range(50)]),
        ("v", [_bloom_canon(f"v{j}") for j in range(50)]),
    ):
        arr = bytearray(bits // 8)
        for canon_s in vals:
            for h in _bloom_positions(canon_s, bits):
                arr[h >> 3] |= 1 << (h & 7)
        v1_blooms[col] = _b64.b64encode(
            _zlib.compress(bytes(arr))
        ).decode("ascii")
    _json.dump(
        {"bits": bits, "k": raw["k"], "codec": "zlib", "blooms": v1_blooms},
        open(p, "w"),
    )
    sc1 = _load_bloom_sidecar(tbl.root, f)
    assert sc1["hashes"] == {}
    for col, present, absent in (
        ("k", _bloom_canon(7), _bloom_canon(999_999)),
        ("v", _bloom_canon("v7"), _bloom_canon("absent")),
    ):
        assert _bloom_may_contain_any(sc1, col, [present])
        assert not _bloom_may_contain_any(sc1, col, [absent])
    # unknown future kind: conservatively kept
    raw_future = dict(raw)
    raw_future["hashes"] = {"k": "xxh128", "v": "xxh128"}
    _json.dump(raw_future, open(p, "w"))
    sc2 = _load_bloom_sidecar(tbl.root, f)
    assert _bloom_may_contain_any(sc2, "k", [_bloom_canon(999_999)])
    assert _bloom_may_contain_any(sc2, "v", [_bloom_canon("absent")])
