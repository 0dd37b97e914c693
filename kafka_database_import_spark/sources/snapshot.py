"""Versioned snapshot tables over parquet — manifest commits, snapshot
isolation, time travel, compaction.

The reference imports into a mutable database table
(kafka-database-import.go:171-218); the 100 TB analog of that sink is a
table FORMAT: immutable parquet data files plus a tiny manifest per
version that lists exactly the files constituting that snapshot. This
module is that pattern (the public Iceberg/Delta core) reduced to its
load-bearing minimum:

* **Atomic commits** — a version exists iff ``_manifests/v{N}.json``
  exists, and publication is an atomic ``os.link`` (fails if the name
  is taken). Readers never see a half-written version; a crashed
  writer leaves only unreferenced data files (garbage, not
  corruption).
* **Optimistic concurrency** — two writers racing to version N+1: one
  wins the link, the loser gets :class:`ConcurrentCommitError` and
  must re-read the new head and retry (the Iceberg commit protocol).
* **Snapshot isolation / time travel** — ``read(version=...)`` plans
  from one manifest: a reader holds a consistent file list for as long
  as it likes while writers commit ahead; yesterday's version stays
  queryable for audits and reproducible training runs.
* **O(manifest) planning** — the file list comes from one small JSON,
  never from recursive directory listing, which is what breaks object
  stores at millions of files.
* **Compaction** (:meth:`SnapshotTable.compact`) rewrites the current
  file set into fewer, larger files and commits the SAME logical state
  as a new version — readers of old versions are untouched because
  data files are immutable.

Append-only + overwrite commits cover the batch-sink surface; row-level
upserts at scale layer the CDC mirror (operators/cdc.py) or the q99za
keyed SQL sink on top.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first — re-read the head
    and retry (optimistic concurrency, Iceberg-style)."""


class SnapshotTable:
    """A versioned parquet table rooted at ``root``.

    Layout::

        <root>/data/c{N}/part-*.parquet   immutable files of commit N
        <root>/_manifests/v{N}.json       {version, mode, schema, files}
    """

    def __init__(self, root: str):
        self.root = root
        self._mdir = os.path.join(root, "_manifests")
        os.makedirs(self._mdir, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version}.json")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._mdir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # ----------------------------------------------------------- commits
    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write ``df``'s rows as immutable files and publish the next
        version atomically. ``mode='append'`` keeps the previous file
        list; ``'overwrite'`` replaces it. Returns the new version.

        Raises :class:`ConcurrentCommitError` if another writer
        published the same version between our head read and our link —
        data files written by the loser are unreferenced and harmless.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        head = self.latest_version()
        version = (head or 0) + 1 if head is not None else 1
        files = self._write_data(df, version)
        prev = self.manifest(head)["files"] if (head and mode == "append") else []
        manifest = {
            "version": version,
            "base": head,
            "mode": mode,
            "schema": df.schema.json(),
            "files": prev + files,
        }
        self._publish(version, manifest)
        return version

    def _write_data(self, df: DataFrame, version: int) -> list[str]:
        """Write immutable data files; returns root-relative paths.
        Uniquely-named dir per attempt so a losing concurrent writer
        never collides with the winner's files."""
        rel_dir = None
        while rel_dir is None or os.path.exists(os.path.join(self.root, rel_dir)):
            suffix = os.path.basename(tempfile.mktemp(prefix=""))
            rel_dir = os.path.join("data", f"c{version}-{suffix}")
        out_dir = os.path.join(self.root, rel_dir)
        df.write.parquet(out_dir)
        return sorted(
            os.path.join(rel_dir, name)
            for name in os.listdir(out_dir)
            if name.endswith(".parquet")
        )

    def _publish(self, version: int, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self._mdir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
            try:
                # atomic claim: link fails iff the version already exists
                os.link(tmp, self._manifest_path(version))
            except FileExistsError as e:
                raise ConcurrentCommitError(
                    f"version {version} was committed concurrently; "
                    f"re-read the head and retry"
                ) from e
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------- reads
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Plan a scan of exactly one snapshot's file list. The manifest
        is the unit of isolation: this DataFrame keeps returning the
        same rows no matter how many commits land after it was built."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, f) for f in m["files"]]
        return spark.read.schema(schema).parquet(*paths)

    # -------------------------------------------------------- maintenance
    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the CURRENT snapshot into ``target_files`` files and
        commit the same logical state as a new overwrite version. Old
        versions keep reading their original immutable files."""
        current = self.read(spark).coalesce(target_files)
        return self.commit(current, mode="overwrite")
