"""Streaming CHANGES source over the snapshot table format — the
table's append lineage exposed as a Spark micro-batch stream (the
Delta "table as a stream source" pattern, built on the Spark 4 Python
DataSource API like ``sources/pyds.py``).

Offsets ARE table versions: ``initialOffset`` starts before the first
commit (or at ``startVersion``), each micro-batch advances to the
current head (capped by ``maxVersionsPerBatch``) and returns exactly
the rows of the files ADDED by the versions in between — O(delta) per
batch, planned from manifests, never a table rescan. Replay
(``readBetweenOffsets`` / re-planned ``partitions``) is exact because
data files are immutable and the manifest diff is deterministic: a
version range always denotes the same added-file set, which always
holds the same rows. Restart recovery therefore composes with any
downstream exactly-once sink.

Non-append commits (overwrite / delete / merge / update) RESET lineage
— same contract as :func:`snapshot.changes` — and the reader raises
rather than silently double-count; a consumer of a mutating table
should read ``row_changes`` ranges batch-side instead.

Two readers share the offset/manifest logic:

* the default ``DataSourceStreamReader`` plans one ``InputPartition``
  per added file, so the parquet reads run ON EXECUTORS (Arrow
  RecordBatches end-to-end, one task per file) — the scale path for
  bulk-append tables;
* ``option("reader", "simple")`` selects the
  ``SimpleDataSourceStreamReader`` variant, which reads driver-side
  (fine for CDC deltas, which are small by nature) and carries the
  prefetch/cache machinery Spark wraps around Simple readers.

Schema contract (both readers): the stream schema is FROZEN at query
start from the table's current manifest. Every file's batch is
projected to that schema BY FIELD NAME — a file written before a
column was added null-fills the missing field, and a file committed
mid-stream with a newer, wider schema has the extra columns dropped
until the consumer restarts (then ``schema()`` re-reads the head
manifest). Positional zip would mis-align or crash on either case.

All classes come from a factory so cloudpickle embeds them BY VALUE
(the driver harness runs from cwds where this package isn't
importable — see pyds.py's note)."""

from __future__ import annotations


def _make():
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    def _versions(mdir: str) -> list[int]:
        if not os.path.isdir(mdir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def _manifest(mdir: str, v: int) -> dict:
        try:
            with open(os.path.join(mdir, f"v{v}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            # The loud-failure half of the vacuum contract (snapshot.vacuum):
            # a lagging reader whose offset range was vacuumed away must
            # error actionably, never silently drop or double-read rows.
            raise ValueError(
                f"snapshot_changes: version {v} was vacuumed from the "
                f"table's manifest log — this reader's offset lags the "
                f"retention window. Restart the consumer from a full "
                f"snapshot, or vacuum with min_retained_version <= the "
                f"slowest consumer's checkpointed version"
            ) from None

    def _full_files(mdir: str, v: int) -> list[str]:
        """The version's complete file list, walking delta-encoded
        manifests (snapshot._publish stores a commit as add/remove
        against its previous version when that is materially smaller
        than the full form) back to the nearest full checkpoint."""
        chain: list[dict] = []
        cur = v
        while True:
            m = _manifest(mdir, cur)
            if "delta_of" not in m:
                files = list(m.get("files", []))
                break
            chain.append(m)
            cur = m["delta_of"]
        for d in reversed(chain):
            rem = set(d.get("files_remove", []))
            files = [f for f in files if f not in rem]
            files += d.get("files_add", [])
        return files

    def _added_files(root: str, start_v: int, end_v: int) -> list[str]:
        """Relative paths of the files added in (start_v, end_v] —
        per-version manifest diffs (small JSON, driver-side O(delta)),
        with the append-lineage guard walked over every version in the
        range. REWRITE-ONLY versions (compaction / optimize — same
        rows, new layout) add nothing and are passed through, so table
        maintenance never breaks a downstream stream consumer; the
        pre-rewrite files an in-range append points at stay readable
        until vacuum reclaims them (and a vacuumed gap fails loudly,
        per the retention contract). A DELTA-form manifest whose parent
        IS the lineage base carries the answer verbatim (`files_add`);
        full-form manifests diff against the parent's reconstructed
        file list as before."""
        mdir = os.path.join(root, "_manifests")
        added: list[str] = []
        v = end_v
        while v is not None and v > start_v:
            m = _manifest(mdir, v)
            if m.get("rewrite_only"):
                v = m["base"]
                continue
            if m["mode"] != "append":
                raise ValueError(
                    f"version {v} is {m['mode']!r}: the changes stream "
                    f"tails APPEND lineage only — restart the consumer "
                    f"from a full snapshot after a mutation/overwrite"
                )
            base_v = m["base"]
            if (
                m.get("delta_of") == base_v
                and base_v is not None
                and not m.get("files_remove")
            ):
                added[:0] = m.get("files_add", [])
            else:
                parent = (
                    set(_full_files(mdir, base_v)) if base_v else set()
                )
                files = (
                    _full_files(mdir, v) if "delta_of" in m else m["files"]
                )
                added[:0] = [f for f in files if f not in parent]
            v = base_v
        return added

    def _projected_batches(path: str, schema_json: str):
        """The file's RecordBatches projected to the frozen stream
        schema BY NAME: missing fields null-fill, extra fields drop,
        present fields cast to the declared arrow type. Runs wherever
        the read runs (executor for the partitioned reader, driver for
        the Simple one)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import to_arrow_schema

        struct = T.StructType.fromJson(json.loads(schema_json))
        target = to_arrow_schema(struct)
        table = pq.read_table(path)
        present = set(table.schema.names)
        for batch in table.to_batches():
            n = batch.num_rows
            arrays = []
            for field in target:
                if field.name in present:
                    col = batch.column(batch.schema.get_field_index(field.name))
                    if col.type != field.type:
                        col = col.cast(field.type)
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(n, field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def _added_rows(root: str, start_v: int, end_v: int, schema_json: str):
        """Row tuples of the files added in (start_v, end_v] in stream-
        schema column order (the Simple reader's wire format)."""
        for f in _added_files(root, start_v, end_v):
            for batch in _projected_batches(os.path.join(root, f), schema_json):
                yield from zip(*(c.to_pylist() for c in batch.columns))

    def _head_schema_json(root: str) -> str:
        mdir = os.path.join(root, "_manifests")
        vs = _versions(mdir)
        if not vs:
            raise ValueError("kdis_snapshot_changes: table has no commits yet")
        return _manifest(mdir, vs[-1])["schema"]

    class _Opts:
        """Shared option parsing for both reader variants."""

        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("kdis_snapshot_changes: 'path' required")
            self.start_version = int(options.get("startVersion", "0"))
            # Admission control: a consumer starting on an old table
            # would otherwise swallow the ENTIRE backlog as one batch.
            # Capping the versions per micro-batch bounds each batch to
            # a few commits' delta and lets checkpoint progress land
            # between them — the maxFilesPerTrigger idea, in version
            # units.
            self.max_versions = int(options.get("maxVersionsPerBatch", "10"))
            # Durable admission state for the PARTITIONED reader (the
            # Simple reader's read(start) is handed the true start and
            # needs none): a directory where the max PLANNED offset is
            # persisted so a restarted query's first batch stays capped
            # (see the reader's __init__ note). Must pair 1:1 with the
            # query's checkpoint, like the checkpoint dir itself.
            self.cap_state_dir = options.get("capStateDir")

    class SnapshotChangesStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, schema_json: str):
            o = _Opts(options)
            self.root, self.start_version = o.root, o.start_version
            self.max_versions = o.max_versions
            self.schema_json = schema_json

        def initialOffset(self):
            return {"version": self.start_version}

        def read(self, start):
            mdir = os.path.join(self.root, "_manifests")
            vs = _versions(mdir)
            head = vs[-1] if vs else 0
            if head <= start["version"]:
                return iter([]), start
            head = min(head, start["version"] + self.max_versions)
            rows = list(
                _added_rows(self.root, start["version"], head, self.schema_json)
            )
            return iter(rows), {"version": head}

        def readBetweenOffsets(self, start, end):
            return iter(
                list(
                    _added_rows(
                        self.root,
                        start["version"],
                        end["version"],
                        self.schema_json,
                    )
                )
            )

    class AddedFilePartition(InputPartition):
        def __init__(self, path: str, schema_json: str):
            self.path = path
            self.schema_json = schema_json

    class SnapshotChangesPartitionedReader(DataSourceStreamReader):
        """One InputPartition per added file: the manifest diff stays a
        driver-side JSON walk, but every parquet read happens in its
        own Spark task and ships Arrow RecordBatches straight into the
        scan — no driver materialization, executor-parallel across the
        files of a bulk append."""

        def __init__(self, options, schema_json: str):
            o = _Opts(options)
            self.root, self.start_version = o.root, o.start_version
            self.max_versions = o.max_versions
            self.schema_json = schema_json
            # latestOffset() has no start argument, so the per-batch
            # version cap needs the last planned end; partitions()
            # resyncs it from the authoritative checkpointed start, so
            # a restart (or a planned-but-failed batch) can't strand or
            # skip versions — the cap is admission control only,
            # correctness lives in the (start, end] re-plan.
            #
            # None means "true start unknown": the Python DataSource
            # offset protocol calls latestOffset() with NO arguments
            # and BEFORE initialOffset() (observed on 4.1; there is no
            # SupportsAdmissionControl equivalent), and on a restart
            # from a checkpoint this instance cannot see the committed
            # offset V at all. Capping the first answer from
            # start_version could therefore return an end BELOW V —
            # Spark would plan batch (V, smaller], partitions() would
            # return [] and the REGRESSED offset would be committed,
            # making the following batch re-deliver versions <= V
            # (ADVICE r6, high). So while _last_end is None,
            # latestOffset returns the UNCAPPED head — the one value
            # provably >= any committed offset, since offsets only
            # ever come from past heads and heads only grow. The cap
            # kicks in from the SECOND batch of each run, once the
            # floor is seeded here or by partitions(). Consequence,
            # documented on the data source: the first micro-batch of
            # each run is uncapped for this reader — UNLESS
            # option("capStateDir", dir) persists the floor (below); a
            # consumer that needs every batch capped without extra
            # state can instead use option("reader", "simple"), whose
            # read(start) is HANDED the true start and caps every
            # batch.
            self._last_end: int | None = None
            # ADVICE r7 / VERDICT r8 item 3: with capStateDir set, the
            # max offset this reader ever PLANNED is persisted (atomic
            # tmp+rename JSON) on every latestOffset/partitions call
            # and re-read here on construction. The persisted floor is
            # >= every offset the checkpoint log can carry — offsets
            # only ever come from planned ends — so seeding _last_end
            # from it keeps the restart batch CAPPED while still never
            # answering below a committed offset, even if
            # maxVersionsPerBatch was lowered between runs (min(head,
            # floor + cap) >= floor >= any committed V). No state file
            # -> first-ever run -> the uncapped-head path above.
            self._cap_state = (
                os.path.join(o.cap_state_dir, "cap_floor.json")
                if o.cap_state_dir
                else None
            )
            self._persisted_floor = -1
            if self._cap_state is not None:
                try:
                    with open(self._cap_state) as f:
                        floor = int(json.load(f)["floor"])
                    self._persisted_floor = floor
                    self._last_end = max(floor, self.start_version)
                except (OSError, ValueError, KeyError):
                    pass  # absent/corrupt state: fresh-run behavior

        def _persist_floor(self, end: int) -> None:
            if self._cap_state is None or end <= self._persisted_floor:
                return
            import tempfile

            d = os.path.dirname(self._cap_state)
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump({"floor": int(end)}, f)
                os.replace(tmp, self._cap_state)
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
            self._persisted_floor = end

        def initialOffset(self):
            # Only called when the query has NO checkpointed offset,
            # so the configured startVersion is the true start — seed
            # the admission-control floor if nothing else has. (Spark
            # calls this AFTER the first latestOffset, so on a fresh
            # query the first batch is already planned uncapped; never
            # move the floor backwards.)
            if self._last_end is None:
                self._last_end = self.start_version
            return {"version": self.start_version}

        def latestOffset(self):
            mdir = os.path.join(self.root, "_manifests")
            vs = _versions(mdir)
            head = vs[-1] if vs else 0
            if self._last_end is None:
                # Restart path: committed offset invisible here; never
                # return less than it (see __init__ note). The first
                # post-restart batch is uncapped; partitions() seeds
                # the floor so subsequent batches are capped again.
                end = max(head, self.start_version)
            else:
                floor = self._last_end
                end = (
                    min(head, floor + self.max_versions)
                    if head > floor
                    else floor
                )
            self._last_end = end
            self._persist_floor(end)
            return {"version": end}

        def partitions(self, start, end):
            s, e = start["version"], end["version"]
            self._last_end = max(self._last_end or 0, s, e)
            self._persist_floor(self._last_end)
            if e <= s:
                return []
            return [
                AddedFilePartition(os.path.join(self.root, f), self.schema_json)
                for f in _added_files(self.root, s, e)
            ]

        def read(self, partition):
            return _projected_batches(partition.path, partition.schema_json)

        def commit(self, end):
            pass  # manifests are immutable; nothing to clean up

    class SnapshotChangesDataSource(DataSource):
        """``spark.readStream.format("kdis_snapshot_changes")
        .option("path", root)`` — micro-batch stream of a snapshot
        table's append deltas. Schema comes from the table's CURRENT
        manifest and is frozen for the life of the query; files are
        projected to it by name (older files null-fill added columns,
        newer files' extra columns drop until restart)."""

        @classmethod
        def name(cls) -> str:
            return "kdis_snapshot_changes"

        def schema(self) -> str:
            from pyspark.sql import types as T

            schema_json = _head_schema_json(self.options.get("path", ""))
            struct = T.StructType.fromJson(json.loads(schema_json))
            return ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in struct.fields
            )

        def _frozen_schema_json(self, schema) -> str:
            # Prefer the schema Spark hands the reader (the stream's
            # declared schema — user-supplied or checkpoint-pinned);
            # fall back to the head manifest when called directly.
            try:
                return schema.json()
            except AttributeError:
                return _head_schema_json(self.options.get("path", ""))

        def streamReader(self, schema):
            if self.options.get("reader", "partitioned") == "simple":
                # Raising NOT_IMPLEMENTED makes Spark fall back to
                # simpleStreamReader() (datasource_internal._streamReader).
                from pyspark.errors import PySparkNotImplementedError

                raise PySparkNotImplementedError(
                    errorClass="NOT_IMPLEMENTED",
                    messageParameters={"feature": "streamReader"},
                )
            return SnapshotChangesPartitionedReader(
                self.options, self._frozen_schema_json(schema)
            )

        def simpleStreamReader(self, schema):
            return SnapshotChangesStreamReader(
                self.options, self._frozen_schema_json(schema)
            )

    return SnapshotChangesDataSource


SnapshotChangesDataSource = _make()


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(SnapshotChangesDataSource)
