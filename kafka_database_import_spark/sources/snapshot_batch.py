"""BATCH read of the snapshot table format as a Spark 4 Python
DataSource WITH FILTER PUSHDOWN — ``spark.read.format("kdis_snapshot")
.option("path", root).load().filter(...)`` plans O(matching files):

* Catalyst pushes supported conjuncts (``pushFilters``, Spark 4.1
  typed filters) down to the source;
* ``partitions()`` prunes the version's file list through every
  metadata layer the table carries — identity partition tuples,
  manifest min/max stats, bloom sidecars (presence-driven: any file
  that HAS a sidecar for an equality/IN column gets probed, no table
  configuration needed) — and emits one ``InputPartition`` per
  surviving file;
* every pushed filter is RETURNED to Spark (``pushFilters``' contract
  for partially-handled filters), so Spark re-applies the full
  predicate and the pruning stays planning-only — exactly the
  stats/bloom contract of ``SnapshotTable``'s own read/DML paths.

This gives plain declarative Spark — SQL over a registered view
included — the same file-skipping a ``SnapshotTable.read_keys`` call
gets programmatically; at 100 TB the difference between the two plans
is "a handful of files" vs "a million-file scan". Reference parity:
the $in semi-join of kafka-database-import.go:148-170 resolved at
planning time.

Boundaries, loud by design: a version carrying merge-on-read deletion
vectors refuses batch-source reads (the DV anti-join is a Spark-side
plan — use ``SnapshotTable.read``); range pruning compares only
like-typed (numeric/string) stats; bloom probing covers
int/string/bool/date/binary equality values (timestamps decline —
pushed literals arrive session-zone-naive and must not false-reject).

Everything lives in a factory so cloudpickle embeds the classes BY
VALUE: the DataSource is planned in a separate Python worker and read
on executors, neither of which can import this package when the host
process runs from a foreign cwd (see pyds.py's note). The few manifest
helpers duplicated from snapshot.py/snapshot_stream.py are the price
of that self-containment and are kept byte-compatible by tests.

``option("planReportPath", file)`` writes ``{"planned": n, "total":
m, "version": v}`` at planning time — the observability hook the
pruning tests and ops dashboards read.
"""

from __future__ import annotations


def _make():
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    _LIST_KEYS = ("files", "dv_files", "tombstone_files")
    _MAP_KEYS = ("stats", "file_partitions")

    # ---------------- manifest reading (delta-aware, self-contained)
    def _versions(mdir: str) -> list:
        if not os.path.isdir(mdir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def _read_raw(mdir: str, v: int) -> dict:
        try:
            with open(os.path.join(mdir, f"v{v}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"kdis_snapshot: version {v} is not in the manifest log "
                f"(vacuumed/expired, or never committed)"
            ) from None

    def _apply_delta(parent: dict, delta: dict) -> dict:
        # byte-compatible copy of snapshot._apply_manifest_delta
        suffixes = ("_add", "_remove", "_set", "_unset")
        full = {
            k: v
            for k, v in delta.items()
            if k not in ("delta_of", "empty_keys")
            and not any(
                k == base + suf
                for base in (*_LIST_KEYS, *_MAP_KEYS)
                for suf in suffixes
            )
        }
        empty = set(delta.get("empty_keys", []))
        for k in _LIST_KEYS:
            rem = set(delta.get(k + "_remove", []))
            out = [f for f in parent.get(k, []) if f not in rem]
            out += delta.get(k + "_add", [])
            if out or k in empty:
                full[k] = out
        for k in _MAP_KEYS:
            base = dict(parent.get(k, {}))
            for f in delta.get(k + "_unset", []):
                base.pop(f, None)
            base.update(delta.get(k + "_set", {}))
            if base or k in empty:
                full[k] = base
        return full

    def _manifest(mdir: str, v: int) -> dict:
        chain: list = []
        cur = v
        while True:
            m = _read_raw(mdir, cur)
            if "delta_of" not in m:
                full = m
                break
            chain.append(m)
            cur = m["delta_of"]
        for d in reversed(chain):
            full = _apply_delta(full, d)
        return full

    # ---------------- bloom probe (canon/positions byte-compatible
    # with snapshot._bloom_impl; pinned by tests)
    def _canon(v):
        import datetime as _dt

        if isinstance(v, bool):
            return f"b:{int(v)}"
        if isinstance(v, (bytes, bytearray)):
            return "x:" + bytes(v).hex()
        if isinstance(v, _dt.datetime):
            return None  # session-zone-naive literal: decline
        if isinstance(v, _dt.date):
            return "d:" + v.isoformat()
        if isinstance(v, int):
            return str(v)
        if isinstance(v, str):
            return v
        return None  # float/Decimal/other: decline

    def _positions(canon_s: str, bits: int, k: int):
        import hashlib

        d = hashlib.sha1(canon_s.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1
        return [(h1 + i * h2) % bits for i in range(k)]

    def _load_sidecar(root: str, rel: str):
        import base64
        import zlib

        try:
            with open(os.path.join(root, rel + ".bloom")) as f:
                raw = json.load(f)
            return {
                "bits": int(raw["bits"]),
                "k": int(raw["k"]),
                "blooms": {
                    c: zlib.decompress(base64.b64decode(b))
                    for c, b in raw.get("blooms", {}).items()
                },
            }
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return None

    def _bloom_keeps(sidecar, col, canons) -> bool:
        data = sidecar["blooms"].get(col)
        if data is None:
            return True
        bits, k = sidecar["bits"], sidecar["k"]
        for canon_s in canons:
            if all(
                (data[h >> 3] >> (h & 7)) & 1
                for h in _positions(canon_s, bits, k)
            ):
                return True
        return False

    # ---------------- per-file projected read (executor-side)
    def _batches(path: str, schema_json: str):
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
                    col = batch.column(
                        batch.schema.get_field_index(field.name)
                    )
                    if col.type != field.type:
                        col = col.cast(field.type)
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(n, field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    class ScanPartition(InputPartition):
        def __init__(self, path: str, schema_json: str):
            self.path = path
            self.schema_json = schema_json

    class SnapshotBatchReader(DataSourceReader):
        def __init__(self, options, schema_json: str):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("kdis_snapshot: 'path' required")
            v = options.get("version")
            self.version = int(v) if v is not None else None
            self.report_path = options.get("planReportPath")
            self.schema_json = schema_json
            # pushFilters() state consumed by partitions():
            self._eq: dict = {}  # col -> set of equality/IN values
            self._lo: dict = {}  # col -> (bound, inclusive)
            self._hi: dict = {}  # col -> (bound, inclusive)

        # -------- pushdown: remember prunable conjuncts, return ALL
        # filters so Spark re-applies the exact predicate (pruning is
        # planning-only, never a correctness dependency)
        def pushFilters(self, filters):
            for f in filters:
                if len(getattr(f, "attribute", ())) != 1:
                    continue
                col = f.attribute[0]
                if isinstance(f, EqualTo):
                    vals = {f.value}
                elif isinstance(f, In):
                    vals = set(f.value)
                else:
                    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        side, inc = self._lo, isinstance(
                            f, GreaterThanOrEqual
                        )
                    elif isinstance(f, (LessThan, LessThanOrEqual)):
                        side, inc = self._hi, isinstance(
                            f, LessThanOrEqual
                        )
                    else:
                        continue
                    if isinstance(f.value, (int, float, str)) and not (
                        isinstance(f.value, bool)
                    ):
                        side[col] = (f.value, inc)
                    continue
                if None in vals:
                    continue  # NULL never equality-matches: leave to Spark
                self._eq[col] = (
                    vals
                    if col not in self._eq
                    else self._eq[col] & vals  # AND of conjuncts
                )
            return filters

        # -------- planning: manifest arithmetic, one partition per
        # surviving file
        def _keep_by_stats(self, st: dict) -> bool:
            def _cmp_ok(a, b) -> bool:
                num = (int, float)
                if isinstance(a, bool) or isinstance(b, bool):
                    return False
                return (
                    isinstance(a, num) and isinstance(b, num)
                ) or (isinstance(a, str) and isinstance(b, str))

            for col, vals in self._eq.items():
                rng = st.get(col)
                if rng is None:
                    continue
                lo, hi = rng
                usable = [v for v in vals if _cmp_ok(v, lo)]
                if len(usable) == len(vals) and not any(
                    lo <= v <= hi for v in usable
                ):
                    return False
            for col, (b, inc) in self._lo.items():
                rng = st.get(col)
                if rng and _cmp_ok(b, rng[1]) and (
                    rng[1] < b or (rng[1] == b and not inc)
                ):
                    return False
            for col, (b, inc) in self._hi.items():
                rng = st.get(col)
                if rng and _cmp_ok(b, rng[0]) and (
                    rng[0] > b or (rng[0] == b and not inc)
                ):
                    return False
            return True

        def _keep_by_partition(self, entry: dict) -> bool:
            # identity entries only (key == source column); transform
            # keys (col_month, col_bucket8) are skipped — conservative
            for col, vals in self._eq.items():
                if col in entry and entry[col] not in vals:
                    return False
            return True

        def _keep_by_bloom(self, rel: str, canons_by_col: dict) -> bool:
            if not canons_by_col:
                return True
            sc = _load_sidecar(self.root, rel)
            if sc is None:
                return True
            return all(
                _bloom_keeps(sc, col, canons)
                for col, canons in canons_by_col.items()
            )

        def partitions(self):
            mdir = os.path.join(self.root, "_manifests")
            vs = _versions(mdir)
            if not vs:
                raise ValueError(
                    f"kdis_snapshot: table {self.root} has no commits"
                )
            v = self.version if self.version is not None else vs[-1]
            m = _manifest(mdir, v)
            if m.get("dv_files"):
                raise ValueError(
                    f"kdis_snapshot: version {v} carries merge-on-read "
                    f"deletion vectors — the DV anti-join is a Spark-side "
                    f"plan; read this table via SnapshotTable.read() or "
                    f"compact() it first"
                )
            files = list(m.get("files", []))
            total = len(files)
            stats = m.get("stats", {})
            fp = m.get("file_partitions", {})
            canons_by_col: dict = {}
            unsat = False
            for col, vals in self._eq.items():
                if not vals:
                    unsat = True  # e.g. k = 1 AND k = 2
                canons = [c for v_ in vals if (c := _canon(v_)) is not None]
                if canons and len(canons) == len(vals):
                    canons_by_col[col] = sorted(canons)
            if unsat:
                files = []
            files = [
                f
                for f in files
                if self._keep_by_stats(stats.get(f, {}))
                and self._keep_by_partition(fp.get(f, {}))
                and self._keep_by_bloom(f, canons_by_col)
            ]
            if self.report_path:
                import tempfile

                d = os.path.dirname(self.report_path) or "."
                os.makedirs(d, exist_ok=True)
                fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
                with os.fdopen(fd, "w") as f:
                    json.dump(
                        {"planned": len(files), "total": total,
                         "version": v},
                        f,
                    )
                os.replace(tmp, self.report_path)
            return [
                ScanPartition(
                    os.path.join(self.root, f), self.schema_json
                )
                for f in files
            ]

        def read(self, partition):
            yield from _batches(partition.path, partition.schema_json)

    class SnapshotBatchDataSource(DataSource):
        """``spark.read.format("kdis_snapshot").option("path", root)
        [.option("version", n)].load()`` — pushdown-pruned batch scan
        of one snapshot. Schema comes from the requested version's
        manifest (head by default)."""

        @classmethod
        def name(cls) -> str:
            return "kdis_snapshot"

        def _manifest_schema_json(self) -> str:
            root = self.options.get("path", "")
            mdir = os.path.join(root, "_manifests")
            vs = _versions(mdir)
            if not vs:
                raise ValueError(
                    f"kdis_snapshot: table {root} has no commits"
                )
            v = self.options.get("version")
            return _manifest(mdir, int(v) if v is not None else vs[-1])[
                "schema"
            ]

        def schema(self) -> str:
            from pyspark.sql import types as T

            struct = T.StructType.fromJson(
                json.loads(self._manifest_schema_json())
            )
            return ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in struct.fields
            )

        def reader(self, schema):
            try:
                schema_json = schema.json()
            except AttributeError:
                schema_json = self._manifest_schema_json()
            return SnapshotBatchReader(self.options, schema_json)

    return SnapshotBatchDataSource


SnapshotBatchDataSource = _make()


def register(spark) -> None:
    """Idempotent registration on a session. Python-data-source filter
    pushdown is gated by a session conf (default false in 4.1) —
    without it Spark refuses a reader that implements pushFilters();
    it's runtime-settable, so enable it here the same way the readers
    module pins its parquet confs for foreign sessions."""
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotBatchDataSource)
