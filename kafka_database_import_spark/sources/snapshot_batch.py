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

Merge-on-read deletion vectors are applied IN the source: at planning
time (after file pruning) the driver loads the surviving files' DV
positions — the same O(deletes) bound as ``SnapshotTable.read``'s
broadcast anti-join, but scoped to files that survived
partition/stats/bloom pruning — and each ``InputPartition`` carries
only ITS file's sorted positions, masked out executor-side as Arrow
batches stream (``_batches``), so the declarative scan of a
DV-carrying version equals ``SnapshotTable.read`` row-for-row with no
Spark-side join. Other boundaries, loud by design: range pruning
compares only like-typed (numeric/string) stats; bloom probing covers
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

Session-catalog DDL boundary (upstream, probed 2026-08-15): ``CREATE
TABLE t USING kdis_snapshot OPTIONS (path ...)`` creates the catalog
entry (schema inference receives the options, which arrive as a
``file:`` URI — normalized by ``_localize``), but Spark 4.1 does NOT
forward the stored options to ``reader()``/``writer()`` when the
table is later scanned or INSERTed (probed: ``self.options`` is
``{}``; same with LOCATION). SQL access therefore goes through a temp
view over ``spark.read.format("kdis_snapshot")...load()`` — full
pushdown pruning, q99zzza shape — and writes through the DataFrame
writer. The day the catalog forwards options, DDL works with no
change here.

The format also WRITES — ``df.write.format("kdis_snapshot")
.option("path", root).mode("append"|"overwrite").save()`` and
``df.writeStream.format("kdis_snapshot")`` — committing real snapshot
versions byte-compatible with ``SnapshotTable``'s manifest protocol
(same atomic ``os.link`` publish, same field-id schema JSON, footer
min/max stats recorded per file, optional bloom sidecars via
``option("bloomCols", "a,b")``), so a table written here reads, DMLs,
time-travels, and streams through every existing path. Executors
write immutable parquet files directly (Arrow batches → one file per
task × partition tuple, rolled at ``option("maxRecordsPerFile", n)``);
the driver-side ``commit()`` assembles and links the manifest,
auto-rebasing lost append races exactly like ``SnapshotTable.commit``.
``option("mergeSchema", "true")`` enables additive schema evolution
under ``SnapshotTable.commit``'s exact rules (new columns minted fresh
field ids, safe widening keeps the field id, type CHANGES always
refused); without it the incoming columns must be a same-typed subset
of the head schema (equal set for overwrite). An active partition
spec is honored: each row's transformed partition tuple is computed
executor-side (the Python mirror of the table's write expressions),
files land hive-style, and the manifest records the same typed tuples
``commit`` would — pruning parity by construction. A FRESH table can
be born partitioned via ``option("partitionBy", "s, month(d),
bucket(4, k)")`` — validated with SnapshotTable's spec rules and
stored canonically, so the table's next ``commit`` accepts it
verbatim; on an existing table the option must MATCH the active spec
(spec evolution stays with ``set_partition_spec``). The writer cannot
inject an Exchange, so pre-``repartition`` big partitioned appends by
the spec columns. The streaming sink is append-only and skips a
replayed micro-batch when ANY committed manifest carries its epoch id
(all-manifests scan, robust to foreign appends landing between a
crash and the restart replay).
"""

from __future__ import annotations


def _make():
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        DataSourceStreamArrowWriter,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
        WriterCommitMessage,
    )

    _LIST_KEYS = ("files", "dv_files", "tombstone_files")
    _MAP_KEYS = ("stats", "file_partitions")

    def _localize(p):
        """Catalog DDL (``CREATE TABLE ... USING kdis_snapshot OPTIONS
        (path ...)``) hands the option through Spark's path resolution,
        which arrives as a ``file:`` URI; the programmatic
        ``option("path", ...)`` hands the raw string. Normalize both to
        a local filesystem path (this source is explicitly
        local/shared-filesystem, like the rest of the format)."""
        if p and p.startswith("file:"):
            from urllib.parse import unquote, urlparse

            return unquote(urlparse(p).path)
        return p

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

    def _encode_delta(full: dict, parent: dict) -> "dict | None":
        """Byte-compatible copy of snapshot._encode_manifest_delta
        (pinned by test): the writer publishes DELTA manifests on the
        same cadence as SnapshotTable._publish, because at a
        million-file table an append that rewrote the FULL manifest
        would make commit cost O(table) instead of O(commit) — the
        scale asymmetry this closes. None = store the full form."""
        delta = {
            k: v
            for k, v in full.items()
            if k not in _LIST_KEYS and k not in _MAP_KEYS
        }
        delta["delta_of"] = parent["version"]
        present = [
            k for k in (*_LIST_KEYS, *_MAP_KEYS) if k in full and not full[k]
        ]
        if present:
            delta["empty_keys"] = present
        for k in _LIST_KEYS:
            new, old = full.get(k, []), parent.get(k, [])
            new_set, old_set = set(new), set(old)
            add = [f for f in new if f not in old_set]
            rem = [f for f in old if f not in new_set]
            if [f for f in old if f in new_set] + add != new:
                return None
            if add:
                delta[k + "_add"] = add
            if rem:
                delta[k + "_remove"] = rem
        for k in _MAP_KEYS:
            new, old = full.get(k, {}), parent.get(k, {})
            upsert = {
                f: v for f, v in new.items() if f not in old or old[f] != v
            }
            unset = [f for f in old if f not in new]
            if upsert:
                delta[k + "_set"] = upsert
            if unset:
                delta[k + "_unset"] = unset
        return delta

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
                # per-column hash kind (round 14/15 vectorized builds);
                # absent = sha1, the v1 layout
                "hashes": dict(raw.get("hashes", {})),
            }
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return None

    def _sm64_pair(vals):
        """splitmix64 double-hash pair — byte-compatible twin of
        snapshot._bloom_impl's ``sm64_h1h2`` (pinned by test)."""
        import numpy as np

        m = np.uint64(0xFFFFFFFFFFFFFFFF)

        def mix(x):
            x = x.copy()
            x ^= x >> np.uint64(30)
            x = (x * np.uint64(0xBF58476D1CE4E5B9)) & m
            x ^= x >> np.uint64(27)
            x = (x * np.uint64(0x94D049BB133111EB)) & m
            x ^= x >> np.uint64(31)
            return x

        h1 = mix(vals)
        h2 = mix((vals + np.uint64(0x9E3779B97F4A7C15)) & m) | np.uint64(1)
        return h1, h2

    def _sm64_keeps(data, vals, bits: int, k: int) -> bool:
        import numpy as np

        arr = np.frombuffer(data, dtype=np.uint8)
        h1, h2 = _sm64_pair(vals)
        alive = np.ones(len(vals), dtype=bool)
        for i in range(k):
            h = (h1 + np.uint64(i) * h2) % np.uint64(bits)
            bit = (
                arr[(h >> np.uint64(3)).astype(np.int64)]
                >> (h & np.uint64(7)).astype(np.uint8)
            ) & 1
            alive &= bit.astype(bool)
            if not alive.any():
                return False
        return True

    def _fnv1a64(strs):
        """FNV-1a 64 over canon strings — byte-compatible twin of
        snapshot._bloom_impl's ``fnv1a64_strs`` (pinned by test)."""
        import numpy as np

        m = np.uint64(0xFFFFFFFFFFFFFFFF)
        prime = np.uint64(0x100000001B3)
        bs = [s.encode("utf-8") for s in strs]
        offsets = np.zeros(len(bs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in bs], out=offsets[1:])
        data = np.frombuffer(b"".join(bs), dtype=np.uint8)
        lens = offsets[1:] - offsets[:-1]
        h = np.full(len(bs), 0xCBF29CE484222325, dtype=np.uint64)
        if len(bs) == 0:
            return h
        starts = offsets[:-1]
        for j in range(int(lens.max())):
            live = lens > j
            if not live.any():
                break
            idx = (starts[live] + j).astype(np.int64)
            b = data[idx].astype(np.uint64)
            h[live] = ((h[live] ^ b) * prime) & m
        return h

    def _bloom_keeps(sidecar, col, canons) -> bool:
        data = sidecar["blooms"].get(col)
        if data is None:
            return True
        bits, k = sidecar["bits"], sidecar["k"]
        kind = sidecar.get("hashes", {}).get(col)
        if kind == "sm64":
            import numpy as np

            try:
                vals = np.array(
                    [int(c0) & 0xFFFFFFFFFFFFFFFF for c0 in canons],
                    dtype=np.uint64,
                )
            except (ValueError, TypeError):
                return True  # cross-type probe: cannot disprove
            return _sm64_keeps(data, vals, bits, k)
        if kind == "fnv1a64":
            return _sm64_keeps(data, _fnv1a64(canons), bits, k)
        if kind is not None and kind != "sha1":
            return True  # unknown future kind: conservatively keep
        for canon_s in canons:
            if all(
                (data[h >> 3] >> (h & 7)) & 1
                for h in _positions(canon_s, bits, k)
            ):
                return True
        return False

    # ---------------- per-file projected read (executor-side)
    def _batches(path: str, schema_json: str, deletes=None):
        """Arrow batches of one data file projected to the requested
        schema; ``deletes`` is this FILE's sorted merge-on-read deleted
        row positions (parquet row index, the same ``_metadata
        .row_index`` domain ``SnapshotTable._write_dv`` recorded) —
        masked out with a running offset as batches stream, so the
        declarative read returns exactly ``SnapshotTable.read``'s
        DV-anti-joined rows without any Spark-side join."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import to_arrow_schema

        struct = T.StructType.fromJson(json.loads(schema_json))
        target = to_arrow_schema(struct)
        table = pq.read_table(path)
        present = set(table.schema.names)
        offset = 0
        for batch in table.to_batches():
            n = batch.num_rows
            if deletes:
                import bisect

                lo = bisect.bisect_left(deletes, offset)
                hi = bisect.bisect_left(deletes, offset + n)
                if lo != hi:
                    keep = [True] * n
                    for p in deletes[lo:hi]:
                        keep[p - offset] = False
                    batch = batch.filter(pa.array(keep))
            offset += n
            m = batch.num_rows
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
                    arrays.append(pa.nulls(m, field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def _load_dv_positions(root: str, dv_files: list, keep_k3s) -> dict:
        """k3 → sorted deleted row positions, read driver-side at
        planning time AFTER file pruning: ``keep_k3s`` is the surviving
        files' key set, so DV rows for pruned files are dropped at the
        Arrow filter — the loaded set is O(surviving files' deletes),
        strictly <= the O(all deletes) SnapshotTable.read BROADCASTS
        for its anti-join (snapshot.py _write_dv docstring). Each
        InputPartition then ships only ITS file's positions."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        keys = pa_keys = None
        by_k3: dict = {}
        for rel in dv_files:
            t = pq.read_table(os.path.join(root, rel), columns=["k3", "pos"])
            if pa_keys is None:
                import pyarrow as pa

                keys = sorted(keep_k3s)
                pa_keys = pa.array(keys, type=t.column("k3").type)
            t = t.filter(pc.is_in(t.column("k3"), value_set=pa_keys))
            for k3, pos in zip(
                t.column("k3").to_pylist(), t.column("pos").to_pylist()
            ):
                by_k3.setdefault(k3, set()).add(pos)
        return {k: sorted(v) for k, v in by_k3.items()}

    def _k3(rel: str) -> str:
        """Relocation-proof file identity: last three path components —
        byte-compatible with snapshot._file_key3's
        ``concat_ws("/", slice(split(file_path, "/"), -3, 3))`` (the
        DV build side records k3 off the scan's ``_metadata`` path)."""
        return "/".join(rel.replace(os.sep, "/").split("/")[-3:])

    class ScanPartition(InputPartition):
        def __init__(self, path: str, schema_json: str, deletes=None):
            self.path = path
            self.schema_json = schema_json
            self.deletes = deletes

    class SnapshotBatchReader(DataSourceReader):
        def __init__(self, options, schema_json: str):
            self.root = _localize(options.get("path"))
            if not self.root:
                raise ValueError("kdis_snapshot: 'path' required")
            v = options.get("version")
            self.version = int(v) if v is not None else None
            self.report_path = options.get("planReportPath")
            self.schema_json = schema_json
            # pushFilters() state consumed by partitions():
            self._eq: dict = {}  # col -> set of equality/IN values
            self._lo: dict = {}  # col -> (bound, inclusive)
            self._pv_memo: dict = {}  # (tag, col, (tf, p)) -> mapped literals
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
                    import datetime as _dt

                    if (
                        isinstance(f.value, (int, float, str))
                        and not isinstance(f.value, bool)
                    ) or (
                        isinstance(f.value, _dt.date)
                        and not isinstance(f.value, _dt.datetime)
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

        def _keep_by_partition(self, entry: dict, types: dict) -> bool:
            """HIDDEN partitioning for the declarative scan: pushed
            equality/IN AND range conjuncts on a SOURCE column prune
            through every decodable tuple key — identity (key ==
            column) or a self-describing transform suffix (col_month,
            col_bucket8; the same grammar snapshot._field_from_entry_key
            decodes) — by mapping the literals through the transform's
            Python mirror and comparing canonical values. Undecodable
            keys or unmappable literal types constrain nothing
            (conservative keep); timestamp literals decline
            (session-zone-naive, like the bloom probe). A NULL tuple
            value prunes under any equality or range (NULL satisfies
            neither). Range bounds prune through ORDER-PRESERVING
            transforms only (identity, year/month/day, truncate —
            monotone, so pv < f(lo) means no row in the file reaches
            the bound; bucket scrambles order and constrains nothing),
            and only when the mapped bound and the recorded value share
            a Python type (int-with-int, str-with-str — the stats
            rule). Inclusivity never matters at partition granularity:
            x > b still implies f(x) >= f(b) for monotone f."""
            import datetime as _dt

            def _decoded(key, col):
                """(transform, param) when ``key`` is a tuple key over
                source ``col``, else None. Identity wins a literal
                column-name match (a column named x_month is a column)."""
                if key == col:
                    return ("identity", None)
                km = _FIELD_KEY_RE.match(key)
                if km is None or key in types:
                    return None
                if km.group(1) is not None:
                    src, tf, p = km.group(1), km.group(2), None
                else:
                    src, tf, p = km.group(3), km.group(4), int(km.group(5))
                return (tf, p) if src == col else None

            def _mappable(v):
                return isinstance(v, (bool, int, str, _dt.date)) and not (
                    isinstance(v, _dt.datetime)
                )

            # mapped-literal memo: pruning runs per FILE, but the
            # mapping depends only on (col, transform, param) — at a
            # million files recomputing the lambdas per file is real
            # driver time for zero information
            memo = self._pv_memo

            def _mapped_eq(col, d, t, vals):
                key = ("eq", col, d)
                if key not in memo:
                    memo[key] = (
                        set(_pv_fn(*d, t)(v) for v in vals)
                        if all(_mappable(v) for v in vals)
                        else None
                    )
                return memo[key]

            def _mapped_bound(col, d, t, b, tag):
                key = (tag, col, d)
                if key not in memo:
                    memo[key] = _pv_fn(*d, t)(b)
                return memo[key]

            for col, vals in self._eq.items():
                t = types.get(col)
                if t is None:
                    continue
                for key, pv in entry.items():
                    d = _decoded(key, col)
                    if d is None:
                        continue
                    mapped = _mapped_eq(col, d, t, vals)
                    if mapped is not None and pv not in mapped:
                        return False
            for side, below, tag in (
                (self._lo, True, "lo"),
                (self._hi, False, "hi"),
            ):
                for col, (b, _inc) in side.items():
                    t = types.get(col)
                    if t is None or not _mappable(b):
                        continue
                    for key, pv in entry.items():
                        d = _decoded(key, col)
                        if d is None or d[0] == "bucket":
                            continue  # not order-preserving
                        if pv is None:
                            return False  # all-NULL source: nothing passes
                        m = _mapped_bound(col, d, t, b, tag)
                        if m is None or type(pv) is not type(m):
                            continue
                        if (below and pv < m) or (not below and pv > m):
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
            files = list(m.get("files", []))
            total = len(files)
            stats = m.get("stats", {})
            fp = m.get("file_partitions", {})
            from pyspark.sql import types as T

            col_types = {
                f.name: f.dataType.simpleString()
                for f in T.StructType.fromJson(
                    json.loads(m["schema"])
                ).fields
            }
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
                and self._keep_by_partition(fp.get(f, {}), col_types)
                and self._keep_by_bloom(f, canons_by_col)
            ]
            # DV positions load AFTER pruning, scoped to survivors —
            # a point lookup on a heavily-MOR'd table never pays for
            # pruned files' delete vectors
            dv_by_k3 = (
                _load_dv_positions(
                    self.root, m["dv_files"], {_k3(f) for f in files}
                )
                if m.get("dv_files") and files
                else {}
            )
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
                    os.path.join(self.root, f),
                    self.schema_json,
                    dv_by_k3.get(_k3(f)),
                )
                for f in files
            ]

        def read(self, partition):
            yield from _batches(
                partition.path, partition.schema_json, partition.deletes
            )

    # ---------------- write side: immutable files on executors, one
    # manifest link on the driver — the same two-phase shape as
    # SnapshotTable.commit, re-expressed in the DataSource writer
    # lifecycle (write → WriterCommitMessage → commit/abort).

    _FIELD_ID_KEY = "parquet.field.id"  # snapshot.FIELD_ID_KEY

    def _canon_build(v):
        """BUILD-side canonical form — byte-compatible with
        snapshot._bloom_impl's ``canon`` (pinned by test): unlike the
        probe-side ``_canon`` above (which DECLINES timestamps because
        pushed literals are session-zone-naive), the build side reads
        values back from the written parquet via pyarrow, so
        timestamps arrive tz-aware and normalize to one UTC wall-clock
        string. A sidecar built with the probe's declining canon would
        leave timestamp blooms empty and FALSE-REJECT matching files
        under SnapshotTable's DML probe — hence two functions."""
        import datetime as _dt

        if v is None:
            return None
        if isinstance(v, bool):
            return f"b:{int(v)}"
        if isinstance(v, float):
            raise TypeError(
                "float/double columns are not supported as bloom columns"
            )
        if isinstance(v, (bytes, bytearray)):
            return "x:" + bytes(v).hex()
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return "ts:" + v.isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return "d:" + v.isoformat()
        return str(v)

    def _build_sidecar(root: str, rel: str, cols: list, bits: int) -> None:
        """Byte-compatible twin of snapshot._build_bloom_sidecar: reads
        the just-written file back through pyarrow (same value domain
        as the original build side), writes ``<file>.bloom`` atomically
        via a ``.bloomtmp`` rename. Columns absent from the file are
        skipped (probe keeps the file)."""
        import base64
        import tempfile as _tf
        import zlib

        import pyarrow.parquet as pq

        path = os.path.join(root, rel)
        pf = pq.ParquetFile(path)
        names = set(pf.schema_arrow.names)
        present = [c for c in cols if c in names]
        blooms: dict = {}
        if present:
            tbl = pf.read(columns=present)
            for c in present:
                arr = bytearray(bits // 8)
                for v in tbl.column(c).to_pylist():
                    canon_s = _canon_build(v)
                    if canon_s is None:
                        continue
                    for h in _positions(canon_s, bits, 6):
                        arr[h >> 3] |= 1 << (h & 7)
                blooms[c] = base64.b64encode(
                    zlib.compress(bytes(arr))
                ).decode("ascii")
        payload = json.dumps(
            {"bits": bits, "k": 6, "codec": "zlib", "blooms": blooms}
        )
        fd, tmp = _tf.mkstemp(dir=os.path.dirname(path), suffix=".bloomtmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, path + ".bloom")
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def _footer_stats(path: str, cols) -> dict:
        """Manifest stats entry for one written file — the JSON-safe
        subset of snapshot._file_stats: ``_nrows``/``_bytes`` always,
        plus footer min/max for columns whose stats are int/float/str
        (dates, timestamps, decimals, and binary come back as
        non-JSON-serializable Python objects; skipping them means "no
        stats recorded" and every pruning consumer conservatively
        keeps the file). ``cols=None`` records every eligible column —
        stats are footer-only reads of a file this task just wrote, so
        the marginal cost is near zero and the table is range-prunable
        by default."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out: dict = {"_nrows": md.num_rows, "_bytes": os.path.getsize(path)}
        for col in idx if cols is None else cols:
            if col not in idx:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if (
                ok
                and lo is not None
                and not isinstance(lo, bool)
                and isinstance(lo, (int, float, str))
                and isinstance(hi, (int, float, str))
            ):
                out[col] = [lo, hi]
        return out

    def _merge_schema_json(prev_m: dict, new_schema) -> str:
        """Byte-compatible twin of snapshot._merge_schema (pinned by
        the writer-evolution tests + fuzz family 18): previous fields +
        any NEW fields in stable order, new fields minted fresh ids no
        live or dropped (tombstoned) column ever used, same-name SAFE
        widening (tinyint→smallint→int→bigint, float→double — Iceberg's
        promotion set, physically decodable in either commit order)
        adopts the wider type keeping the field's id, any other type
        change refused."""
        from pyspark.sql import types as T

        chains = (
            ["tinyint", "smallint", "int", "bigint"],
            ["float", "double"],
        )
        prev = T.StructType.fromJson(json.loads(prev_m["schema"]))
        by_name = {f.name: f for f in prev.fields}
        ids = {
            f.name: f.metadata[_FIELD_ID_KEY]
            for f in prev.fields
            if f.metadata and _FIELD_ID_KEY in f.metadata
        }
        next_id = max([*ids.values(), *prev_m.get("dropped_ids", []), 0]) + 1
        merged = list(prev.fields)
        for f in new_schema.fields:
            if f.name in by_name:
                pf = by_name[f.name]
                w = pf.dataType if pf.dataType == f.dataType else None
                if w is None:
                    an = pf.dataType.simpleString()
                    bn = f.dataType.simpleString()
                    for chain in chains:
                        if an in chain and bn in chain:
                            w = (
                                pf.dataType
                                if chain.index(an) >= chain.index(bn)
                                else f.dataType
                            )
                if w is None:
                    raise ValueError(
                        f"kdis_snapshot: column {f.name!r}: "
                        f"{pf.dataType.simpleString()} -> "
                        f"{f.dataType.simpleString()} is a type CHANGE, "
                        f"not evolution — refused even under mergeSchema"
                    )
                if w != pf.dataType:  # widen in place, keep identity
                    merged[merged.index(pf)] = T.StructField(
                        pf.name, w, pf.nullable, pf.metadata
                    )
            else:
                meta = dict(f.metadata or {})
                meta.pop(_FIELD_ID_KEY, None)
                if ids:  # id-table: stamp the newcomer
                    meta[_FIELD_ID_KEY] = next_id
                    next_id += 1
                merged.append(
                    T.StructField(f.name, f.dataType, f.nullable, meta or None)
                )
        return T.StructType(merged).json()

    # ---------------- partition-spec write support: the driver-side
    # Python mirror of snapshot._PartitionField (py_apply + _canon_pv,
    # byte-compatible by the pruning-parity test) — the writer computes
    # each row's TRANSFORMED partition tuple executor-side and records
    # it in the manifest directly, so partition pruning of a
    # declaratively-appended file is identical to a commit-written one.
    _INT_PTYPES = ("tinyint", "smallint", "int", "bigint")
    _HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

    import re as _re

    _SPEC_ENTRY_RE = _re.compile(
        r"^\s*(year|month|day|bucket|truncate)\s*\(\s*"
        r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
    )
    # recorded tuple KEY -> (source, transform, param) — byte-compatible
    # with snapshot._FIELD_NAME_RE (self-describing suffixes)
    _FIELD_KEY_RE = _re.compile(
        r"^(?:(.+)_(year|month|day)|(.+)_(bucket|truncate)(\d+))$"
    )

    def _canon_pv(value, t: str):
        if value is None:
            return None
        if t in _INT_PTYPES:
            return int(value)
        if t == "boolean":
            if isinstance(value, str):
                return value.lower() == "true"
            return bool(value)
        return str(value)

    def _pv_fn(transform: str, param, t: str):
        """value -> canonical partition value for one spec field.
        String forms ride str(value): datetime.date/datetime give ISO
        text, exactly the domain snapshot._PartitionField.py_apply
        maps filter literals through — the two sides must agree or
        pruning would silently diverge from placement."""
        import zlib as _z

        if transform == "identity":
            return lambda v: _canon_pv(v, t)
        if transform == "year":
            return lambda v: None if v is None else int(str(v)[:4])
        if transform == "month":
            return lambda v: None if v is None else str(v)[:7]
        if transform == "day":
            return lambda v: None if v is None else str(v)[:10]
        if transform == "bucket":
            return (
                lambda v: None
                if v is None
                else _z.crc32(str(v).encode("utf-8")) % param
            )
        # truncate
        if t in _INT_PTYPES:
            return lambda v: None if v is None else int(v) - (int(v) % param)
        return lambda v: None if v is None else str(v)[: param]

    def _parse_spec(spec: list, types: dict) -> list:
        """[(field_name, source_col, value_fn)] for an active spec —
        the same entry grammar as snapshot._parse_spec_entry (the spec
        was validated against the schema when it was set; this parse
        trusts the manifest)."""
        out = []
        for entry in spec:
            m = _SPEC_ENTRY_RE.match(entry)
            if m is None:
                src, tf, p = entry.strip(), "identity", None
            else:
                tf, p, src = m.group(1), m.group(2), m.group(3)
                p = int(p) if p is not None else None
            if src not in types:
                raise ValueError(
                    f"kdis_snapshot: partition spec entry {entry!r}: no "
                    f"column {src!r} in the table schema"
                )
            name = (
                src
                if tf == "identity"
                else f"{src}_{tf}{p if p is not None else ''}"
            )
            out.append((name, src, _pv_fn(tf, p, types[src])))
        return out

    def _fresh_spec(pb: str, types: dict) -> list:
        """Canonical spec entries for a FRESH table created through the
        writer (``option("partitionBy", "s, month(d), bucket(4, k)")``)
        — validated with the SAME rules as snapshot._validate_spec so a
        spec this writer stores is always one ``SnapshotTable`` accepts
        verbatim on its next write."""
        _DATEISH = ("date", "timestamp", "timestamp_ntz")
        entries = [e.strip() for e in pb.split(",") if e.strip()]
        # re-stitch transform entries the comma split broke apart:
        # "bucket(4" + "k)" -> "bucket(4, k)"
        merged: list = []
        for e in entries:
            if merged and "(" in merged[-1] and ")" not in merged[-1]:
                merged[-1] = f"{merged[-1]}, {e}"
            else:
                merged.append(e)
        canon: list = []
        names: list = []
        for entry in merged:
            m = _SPEC_ENTRY_RE.match(entry)
            if m is None:
                src, tf, p = entry.strip(), "identity", None
            else:
                tf, p, src = m.group(1), m.group(2), m.group(3)
                if tf in ("bucket", "truncate") and p is None:
                    raise ValueError(
                        f"kdis_snapshot: partition transform {tf}() needs "
                        f"a width: {tf}(N, {src})"
                    )
                p = int(p) if p is not None else None
                if p is not None and p <= 0:
                    raise ValueError(
                        f"kdis_snapshot: partition transform "
                        f"{tf}({p}, {src}): N > 0"
                    )
            if src not in types:
                raise ValueError(
                    f"kdis_snapshot: partition spec {entry!r}: no column "
                    f"{src!r} (have {sorted(types)})"
                )
            t = types[src]
            if tf == "identity":
                if t in ("float", "double"):
                    raise ValueError(
                        f"kdis_snapshot: partition column {src!r} is {t} — "
                        f"float partition values are lossy in hive paths"
                    )
                canon.append(src)
                names.append(src)
                continue
            if tf in ("year", "month", "day") and t not in _DATEISH:
                raise ValueError(
                    f"kdis_snapshot: partition transform {entry!r}: source "
                    f"must be date/timestamp, got {t}"
                )
            if tf == "bucket" and t not in _INT_PTYPES and t not in (
                "string", "date"
            ):
                raise ValueError(
                    f"kdis_snapshot: partition transform {entry!r}: bucket "
                    f"source must be int/string/date, got {t}"
                )
            if tf == "truncate" and t not in _INT_PTYPES and t != "string":
                raise ValueError(
                    f"kdis_snapshot: partition transform {entry!r}: "
                    f"truncate source must be int/string, got {t}"
                )
            name = f"{src}_{tf}{p if p is not None else ''}"
            if name in types:
                raise ValueError(
                    f"kdis_snapshot: partition field name {name!r} collides "
                    f"with an existing column — rename one"
                )
            names.append(name)
            canon.append(
                f"{tf}({str(p) + ', ' if p is not None else ''}{src})"
            )
        if len(set(names)) != len(names):
            raise ValueError(
                f"kdis_snapshot: duplicate partition field names: {names}"
            )
        return canon

    class WriteMessage(WriterCommitMessage):
        def __init__(self, entries):
            self.entries = entries  # [(rel_path, stats_dict, fp|None), ...]

    class _WriterCore:
        """Shared machinery of the batch and streaming writers. The
        constructor runs in the driver-side planning worker (schema
        resolution against the head manifest — loud boundaries live
        here so a bad write fails at plan time, before any task runs);
        ``write`` runs on executors; ``_commit_files`` back on the
        driver worker. Self-contained for the same foreign-cwd reason
        as the reader classes."""

        def __init__(self, options, schema, overwrite: bool):
            from pyspark.sql import types as T

            self.root = _localize(options.get("path"))
            if not self.root:
                raise ValueError("kdis_snapshot: 'path' required")
            self.overwrite = bool(overwrite)
            self.max_rpf = int(options.get("maxRecordsPerFile", 0)) or None
            sc = options.get("statsCols")
            self.stats_cols = (
                [c.strip() for c in sc.split(",") if c.strip()] if sc else None
            )
            bc = options.get("bloomCols")
            self.bloom_cols = (
                [c.strip() for c in bc.split(",") if c.strip()] if bc else None
            )
            self.bloom_bits = int(options.get("bloomBits", "65536"))
            if self.bloom_bits <= 0 or self.bloom_bits % 8:
                raise ValueError(
                    f"kdis_snapshot: bloomBits must be a positive multiple "
                    f"of 8, got {self.bloom_bits}"
                )
            mdir = os.path.join(self.root, "_manifests")
            vs = _versions(mdir)
            head = vs[-1] if vs else None
            # overwrites never auto-rebase (SnapshotTable.commit's
            # contract: an overwrite re-published over a concurrent
            # append silently DELETES the appended rows) — pin the head
            # this plan was computed against and refuse at commit if it
            # moved
            self.head_at_plan = head
            self.pfields = None  # active partition spec, parsed
            self.spec_at_plan = None
            if head is None:
                # fresh table: mint field ids 1..n — byte-compatible
                # with snapshot._fresh_schema_json
                fields = [
                    T.StructField(
                        f.name,
                        f.dataType,
                        f.nullable,
                        {**(f.metadata or {}), _FIELD_ID_KEY: i + 1},
                    )
                    for i, f in enumerate(schema.fields)
                ]
                self.schema_json = T.StructType(fields).json()
                self.base_schema_json = None
                pb = options.get("partitionBy")
                if pb:
                    struct_types = {
                        f.name: f.dataType.simpleString()
                        for f in schema.fields
                    }
                    self.spec_at_plan = _fresh_spec(pb, struct_types)
                    self.pfields = _parse_spec(
                        self.spec_at_plan, struct_types
                    )
            else:
                m = _manifest(mdir, head)
                tbl_struct = T.StructType.fromJson(json.loads(m["schema"]))
                tbl_types = {
                    f.name: f.dataType.simpleString() for f in tbl_struct.fields
                }
                mine = {
                    f.name: f.dataType.simpleString() for f in schema.fields
                }
                merge = (
                    str(options.get("mergeSchema", "false")).lower() == "true"
                )
                if merge:
                    # additive evolution under the SAME rules as
                    # SnapshotTable.commit (_merge_schema_json is its
                    # byte-compatible twin): new columns get fresh field
                    # ids no live or dropped column ever used, same-name
                    # safe widening adopts the wider type, any other
                    # type change still refuses loudly
                    self.schema_json = _merge_schema_json(m, schema)
                else:
                    bad = sorted(
                        c
                        for c, t in mine.items()
                        if c not in tbl_types or tbl_types[c] != t
                    )
                    if bad or (self.overwrite and set(mine) != set(tbl_types)):
                        raise ValueError(
                            f"kdis_snapshot: incoming schema does not match "
                            f"the table ({bad or sorted(set(tbl_types) - set(mine))} "
                            f"differ) — pass option('mergeSchema', 'true') "
                            f"for additive evolution (new columns, safe "
                            f"widening); type CHANGES are never accepted"
                        )
                    self.schema_json = m["schema"]
                self.base_schema_json = m["schema"]
                spec = m.get("partition_spec")
                if spec:
                    struct_types = {
                        f.name: f.dataType.simpleString()
                        for f in T.StructType.fromJson(
                            json.loads(self.schema_json)
                        ).fields
                    }
                    self.pfields = _parse_spec(spec, struct_types)
                    missing = [
                        s for _n, s, _f in self.pfields if s not in mine
                    ]
                    if missing:
                        raise ValueError(
                            f"kdis_snapshot: partitioned write: spec "
                            f"column(s) {missing} missing from the data "
                            f"(have {sorted(mine)})"
                        )
                self.spec_at_plan = spec
                pb = options.get("partitionBy")
                if pb is not None:
                    want = _fresh_spec(pb, tbl_types)
                    if want != (spec or []):
                        raise ValueError(
                            f"kdis_snapshot: partitionBy={want} does not "
                            f"match the table's active spec {spec or []} — "
                            f"spec evolution goes through "
                            f"SnapshotTable.set_partition_spec"
                        )
            struct = T.StructType.fromJson(json.loads(self.schema_json))
            self.field_ids = {
                f.name: f.metadata[_FIELD_ID_KEY]
                for f in struct.fields
                if f.metadata and _FIELD_ID_KEY in f.metadata
            }
            import tempfile as _tf

            rel = None
            while rel is None or os.path.exists(os.path.join(self.root, rel)):
                suffix = os.path.basename(_tf.mktemp(prefix=""))
                rel = os.path.join("data", f"c{(head or 0) + 1}-ds{suffix}")
            self.rel_dir = rel

        # -------- executor side
        def write(self, it):
            """One immutable parquet file per (task × partition tuple),
            rolled at maxRecordsPerFile. Under an active spec each
            row's TRANSFORMED tuple is computed here (the Python mirror
            of the table's write-path expressions) and files land in
            hive-style ``__p_<field>=<value>`` subdirs with the tuple
            recorded in the commit message — manifest-side pruning of a
            declarative append is identical to a commit-written file.
            Scale note: the writer cannot inject an Exchange, so an
            input NOT clustered by the spec columns fans out to one
            file per (task × value) — callers append-ing big
            partitioned data should ``df.repartition(<spec cols>)``
            first, the same hash-distribution SnapshotTable._write_data
            applies automatically."""
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark import TaskContext

            tc = TaskContext.get()
            pid = tc.partitionId() if tc else 0
            tid = tc.taskAttemptId() if tc else 0
            entries: list = []
            seqs: dict = {}
            bufs: dict = {}  # tuple key -> [batch list, row count]

            from urllib.parse import quote as _quote

            def _frag(name, v) -> str:
                s = _HIVE_NULL if v is None else _quote(str(v), safe="")
                return f"__p_{name}={s}"

            def _flush(key):
                buf = bufs.get(key)
                if not buf or not buf[1]:
                    return
                tbl = pa.Table.from_batches(buf[0])
                if self.field_ids:
                    fields = [
                        f.with_metadata(
                            {
                                b"PARQUET:field_id": str(
                                    self.field_ids[f.name]
                                ).encode()
                            }
                        )
                        if f.name in self.field_ids
                        else f
                        for f in tbl.schema
                    ]
                    tbl = tbl.cast(pa.schema(fields))
                seq = seqs.get(key, 0)
                seqs[key] = seq + 1
                parts = (
                    [
                        _frag(n, v)
                        for (n, _s, _f), v in zip(self.pfields, key)
                    ]
                    if self.pfields
                    else []
                )
                rel = os.path.join(
                    self.rel_dir, *parts,
                    f"part-{pid:05d}-{tid}-{seq}.parquet",
                )
                path = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                pq.write_table(tbl, path, compression="snappy")
                if self.bloom_cols:
                    _build_sidecar(
                        self.root, rel, self.bloom_cols, self.bloom_bits
                    )
                fp = (
                    {n: v for (n, _s, _f), v in zip(self.pfields, key)}
                    if self.pfields
                    else None
                )
                entries.append((rel, _footer_stats(path, self.stats_cols), fp))
                bufs[key] = [[], 0]

            def _add(key, piece):
                buf = bufs.setdefault(key, [[], 0])
                while piece.num_rows:
                    take = (
                        min(piece.num_rows, self.max_rpf - buf[1])
                        if self.max_rpf
                        else piece.num_rows
                    )
                    buf[0].append(piece.slice(0, take))
                    buf[1] += take
                    piece = piece.slice(take)
                    if self.max_rpf and buf[1] >= self.max_rpf:
                        _flush(key)
                        buf = bufs[key]

            for batch in it:
                if not self.pfields:
                    _add((), batch)
                    continue
                cols = [
                    batch.column(batch.schema.get_field_index(src)).to_pylist()
                    for _n, src, _f in self.pfields
                ]
                groups: dict = {}
                for i in range(batch.num_rows):
                    k = tuple(
                        f(c[i])
                        for (_n2, _s2, f), c in zip(self.pfields, cols)
                    )
                    groups.setdefault(k, []).append(i)
                if len(groups) == 1:
                    _add(next(iter(groups)), batch)
                else:
                    for k, idxs in groups.items():
                        _add(k, batch.take(pa.array(idxs, type=pa.int64())))
            for key in list(bufs):
                _flush(key)
            return WriteMessage(entries)

        # -------- driver side
        def _gather(self, messages):
            return [
                e
                for m in messages
                if m is not None
                for e in getattr(m, "entries", [])
            ]

        def _discard(self, entries) -> None:
            for e in entries:
                rel = e[0]
                for p in (
                    os.path.join(self.root, rel),
                    os.path.join(self.root, rel + ".bloom"),
                ):
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
            dirs: set = set()
            for e in entries:  # hive layout nests: collect every level
                d = os.path.dirname(e[0])
                while d and d != "data":
                    dirs.add(d)
                    d = os.path.dirname(d)
            for d in sorted(dirs, reverse=True):  # deepest first
                try:
                    os.rmdir(os.path.join(self.root, d))
                except OSError:
                    pass

        def _commit_files(self, entries, epoch_id=None) -> None:
            import tempfile as _tf
            import time as _time

            files = [e[0] for e in entries]
            stats = {e[0]: e[1] for e in entries}
            new_fp = {e[0]: e[2] for e in entries if len(e) > 2 and e[2]}
            mode = "overwrite" if self.overwrite else "append"
            mdir = os.path.join(self.root, "_manifests")
            os.makedirs(mdir, exist_ok=True)
            # OCC livelock bound, same constant as snapshot.commit
            for _attempt in range(50):
                vs = _versions(mdir)
                head = vs[-1] if vs else None
                if mode == "overwrite" and head != self.head_at_plan:
                    self._discard(entries)
                    raise ValueError(
                        "kdis_snapshot: overwrite lost the version race (a "
                        "concurrent commit landed after this write was "
                        "planned) — overwrites never auto-rebase; recompute "
                        "from the new head"
                    )
                prev_files: list = []
                prev_stats: dict = {}
                prev_fp: dict = {}
                dv: list = []
                extras: dict = {}
                if head is not None:
                    m = _manifest(mdir, head)
                    if (
                        epoch_id is not None
                        and m.get("epoch_id") == epoch_id
                    ):
                        # restarted stream replaying its last committed
                        # micro-batch: the version is already published —
                        # drop this attempt's files, keep exactly-once
                        self._discard(entries)
                        return
                    if m.get("partition_spec") != self.spec_at_plan:
                        # spec evolution landed under this write: the
                        # tuples were computed under the OLD spec —
                        # recording them would mis-prune under the new
                        self._discard(entries)
                        raise ValueError(
                            "kdis_snapshot: the table's partition spec "
                            "changed under this write (concurrent "
                            "set_partition_spec) — the files were "
                            "discarded; re-run against the new head"
                        )
                    committed_schema = m["schema"]
                    expected = (
                        self.base_schema_json
                        if self.base_schema_json is not None
                        else self.schema_json
                    )
                    if committed_schema != expected:
                        self._discard(entries)
                        raise ValueError(
                            "kdis_snapshot: the table schema changed under "
                            "this write (concurrent evolution) — the files "
                            "were discarded; re-run the write against the "
                            "new head"
                        )
                    if mode == "append":
                        prev_files = m["files"]
                        prev_stats = m.get("stats", {})
                        prev_fp = m.get("file_partitions", {})
                        dv = m.get("dv_files", [])
                    extras = {
                        k: m[k]
                        for k in (
                            "dropped_ids",
                            "tombstone_files",
                            "partition_spec",
                        )
                        if m.get(k)
                    }
                version = (head or 0) + 1
                manifest = {
                    "version": version,
                    "base": head,
                    "mode": mode,
                    "schema": self.schema_json,
                    "files": prev_files + files,
                    "committed_at_ms": int(_time.time() * 1000),
                    **extras,
                }
                all_stats = {
                    **{f: prev_stats[f] for f in prev_files if f in prev_stats},
                    **stats,
                }
                if all_stats:
                    manifest["stats"] = all_stats
                fp = {f: prev_fp[f] for f in prev_files if f in prev_fp}
                fp.update(new_fp)
                if fp:
                    manifest["file_partitions"] = fp
                if dv:
                    manifest["dv_files"] = dv
                if self.spec_at_plan and "partition_spec" not in manifest:
                    # fresh table born partitioned through the writer
                    manifest["partition_spec"] = self.spec_at_plan
                if epoch_id is not None:
                    manifest["epoch_id"] = epoch_id
                full_json = json.dumps(manifest)
                payload = full_json
                # delta-encode against the head on SnapshotTable's own
                # cadence (full checkpoint every 25 versions) so chain
                # walks stay bounded and appends stay O(commit)
                if head is not None and version % 25 != 0:
                    d = _encode_delta(manifest, m)
                    if d is not None:
                        dj = json.dumps(d)
                        if len(dj) < 0.6 * len(full_json):
                            payload = dj
                fd, tmp = _tf.mkstemp(dir=mdir, suffix=".tmp")
                try:
                    with os.fdopen(fd, "w") as f:
                        f.write(payload)
                    try:
                        os.link(tmp, os.path.join(mdir, f"v{version}.json"))
                        return
                    except FileExistsError:
                        if mode != "append":
                            self._discard(entries)
                            raise ValueError(
                                "kdis_snapshot: overwrite lost the version "
                                "race (a concurrent commit landed first) — "
                                "overwrites never auto-rebase; recompute "
                                "from the new head"
                            ) from None
                finally:
                    os.unlink(tmp)
            raise ValueError(
                "kdis_snapshot: append lost the version race 50 times — "
                "sustained contention; batch the writers"
            )

    class SnapshotBatchWriter(_WriterCore, DataSourceArrowWriter):
        def commit(self, messages):
            self._commit_files(self._gather(messages))

        def abort(self, messages):
            self._discard(self._gather(messages))

    class SnapshotStreamWriter(_WriterCore, DataSourceStreamArrowWriter):
        """Append-only streaming sink: each micro-batch publishes one
        snapshot version stamped with its epoch id, and a replayed
        batch after restart is skipped — idempotent per-epoch, the
        same replay contract as SnapshotCommitSink. Replay detection
        scans the epoch ids of ALL committed manifests (exactly
        snapshot.SnapshotCommitSink.committed_epochs — epoch_id is
        stored verbatim even in delta-form manifests, so raw reads
        suffice), NOT just the head: a foreign append landing between
        a stream crash and the restart replay buries the replayed
        epoch's version below the head, and a head-only check would
        commit the batch twice (ADVICE r9/r10). The scan is
        incremental per writer instance — versions at or below the
        last scanned floor are never re-read, so a long-running stream
        stays O(new versions) per batch, not O(versions²)."""

        def _replayed(self, batch_id) -> bool:
            mdir = os.path.join(self.root, "_manifests")
            seen = getattr(self, "_seen_epochs", None)
            floor = getattr(self, "_scan_floor", 0)
            if seen is None:
                seen = set()
            for v in _versions(mdir):
                if v <= floor:
                    continue
                e = _read_raw(mdir, v).get("epoch_id")
                if e is not None:
                    seen.add(e)
                floor = max(floor, v)
            self._seen_epochs, self._scan_floor = seen, floor
            return batch_id in seen

        def commit(self, messages, batchId):
            if self._replayed(batchId):
                self._discard(self._gather(messages))
                return
            self._commit_files(self._gather(messages), epoch_id=batchId)

        def abort(self, messages, batchId):
            self._discard(self._gather(messages))

    class SnapshotBatchDataSource(DataSource):
        """``spark.read.format("kdis_snapshot").option("path", root)
        [.option("version", n)].load()`` — pushdown-pruned batch scan
        of one snapshot. Schema comes from the requested version's
        manifest (head by default)."""

        @classmethod
        def name(cls) -> str:
            return "kdis_snapshot"

        def _manifest_schema_json(self) -> str:
            root = _localize(self.options.get("path", ""))
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

        def writer(self, schema, overwrite):
            return SnapshotBatchWriter(self.options, schema, overwrite)

        def streamWriter(self, schema, overwrite):
            if overwrite:
                raise ValueError(
                    "kdis_snapshot: the streaming sink is append-only "
                    "(one snapshot version per micro-batch); complete/"
                    "update output modes are not supported"
                )
            return SnapshotStreamWriter(self.options, schema, overwrite)

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
