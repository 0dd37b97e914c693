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

Row-level mutation comes in BOTH lakehouse strategies:

* **Copy-on-write** (:meth:`SnapshotTable.delete_where` /
  :meth:`merge_rows`): only the files that actually contain affected
  rows are rewritten; every untouched file is carried into the new
  manifest by reference. A delete hitting 0.1 % of files rewrites
  0.1 % of the table; old versions stay queryable (time travel over
  the mutation); a concurrent committer loses the version race
  cleanly.
* **Merge-on-read** (``delete_where(mode='mor')``): a DELETION VECTOR
  sidecar of (file-key, row position) pairs — O(matched rows) written,
  ZERO data files touched — with reads paying a broadcast anti-join on
  the scan's ``_metadata`` (file, row_index) identity until
  ``compact()`` materializes the deletes and drops the vectors. The
  classic write-cheap/read-cost tradeoff (Delta DVs / Iceberg
  positional deletes), including its GDPR caveat: the bytes stay on
  disk until compaction + vacuum.

``row_changes`` derives the exact row-level diff (inserts + deletes)
of any version range from the file-list diff PLUS the deletion-vector
diff — O(touched files), never O(table), across both strategies.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


_MAX_COMMIT_REBASE = 50  # OCC livelock bound: each loss means another
# writer made progress, so 50 losses = genuinely pathological contention


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first — re-read the head
    and retry (optimistic concurrency, Iceberg-style)."""


def _file_key3():
    """Relocation-proof identity of a data file inside its table: the
    last three path components (``data/c{N}-{suffix}/{part file}`` —
    the commit dir is unique per attempt, so the triple is unique
    within the table and survives the table root moving). Used to bind
    merge-on-read deletion vectors to rows: DV rows store
    (k3, row position) as reported by the scan's ``_metadata``
    columns, so the read-side anti-join needs no path normalization."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        "/", F.slice(F.split(F.col("_metadata.file_path"), "/"), -3, 3)
    )


class SchemaEvolutionError(ValueError):
    """An append changed an existing column's TYPE. Adding columns is
    schema evolution; changing a type silently corrupts every reader —
    rejected at commit time, the only place it can be caught cheaply."""


FIELD_ID_KEY = "parquet.field.id"


def _ids_of(struct: "T.StructType") -> dict[str, int]:
    """name → field id for fields carrying one (empty = legacy table)."""
    return {
        f.name: f.metadata[FIELD_ID_KEY]
        for f in struct.fields
        if f.metadata and FIELD_ID_KEY in f.metadata
    }


def _fresh_schema_json(schema: "T.StructType") -> str:
    """Schema for a NEW table: every field gets a fresh parquet field
    id (1..n) in its metadata. The id — not the name — is a column's
    identity from here on: Spark's native parquet field-id resolution
    (``spark.sql.parquet.fieldId.{write,read}.enabled``) reads old
    files through renames and refuses to resurrect dropped-then-readded
    names, exactly the Iceberg column-mapping contract."""
    fields = [
        T.StructField(
            f.name, f.dataType, f.nullable, {**(f.metadata or {}), FIELD_ID_KEY: i + 1}
        )
        for i, f in enumerate(schema.fields)
    ]
    return T.StructType(fields).json()


def _next_field_id(prev_m: dict, live: dict[str, int]) -> int:
    """Never reuse an id: max over live ids AND the tombstoned
    dropped ids carried in the manifest."""
    return max([*live.values(), *prev_m.get("dropped_ids", []), 0]) + 1


#: manifest keys the commit protocol itself owns — caller-supplied
#: ``manifest_extra`` entries may not shadow them (a shadowed
#: ``epoch_id`` would silently corrupt replay detection)
_RESERVED_MANIFEST_KEYS = frozenset(
    {
        "version", "base", "mode", "schema", "files", "epoch_id",
        "rewrite_only", "partition_spec", "file_partitions", "dv_files",
        "committed_at_ms", "dropped_ids", "stats", "tombstones",
        "staged_from", "add_files",
    }
)


def _obs_metric(obs, name: str, fallback):
    """Read one metric off a batch :class:`Observation`, tolerating the
    optimizer having REMOVED the CollectMetrics node: when the observed
    subtree is provably empty (PropagateEmptyRelation — e.g. a pruned
    scan of a fully-deleted partition) the metrics row comes back
    schema-less/empty and PySpark's conversion raises. ``fallback`` is
    then consulted — on that path the underlying plan is an empty
    relation, so the extra job is instant; on any other miss it simply
    recomputes the exact value."""
    try:
        return obs.get[name]
    except Exception:
        return fallback()


def _align_to(df: DataFrame, merged_schema: "T.StructType") -> DataFrame:
    """Project ``df`` onto the merged commit schema: missing columns
    NULL-fill, present columns cast ONLY on a real type difference —
    Spark has no cast for some complex types even to themselves (e.g.
    map<long,binary> → map<long,binary> raises
    CAST_WITHOUT_SUGGESTION), and nullability-only differences need
    none. Shared by every DML post-image writer (merge / replace /
    apply_changes)."""
    from pyspark.sql import functions as F

    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in merged_schema.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name].simpleString() == f.dataType.simpleString():
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _check_manifest_extra(extra: dict | None) -> dict:
    """Validate caller-supplied manifest metadata: JSON-serializable,
    never shadowing a protocol-owned key. Returns a defensive copy."""
    if not extra:
        return {}
    clash = set(extra) & _RESERVED_MANIFEST_KEYS
    if clash:
        raise ValueError(
            f"manifest_extra may not shadow protocol-owned manifest "
            f"keys: {sorted(clash)!r}"
        )
    json.dumps(extra)  # fail fast, not at publish time
    return dict(extra)


def _schema_extras(prev_m: dict) -> dict:
    """Manifest keys every commit must carry forward: field-id
    tombstones (dropped_ids) and CDC delete tombstones
    (tombstone_files) — both are retention state that would silently
    re-open correctness holes if a commit dropped them."""
    out: dict = {}
    if prev_m.get("dropped_ids"):
        out["dropped_ids"] = prev_m["dropped_ids"]
    if prev_m.get("tombstone_files"):
        out["tombstone_files"] = prev_m["tombstone_files"]
    return out


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_PARTITION_DIR_PREFIX = "__p_"
# Integral types whose partition values are stored as JSON ints; every
# other supported type is stored as its canonical string form. Float
# partition columns are refused outright (path-encoding a float is
# lossy and equality-partitioning on one is a modeling bug).
_INT_PARTITION_TYPES = ("tinyint", "smallint", "int", "bigint")
_BANNED_PARTITION_TYPES = ("float", "double")


def _canon_pv(value, dtype) -> "int | bool | str | None":
    """Canonical manifest/comparison form of a partition value — the
    SAME function canonicalizes values parsed from hive directory
    fragments and values supplied by a caller's partition filter, so
    pruning compares like with like. Integral types become ints,
    boolean a bool, everything else (string, date, decimal, timestamp)
    its string form."""
    if value is None:
        return None
    t = dtype.simpleString()
    if t in _INT_PARTITION_TYPES:
        return int(value)
    if t == "boolean":
        if isinstance(value, str):
            return value.lower() == "true"
        return bool(value)
    return str(value)


class Between:
    """Inclusive range value for partition filters
    (``{"o_orderdate": Between("1995-01-01", "1995-03-31")}``). Maps
    through ORDER-PRESERVING partition transforms (identity, year,
    month, day, truncate) to a range over partition values; a bucket
    transform is not order-preserving, so a Between on its source
    column prunes nothing (the exact re-filter still applies)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Between({self.lo!r}, {self.hi!r})"


# spec-entry syntax: a bare column name (identity), or
# year(col) / month(col) / day(col) / bucket(N, col) / truncate(W, col)
_TRANSFORM_ENTRY_RE = re.compile(
    r"^\s*(year|month|day|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)
# partition FIELD names are self-describing (`c`, `c_year`, `c_month`,
# `c_day`, `c_bucket<N>`, `c_truncate<W>`): pruning can decode the
# transform of any recorded tuple key without knowing which (possibly
# since-evolved) spec wrote the file
_FIELD_NAME_RE = re.compile(
    r"^(?:(.+)_(year|month|day)|(.+)_(bucket|truncate)(\d+))$"
)


class _PartitionField:
    """One parsed partition-spec entry: a (transform, source column)
    pair with Iceberg-style HIDDEN partitioning semantics — callers
    filter on the SOURCE column; the engine maps values through the
    transform on both the write path (Spark expression) and the
    pruning path (driver-side Python on filter literals). The two
    sides must agree exactly; ``bucket`` uses CRC-32 over Spark's
    string cast of the value precisely because both the JVM
    (``F.crc32``) and Python (``zlib.crc32``) implement the same
    public polynomial."""

    __slots__ = ("entry", "source", "transform", "param", "name")

    def __init__(self, entry: str, source: str, transform: str, param):
        self.entry = entry
        self.source = source
        self.transform = transform
        self.param = param
        self.name = (
            source
            if transform == "identity"
            else f"{source}_{transform}{param if param is not None else ''}"
        )

    @property
    def order_preserving(self) -> bool:
        return self.transform != "bucket"

    def spark_expr(self, dtype):
        """Column computing this field's partition value (write path)."""
        from pyspark.sql import functions as F

        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t == "year":
            return F.year(c)
        if t == "month":
            return F.date_format(c, "yyyy-MM")
        if t == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if t == "bucket":
            return F.pmod(
                F.crc32(c.cast("string").cast("binary")), F.lit(self.param)
            )
        # truncate
        if dtype.simpleString() in _INT_PARTITION_TYPES:
            return c - F.pmod(c, F.lit(self.param))
        return F.substring(c, 1, self.param)

    def py_apply(self, value, dtype):
        """Canonical partition value of a SOURCE-column literal —
        driver-side mirror of :meth:`spark_expr`, used to map a
        caller's partition-filter values without running a job."""
        if value is None:
            return None
        t = self.transform
        if t == "identity":
            return _canon_pv(value, dtype)
        s = str(value)
        if t == "year":
            return int(s[:4])
        if t == "month":
            return s[:7]
        if t == "day":
            return s[:10]
        if t == "bucket":
            return zlib.crc32(s.encode("utf-8")) % self.param
        if dtype.simpleString() in _INT_PARTITION_TYPES:
            v = int(value)
            return v - (v % self.param)
        return s[: self.param]

    def canon_result(self, raw: str, dtype):
        """Canonical form of a hive-dir-parsed partition value."""
        t = self.transform
        if t == "identity":
            return _canon_pv(raw, dtype)
        if t in ("year", "bucket"):
            return int(raw)
        if t == "truncate" and dtype.simpleString() in _INT_PARTITION_TYPES:
            return int(raw)
        return str(raw)


def _parse_spec_entry(entry: str) -> _PartitionField:
    m = _TRANSFORM_ENTRY_RE.match(entry)
    if m is None:
        return _PartitionField(entry.strip(), entry.strip(), "identity", None)
    t, param, col = m.group(1), m.group(2), m.group(3)
    if t in ("bucket", "truncate"):
        if param is None:
            raise ValueError(
                f"partition transform {t}() needs a width: {t}(N, {col})"
            )
        p = int(param)
        if p <= 0:
            raise ValueError(f"partition transform {t}({param}, {col}): N > 0")
    else:
        if param is not None:
            raise ValueError(f"partition transform {t}() takes one column")
        p = None
    canon = f"{t}({str(p) + ', ' if p is not None else ''}{col})"
    return _PartitionField(canon, col, t, p)


def _field_from_entry_key(key: str, types: dict) -> "_PartitionField | None":
    """Decode a recorded partition-tuple KEY back into its field.
    Identity wins on a literal column-name match (a column named
    ``x_month`` is just a column); otherwise the self-describing
    suffix identifies transform + param. Returns None for keys whose
    source column no longer exists (dropped since) — callers skip
    those keys, i.e. treat the file conservatively."""
    if key in types:
        return _PartitionField(key, key, "identity", None)
    m = _FIELD_NAME_RE.match(key)
    if m is None:
        return None
    if m.group(1) is not None:
        src, t, p = m.group(1), m.group(2), None
    else:
        src, t, p = m.group(3), m.group(4), int(m.group(5))
    if src not in types:
        return None
    canon = f"{t}({str(p) + ', ' if p is not None else ''}{src})"
    return _PartitionField(canon, src, t, p)


_DATEISH_TYPES = ("date", "timestamp", "timestamp_ntz")


def _validate_spec(spec: list[str], types: dict) -> "list[_PartitionField]":
    """Parse + validate a spec against the table schema; returns the
    parsed fields. Shared by table creation, commit-time writes, and
    set_partition_spec so the rules can't drift."""
    fields = [_parse_spec_entry(e) for e in spec]
    for f in fields:
        if f.source not in types:
            raise KeyError(
                f"partition spec {f.entry!r}: no column {f.source!r} "
                f"(have {sorted(types)})"
            )
        t = types[f.source].simpleString()
        if f.transform == "identity":
            if t in _BANNED_PARTITION_TYPES:
                raise ValueError(
                    f"partition column {f.source!r} is {t} — float "
                    f"partition values are lossy in hive paths; "
                    f"partition on an int/string/date/bool column instead"
                )
        elif f.transform in ("year", "month", "day"):
            if t not in _DATEISH_TYPES:
                raise ValueError(
                    f"partition transform {f.entry!r}: source must be "
                    f"date/timestamp, got {t}"
                )
        elif f.transform == "bucket":
            if t not in _INT_PARTITION_TYPES and t not in ("string", "date"):
                raise ValueError(
                    f"partition transform {f.entry!r}: bucket source "
                    f"must be int/string/date, got {t} (the JVM and "
                    f"driver-side hash must agree on the value's "
                    f"string form)"
                )
        elif f.transform == "truncate":
            if t not in _INT_PARTITION_TYPES and t != "string":
                raise ValueError(
                    f"partition transform {f.entry!r}: truncate source "
                    f"must be int/string, got {t}"
                )
        if f.transform != "identity" and f.name in types:
            raise ValueError(
                f"partition field name {f.name!r} collides with an "
                f"existing column — rename one"
            )
    names = [f.name for f in fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate partition fields in spec: {spec}")
    return fields


def _file_partition_values(
    relpath: str, spec: list[str], struct: "T.StructType"
) -> dict | None:
    """Typed partition values of one data file, parsed from the
    ``__p_<field>=<hive-encoded value>`` fragments of its root-relative
    path, keyed by partition FIELD name. Returns None when any spec
    field is absent (a file written under a different spec) — callers
    treat such files conservatively."""
    from urllib.parse import unquote

    fields = [_parse_spec_entry(e) for e in spec]
    types = {f.name: f.dataType for f in struct.fields}
    by_name = {f.name: f for f in fields}
    found: dict = {}
    for frag in relpath.split(os.sep):
        if frag.startswith(_PARTITION_DIR_PREFIX) and "=" in frag:
            name, _, raw = frag.partition("=")
            pname = name[len(_PARTITION_DIR_PREFIX):]
            pf = by_name.get(pname)
            if pf is not None and pf.source in types:
                found[pname] = (
                    None if raw == _HIVE_NULL
                    else pf.canon_result(unquote(raw), types[pf.source])
                )
    if set(found) != set(by_name):
        return None
    return found


# ---------------------------------------------------------------------------
# Delta-encoded manifests (metadata O(delta) per commit).
#
# A full manifest re-lists every live file with its stats and partition
# tuple — O(table) JSON per commit. At 100 TB (~1M files) that is the
# real metadata wall: a streaming CDC sink committing every 10 s would
# write gigabytes of identical file lists per hour. Iceberg solves this
# with manifest-list indirection, Delta with a JSON action log +
# periodic parquet checkpoints; this format takes the Delta shape:
# a commit whose change is small relative to the table is stored as a
# DELTA against the previous version (add/remove file lists, upsert/
# unset stats and partition-tuple entries, every small field verbatim),
# and every `_CHECKPOINT_EVERY`-th version — or any commit whose delta
# would not be materially smaller (overwrites, renames that remap every
# per-file entry) — is stored FULL, bounding reconstruction to a short
# walk. `manifest()` reconstructs transparently, so every planner /
# DML / CDC / time-travel path is unchanged; the streaming changes
# source reads the delta's `files_add` directly (the diff it previously
# recomputed). Deltas carry `committed_at_ms`, `schema`, `mode`,
# `base`, `epoch_id`, `rewrite_only` verbatim, so raw-JSON consumers of
# those fields never reconstruct at all.
# ---------------------------------------------------------------------------

_DELTA_LIST_KEYS = ("files", "dv_files", "tombstone_files")
_DELTA_MAP_KEYS = ("stats", "file_partitions")
_DELTA_COLL_SUFFIXES = ("_add", "_remove", "_set", "_unset")
_CHECKPOINT_EVERY = 25  # full manifest at least this often


def _encode_manifest_delta(full: dict, parent: dict) -> "dict | None":
    """``full`` re-expressed as a delta against ``parent`` (the
    previous VERSION — a storage encoding, independent of the `base`
    lineage field). Returns None when the encoding cannot reproduce
    ``full`` exactly (file-list reordering), signalling the caller to
    store the full form."""
    delta = {
        k: v
        for k, v in full.items()
        if k not in _DELTA_LIST_KEYS and k not in _DELTA_MAP_KEYS
    }
    delta["delta_of"] = parent["version"]
    present = [
        k
        for k in (*_DELTA_LIST_KEYS, *_DELTA_MAP_KEYS)
        if k in full and not full[k]
    ]
    if present:
        # exact reproduction: a key present-but-empty in the full form
        # must come back present-but-empty
        delta["empty_keys"] = present
    for k in _DELTA_LIST_KEYS:
        new, old = full.get(k, []), parent.get(k, [])
        new_set, old_set = set(new), set(old)
        add = [f for f in new if f not in old_set]
        rem = [f for f in old if f not in new_set]
        if [f for f in old if f in new_set] + add != new:
            return None  # order not parent-kept-then-added
        if add:
            delta[k + "_add"] = add
        if rem:
            delta[k + "_remove"] = rem
    for k in _DELTA_MAP_KEYS:
        new, old = full.get(k, {}), parent.get(k, {})
        upsert = {f: v for f, v in new.items() if f not in old or old[f] != v}
        unset = [f for f in old if f not in new]
        if upsert:
            delta[k + "_set"] = upsert
        if unset:
            delta[k + "_unset"] = unset
    return delta


def _apply_manifest_delta(parent: dict, delta: dict) -> dict:
    """Inverse of :func:`_encode_manifest_delta`: the full manifest."""
    full = {
        k: v
        for k, v in delta.items()
        if k not in ("delta_of", "empty_keys")
        and not any(
            k == base + suf
            for base in (*_DELTA_LIST_KEYS, *_DELTA_MAP_KEYS)
            for suf in _DELTA_COLL_SUFFIXES
        )
    }
    empty = set(delta.get("empty_keys", []))
    for k in _DELTA_LIST_KEYS:
        rem = set(delta.get(k + "_remove", []))
        out = [f for f in parent.get(k, []) if f not in rem]
        out += delta.get(k + "_add", [])
        if out or k in empty:
            full[k] = out
    for k in _DELTA_MAP_KEYS:
        base = dict(parent.get(k, {}))
        for f in delta.get(k + "_unset", []):
            base.pop(f, None)
        base.update(delta.get(k + "_set", {}))
        if base or k in empty:
            full[k] = base
    return full


def _overwrite_schema(
    prev_m: dict, new_schema: "T.StructType"
) -> tuple[str, dict]:
    """Schema for an overwrite commit on an EXISTING table: the new
    field LIST wins (an overwrite may reshape the table), but on a
    field-id table each same-name same-type column keeps its id (a
    compaction/optimize round-trip must not change column identity),
    any other column gets a fresh id, and ids of columns the overwrite
    dropped are tombstoned so a later re-add can never resurrect them.
    Returns (schema_json, manifest_extras)."""
    prev = T.StructType.fromJson(json.loads(prev_m["schema"]))
    ids = _ids_of(prev)
    if not ids:
        # Legacy (pre-field-id) table: an overwrite rewrites EVERY live
        # file, so this is the one safe point to upgrade — mint fresh
        # ids for the whole schema (rename/drop work from here on).
        return _fresh_schema_json(new_schema), _schema_extras(prev_m)
    by_name = {f.name: f for f in prev.fields}
    next_id = _next_field_id(prev_m, ids)
    fields = []
    used: set[int] = set()
    for f in new_schema.fields:
        pf = by_name.get(f.name)
        meta = dict(f.metadata or {})
        meta.pop(FIELD_ID_KEY, None)
        if pf is not None and pf.dataType == f.dataType and f.name in ids:
            meta[FIELD_ID_KEY] = ids[f.name]
        else:
            meta[FIELD_ID_KEY] = next_id
            next_id += 1
        used.add(meta[FIELD_ID_KEY])
        fields.append(T.StructField(f.name, f.dataType, f.nullable, meta))
    dropped = sorted(
        set(prev_m.get("dropped_ids", []))
        | {i for i in ids.values() if i not in used}
    )
    extras = _schema_extras(prev_m)
    if dropped:
        extras["dropped_ids"] = dropped
    return T.StructType(fields).json(), extras


# Safe widening promotions (Iceberg's type-promotion set): the parquet
# reader decodes a narrow physical column under the wider requested
# type natively, so files written before OR after the widening read
# correctly under the widened manifest schema. Keys are simpleString.
_WIDEN_CHAINS = (
    ["tinyint", "smallint", "int", "bigint"],
    ["float", "double"],
)


def _wider_type(a: "T.DataType", b: "T.DataType") -> "T.DataType | None":
    """The wider of two types if one safely widens to the other, the
    common type if equal, else None (a real type CHANGE)."""
    if a == b:
        return a
    an, bn = a.simpleString(), b.simpleString()
    for chain in _WIDEN_CHAINS:
        if an in chain and bn in chain:
            return a if chain.index(an) >= chain.index(bn) else b
    return None


def _merge_schema(prev_m: dict | str, new_schema: "T.StructType") -> str:
    """Additive schema evolution for append commits: the manifest
    schema is previous fields + any NEW fields, in stable order. Old
    data files simply lack the new columns — Spark fills NULL when the
    read supplies the manifest schema — and new files may omit old
    columns the writer dropped (also NULL). Same-name SAFE WIDENING
    (tinyint→smallint→int→bigint, float→double) adopts the wider type
    — the scan decodes narrow files under the wide schema natively, in
    either commit order — while any other type change is refused. On a
    field-id table (accepting the MANIFEST dict so the dropped-id
    tombstones are visible), new fields get fresh ids that no live or
    dropped column ever used; a widened column keeps its id (same
    identity)."""
    prev_manifest = prev_m if isinstance(prev_m, dict) else {"schema": prev_m}
    prev = T.StructType.fromJson(json.loads(prev_manifest["schema"]))
    by_name = {f.name: f for f in prev.fields}
    ids = _ids_of(prev)
    next_id = _next_field_id(prev_manifest, ids)
    merged = list(prev.fields)
    for f in new_schema.fields:
        if f.name in by_name:
            pf = by_name[f.name]
            w = _wider_type(pf.dataType, f.dataType)
            if w is None:
                raise SchemaEvolutionError(
                    f"column {f.name!r}: {pf.dataType.simpleString()} "
                    f"-> {f.dataType.simpleString()} is a type CHANGE, not evolution"
                )
            if w != pf.dataType:  # widen in place, keep identity/metadata
                merged[merged.index(pf)] = T.StructField(
                    pf.name, w, pf.nullable, pf.metadata
                )
        else:
            meta = dict(f.metadata or {})
            meta.pop(FIELD_ID_KEY, None)
            if ids:  # id-table: stamp the newcomer
                meta[FIELD_ID_KEY] = next_id
                next_id += 1
            merged.append(
                T.StructField(f.name, f.dataType, f.nullable, meta or None)
            )
    return T.StructType(merged).json()


def _with_field_ids(df: DataFrame, schema_json: str) -> DataFrame:
    """Stamp the manifest's field ids onto ``df``'s columns (metadata
    alias) so the parquet writer records them in the footer. A no-op on
    legacy (id-less) schemas. Extra bookkeeping columns not in the
    schema pass through unstamped.

    (Round 15 note: ``DataFrame.to(struct)`` looked like a one-call
    replacement for this loop — its RESULT SCHEMA even shows the
    metadata — but the parquet writer then records NO field ids in the
    footers: the reconciliation drops the metadata from the physical
    attributes. Verified empirically; keep the alias loop.)"""
    from pyspark.sql import functions as F

    struct = T.StructType.fromJson(json.loads(schema_json))
    meta = {
        f.name: dict(f.metadata)
        for f in struct.fields
        if f.metadata and FIELD_ID_KEY in f.metadata
    }
    if not meta:
        return df
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    return df.select(
        *[
            F.col(c).alias(c, metadata=meta[c]) if c in meta else F.col(c)
            for c in df.columns
        ]
    )


def _strip_field_ids(df: DataFrame, schema: "T.StructType | None" = None) -> DataFrame:
    """Remove the internal ``parquet.field.id`` metadata from a user-
    facing DataFrame (one metadata-only Project; the id-resolved scan
    underneath is untouched) — field ids are a storage detail, not part
    of the table's logical schema. Callers that already hold the scan's
    StructType (every manifest-driven read does) pass it so the probe
    and the alias list come from Python-side metadata instead of
    ``df.schema``, which forces an eager analyzer pass per read."""
    from pyspark.sql import functions as F

    fields = (schema if schema is not None else df.schema).fields
    if not any(f.metadata and FIELD_ID_KEY in f.metadata for f in fields):
        return df
    return df.select(
        *[F.col(f.name).alias(f.name, metadata={}) for f in fields]
    )


def _ensure_fieldid_read(spark: SparkSession, schema: "T.StructType") -> None:
    """Foreign-session conf guard: id-resolved reads need
    ``spark.sql.parquet.fieldId.read.enabled``. Only flipped when the
    requested schema actually carries ids; schemas without ids resolve
    by name exactly as before, so the session-wide setting is inert for
    every other read."""
    if any(f.metadata and FIELD_ID_KEY in f.metadata for f in schema.fields):
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")


class SnapshotTable:
    """A versioned parquet table rooted at ``root``.

    Layout::

        <root>/data/c{N}/part-*.parquet   immutable files of commit N
        <root>/_manifests/v{N}.json       {version, mode, schema, files}

    **Partitioning** (``partition_by=['col', ...]``): data files land
    in hive-style subdirectories
    (``data/c{N}-*/__p_field=value/part-*.parquet``) and the manifest
    records the spec (``partition_spec``) plus each file's typed
    partition tuple (``file_partitions``), so partition-pruned
    planning — :meth:`read_partition`, ``delete_where(partition_
    filter=...)``, :meth:`apply_changes` candidate selection — is a
    pure MANIFEST operation: whole partitions are skipped without
    listing, footer-fetching, or scheduling their files. Unlike
    Spark's plain ``partitionBy``, the partition columns are ALSO kept
    in the data files (the Iceberg choice, not Delta's path-only one):
    every existing read path works unchanged, and **partition
    evolution** falls out — :meth:`set_partition_spec` changes the
    layout of FUTURE files only, mixed-spec versions read fine, and
    pruning treats old-spec files (no manifest entry under the new
    spec) conservatively. At 100 TB this is the difference between a
    time-partitioned fact table consulting O(partitions-touched)
    manifest entries and consulting a million file footers.

    **Partition transforms** (Iceberg-style HIDDEN partitioning): a
    spec entry is a bare column (identity) or ``year(col)`` /
    ``month(col)`` / ``day(col)`` (date/timestamp sources),
    ``bucket(N, col)`` (CRC-32 mod N — int/string/date sources), or
    ``truncate(W, col)`` (int width / string prefix). Callers always
    filter on the SOURCE column (values or :class:`Between` ranges);
    pruning maps the literals through the transform driver-side and
    compares against the recorded tuples, whose self-describing field
    names (``col_month``, ``col_bucket8``) decode independently of
    the active spec — so evolution between transforms stays
    prune-correct with no spec-id bookkeeping. ``Between`` prunes
    through every order-preserving transform; ``bucket`` prunes
    equality/IN only. The 100 TB norm — ``month(event_ts)`` fact
    tables, ``bucket(N, key)`` CDC targets — plans this way without
    the query ever naming a partition value.
    """

    def __init__(
        self,
        root: str,
        partition_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 65536,
    ):
        self.root = root
        self._mdir = os.path.join(root, "_manifests")
        # Bloom SIDECARS (Iceberg-puffin shape): with ``bloom_cols``,
        # every data file write also computes a per-column bloom filter
        # over the file's values (distributed — one mapInPandas pass
        # over the just-written files) and stores it at a path derived
        # from the data file's relpath. Data files are immutable, so
        # the sidecar is too: no manifest coupling, no carrying through
        # commits, and the PROBE side (apply_changes candidate pruning,
        # read_keys) is presence-driven — a file without a sidecar is
        # conservatively kept. This is the key-scoped complement to
        # partition pruning: a CDC target NOT partitioned by the merge
        # key still skips every file whose blooms reject the whole
        # batch's key set. ``bloom_bits`` is per column per file
        # (default 64 Ki bits = 8 KiB; ~1% false positives at ~6k
        # distinct keys/file — size up for bigger files). Both sides
        # canonicalize through ``_bloom_canon`` (one string form per
        # value; timestamps normalized to UTC wall-clock on BOTH the
        # pyarrow build read and the Arrow-collected probe) for
        # int/string/date/timestamp/decimal/bool/binary keys — floats
        # are refused as bloom columns (hash-equality on floats is a
        # modeling bug, same stance as partition values). Probing is
        # planning-only: a missing/corrupt sidecar, an over-limit
        # batch key set, or a null/uncanonizable probe value all fall
        # back to "keep the file" — correctness never depends on it.
        self._bloom_cols = list(bloom_cols) if bloom_cols else None
        self._bloom_bits = int(bloom_bits)
        if self._bloom_bits <= 0 or self._bloom_bits % 8:
            # a non-multiple-of-8 would allocate bytearray(bits // 8)
            # SHORTER than the mod-bits hash positions and crash
            # executor tasks with IndexError mid-commit (ADVICE r8)
            raise ValueError(
                f"bloom_bits must be a positive multiple of 8, got "
                f"{bloom_bits!r}"
            )
        # probe observability: (kept, candidates_before) of the last
        # bloom-pruned DML discovery on this instance — test/ops hook,
        # same shape as last_apply_candidates / last_partition_counts
        self.last_bloom_pruned: "tuple | None" = None
        # Initial spec for TABLE CREATION only: once any commit exists,
        # the manifest's recorded spec wins (evolve via
        # set_partition_spec, never by re-constructing with a
        # different argument).
        self._default_spec = list(partition_by) if partition_by else None
        self._pending_file_partitions: dict = {}
        # reconstructed-manifest cache: version -> ((mtime_ns, size),
        # full-form JSON string). Strings, not dicts, so callers can
        # never mutate a cached entry; the stat token invalidates on
        # vacuum/expire deletion (version must fail loudly, not serve
        # stale) and on admin edits of the manifest file. Small cap —
        # ascending walks (history, changes) only ever need the
        # immediate parent.
        self._man_cache: dict[int, tuple] = {}
        os.makedirs(self._mdir, exist_ok=True)

    def partition_spec(self) -> list[str] | None:
        """The ACTIVE spec: the head manifest's, else the construction
        default (table not yet created)."""
        head = self.latest_version()
        if head is not None:
            return self.manifest(head).get("partition_spec")
        return list(self._default_spec) if self._default_spec else None

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

    def _read_raw_manifest(self, version: int) -> dict:
        """The version's manifest file AS STORED — full form or delta
        form. Small verbatim fields (mode, base, schema, epoch_id,
        committed_at_ms, rewrite_only, partition_spec) are identical in
        both forms; only the per-file collections need
        :meth:`manifest`'s reconstruction."""
        try:
            with open(self._manifest_path(version)) as f:
                return json.load(f)
        except FileNotFoundError:
            vs = self.versions()
            raise FileNotFoundError(
                f"snapshot table {self.root}: version {version} is not "
                f"readable — it was expired/vacuumed from the retention "
                f"window or never existed (retained versions: "
                f"{vs[0]}..{vs[-1]})" if vs else
                f"snapshot table {self.root} has no commits"
            ) from None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        cached = self._cached_manifest(version)
        if cached is not None:
            return json.loads(cached)
        # walk back through delta-encoded manifests to the nearest full
        # (or cached) form, then apply the deltas forward — bounded by
        # the checkpoint cadence
        chain: list[dict] = []
        v = version
        while True:
            raw = self._read_raw_manifest(v)
            if "delta_of" not in raw:
                full = raw
                break
            parent_v = raw["delta_of"]
            chain.append(raw)
            cached = self._cached_manifest(parent_v)
            if cached is not None:
                full = json.loads(cached)
                break
            v = parent_v
        for d in reversed(chain):
            full = _apply_manifest_delta(full, d)
        self._cache_manifest(version, json.dumps(full))
        return full

    def _stat_token(self, version: int) -> "tuple | None":
        try:
            st = os.stat(self._manifest_path(version))
        except FileNotFoundError:
            return None
        return (st.st_mtime_ns, st.st_size)

    def _cached_manifest(self, version: int) -> "str | None":
        entry = self._man_cache.get(version)
        if entry is None:
            return None
        token, payload = entry
        if self._stat_token(version) != token:
            # deleted (vacuum/expire — must fail loudly downstream) or
            # rewritten (vacuum materialize / admin edit)
            del self._man_cache[version]
            return None
        return payload

    def _cache_manifest(self, version: int, payload: str) -> None:
        token = self._stat_token(version)
        if token is None:
            return
        self._man_cache[version] = (token, payload)
        while len(self._man_cache) > 8:
            self._man_cache.pop(next(iter(self._man_cache)))

    # ----------------------------------------------------------- commits
    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        epoch_id: int | None = None,
        rewrite_only: bool = False,
        manifest_extra: dict | None = None,
    ) -> int:
        """Write ``df``'s rows as immutable files and publish the next
        version atomically. ``mode='append'`` keeps the previous file
        list; ``'overwrite'`` replaces it. ``epoch_id`` (streaming
        writers) is recorded in the manifest for replay detection.
        ``manifest_extra`` (JSON-serializable, non-protocol keys only)
        rides the SAME manifest — application bookkeeping that must be
        atomic with the data (e.g. a star-join view's applied dimension
        versions) gets the commit protocol's atomicity for free instead
        of a torn side file.
        ``rewrite_only`` marks the commit as LOGICALLY NEUTRAL (same
        rows, new layout — compaction/optimize): lineage walkers
        (``changes``, the streaming source) pass through it instead of
        resetting. Returns the new version.

        Concurrency: an APPEND that loses the version race REBASES and
        re-publishes automatically — appends commute, so two
        independent appenders both succeed and the final table is the
        union (the Iceberg/Delta retry-merge contract). The rebase is
        metadata-only: the already-written data files are re-referenced
        against the new head; only in the rare case where BOTH writers
        minted new field ids for evolved columns (id collision) is the
        data rewritten under the rebased schema. ``'overwrite'`` does
        NOT auto-rebase — a compaction/optimize overwrite re-published
        over a concurrent append would silently DELETE the appended
        rows — and raises :class:`ConcurrentCommitError`; the caller
        must recompute from the new head. Table handles are one-per-
        writer (pending-write state is instance-local): concurrent
        writers each use their own ``SnapshotTable(root)``.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        extra_keys = _check_manifest_extra(manifest_extra)
        head = self.latest_version()
        version = (head or 0) + 1 if head is not None else 1
        dv_files: list[str] = []
        prev_fp: dict = {}
        if head and mode == "append":
            prev_m = self.manifest(head)
            prev, schema_json = prev_m["files"], _merge_schema(
                prev_m, df.schema
            )
            extras = _schema_extras(prev_m)
            dv_files = prev_m.get("dv_files", [])  # MOR deletes persist
            prev_fp = prev_m.get("file_partitions", {})
        elif head:  # overwrite of an existing table
            prev = []
            schema_json, extras = _overwrite_schema(self.manifest(head), df.schema)
        else:
            prev, schema_json, extras = [], _fresh_schema_json(df.schema), {}
        spec = self.partition_spec()
        files = self._write_data(df, version, schema_json)
        pend_fp = dict(self._pending_file_partitions)
        for _attempt in range(_MAX_COMMIT_REBASE):
            manifest = {
                "version": version,
                "base": head,
                "mode": mode,
                "schema": schema_json,
                "files": prev + files,
                **extras,
            }
            if spec:
                manifest["partition_spec"] = spec
            fp = {
                **{f: prev_fp[f] for f in prev if f in prev_fp},
                **{f: pend_fp[f] for f in files if f in pend_fp},
            }
            if fp:
                manifest["file_partitions"] = fp
            if dv_files:
                manifest["dv_files"] = dv_files
            if epoch_id is not None:
                manifest["epoch_id"] = epoch_id
            if rewrite_only:
                manifest["rewrite_only"] = True
            manifest.update(extra_keys)
            try:
                self._publish(version, manifest)
                return version
            except ConcurrentCommitError:
                if mode != "append":
                    raise
                head, version, prev, schema_json, extras, dv_files, \
                    prev_fp, spec, files, pend_fp = self._rebase_append(
                        df, files, pend_fp, schema_json
                    )
        raise ConcurrentCommitError(
            f"append lost the version race {_MAX_COMMIT_REBASE} times — "
            f"sustained contention; batch the writers"
        )

    def _rebase_append(self, df, files, pend_fp, schema_json):
        """Re-derive an append's commit inputs against the NEW head
        after losing the version race. Metadata-only unless the
        concurrent winner minted field ids that collide with ours (both
        writers evolved the schema): then the data is rewritten under
        the rebased schema (the lost attempt's files stay unreferenced
        for vacuum)."""
        new_head = self.latest_version()
        new_m = self.manifest(new_head)
        new_schema_json = _merge_schema(new_m, df.schema)
        old_ids = _ids_of(T.StructType.fromJson(json.loads(schema_json)))
        new_ids = _ids_of(T.StructType.fromJson(json.loads(new_schema_json)))
        ours = set(df.columns)
        if any(
            old_ids.get(c) != new_ids.get(c)
            for c in ours
            if c in old_ids or c in new_ids
        ):
            files = self._write_data(df, new_head + 1, new_schema_json)
            pend_fp = dict(self._pending_file_partitions)
        return (
            new_head,
            new_head + 1,
            new_m["files"],
            new_schema_json,
            _schema_extras(new_m),
            new_m.get("dv_files", []),
            new_m.get("file_partitions", {}),
            new_m.get("partition_spec"),
            files,
            pend_fp,
        )

    def _write_data(
        self, df: DataFrame, version: int, schema_json: str | None = None
    ) -> list[str]:
        """Write immutable data files; returns root-relative paths.
        Uniquely-named dir per attempt so a losing concurrent writer
        never collides with the winner's files. With a field-id-bearing
        ``schema_json`` (the manifest being committed), the ids are
        stamped into the parquet footers so reads resolve columns by id
        across renames.

        Under an active partition spec the files land in hive-style
        ``__p_<col>=<value>`` subdirectories AND keep the partition
        columns in the data (written as duplicates so every existing
        read path — plain scans, meta scans, the changes stream —
        works without path reconstruction; the duplicate is a constant
        per file, so parquet RLE/dictionary encodes it to ~nothing).
        Each new file's typed partition tuple is parsed back off its
        path into ``self._pending_file_partitions`` for the manifest
        being built.

        Partitioned writes HASH-DISTRIBUTE on the spec columns first
        (Iceberg's ``write.distribution-mode=hash``): without it, an
        unclustered input fans out to one file per (task × partition
        value) — measured 2,560 files for 32 tasks × 80 months at 10×,
        a small-file explosion that poisons every later plan. With it,
        each partition value lands in exactly one task → one file
        (bounded above via ``self.max_records_per_file`` → Spark's
        ``maxRecordsPerFile`` for the 100-TB case where one partition
        exceeds a sane file size). Layout-managing callers (Z-order
        optimize) that have already arranged a spec-aware distribution
        set ``self._skip_spec_distribution`` for the next write."""
        from pyspark.sql import functions as F

        self._pending_file_partitions = {}
        spec = self.partition_spec()
        if schema_json is not None:
            df = _with_field_ids(df, schema_json)
        if spec:
            struct = (
                T.StructType.fromJson(json.loads(schema_json))
                if schema_json is not None
                else df.schema
            )
            types = {f.name: f.dataType for f in struct.fields}
            pfields = _validate_spec(spec, types)
            for pf in pfields:
                if pf.source not in df.columns:
                    raise ValueError(
                        f"partitioned write: spec column {pf.source!r} "
                        f"missing from the data (have {df.columns})"
                    )
            pcols = [f"{_PARTITION_DIR_PREFIX}{pf.name}" for pf in pfields]
            for pf, pc in zip(pfields, pcols):
                df = df.withColumn(pc, pf.spark_expr(types[pf.source]))
            if not getattr(self, "_skip_spec_distribution", False):
                # distribute on the TRANSFORMED values: one task per
                # partition value, not per source value
                df = df.repartition(*[F.col(pc) for pc in pcols])
            self._skip_spec_distribution = False
        rel_dir = None
        while rel_dir is None or os.path.exists(os.path.join(self.root, rel_dir)):
            suffix = os.path.basename(tempfile.mktemp(prefix=""))
            rel_dir = os.path.join("data", f"c{version}-{suffix}")
        # recorded so a caller that decides NOT to publish (e.g. a
        # replace that matched and inserted nothing) can drop the dir
        self._last_write_reldir = rel_dir
        out_dir = os.path.join(self.root, rel_dir)
        if spec:
            writer = df.write
            mrpf = getattr(self, "max_records_per_file", None)
            if mrpf:
                writer = writer.option("maxRecordsPerFile", int(mrpf))
            writer.partitionBy(*pcols).parquet(out_dir)
            files = sorted(
                os.path.relpath(os.path.join(dirpath, name), self.root)
                for dirpath, _dn, filenames in os.walk(out_dir)
                for name in filenames
                if name.endswith(".parquet")
            )
            self._pending_file_partitions = {
                f: pv
                for f in files
                if (pv := _file_partition_values(f, spec, struct)) is not None
            }
            self._write_bloom_sidecars(df.sparkSession, files)
            return files
        writer = df.write
        mrpf = getattr(self, "max_records_per_file", None)
        if mrpf:
            # honored on BOTH branches (previously partitioned-only):
            # bounding rows/file is what keeps per-file bloom sidecars
            # correctly sized as commits grow — bloom_bits is chosen
            # per expected keys/FILE, and an unbounded file saturates
            # its bloom into a no-op (~94% fp at 50k keys / 64Ki bits)
            writer = writer.option("maxRecordsPerFile", int(mrpf))
        writer.parquet(out_dir)
        files = sorted(
            os.path.join(rel_dir, name)
            for name in os.listdir(out_dir)
            if name.endswith(".parquet")
        )
        self._write_bloom_sidecars(df.sparkSession, files)
        return files

    def _write_bloom_sidecars(
        self, spark: SparkSession, files: list[str]
    ) -> None:
        """Build the per-file per-column bloom sidecars for just-written
        data files (see ``__init__``: Iceberg-puffin shape). No-op when
        the table has no ``bloom_cols``. Data files are immutable, so
        each sidecar is written exactly once, atomically, next to its
        file (``<file>.parquet.bloom``), and never touched by later
        commits; the probe side treats a missing sidecar as
        conservatively-keep, so a crash between data write and sidecar
        write costs pruning, never correctness.

        Distribution: one ``mapInPandas`` pass over the FILE LIST (one
        task per slice of files; each task footer-opens and
        column-prunes its own parquet with pyarrow and writes the
        sidecar itself, like a writer job) — no data shuffle, scales
        with file count not table size. Tiny commits (<= 4 files) skip
        job-launch overhead and build driver-side with the same helper,
        so both paths share one code path for the actual bloom math."""
        if not self._bloom_cols or not files:
            return
        root = self.root
        cols = list(self._bloom_cols)
        bits = self._bloom_bits
        if len(files) <= 4:
            for f in files:
                _build_bloom_sidecar(root, f, cols, bits)
            return
        import pandas as pd

        def _build(batches):
            for pdf in batches:
                done = 0
                for rel in pdf["file"]:
                    _build_bloom_sidecar(root, rel, cols, bits)
                    done += 1
                yield pd.DataFrame({"n": [done]})

        fdf = spark.createDataFrame(
            [(f,) for f in files], "file string"
        ).repartition(min(len(files), 32))
        built = sum(
            r["n"] for r in fdf.mapInPandas(_build, "n long").collect()
        )
        if built != len(files):  # pragma: no cover - defensive
            raise RuntimeError(
                f"bloom sidecar build covered {built}/{len(files)} files"
            )

    def _bloom_batch_canons(
        self, keys_df: DataFrame, limit: int = 10_000
    ) -> dict:
        """Canonicalized probe values per bloom∩batch column, from the
        batch's DISTINCT key tuples — the driver-side half of sidecar
        pruning (one bounded job, same 10k ceiling as the
        partition-tuple pruning in :meth:`apply_changes`).

        Collected VIA ARROW, not ``collect()``: Spark's Arrow export
        carries TIMESTAMP values tz-aware (session zone attached), so
        ``_bloom_canon`` normalizes them to the same UTC wall-clock
        string the build side gets from its pyarrow read of the data
        file — a plain ``collect()`` hands back session-zone NAIVE
        datetimes, which would canonicalize an equal instant
        differently and wrongly prune (ADVICE r8). Fallbacks are all
        toward "don't prune": over-limit batch → ``{}``; a column with
        a null or uncanonizable value is dropped from the result."""
        pcols = [
            c for c in (self._bloom_cols or []) if c in keys_df.columns
        ]
        if not pcols:
            return {}
        rows = (
            keys_df.select(*pcols)
            .distinct()
            .limit(limit + 1)
            .toArrow()
            .to_pylist()
        )
        if len(rows) > limit:
            return {}
        out: dict = {}
        for c in pcols:
            canons = set()
            try:
                for r in rows:
                    canon = _bloom_canon(r[c])
                    if canon is None:  # null key: decline on this col
                        canons = None
                        break
                    canons.add(canon)
            except TypeError:  # float key slipped in: decline
                canons = None
            if canons:
                out[c] = sorted(canons)
        return out

    def _bloom_prune_files(self, files: list[str], probes: dict) -> list:
        """Drop every candidate file whose sidecar REJECTS all probe
        values for at least one probed column — a matching row would
        have to carry one of the batch's values in every key column,
        so a single all-reject column proves the file holds no match.
        Bloom filters have no false negatives over the canon strings,
        which makes the drop exact; false positives only keep extra
        files. Missing/corrupt sidecars and sidecars without the
        column keep the file (conservative — crash between data write
        and sidecar write costs pruning, never correctness). Records
        ``last_bloom_pruned = (kept, before)``. Driver-side cost is
        O(candidate files) small-file reads — run AFTER partition and
        stats pruning, which is where every call site sits."""
        if not probes or not files:
            self.last_bloom_pruned = None
            return list(files)
        kept = []
        for f in files:
            sc = _load_bloom_sidecar(self.root, f)
            if sc is None or all(
                _bloom_may_contain_any(sc, c, canons)
                for c, canons in probes.items()
            ):
                kept.append(f)
        self.last_bloom_pruned = (len(kept), len(files))
        return kept

    def _bloom_caller_canons(self, probe: dict) -> dict:
        """Canonicalize a caller-supplied ``bloom_probe`` hint — the
        bloom analog of ``stats_range`` on the predicate DMLs
        (:meth:`delete_where` / :meth:`update_where` /
        :meth:`overwrite_where`): ``{column: [values]}`` asserting the
        condition can only match rows whose column equals one of the
        values (the equality/IN shape). Planning-only, same contract
        as every pruning hint here — the exact predicate is re-applied
        on the candidate scan. Naive datetimes are taken as UTC
        wall-clock (how the table stores instants); pass tz-aware
        values to be explicit. Typos fail loudly: probing a column not
        in ``bloom_cols`` could never prune (no sidecar carries it),
        so it's rejected rather than silently useless; an empty value
        list is rejected too (it would prune EVERY file — a caller
        with no constraint passes no hint). A null value declines
        pruning on its column; floats raise (never bloomable)."""
        out: dict = {}
        for c, vals in probe.items():
            if not self._bloom_cols or c not in self._bloom_cols:
                raise ValueError(
                    f"bloom_probe column {c!r} is not in this table's "
                    f"bloom_cols {self._bloom_cols!r}"
                )
            if not vals:
                raise ValueError(
                    f"bloom_probe for {c!r} is empty — it would prune "
                    f"every file; omit the hint instead"
                )
            canons = set()
            for v in vals:
                canon = _bloom_canon(v)
                if canon is None:
                    canons = None
                    break
                canons.add(canon)
            if canons:
                out[c] = sorted(canons)
        return out

    def _publish(self, version: int, manifest: dict) -> None:
        if "committed_at_ms" not in manifest:
            # wall-clock commit time, stamped at the single publish
            # choke point -> every commit path gets TIMESTAMP AS OF
            # time travel for free
            import time as _time

            manifest = {**manifest, "committed_at_ms": int(_time.time() * 1000)}
        full_json = json.dumps(manifest)
        payload = full_json
        every = getattr(self, "checkpoint_every", _CHECKPOINT_EVERY)
        if version > 1 and version % every != 0:
            try:
                parent = self.manifest(version - 1)
            except FileNotFoundError:
                parent = None  # parent vacuumed away mid-race: store full
            if parent is not None:
                delta = _encode_manifest_delta(manifest, parent)
                if delta is not None:
                    delta_json = json.dumps(delta)
                    # only worth a chain link if materially smaller —
                    # overwrites / renames / restores that touch most
                    # per-file entries stay full-form
                    if len(delta_json) < 0.6 * len(full_json):
                        payload = delta_json
        fd, tmp = tempfile.mkstemp(dir=self._mdir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
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
        # seed the cache with the round-tripped FULL form so the very
        # next manifest() (every DML path re-reads the head) is a dict
        # parse, not a chain walk
        self._cache_manifest(version, full_json)

    def version_as_of(self, ts_ms: int) -> int:
        """The newest version committed at or before ``ts_ms`` (epoch
        milliseconds) — Delta's TIMESTAMP AS OF resolution. Versions
        from before commit timestamps existed are treated as
        arbitrarily old (always eligible). Raises if the timestamp
        predates every commit."""
        best = None
        for v in self.versions():
            # raw read: committed_at_ms is stored verbatim in delta-
            # and full-form manifests alike — no reconstruction
            at = self._read_raw_manifest(v).get("committed_at_ms", 0)
            if at <= ts_ms:
                best = v
        if best is None:
            raise ValueError(
                f"no version committed at or before {ts_ms} "
                f"(earliest retained version is newer, or table is empty)"
            )
        return best

    def read_as_of(self, spark: SparkSession, ts_ms: int) -> DataFrame:
        """Timestamp time travel: :meth:`read` at
        :meth:`version_as_of`(ts_ms)."""
        return self.read(spark, version=self.version_as_of(ts_ms))

    # ------------------------------------------------------------- reads
    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        ref: str | None = None,
        strip: bool = True,
    ) -> DataFrame:
        """Plan a scan of exactly one snapshot's file list. The manifest
        is the unit of isolation: this DataFrame keeps returning the
        same rows no matter how many commits land after it was built.
        If the version carries merge-on-read deletion vectors
        (``delete_where(mode='mor')``), the scan anti-joins them on
        (file-key, row position) — the read-time half of the MOR
        tradeoff. ``ref`` reads a named tag (:meth:`create_tag`)
        instead of a version number.

        ``strip=False`` (internal maintenance paths only) skips the
        field-id-stripping Project: the metadata is harmless inside a
        diff/arithmetic/recompute pipeline — every write re-stamps ids
        from the manifest being committed, and fresh/merged schema
        derivations overwrite them — and the per-column alias list is
        measurable py4j/analyzer overhead when a refresh plans a dozen
        reads. User-facing reads always strip (field ids are a storage
        detail, not part of the logical schema)."""
        if ref is not None:
            if version is not None:
                raise ValueError("read: pass version OR ref, not both")
            version = self.resolve_ref(ref)
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            df = spark.createDataFrame([], schema)
        else:
            df = self._read_files(spark, m["files"], schema, m.get("dv_files"))
        return _strip_field_ids(df, schema) if strip else df

    def _prune_partition_files(
        self, m: dict, files: list[str], where: dict
    ) -> list[str]:
        """The files of ``files`` that can hold rows matching ``where``
        (``{col: value | [values]}``, equality/IN semantics over
        partition columns). Pure manifest arithmetic — no listing, no
        footer reads. A file with no recorded tuple for some filtered
        column (written before that column was in the spec, or under no
        spec at all) is conservatively KEPT, so pruning is always a
        planning optimization, never a correctness dependency — exactly
        the stats-pruning contract."""
        struct = T.StructType.fromJson(json.loads(m["schema"]))
        types = {f.name: f.dataType for f in struct.fields}
        for c in where:
            if c not in types:
                raise KeyError(
                    f"partition filter column {c!r} not in table schema"
                )
        fp = m.get("file_partitions", {})

        def _holds(entry: dict, c: str, v) -> bool:
            """Can a file with partition tuple ``entry`` hold rows
            matching ``c = v`` (or ``c BETWEEN v.lo AND v.hi``)?
            HIDDEN partitioning: the filter names the SOURCE column;
            each recorded tuple key whose decoded field has that
            source constrains the answer (a key with no applicable
            field constrains nothing — conservative keep)."""
            for key, pv in entry.items():
                pf = _field_from_entry_key(key, types)
                if pf is None or pf.source != c:
                    continue
                dtype = types[c]
                if isinstance(v, Between):
                    if not pf.order_preserving:
                        continue  # bucket can't bound a range
                    if pv is None:
                        return False  # NULL never matches BETWEEN
                    lo = pf.py_apply(v.lo, dtype)
                    hi = pf.py_apply(v.hi, dtype)
                    if not (lo <= pv <= hi):
                        return False
                else:
                    vals = (
                        v if isinstance(v, (list, tuple, set)) else [v]
                    )
                    mapped = {pf.py_apply(x, dtype) for x in vals}
                    if pv not in mapped:
                        return False
            return True

        kept = []
        for f in files:
            entry = fp.get(f)
            if entry is None:
                kept.append(f)
                continue
            if all(_holds(entry, c, v) for c, v in where.items()):
                kept.append(f)
        return kept

    def read_partition(
        self,
        spark: SparkSession,
        where: dict,
        version: int | None = None,
        strip: bool = True,
    ) -> DataFrame:
        """Partition-pruned scan: plan ONLY the files whose manifest
        partition tuple matches ``where`` (``{col: value | [values]}``),
        then re-apply the predicate exactly (covers old-spec files that
        were conservatively kept, and makes the result identical to
        ``read().filter(...)`` by construction). Sets
        ``self.last_partition_counts = (planned, total)`` for
        observability/tests. ``strip`` as in :meth:`read` (internal
        maintenance callers skip the field-id-strip Project)."""
        from pyspark.sql import functions as F

        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        keep = self._prune_partition_files(m, list(m["files"]), where)
        self.last_partition_counts = (len(keep), len(m["files"]))

        def _cond():
            cond = F.lit(True)
            for c, v in where.items():
                if isinstance(v, Between):
                    leg = (F.col(c) >= F.lit(v.lo)) & (
                        F.col(c) <= F.lit(v.hi)
                    )
                    cond = cond & leg
                    continue
                vals = list(v) if isinstance(v, (list, tuple, set)) else [v]
                non_null = [x for x in vals if x is not None]
                leg = (
                    F.col(c).isin(non_null) if non_null else F.lit(False)
                )
                if any(x is None for x in vals):
                    leg = leg | F.col(c).isNull()
                cond = cond & leg
            return cond

        if not keep:
            df = spark.createDataFrame([], schema)
        else:
            df = self._read_files(spark, keep, schema, m.get("dv_files"))
        if strip:
            df = _strip_field_ids(df, schema)
        return df.filter(_cond())

    def read_keys(
        self,
        spark: SparkSession,
        keys: dict,
        version: int | None = None,
    ) -> DataFrame:
        """POINT-LOOKUP read: rows whose columns equal any of the given
        values (``{col: value | [values]}``, equality/IN, conjunctive
        across columns) — planned through every file-skipping layer the
        manifest offers, then filtered exactly:

        1. partition-tuple pruning (when a filtered column is a spec
           source — identity or transform);
        2. per-file min/max stats (when the manifest carries them —
           :class:`StatsSnapshotTable`);
        3. bloom sidecars (when the column is in ``bloom_cols``).

        Unlike the DML ``bloom_probe`` hint, nothing here is
        caller-trusted: the predicate is BUILT from ``keys`` and
        re-applied on the scan, so any column combination is safe —
        non-prunable columns just don't skip files. This is the
        fetch-these-keys path of a 100 TB serving table: a handful of
        sidecar/manifest reads instead of a full scan, the same
        semi-join shape as the reference's $in filter
        (kafka-database-import.go:148-170) resolved at planning time.
        Sets ``last_keys_counts = (planned, total)``; float columns
        and NULL values filter exactly but never prune."""
        from pyspark.sql import functions as F

        if not keys:
            raise ValueError("read_keys: pass at least one column")
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        names = {f.name for f in schema.fields}
        for c in keys:
            if c not in names:
                raise KeyError(f"read_keys column {c!r} not in table schema")
        vals = {
            c: list(v) if isinstance(v, (list, tuple, set)) else [v]
            for c, v in keys.items()
        }
        files = self._prune_partition_files(m, list(m["files"]), keys)
        stats = m.get("stats", {})
        if stats:
            def _stats_keep(f: str) -> bool:
                st = stats.get(f, {})
                for c, vs in vals.items():
                    rng = st.get(c)
                    if rng is None:
                        continue
                    if not any(
                        x is not None and rng[0] <= x <= rng[1] for x in vs
                    ):
                        return False
                return True

            files = [f for f in files if _stats_keep(f)]
        if self._bloom_cols:
            probes: dict = {}
            for c in self._bloom_cols:
                if c not in vals:
                    continue
                canons = set()
                try:
                    for x in vals[c]:
                        canon = _bloom_canon(x)
                        if canon is None:  # NULL matches only via filter
                            canons = None
                            break
                        canons.add(canon)
                except TypeError:  # float values: filter-only
                    canons = None
                if canons:
                    probes[c] = sorted(canons)
            files = self._bloom_prune_files(files, probes)
        self.last_keys_counts = (len(files), len(m["files"]))
        cond = F.lit(True)
        for c, vs in vals.items():
            non_null = [x for x in vs if x is not None]
            leg = F.col(c).isin(non_null) if non_null else F.lit(False)
            if any(x is None for x in vs):
                leg = leg | F.col(c).isNull()
            cond = cond & leg
        if not files:
            return _strip_field_ids(
                spark.createDataFrame([], schema), schema
            ).filter(cond)
        return _strip_field_ids(
            self._read_files(spark, files, schema, m.get("dv_files")),
            schema,
        ).filter(cond)

    def set_partition_spec(self, partition_by: list[str] | None) -> int:
        """Evolve the partition spec — METADATA-ONLY commit (Iceberg
        partition evolution): the new spec applies to files written
        FROM NOW ON; existing files keep their recorded tuples (or
        none) and are treated conservatively by pruning, so mixed-spec
        versions read and prune correctly with no rewrite. Pass None
        to stop partitioning future writes. The commit is marked
        ``rewrite_only`` — it changes no rows and no schema, so
        changes()/stream lineage passes through it."""
        m = self.manifest()
        struct = T.StructType.fromJson(json.loads(m["schema"]))
        types = {f.name: f.dataType for f in struct.fields}
        spec = list(partition_by) if partition_by else None
        if spec:
            spec = [pf.entry for pf in _validate_spec(spec, types)]
        head = m["version"]
        version = head + 1
        man = {
            # carry table state, not the previous commit's own markers
            # (see rename_column's note)
            **{k: v for k, v in m.items()
               if k not in ("version", "base", "mode", "rewrite_only",
                            "epoch_id", "committed_at_ms",
                            "partition_spec")},
            "version": version,
            "base": head,
            "mode": "set_partition_spec",
            "rewrite_only": True,
        }
        if spec:
            man["partition_spec"] = spec
        self._publish(version, man)
        return version

    def _read_files(
        self,
        spark: SparkSession,
        files: list[str],
        schema: "T.StructType",
        dv_files: list[str] | None,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        _ensure_fieldid_read(spark, schema)
        paths = [os.path.join(self.root, f) for f in files]
        df = spark.read.schema(schema).parquet(*paths)
        if not dv_files:
            return df
        dv = spark.read.parquet(
            *[os.path.join(self.root, f) for f in dv_files]
        )
        cols = df.columns
        keyed = df.select(
            "*",
            _file_key3().alias("_sg_k3"),
            F.col("_metadata.row_index").alias("_sg_pos"),
        )
        return keyed.join(
            F.broadcast(dv),
            (keyed["_sg_k3"] == dv["k3"]) & (keyed["_sg_pos"] == dv["pos"]),
            "left_anti",
        ).select(*cols)

    def restore(self, version: int) -> int:
        """RESTORE the table to ``version`` as a NEW commit (Delta
        ``RESTORE TABLE ... TO VERSION AS OF`` / Iceberg rollback):
        the new head's file set, schema, deletion vectors, tombstones,
        stats and partition state are exactly the target version's —
        a pure METADATA commit (no data file is read or written; the
        target's immutable files are re-referenced), so rolling back a
        bad CDC batch on a 100-TB table costs one manifest write.

        This IS a logical change: the commit is ``mode='restore'`` and
        NOT rewrite-only, so ``changes()`` lineage and the streaming
        source RESET at it (a consumer must restart from a snapshot —
        the rows it already delivered may have been un-happened), and
        ``history()`` records ``restored_from``. Row-level
        :func:`row_changes` across the restore yields the INVERSE of
        the intervening delta, which falls out of the file-set diff.

        Field-id safety across the rollback: ids dropped in EITHER the
        target's lineage or the abandoned head's stay tombstoned
        unless the restored schema itself makes them live again — a
        column added after the target (and thus removed by the
        restore) can never have its id reused by a later add.

        History is preserved — the rolled-back versions remain
        readable via time travel until :func:`vacuum`. Raises if the
        target version's manifest or any of its files were already
        vacuumed, and on the version race like every commit."""
        target = self.manifest(version)  # FileNotFoundError if vacuumed
        head_m = self.manifest()
        head = head_m["version"]
        if version == head:
            return head  # restoring to the head is a no-op
        needed = (
            list(target["files"])
            + list(target.get("dv_files", []))
            + list(target.get("tombstone_files", []))
        )
        missing = [
            f for f in needed
            if not os.path.exists(os.path.join(self.root, f))
        ]
        if missing:
            raise ValueError(
                f"restore({version}): {len(missing)} of the target "
                f"version's files were vacuumed (e.g. {missing[0]!r}) — "
                f"that version is no longer restorable"
            )
        live_target_ids = set(
            _ids_of(T.StructType.fromJson(json.loads(target["schema"]))).values()
        )
        dropped = (
            set(target.get("dropped_ids", []))
            | set(head_m.get("dropped_ids", []))
        ) - live_target_ids
        new_version = head + 1
        man = {
            "version": new_version,
            "base": head,
            "mode": "restore",
            "restored_from": version,
            "schema": target["schema"],
            "files": list(target["files"]),
        }
        for key in ("dv_files", "tombstone_files", "stats",
                    "partition_spec", "file_partitions"):
            if target.get(key):
                man[key] = target[key]
        if dropped:
            man["dropped_ids"] = sorted(dropped)
        self._publish(new_version, man)
        return new_version

    # --------------------------------------------------- named refs (tags)
    def _refs_dir(self) -> str:
        return os.path.join(self.root, "_refs")

    def _ref_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name):
            raise ValueError(
                f"ref name {name!r}: use letters/digits/._- only"
            )
        return os.path.join(self._refs_dir(), f"{name}.json")

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: head) under an immutable NAME —
        Iceberg tags / Delta named snapshots. A tag does two things:
        readers address it (``read(spark, ref='audit-2026-08')``,
        stable meaning forever), and RETENTION honors it —
        :func:`vacuum` / :func:`expire_snapshots` keep a tagged
        version's manifest and files alive regardless of the retention
        window, which is the actual production use (pin the quarterly
        compliance snapshot; let everything else age out). Tags are
        immutable: re-creating an existing name raises — drop first."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(
                    f"snapshot table {self.root} has no commits"
                )
        self.manifest(version)  # loud FileNotFoundError if expired
        os.makedirs(self._refs_dir(), exist_ok=True)
        path = self._ref_path(name)
        fd, tmp = tempfile.mkstemp(dir=self._refs_dir(), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"name": name, "type": "tag", "version": version}, f)
            try:
                os.link(tmp, path)  # atomic claim, like a commit
            except FileExistsError:
                raise ValueError(
                    f"tag {name!r} already exists (at version "
                    f"{self.resolve_ref(name)}) — tags are immutable; "
                    f"drop_tag first"
                ) from None
        finally:
            os.unlink(tmp)
        return version

    def resolve_ref(self, name: str) -> int:
        try:
            with open(self._ref_path(name)) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            raise KeyError(
                f"no ref {name!r} (have {sorted(self.tags())})"
            ) from None

    def tags(self) -> dict[str, int]:
        d = self._refs_dir()
        if not os.path.isdir(d):
            return {}
        out = {}
        for n in os.listdir(d):
            if n.endswith(".json"):
                with open(os.path.join(d, n)) as f:
                    r = json.load(f)
                out[r["name"]] = r["version"]
        return out

    def drop_tag(self, name: str) -> None:
        try:
            os.unlink(self._ref_path(name))
        except FileNotFoundError:
            raise KeyError(f"no ref {name!r}") from None

    # -------------------------------------- write-audit-publish (staging)
    def _staged_dir(self) -> str:
        return os.path.join(self.root, "_staged")

    def _staged_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name):
            raise ValueError(
                f"staged-commit name {name!r}: letters/digits/._- only"
            )
        return os.path.join(self._staged_dir(), f"{name}.json")

    def stage(self, df: DataFrame, name: str, mode: str = "append") -> dict:
        """Write-audit-publish, step 1 (the Iceberg WAP workflow): the
        commit's data files are written and its manifest is built
        against the current head, but nothing is linked into the
        version log — production readers are untouched. The audit job
        reads the candidate state with :meth:`read_staged`, and only
        :meth:`publish_staged` makes it a real version (or
        :meth:`drop_staged` abandons it; vacuum reclaims the orphaned
        files). Staged data files are PINNED through vacuum — an audit
        can't have its evidence collected from under it.

        Returns the staged manifest. One staged commit per name
        (atomic claim); the name is the audit's handle."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown staged mode: {mode!r}")
        head = self.latest_version()
        if head and mode == "append":
            prev_m = self.manifest(head)
            prev = prev_m["files"]
            schema_json = _merge_schema(prev_m, df.schema)
            extras = _schema_extras(prev_m)
            dv_files = prev_m.get("dv_files", [])
            prev_fp = prev_m.get("file_partitions", {})
        elif head:
            prev, prev_fp, dv_files = [], {}, []
            schema_json, extras = _overwrite_schema(self.manifest(head), df.schema)
        else:
            prev, prev_fp, dv_files = [], {}, []
            schema_json, extras = _fresh_schema_json(df.schema), {}
        files = self._write_data(df, (head or 0) + 1, schema_json)
        pend_fp = dict(self._pending_file_partitions)
        man = {
            "staged_from": head,
            "mode": mode,
            "schema": schema_json,
            "add_files": files,
            "files": prev + files,
            **extras,
        }
        spec = self.partition_spec()
        if spec:
            man["partition_spec"] = spec
        fp = {
            **{f: prev_fp[f] for f in prev if f in prev_fp},
            **{f: pend_fp[f] for f in files if f in pend_fp},
        }
        if fp:
            man["file_partitions"] = fp
        if dv_files:
            man["dv_files"] = dv_files
        self._attach_staged_stats(man, files)
        os.makedirs(self._staged_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._staged_dir(), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(man, f)
            try:
                os.link(tmp, self._staged_path(name))
            except FileExistsError:
                raise ValueError(
                    f"staged commit {name!r} already exists — publish or "
                    f"drop it first"
                ) from None
        finally:
            os.unlink(tmp)
        return man

    def _attach_staged_stats(self, man: dict, new_files: list[str]) -> None:
        """Hook for stats-bearing subclasses; base format records no
        per-file stats."""

    def staged(self) -> list[str]:
        d = self._staged_dir()
        if not os.path.isdir(d):
            return []
        return sorted(n[:-5] for n in os.listdir(d) if n.endswith(".json"))

    def _read_staged_manifest(self, name: str) -> dict:
        try:
            with open(self._staged_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise KeyError(
                f"no staged commit {name!r} (have {self.staged()})"
            ) from None

    def read_staged(self, spark: SparkSession, name: str) -> DataFrame:
        """The table AS IF the staged commit were published — what the
        audit job validates before anything becomes visible."""
        m = self._read_staged_manifest(name)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return _strip_field_ids(spark.createDataFrame([], schema), schema)
        return _strip_field_ids(
            self._read_files(spark, m["files"], schema, m.get("dv_files")),
            schema,
        )

    def publish_staged(self, name: str) -> int:
        """Write-audit-publish, step 3: link the audited state into the
        version log as the next version. If the head moved since
        :meth:`stage`, an APPEND is re-based metadata-only (its already-
        written files re-referenced against the new head — appends
        commute, same contract as the commit retry loop) as long as the
        interim commits did not evolve the schema; anything else raises
        :class:`ConcurrentCommitError` — re-stage and re-audit, the
        audited state no longer describes what publishing would make."""
        man = self._read_staged_manifest(name)
        for _attempt in range(_MAX_COMMIT_REBASE):
            head = self.latest_version()
            version = (head or 0) + 1
            staged_from = man.get("staged_from")
            if (head or None) == staged_from:
                out = {k: v for k, v in man.items()
                       if k not in ("staged_from", "add_files")}
                out["version"] = version
                out["base"] = head
            else:
                if man["mode"] != "append":
                    raise ConcurrentCommitError(
                        f"publish_staged({name!r}): head moved from "
                        f"{staged_from} to {head} and the staged commit "
                        f"is an overwrite — the audited state is stale; "
                        f"drop_staged and re-stage"
                    )
                head_m = self.manifest(head)
                try:
                    base_schema = (
                        self.manifest(staged_from)["schema"]
                        if staged_from else man["schema"]
                    )
                except FileNotFoundError:
                    # ADVICE r7: the staging-base manifest was vacuumed
                    # /expired while the audit ran — the rebase can't
                    # prove the interim commits kept the schema, so the
                    # staged state is stale BY POLICY, not an I/O bug;
                    # surface the same re-stage contract as every other
                    # stale-staged path instead of a raw
                    # FileNotFoundError.
                    raise ConcurrentCommitError(
                        f"publish_staged({name!r}): the staging base "
                        f"v{staged_from} was vacuumed while the audit "
                        f"ran — the audited state is stale; "
                        f"drop_staged and re-stage"
                    ) from None
                if head_m["schema"] != base_schema:
                    raise ConcurrentCommitError(
                        f"publish_staged({name!r}): the schema evolved "
                        f"since staging — the audited state is stale; "
                        f"drop_staged and re-stage"
                    )
                add = man["add_files"]
                out = {
                    "version": version,
                    "base": head,
                    "mode": "append",
                    "schema": head_m["schema"],
                    "files": head_m["files"] + add,
                    **_schema_extras(head_m),
                }
                if head_m.get("partition_spec"):
                    out["partition_spec"] = head_m["partition_spec"]
                fp = {
                    **head_m.get("file_partitions", {}),
                    **{
                        f: v
                        for f, v in man.get("file_partitions", {}).items()
                        if f in set(add)
                    },
                }
                if fp:
                    out["file_partitions"] = fp
                if head_m.get("dv_files"):
                    out["dv_files"] = head_m["dv_files"]
                if "stats" in man or "stats" in head_m:
                    out["stats"] = {
                        **head_m.get("stats", {}),
                        **{
                            f: v
                            for f, v in man.get("stats", {}).items()
                            if f in set(add)
                        },
                    }
            try:
                self._publish(version, out)
            except ConcurrentCommitError:
                continue
            os.unlink(self._staged_path(name))
            return version
        raise ConcurrentCommitError(
            f"publish_staged({name!r}) lost the version race "
            f"{_MAX_COMMIT_REBASE} times — sustained contention"
        )

    def drop_staged(self, name: str) -> None:
        """Abandon a staged commit; its files become unreferenced and
        the next :func:`vacuum` reclaims them."""
        try:
            os.unlink(self._staged_path(name))
        except FileNotFoundError:
            raise KeyError(f"no staged commit {name!r}") from None

    # -------------------------------------------------------- maintenance
    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the CURRENT snapshot into ``target_files`` files and
        commit the same logical state as a new overwrite version. Old
        versions keep reading their original immutable files."""
        current = self.read(spark).coalesce(target_files)
        return self.commit(current, mode="overwrite", rewrite_only=True)

    # ------------------------------------------- schema evolution (DDL)
    def _require_field_ids(self, m: dict, op: str) -> dict[str, int]:
        ids = _ids_of(T.StructType.fromJson(json.loads(m["schema"])))
        if not ids:
            raise SchemaEvolutionError(
                f"{op}: this table predates field-id tracking (its "
                f"manifests carry no parquet field ids), so old data "
                f"files cannot be resolved across a rename/drop. Run "
                f"optimize() first — the overwrite commit stamps fresh "
                f"ids on every file — then retry"
            )
        return ids

    def rename_column(self, old: str, new: str) -> int:
        """Rename a column — METADATA-ONLY commit (no data file is
        touched): the field keeps its parquet field id, so every
        existing file's column resolves to the new name via Spark's
        native id-based resolution, and historical versions read back
        under the names they had then (time travel over the rename).

        Refuses ambiguity: ``new`` colliding with a live column is an
        error, never a silent shadow. Like every non-append commit, a
        rename RESETS the changes-stream lineage."""
        m = self.manifest()
        self._require_field_ids(m, "rename_column")
        struct = T.StructType.fromJson(json.loads(m["schema"]))
        names = [f.name for f in struct.fields]
        if old not in names:
            raise KeyError(f"rename_column: no column {old!r} (have {names})")
        if new in names:
            raise SchemaEvolutionError(
                f"rename_column: {new!r} already exists — renaming "
                f"{old!r} onto it would be ambiguous"
            )
        fields = [
            T.StructField(new if f.name == old else f.name, f.dataType,
                          f.nullable, f.metadata)
            for f in struct.fields
        ]
        head = m["version"]
        version = head + 1
        man = {
            # carry table state, NOT the previous commit's own markers:
            # a copied rewrite_only would make this rename silently
            # TRANSPARENT to lineage walkers (whose frozen stream schema
            # has the old name -> null-filled columns), and a copied
            # epoch_id would claim a streaming epoch this commit never
            # processed
            **{k: v for k, v in m.items()
               if k not in ("version", "base", "mode", "rewrite_only",
                            "epoch_id", "committed_at_ms")},
            "version": version,
            "base": head,
            "mode": "rename",
            "schema": T.StructType(fields).json(),
        }
        if "stats" in man:
            # stats are column VALUES keyed by name — carry them under
            # the new name so stats pruning keeps working post-rename
            man["stats"] = {
                f: {(new if c == old else c): rng for c, rng in st.items()}
                for f, st in man["stats"].items()
            }
        spec_fields = [
            _parse_spec_entry(e) for e in (man.get("partition_spec") or [])
        ]
        if any(pf.source == old for pf in spec_fields):
            # partition state is keyed by name too: remap the spec and
            # every file's recorded tuple so pruning keeps working
            # post-rename (the hive DIR names on disk keep the old
            # name — harmless, since planning reads the manifest, never
            # the paths). Transform entries remap their SOURCE
            # (month(old) -> month(new)), and tuple keys remap their
            # self-describing field name (old_month -> new_month).
            old_types = {f.name: f.dataType for f in struct.fields}

            def _remap_entry(e: str) -> str:
                pf = _parse_spec_entry(e)
                if pf.source != old:
                    return pf.entry
                p = pf.param
                if pf.transform == "identity":
                    return new
                return f"{pf.transform}({str(p) + ', ' if p else ''}{new})"

            def _remap_key(k: str) -> str:
                pf = _field_from_entry_key(k, old_types)
                if pf is None or pf.source != old:
                    return k
                if pf.transform == "identity":
                    return new
                return (
                    f"{new}_{pf.transform}"
                    f"{pf.param if pf.param is not None else ''}"
                )

            man["partition_spec"] = [
                _remap_entry(e) for e in man["partition_spec"]
            ]
            man["file_partitions"] = {
                f: {_remap_key(c): v for c, v in pv.items()}
                for f, pv in man.get("file_partitions", {}).items()
            }
        self._publish(version, man)
        return version

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one dict per version (ascending) with the
        operational metadata a consumer audits — version, base, mode,
        file/DV/tombstone counts, epoch, rewrite-only flag. Pure
        manifest reads, O(versions)."""
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "base": m.get("base"),
                    "mode": m["mode"],
                    "n_files": len(m["files"]),
                    "n_dv_files": len(m.get("dv_files", [])),
                    "n_tombstone_files": len(m.get("tombstone_files", [])),
                    "epoch_id": m.get("epoch_id"),
                    "rewrite_only": bool(m.get("rewrite_only")),
                    "committed_at_ms": m.get("committed_at_ms"),
                    **(
                        {"restored_from": m["restored_from"]}
                        if "restored_from" in m
                        else {}
                    ),
                }
            )
        return out

    def history_df(self, spark: SparkSession) -> DataFrame:
        """:meth:`history` as a DataFrame — the ``snapshots`` metadata
        table of the Iceberg/Delta pattern, queryable/joinable like any
        relation. Pure manifest reads, O(versions); ``restored_from``
        is null except on restore commits."""
        rows = [
            (
                h["version"], h.get("base"), h["mode"], h["n_files"],
                h["n_dv_files"], h["n_tombstone_files"], h.get("epoch_id"),
                h["rewrite_only"], h.get("committed_at_ms"),
                h.get("restored_from"),
            )
            for h in self.history()
        ]
        return spark.createDataFrame(
            rows,
            "version long, base long, mode string, n_files long, "
            "n_dv_files long, n_tombstone_files long, epoch_id long, "
            "rewrite_only boolean, committed_at_ms long, "
            "restored_from long",
        )

    def files_df(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The ``files`` metadata table: one row per live data file of
        the snapshot — path, recorded partition tuple (JSON), and the
        footer facts the manifest carries when the table records stats
        (``_nrows``/``_bytes``; null otherwise). Pure manifest
        arithmetic — no listing, no footer reads — so operational
        queries (skew checks, small-file census, partition row counts)
        stay O(manifest) at 100 TB."""
        m = self.manifest(version)
        stats = m.get("stats", {})
        fp = m.get("file_partitions", {})
        rows = [
            (
                f,
                json.dumps(fp[f], default=str) if f in fp else None,
                stats.get(f, {}).get("_nrows"),
                stats.get(f, {}).get("_bytes"),
            )
            for f in m["files"]
        ]
        return spark.createDataFrame(
            rows,
            "file string, partition string, n_rows long, size_bytes long",
        )

    def drop_column(self, name: str) -> int:
        """Drop a column — metadata-only commit. The field's id is
        TOMBSTONED in the manifest (``dropped_ids``), so re-adding the
        same name later mints a fresh id and the old files' data for
        the dropped column is never resurrected (it reads NULL under
        the new id); the bytes stay on disk until files are rewritten
        by optimize()/compaction, the same GDPR caveat as MOR
        deletes."""
        m = self.manifest()
        ids = self._require_field_ids(m, "drop_column")
        struct = T.StructType.fromJson(json.loads(m["schema"]))
        names = [f.name for f in struct.fields]
        if name not in names:
            raise KeyError(f"drop_column: no column {name!r} (have {names})")
        if len(names) == 1:
            raise SchemaEvolutionError("drop_column: cannot drop the last column")
        if any(
            _parse_spec_entry(e).source == name
            for e in (m.get("partition_spec") or [])
        ):
            raise SchemaEvolutionError(
                f"drop_column: {name!r} is a partition column — evolve "
                f"the spec first (set_partition_spec without it), then "
                f"drop"
            )
        fields = [f for f in struct.fields if f.name != name]
        head = m["version"]
        version = head + 1
        man = {
            **{k: v for k, v in m.items()
               if k not in ("version", "base", "mode", "rewrite_only",
                            "epoch_id", "committed_at_ms")},  # see rename_column's note
            "version": version,
            "base": head,
            "mode": "drop",
            "schema": T.StructType(fields).json(),
            "dropped_ids": sorted(set(m.get("dropped_ids", [])) | {ids[name]}),
        }
        self._publish(version, man)
        return version

    def optimize_small_files(
        self,
        spark: SparkSession,
        small_file_rows: int,
        target_rows_per_file: int | None = None,
        partition_filter: dict | None = None,
    ) -> dict:
        """SELECTIVE compaction — the incremental form of
        :meth:`optimize` that survives 100 TB: only files with fewer
        than ``small_file_rows`` rows (footer ``num_rows``, no data
        pages read) are rewritten into ~``target_rows_per_file`` files;
        every right-sized file is carried into the new version BY
        REFERENCE, so the cost is O(small files), not O(table) — the
        real OPTIMIZE bin-packing contract. Deletion vectors on the
        rewritten files are materialized by the rewrite (their DV rows
        go inert); DVs on carried files stay live and carried.

        ``partition_filter`` (same ``{col: value | [values] | Between}``
        source-column semantics as :meth:`read_partition`) scopes the
        candidate scan to matching partitions — the 100 TB maintenance
        norm is "compact yesterday's partition", and the scoped form
        reads only that partition's footers instead of a million.
        Files without recorded tuples (older spec) are conservatively
        INCLUDED as candidates; rewriting them is correct (the rewrite
        re-lands rows under the active spec) just wider than asked.

        Returns ``{"version", "compacted_files", "kept_files",
        "new_files"}``; fewer than two small files is a no-op."""
        import pyarrow.parquet as pq

        target_rows_per_file = target_rows_per_file or small_file_rows * 4
        m = self.manifest()
        cand = (
            self._prune_partition_files(m, m["files"], partition_filter)
            if partition_filter
            else m["files"]
        )
        stats = m.get("stats", {})
        sizes = {
            # manifest _nrows when recorded (StatsSnapshotTable commits
            # capture it footer-side once) — the million-file census is
            # then pure manifest arithmetic; footer-read only the gaps
            f: stats.get(f, {}).get("_nrows")
            or pq.ParquetFile(os.path.join(self.root, f)).metadata.num_rows
            for f in cand
        }
        smalls = sorted(f for f, n in sizes.items() if n < small_file_rows)
        if len(smalls) < 2:
            return {
                "version": m["version"],
                "compacted_files": 0,
                "kept_files": len(m["files"]),
                "new_files": 0,
            }
        total = sum(sizes[f] for f in smalls)
        n_out = max(1, -(-total // target_rows_per_file))  # ceil div
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        merged = self._read_files(
            spark, smalls, schema, m.get("dv_files")
        ).coalesce(n_out)
        version = m["version"] + 1
        new_files = self._write_data(merged, version, m["schema"])
        kept = [f for f in m["files"] if f not in set(smalls)]
        man = self._cow_manifest(
            version, m["version"], "compact", m["schema"], kept, new_files, m
        )
        man["rewrite_only"] = True
        if m.get("dv_files"):
            man["dv_files"] = m["dv_files"]
        self._publish(version, man)
        return {
            "version": version,
            "compacted_files": len(smalls),
            "kept_files": len(kept),
            "new_files": len(new_files),
        }

    def _zorder_arrangement(
        self,
        current: DataFrame,
        cols: list[str],
        target_files: int,
    ) -> "DataFrame | None":
        """``current`` range-distributed and sorted on the N-D Morton
        interleave of ``cols`` (spec-aware for partitioned tables —
        see the comment inline). Returns None when there is nothing to
        cluster (empty input or an all-NULL clustering column). Sets
        ``_skip_spec_distribution`` when it has already arranged a
        spec-aware distribution, so the following ``_write_data`` must
        be the next write on this handle."""
        from pyspark.sql import functions as F

        from kafka_database_import_spark.operators.zorder import zvalue_nd

        # ADVICE r6: validate up front — non-numeric clustering
        # columns would fail the normalization arithmetic with an
        # opaque error, and an empty table collects lo/hi = None.
        numeric = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType,
        )
        field_types = {f.name: f.dataType for f in current.schema.fields}
        for c in cols:
            if c not in field_types:
                raise ValueError(
                    f"optimize(zorder_by=...): column {c!r} not in "
                    f"table schema {sorted(field_types)}"
                )
            if not isinstance(field_types[c], numeric):
                raise ValueError(
                    f"optimize(zorder_by=...): column {c!r} has type "
                    f"{field_types[c].simpleString()} — Z-order "
                    f"clustering needs numeric (int/float) columns; "
                    f"cast or derive a numeric key (e.g. epoch days "
                    f"for dates, a hash bucket for strings) first"
                )
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        b = current.agg(*aggs).collect()[0]
        if any(b[f"lo_{c}"] is None for c in cols):
            return None
        bits = max(1, 32 // len(cols))
        grid = (1 << bits) - 1
        normed = [
            F.floor(
                (F.col(c) - F.lit(b[f"lo_{c}"])).cast("double")
                * grid
                / max(b[f"hi_{c}"] - b[f"lo_{c}"], 1)
            ).cast("long")
            for c in cols
        ]
        z = zvalue_nd(normed, bits)
        spec = self.partition_spec()
        if spec:
            # Partitioned + Z-ordered: range-distribute on (spec,
            # z) and sort the same way, so each task covers a
            # contiguous partition-then-z range — partitionBy then
            # splits along near-boundaries only, giving ~one
            # z-ordered file per partition slice instead of
            # (tasks × partition values) shards. The write must
            # not re-hash on the spec (that would undo this
            # arrangement), hence the skip flag.
            sptypes = {f.name: f.dataType for f in current.schema.fields}
            sexprs = [
                pf.spark_expr(sptypes[pf.source]).alias(f"__sp{i}")
                for i, pf in enumerate(
                    _parse_spec_entry(e) for e in spec
                )
            ]
            spnames = [f"__sp{i}" for i in range(len(sexprs))]
            out = (
                current.withColumn("__z", z)
                .select("*", *sexprs)
                .repartitionByRange(
                    target_files,
                    *[F.col(c) for c in spnames],
                    F.col("__z"),
                )
                .sortWithinPartitions(*spnames, "__z")
                .drop("__z", *spnames)
            )
            self._skip_spec_distribution = True
            return out
        return (
            current.withColumn("__z", z)
            .repartitionByRange(target_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )

    def optimize(
        self,
        spark: SparkSession,
        zorder_by: tuple[str, ...] | None = None,
        target_files: int = 8,
        partition_filter: dict | None = None,
    ) -> dict:
        """The OPTIMIZE maintenance op — one overwrite commit composing
        the three layout tools this format already has separately:

        * **compaction** — small files coalesced to ``target_files``
          and merge-on-read deletion vectors MATERIALIZED (the read
          plans through DVs, the rewrite bakes them in, the new
          manifest drops them) — same contract as :meth:`compact`;
        * **Z-order clustering** — with ``zorder_by=(c1, c2, ...)``
          (2+ columns), rows are range-shuffled on the N-dimensional
          Morton interleave (operators/zorder.py ``zvalue_nd``; per-
          dimension grid = 32//N bits) so every output file covers a
          narrow range of EVERY clustered dimension;
        * **stats refresh** — on a :class:`StatsSnapshotTable` the
          rewrite's per-file min/max stats land in the manifest via the
          normal commit path, so ``read_pruned`` skips files on either
          clustered column immediately.

        Logical state is EXACTLY preserved (same rows as the current
        read; asserted by the optimize tests); old versions keep their
        original immutable files until :func:`vacuum`. Returns
        ``{"version", "files_before", "files_after", "dv_cleared"}``.

        ``partition_filter`` (same source-column semantics as
        :meth:`read_partition`) turns the table-wide overwrite into a
        SCOPED rewrite: only matching files are read, re-clustered,
        and replaced; every other file is carried by reference — the
        100 TB contract, where OPTIMIZE targets yesterday's partition
        and costs O(partition), not O(table). Files without recorded
        tuples are conservatively included (rewriting them is correct,
        just wider than asked); deletion vectors over rewritten files
        are materialized by the rewrite, DV entries for carried files
        stay live (same convention as :meth:`optimize_small_files`)."""
        if partition_filter is not None:
            return self._optimize_scoped(
                spark, partition_filter, zorder_by, target_files
            )
        m = self.manifest()
        files_before = len(m["files"])
        dv_before = len(m.get("dv_files", []))
        current = self.read(spark)
        if zorder_by is not None:
            out = self._zorder_arrangement(
                current, list(zorder_by), target_files
            )
            if out is None:
                # Empty table (or an all-NULL clustering column): there
                # is nothing to cluster — a clean no-op instead of a
                # TypeError in the normalization.
                return {
                    "version": m["version"],
                    "files_before": files_before,
                    "files_after": files_before,
                    "dv_cleared": 0,
                }
        else:
            out = current.coalesce(target_files)
        version = self.commit(out, mode="overwrite", rewrite_only=True)
        return {
            "version": version,
            "files_before": files_before,
            "files_after": len(self.manifest(version)["files"]),
            "dv_cleared": dv_before,
        }

    def _optimize_scoped(
        self,
        spark: SparkSession,
        partition_filter: dict,
        zorder_by: "tuple[str, ...] | None",
        target_files: int,
    ) -> dict:
        """Partition-scoped OPTIMIZE: a copy-on-write rewrite of ONLY
        the files matching ``partition_filter``; everything else is
        carried by reference in a rewrite-only commit (transparent to
        change lineage, like :meth:`compact`)."""
        m = self.manifest()
        files_before = len(m["files"])
        cand = self._prune_partition_files(m, m["files"], partition_filter)
        self.last_partition_counts = (len(cand), files_before)
        if not cand:
            return {
                "version": m["version"],
                "files_before": files_before,
                "files_after": files_before,
                "dv_cleared": 0,
            }
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        sub = self._read_files(spark, cand, schema, m.get("dv_files"))
        out = None
        if zorder_by is not None:
            out = self._zorder_arrangement(sub, list(zorder_by), target_files)
        if out is None:  # no zorder asked, or nothing to cluster
            out = sub.coalesce(target_files)
        version = m["version"] + 1
        new_files = self._write_data(out, version, m["schema"])
        kept = [f for f in m["files"] if f not in set(cand)]
        man = self._cow_manifest(
            version, m["version"], "compact", m["schema"], kept, new_files, m
        )
        man["rewrite_only"] = True
        if m.get("dv_files"):
            man["dv_files"] = m["dv_files"]
        self._publish(version, man)
        return {
            "version": version,
            "files_before": files_before,
            "files_after": len(kept) + len(new_files),
            "dv_cleared": 0,
            "rewritten_files": len(cand),
        }

    # --------------------------------------------- copy-on-write mutation
    def _cow_manifest(
        self,
        version: int,
        head: int,
        mode: str,
        schema_json: str,
        kept_files: list[str],
        new_files: list[str],
        prev_m: dict,
    ) -> dict:
        """Manifest for a copy-on-write commit: untouched files carried
        by reference, rewritten/new files appended, field-id tombstones
        carried forward. Partition state rides along: the spec is table
        metadata, kept files keep their recorded partition tuples, and
        the rewrite's new files bring the tuples `_write_data` parsed
        off their paths. Subclasses attach per-file stats here."""
        man = {
            "version": version,
            "base": head,
            "mode": mode,
            "schema": schema_json,
            "files": kept_files + new_files,
            **_schema_extras(prev_m),
        }
        if prev_m.get("partition_spec"):
            man["partition_spec"] = prev_m["partition_spec"]
        prev_fp = prev_m.get("file_partitions", {})
        pend = getattr(self, "_pending_file_partitions", {})
        fp = {
            **{f: prev_fp[f] for f in kept_files if f in prev_fp},
            **{f: pend[f] for f in new_files if f in pend},
        }
        if fp:
            man["file_partitions"] = fp
        return man

    def _rebase_dml(
        self,
        base_m: dict,
        touched_files: list[str],
        require_same_dv: bool = True,
    ) -> dict:
        """Disjoint-writer conflict check after a DML commit lost the
        version race: re-basing onto the new head is safe iff the
        concurrent winner(s) did not invalidate what this DML computed
        from its base snapshot — the files it read-and-replaced (or
        DV-targeted) are all still live, the schema is unchanged, and
        (where the rewrite baked the base's deletion vectors in) the DV
        set is unchanged. Append vs DML therefore always re-bases; two
        DMLs succeed iff their touched file sets are disjoint (the
        Iceberg validation rule). Returns the new head manifest, or
        raises :class:`ConcurrentCommitError` naming the conflict — the
        caller must then recompute from the new head."""
        m2 = self.manifest()
        if m2["schema"] != base_m["schema"]:
            raise ConcurrentCommitError(
                "concurrent schema change: this DML was computed under "
                "the old schema — recompute from the new head"
            )
        live = set(m2["files"])
        gone = [f for f in touched_files if f not in live]
        if gone:
            raise ConcurrentCommitError(
                f"concurrent DML touched {len(gone)} of the same files "
                f"(e.g. {gone[0]!r}) — touched sets must be disjoint; "
                f"recompute from the new head"
            )
        if require_same_dv and (
            m2.get("dv_files", []) != base_m.get("dv_files", [])
        ):
            raise ConcurrentCommitError(
                "concurrent merge-on-read delete changed the deletion-"
                "vector set this DML's rewrite was computed against — "
                "recompute from the new head"
            )
        return m2

    def _check_epoch_unclaimed(
        self, base_m: dict, head_m: dict, epoch_id: int | None
    ) -> None:
        """Post-rebase fencing for EPOCH-STAMPED commits (exactly-once
        writers: MV refreshes, streaming CDC sinks): an insert-only
        commit (affected file set empty) passes the disjoint-file
        rebase check, so two racing writers carrying the same epoch
        would double-apply. Walk the winner chain from ``head_m`` back
        to ``base_m`` — if any concurrent commit already stamped an
        epoch >= this writer's, the work this epoch records was applied
        by another writer (or a newer one superseded it): raise instead
        of re-publishing.

        Contract: ONE epoch-stamped writer per table. The manifest has
        a single ``epoch_id`` field, so two independent stamped
        sequences (e.g. two streaming queries on disjoint partitions)
        were never sound here — each would trip the other's replay
        detection long before this fence; run multiple UNstamped
        writers (plain disjoint-file rebase applies) or one stamped
        coordinator instead. Within the one-writer contract, ``>=`` is
        exact: an equal epoch is the zombie/failover double-apply, a
        newer one means this batch is a stale replay."""
        if epoch_id is None:
            return
        v = head_m["version"]
        while v is not None and v > base_m["version"]:
            cm = head_m if v == head_m["version"] else self.manifest(v)
            e = cm.get("epoch_id")
            if e is not None and e >= epoch_id:
                raise ConcurrentCommitError(
                    f"concurrent commit v{v} already stamped epoch {e} "
                    f">= this commit's epoch {epoch_id} — the work this "
                    f"epoch records was applied by another writer; "
                    f"recompute from the new head"
                )
            v = cm.get("base")

    def _files_of(self, rows) -> list[str]:
        """Root-relative file paths from already-collected rows carrying
        ``_sg_file`` (= ``input_file_name()``). Pure driver-side string
        work: every caller has just collected the per-file hit counts,
        so normalizing the paths here costs zero Spark jobs (the old
        shape round-tripped the collected rows through createDataFrame →
        distinct → collect — one full job per DML call for strings the
        driver already held)."""
        out = set()
        for r in rows:
            p = r["_sg_file"]
            if p.startswith("file:"):
                p = p[len("file:"):]
                while p.startswith("//"):
                    p = p[1:]
            out.add(os.path.relpath(p, self.root))
        return sorted(out)

    def _scan_with_meta(
        self,
        spark: SparkSession,
        files: list[str],
        schema: "T.StructType",
        dv_files: list[str] | None,
    ) -> DataFrame:
        """Scan ``files`` with the bookkeeping columns every mutation
        needs (``_sg_file``/``_sg_k3``/``_sg_pos``) and EXISTING
        deletion vectors already applied — so copy-on-write mutations
        on a table that previously took merge-on-read deletes neither
        resurrect nor double-count DV-deleted rows."""
        from pyspark.sql import functions as F

        _ensure_fieldid_read(spark, schema)
        df = spark.read.schema(schema).parquet(
            *[os.path.join(self.root, f) for f in files]
        ).select(
            "*",
            F.input_file_name().alias("_sg_file"),
            _file_key3().alias("_sg_k3"),
            F.col("_metadata.row_index").alias("_sg_pos"),
        )
        if dv_files:
            dv = spark.read.parquet(
                *[os.path.join(self.root, f) for f in dv_files]
            )
            df = df.join(
                F.broadcast(dv),
                (df["_sg_k3"] == dv["k3"]) & (df["_sg_pos"] == dv["pos"]),
                "left_anti",
            )
        return df

    def _write_dv(self, hits: DataFrame, version: int) -> list[str]:
        """Write a deletion-vector sidecar: (k3, pos) rows as parquet
        under a uniquely-named ``data/dv{N}-*`` dir (same collision
        discipline as ``_write_data``; vacuum sees the files through
        the manifest's ``dv_files`` references).

        ``coalesce(1)`` is a deliberate smallness contract: a DV row is
        ~20 bytes, so even a 100M-row delete is a ~2 GB single file —
        and read-side the WHOLE vector set must broadcast for the
        anti-join anyway, which is the real bound. A delete too big for
        that broadcast is past MOR's sweet spot and should be
        copy-on-write (or compact immediately after); production
        formats hit the same wall and answer with per-file roaring
        bitmaps, which this layout could adopt without changing the
        manifest contract."""
        rel_dir = None
        while rel_dir is None or os.path.exists(os.path.join(self.root, rel_dir)):
            suffix = os.path.basename(tempfile.mktemp(prefix=""))
            rel_dir = os.path.join("data", f"dv{version}-{suffix}")
        out_dir = os.path.join(self.root, rel_dir)
        hits.coalesce(1).write.parquet(out_dir)
        return sorted(
            os.path.join(rel_dir, name)
            for name in os.listdir(out_dir)
            if name.endswith(".parquet")
        )

    def _write_tombstones(self, dels: DataFrame, version: int) -> list[str]:
        """CDC delete-tombstone sidecar: (key cols, seq col) rows under
        ``data/ts{N}-*`` — the same smallness/broadcast contract as
        deletion vectors (a tombstone is ~the size of a key). Retained
        until :meth:`expire_tombstones`."""
        rel_dir = None
        while rel_dir is None or os.path.exists(os.path.join(self.root, rel_dir)):
            suffix = os.path.basename(tempfile.mktemp(prefix=""))
            rel_dir = os.path.join("data", f"ts{version}-{suffix}")
        out_dir = os.path.join(self.root, rel_dir)
        dels.coalesce(1).write.parquet(out_dir)
        return sorted(
            os.path.join(rel_dir, name)
            for name in os.listdir(out_dir)
            if name.endswith(".parquet")
        )

    def expire_tombstones(self, spark: SparkSession, seq_col: str,
                          before_seq) -> dict:
        """Drop CDC delete tombstones with sequence <= ``before_seq``
        (a metadata+sidecar commit; data files untouched). Retention is
        the caller's ordering guarantee: expiring a tombstone re-opens
        the window in which a change OLDER than it could arrive and be
        wrongly applied — expire only past the source's max lateness,
        exactly Delta's tombstone-retention contract."""
        from pyspark.sql import functions as F

        m = self.manifest()
        prev_ts = m.get("tombstone_files", [])
        if not prev_ts:
            return {"version": m["version"], "expired": 0, "retained": 0}
        ts = spark.read.parquet(*[os.path.join(self.root, f) for f in prev_ts])
        keep = ts.filter(F.col(seq_col) > before_seq)
        total = ts.count()
        kept_n = keep.count()
        version = m["version"] + 1
        new_ts = self._write_tombstones(keep, version) if kept_n else []
        man = {
            **{k: v for k, v in m.items()
               if k not in ("version", "base", "mode", "tombstone_files",
                            "epoch_id", "committed_at_ms")},
            "version": version,
            "base": m["version"],
            "mode": "maintenance",
            # expiry changes no rows — lineage walkers pass through
            "rewrite_only": True,
        }
        if new_ts:
            man["tombstone_files"] = new_ts
        self._publish(version, man)
        return {"version": version, "expired": total - kept_n,
                "retained": kept_n}

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        stats_range: tuple | None = None,
        mode: str = "cow",
        partition_filter: dict | None = None,
        bloom_probe: dict | None = None,
    ) -> dict:
        """Row-level DELETE, copy-on-write: rewrite ONLY the files that
        contain rows where ``condition`` is true; every other file is
        carried into the new version by reference. SQL DELETE
        semantics — rows where the predicate evaluates NULL survive.

        ``condition`` is a Column or SQL string. ``stats_range=(col,
        lo, hi)`` lets a :class:`StatsSnapshotTable` prune the
        candidate set manifest-side before any file is opened (a
        GDPR-delete keyed on a clustered column touches O(matching
        files) of a million-file table); files lacking stats are
        conservatively kept as candidates. ``bloom_probe={col:
        [values]}`` prunes the same way through the per-file bloom
        SIDECARS when the condition is an equality/IN on ``bloom_cols``
        (the GDPR delete-by-key shape on a table not clustered by that
        key — see :meth:`_bloom_caller_canons`). ``partition_filter``
        SCOPES the delete to the named partitions — the effective
        predicate is ``condition AND partition_filter`` (Delta
        ``replaceWhere`` semantics; matches outside the scope are
        deliberately untouched). All three hints are caller-trusted:
        a hint that does not actually cover the condition narrows the
        delete, it never corrupts untouched files — the exact
        predicate is re-applied on the candidate scan.

        ``mode`` picks the write strategy: ``'cow'`` (copy-on-write,
        above) rewrites affected files — pay at write, reads stay pure
        scans; ``'mor'`` (merge-on-read) writes a DELETION VECTOR
        sidecar of (file-key, row position) pairs and leaves every data
        file untouched — an O(matched rows) write regardless of file
        sizes, with reads paying a broadcast anti-join until
        ``compact()`` materializes the deletes. The GDPR caveat is
        real and documented: MOR'd bytes remain on disk until
        compaction + vacuum.

        Returns ``{"version", "rewritten_files", "kept_files",
        "deleted_rows"}``; a delete matching nothing publishes NO new
        version (``version`` = current head). Raises
        :class:`ConcurrentCommitError` on losing the version race —
        re-run against the new head (the rewrite must be recomputed, so
        no blind retry helper applies)."""
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(f"delete mode: {mode!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        m = self.manifest()
        head = m["version"]
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        prev_dv = m.get("dv_files", [])
        candidates = list(m["files"])
        if partition_filter:
            # Manifest-side partition SCOPING before stats pruning: a
            # DML op scoped to a few partitions (the GDPR / backfill /
            # retention shape) skips whole partitions without
            # consulting a single footer stat. ADVICE r7: this is a
            # caller-TRUSTED scope, not an inferred-safe pruning — the
            # effective predicate is ``condition AND <partition
            # filter>`` (Delta replaceWhere shape), so condition
            # matches OUTSIDE the named partitions are deliberately
            # not touched. stats_range and bloom_probe carry the same
            # trust model: the caller asserts the condition cannot
            # match outside the hint. Files without recorded tuples
            # stay candidates, so pre-spec files are never skipped.
            candidates = self._prune_partition_files(
                m, candidates, partition_filter
            )
        if stats_range is not None:
            col, lo, hi = stats_range
            stats = m.get("stats", {})
            candidates = [
                f
                for f in candidates
                if (rng := stats.get(f, {}).get(col)) is None
                or (rng[0] <= hi and rng[1] >= lo)
            ]
        if bloom_probe:
            candidates = self._bloom_prune_files(
                candidates, self._bloom_caller_canons(bloom_probe)
            )
        noop = {
            "version": head,
            "rewritten_files": 0,
            "kept_files": len(m["files"]),
            "deleted_rows": 0,
        }
        if not candidates:
            return noop
        cand = self._scan_with_meta(spark, candidates, schema, prev_dv)
        if mode == "mor":
            hits = cand.filter(cond).select(
                F.col("_sg_k3").alias("k3"), F.col("_sg_pos").alias("pos")
            )
            version = head + 1
            dv_new = self._write_dv(hits, version)
            deleted_rows = (
                spark.read.parquet(
                    *[os.path.join(self.root, f) for f in dv_new]
                ).count()
                if dv_new
                else 0
            )
            if deleted_rows == 0:
                for f in dv_new:  # nothing matched: drop the empty sidecar
                    os.unlink(os.path.join(self.root, f))
                return noop
            man = self._cow_manifest(
                version, head, "delete", m["schema"], list(m["files"]), [], m
            )
            man["dv_files"] = prev_dv + dv_new
            for _attempt in range(_MAX_COMMIT_REBASE):
                try:
                    self._publish(version, man)
                    break
                except ConcurrentCommitError:
                    # MOR deletes merge with concurrent appends AND
                    # with other MOR deletes (DV union is sound: a DV
                    # row targeting an already-DV'd row dedups in the
                    # anti-join) — conflict only if a concurrent COW
                    # rewrite removed a candidate file our DVs may
                    # target.
                    m2 = self._rebase_dml(
                        m, candidates, require_same_dv=False
                    )
                    version = m2["version"] + 1
                    man = self._cow_manifest(
                        version, m2["version"], "delete", m["schema"],
                        list(m2["files"]), [], m2,
                    )
                    man["dv_files"] = m2.get("dv_files", []) + dv_new
            else:
                raise ConcurrentCommitError(
                    f"MOR delete lost the version race "
                    f"{_MAX_COMMIT_REBASE} times — sustained contention"
                )
            return {
                "version": version,
                "rewritten_files": 0,
                "kept_files": len(man["files"]),
                "deleted_rows": deleted_rows,
            }
        # one pass finds the affected files AND the per-file delete
        # counts (bounded by file count, not row count)
        hit = cand.filter(cond).groupBy("_sg_file").count().collect()
        if not hit:
            return noop
        deleted_rows = sum(r["count"] for r in hit)
        affected = set(self._files_of(hit))
        survivors = self._scan_with_meta(
            spark, sorted(affected), schema, prev_dv
        ).filter(
            # keep rows where the predicate is FALSE or NULL
            ~cond.eqNullSafe(F.lit(True))
        ).drop("_sg_file", "_sg_k3", "_sg_pos")
        version = head + 1
        new_files = self._write_data(survivors, version, m["schema"])
        kept = [f for f in m["files"] if f not in affected]
        man = self._cow_manifest(
            version, head, "delete", m["schema"], kept, new_files, m
        )
        if prev_dv:
            # DV rows pointing at the dropped files match nothing now —
            # carried harmlessly until compaction clears them
            man["dv_files"] = prev_dv
        for _attempt in range(_MAX_COMMIT_REBASE):
            try:
                self._publish(version, man)
                break
            except ConcurrentCommitError:
                # disjoint-writer rebase: a concurrent append (or a DML
                # on a disjoint file set) doesn't invalidate this
                # rewrite — re-publish against the new head, carrying
                # ITS file list minus our affected files.
                m2 = self._rebase_dml(m, sorted(affected))
                version = m2["version"] + 1
                kept = [f for f in m2["files"] if f not in affected]
                man = self._cow_manifest(
                    version, m2["version"], "delete", m["schema"], kept,
                    new_files, m2,
                )
                if prev_dv:
                    man["dv_files"] = prev_dv
        else:
            raise ConcurrentCommitError(
                f"delete lost the version race {_MAX_COMMIT_REBASE} "
                f"times — sustained contention"
            )
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "deleted_rows": deleted_rows,
        }

    def overwrite_where(
        self,
        spark: SparkSession,
        condition,
        df: DataFrame,
        stats_range: tuple | None = None,
        partition_filter: dict | None = None,
        bloom_probe: dict | None = None,
    ) -> dict:
        """Atomic predicate-scoped overwrite (the Delta ``replaceWhere``
        backfill pattern): delete every row matching ``condition`` AND
        append ``df``'s rows, as ONE version — the recompute-a-slice
        idiom (rebuild yesterday's partition, replace one tenant's
        rows) with no window where the slice is missing. Copy-on-write
        file bookkeeping is identical to :meth:`delete_where`; rows of
        ``df`` that do not satisfy ``condition`` are rejected (the
        guard that keeps a backfill from silently writing outside its
        declared slice).

        Trade-off (round 14): the stray-row guard is validated from
        metrics observed DURING the data-file write, so a violating
        backfill pays one full (unpublished) write before it errors,
        and a crash between that write and the cleanup ``rmtree``
        leaves an orphan data dir for ``vacuum`` — the happy path
        saves a dedicated validation pass per call, the error path is
        not the case to optimize for. Nothing ever publishes before
        the guard passes.

        Returns ``{"version", "rewritten_files", "kept_files",
        "deleted_rows", "inserted_rows"}``."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        # both guards (stray rows outside the predicate) and the
        # inserted-row count ride the WRITE job as observed metrics —
        # the old shape ran a dedicated stray collect and a dedicated
        # count(), two extra passes over a often-derived backfill frame
        # (guide §1.2); nothing publishes before the guard is checked
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("__ow_n"),
            F.count(F.when(~cond.eqNullSafe(F.lit(True)), True)).alias(
                "__ow_stray"
            ),
        )
        m = self.manifest()
        head = m["version"]
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        schema_json = _merge_schema(m, df.schema)
        prev_dv = m.get("dv_files", [])
        candidates = list(m["files"])
        if partition_filter:
            # Manifest-side partition SCOPING before stats pruning: a
            # DML op scoped to a few partitions (the GDPR / backfill /
            # retention shape) skips whole partitions without
            # consulting a single footer stat. ADVICE r7: this is a
            # caller-TRUSTED scope, not an inferred-safe pruning — the
            # effective predicate is ``condition AND <partition
            # filter>`` (Delta replaceWhere shape), so condition
            # matches OUTSIDE the named partitions are deliberately
            # not touched. stats_range and bloom_probe carry the same
            # trust model: the caller asserts the condition cannot
            # match outside the hint. Files without recorded tuples
            # stay candidates, so pre-spec files are never skipped.
            candidates = self._prune_partition_files(
                m, candidates, partition_filter
            )
        if stats_range is not None:
            col, lo, hi = stats_range
            stats = m.get("stats", {})
            candidates = [
                f
                for f in candidates
                if (rng := stats.get(f, {}).get(col)) is None
                or (rng[0] <= hi and rng[1] >= lo)
            ]
        if bloom_probe:
            # same planning-only contract as stats_range; see
            # delete_where / _bloom_caller_canons
            candidates = self._bloom_prune_files(
                candidates, self._bloom_caller_canons(bloom_probe)
            )
        affected: set[str] = set()
        deleted_rows = 0
        if candidates:
            cand = self._scan_with_meta(spark, candidates, schema, prev_dv)
            hit = cand.filter(cond).groupBy("_sg_file").count().collect()
            if hit:
                deleted_rows = sum(r["count"] for r in hit)
                affected = set(self._files_of(hit))
        merged_schema = T.StructType.fromJson(json.loads(schema_json))

        def _align(d: DataFrame) -> DataFrame:
            return _align_to(d, merged_schema)

        out = _align(df)
        if affected:
            survivors = self._scan_with_meta(
                spark, sorted(affected), schema, prev_dv
            ).filter(~cond.eqNullSafe(F.lit(True))).drop(
                "_sg_file", "_sg_k3", "_sg_pos"
            )
            out = _align(survivors).unionByName(out)
        version = head + 1
        new_files = self._write_data(out, version, schema_json)
        inserted_rows = int(
            _obs_metric(obs, "__ow_n", lambda: df.count())
        )
        n_stray = int(
            _obs_metric(
                obs,
                "__ow_stray",
                lambda: df.filter(~cond.eqNullSafe(F.lit(True))).count(),
            )
        )
        if n_stray:
            # the write is unpublished garbage — drop it and report the
            # offending row exactly as before
            shutil.rmtree(
                os.path.join(self.root, self._last_write_reldir),
                ignore_errors=True,
            )
            stray = (
                df.filter(~cond.eqNullSafe(F.lit(True))).limit(1).collect()
            )
            raise ValueError(
                "overwrite_where: replacement rows must satisfy the "
                f"predicate; offending row: {tuple(stray[0])!r}"
            )
        kept = [f for f in m["files"] if f not in affected]
        man = self._cow_manifest(
            version, head, "overwrite_where", schema_json, kept, new_files, m
        )
        if prev_dv:
            man["dv_files"] = prev_dv
        self._publish(version, man)
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "deleted_rows": deleted_rows,
            "inserted_rows": inserted_rows,
        }

    def update_where(
        self,
        spark: SparkSession,
        condition,
        assignments: dict,
        stats_range: tuple | None = None,
        mode: str = "cow",
        partition_filter: dict | None = None,
        bloom_probe: dict | None = None,
    ) -> dict:
        """Row-level UPDATE — completes the DML triad (DELETE / MERGE /
        UPDATE) on the same machinery, in BOTH strategies. ``'cow'``
        rewrites only the files containing rows where ``condition`` is
        true, with ``assignments`` (column → Column/SQL expression)
        applied to the matching rows and every other row carried
        verbatim. ``'mor'`` (merge-on-read) deletion-vectors the
        matched rows and APPENDS their updated versions — O(matched
        rows) written, zero data files rewritten, reads pay the DV
        anti-join until ``compact()`` materializes (exactly the
        ``delete_where(mode='mor')`` tradeoff plus an append). SQL
        UPDATE semantics: a NULL-evaluating condition leaves the row
        unchanged. Existing deletion vectors are respected and carried.

        Returns ``{"version", "rewritten_files", "kept_files",
        "updated_rows"}``; an update matching nothing publishes no new
        version. Raises :class:`ConcurrentCommitError` on losing the
        version race."""
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(f"update mode: {mode!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        m = self.manifest()
        head = m["version"]
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        for col in assignments:
            if col not in {f.name for f in schema.fields}:
                raise ValueError(f"update of unknown column {col!r}")
        prev_dv = m.get("dv_files", [])
        candidates = list(m["files"])
        if partition_filter:
            # Manifest-side partition SCOPING before stats pruning: a
            # DML op scoped to a few partitions (the GDPR / backfill /
            # retention shape) skips whole partitions without
            # consulting a single footer stat. ADVICE r7: this is a
            # caller-TRUSTED scope, not an inferred-safe pruning — the
            # effective predicate is ``condition AND <partition
            # filter>`` (Delta replaceWhere shape), so condition
            # matches OUTSIDE the named partitions are deliberately
            # not touched. stats_range and bloom_probe carry the same
            # trust model: the caller asserts the condition cannot
            # match outside the hint. Files without recorded tuples
            # stay candidates, so pre-spec files are never skipped.
            candidates = self._prune_partition_files(
                m, candidates, partition_filter
            )
        if stats_range is not None:
            col, lo, hi = stats_range
            stats = m.get("stats", {})
            candidates = [
                f
                for f in candidates
                if (rng := stats.get(f, {}).get(col)) is None
                or (rng[0] <= hi and rng[1] >= lo)
            ]
        if bloom_probe:
            # same planning-only contract as stats_range; see
            # delete_where / _bloom_caller_canons
            candidates = self._bloom_prune_files(
                candidates, self._bloom_caller_canons(bloom_probe)
            )
        noop = {
            "version": head,
            "rewritten_files": 0,
            "kept_files": len(m["files"]),
            "updated_rows": 0,
        }
        if not candidates:
            return noop
        cand = self._scan_with_meta(spark, candidates, schema, prev_dv)
        hit = cand.filter(cond).groupBy("_sg_file").count().collect()
        if not hit:
            return noop
        updated_rows = sum(r["count"] for r in hit)
        affected = set(self._files_of(hit))
        matched = cond.eqNullSafe(F.lit(True))

        def _apply_assignments(df: DataFrame, always: bool) -> DataFrame:
            return df.select(
                *[
                    (
                        (
                            F.expr(assignments[f.name])
                            if isinstance(assignments.get(f.name), str)
                            else assignments[f.name]
                        ).cast(f.dataType)
                        if always
                        else F.when(
                            matched,
                            (
                                F.expr(assignments[f.name])
                                if isinstance(assignments.get(f.name), str)
                                else assignments[f.name]
                            ).cast(f.dataType),
                        ).otherwise(F.col(f.name))
                    ).alias(f.name)
                    if f.name in assignments
                    else F.col(f.name).alias(f.name)
                    for f in schema.fields
                ]
            )

        version = head + 1
        if mode == "mor":
            # DV the matched rows, append their updated versions — the
            # two writes derive from the same (files, predicate) scan,
            # so they are consistent; zero data files rewritten.
            matched_scan = self._scan_with_meta(
                spark, sorted(affected), schema, prev_dv
            ).filter(matched)
            dv_new = self._write_dv(
                matched_scan.select(
                    F.col("_sg_k3").alias("k3"), F.col("_sg_pos").alias("pos")
                ),
                version,
            )
            new_files = self._write_data(
                _apply_assignments(matched_scan, always=True), version,
                m["schema"],
            )
            man = self._cow_manifest(
                version, head, "update", m["schema"], list(m["files"]),
                new_files, m,
            )
            man["dv_files"] = prev_dv + dv_new
            self._publish(version, man)
            return {
                "version": version,
                "rewritten_files": 0,
                "kept_files": len(m["files"]),
                "updated_rows": updated_rows,
            }
        rewritten = _apply_assignments(
            self._scan_with_meta(spark, sorted(affected), schema, prev_dv),
            always=False,
        )
        new_files = self._write_data(rewritten, version, m["schema"])
        kept = [f for f in m["files"] if f not in affected]
        man = self._cow_manifest(
            version, head, "update", m["schema"], kept, new_files, m
        )
        if prev_dv:
            man["dv_files"] = prev_dv
        self._publish(version, man)
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "updated_rows": updated_rows,
        }

    def merge_rows(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        when_matched: str = "update",
        when_not_matched: str = "insert",
        mode: str = "cow",
    ) -> dict:
        """Row-level MERGE — the table-format promotion of the proven
        JDBC ``merge_sql`` semantics (sinks/jdbc.py): target rows whose
        key appears in ``source`` are replaced
        (``when_matched='update'``) or removed (``'delete'``); source
        rows with no target match are appended (``when_not_matched=
        'insert'``) or dropped (``'ignore'``).

        Scale shape (``mode='cow'``): only files CONTAINING matched
        keys are rewritten — the affected-file discovery is a key
        semi-join against the target scan (AQE broadcasts the source's
        key set when small, the common CDC-batch case), survivors are
        the affected files anti-joined on key, and matched/unmatched
        source rows are classified against the AFFECTED files only (a
        matched key can only live there), so no pass is O(table) beyond
        the one discovery semi-join, which prunes columns to the keys.
        ``mode='mor'`` (merge-on-read) deletion-vectors the matched
        target rows and APPENDS the source's contribution instead of
        rewriting any file — O(matched + source) written, reads pay the
        DV anti-join until ``compact()`` materializes; same equivalence
        contract as ``delete_where(mode='mor')``. Additive schema
        evolution applies (source may carry new columns; old files read
        NULL).

        Duplicate keys in ``source`` are rejected (same contract as the
        JDBC MERGE: a row matched twice is nondeterministic). Duplicate
        keys in the TARGET (appends can create them) are allowed and all
        collapse onto the one matching source row on update — the
        documented resolution, mirroring what the JDBC MERGE's key-equal
        UPDATE does to every matching target row; ``matched_rows``
        counts matched *target* rows, so it can exceed the number of
        matching source rows in that case.

        Returns ``{"version", "rewritten_files", "kept_files",
        "matched_rows", "inserted_rows"}``. Raises
        :class:`ConcurrentCommitError` on losing the version race."""
        from pyspark.sql import functions as F

        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched: {when_not_matched!r}")
        if mode not in ("cow", "mor"):
            raise ValueError(f"merge mode: {mode!r}")

        def _raise_dup(dup=None):
            # error path only; callers that already hold an offending
            # row pass it so the probe query never runs twice
            if dup is None:
                dup = (
                    source.groupBy(*key_cols)
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                    .collect()
                )
            raise ValueError(
                f"source has duplicate merge keys, e.g. "
                f"{tuple(dup[0][k] for k in key_cols)!r} — a target row "
                f"matched twice is nondeterministic"
            )

        head = self.latest_version()
        if head is None:
            ndup = (
                source.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if ndup:
                _raise_dup(ndup)
            if when_not_matched == "insert":
                v = self.commit(source, mode="append")
                n = source.count()
                return {
                    "version": v,
                    "rewritten_files": 0,
                    "kept_files": 0,
                    "matched_rows": 0,
                    "inserted_rows": n,
                }
            return {
                "version": None,
                "rewritten_files": 0,
                "kept_files": 0,
                "matched_rows": 0,
                "inserted_rows": 0,
            }
        m = self.manifest(head)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        schema_json = _merge_schema(m, source.schema)
        merged_schema = T.StructType.fromJson(json.loads(schema_json))
        # the source feeds three jobs (affected-file discovery, the
        # dup/insert stats pass, the rewrite) and is often a derived
        # CDC batch — pin it for the op, O(batch) by definition
        source = source.persist()
        try:
            return self._merge_rows_body(
                spark, source, key_cols, when_matched, when_not_matched,
                mode, m, head, schema, schema_json, merged_schema,
                _raise_dup,
            )
        finally:
            source.unpersist()

    def _merge_rows_body(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        when_matched: str,
        when_not_matched: str,
        mode: str,
        m: dict,
        head: int,
        schema,
        schema_json: str,
        merged_schema,
        _raise_dup,
    ) -> dict:
        from pyspark.sql import functions as F

        keys = source.select(*key_cols).distinct()
        prev_dv = m.get("dv_files", [])
        candidates = list(m["files"])
        if self._bloom_cols and candidates:
            # Bloom-sidecar candidate pruning (see apply_changes): the
            # affected-file discovery semi-join only needs files whose
            # blooms may contain a source key — on a bloom_cols table
            # an incremental merge scans O(files-with-matches), not
            # O(table), even with no partition spec on the key.
            candidates = self._bloom_prune_files(
                candidates, self._bloom_batch_canons(keys)
            )
        if candidates:
            target = self._scan_with_meta(spark, candidates, schema, prev_dv)
        else:  # every file bloom-rejected: nothing can match
            target = spark.createDataFrame([], schema).select(
                "*",
                F.lit(None).cast("string").alias("_sg_file"),
                F.lit(None).cast("string").alias("_sg_k3"),
                F.lit(None).cast("long").alias("_sg_pos"),
            )
        # ONE combined discovery/stats pass (guide §1.2, the
        # apply_changes fold applied to MERGE): the per-file hit counts
        # (affected-file discovery) and the per-key source stats (the
        # duplicate-key guard's max count plus the inserted-row count)
        # union under a tag column and collect together — round 14 had
        # already folded the dup guard and insert count into one stats
        # job; this removes the remaining dedicated discovery job. The
        # matched flag joins the source's per-key counts against the
        # DISTINCT MATCHED target keys, equivalent to the old
        # affected-files key set: any target row sharing a source key
        # lives in an affected file by construction. Counting inserts
        # as source.count() - matched_rows would be wrong:
        # matched_rows counts matched TARGET rows, so a target holding
        # duplicate keys would undercount (or go negative). A
        # synthetic-name collision with the key columns falls back to
        # the two-job shape (same answers, one extra pass).
        reserved = {"__mg_n", "__mg_m", "__mg_tag", "__mg_mx", "__mg_ins"}
        if reserved & set(key_cols) or "_sg_file" in key_cols:
            hit = (
                target.select(*key_cols, "_sg_file")
                .join(keys, on=key_cols, how="left_semi")
                .groupBy("_sg_file")
                .count()
                .collect()
            )
            matched_rows = sum(r["count"] for r in hit)
        else:
            hits_branch = (
                target.select(*key_cols, "_sg_file")
                .join(keys, on=key_cols, how="left_semi")
                .groupBy("_sg_file")
                .agg(F.count(F.lit(1)).alias("count"))
                .select(
                    F.lit(1).alias("__mg_tag"),
                    "_sg_file",
                    "count",
                    F.lit(None).cast("long").alias("__mg_mx"),
                    F.lit(None).cast("long").alias("__mg_ins"),
                )
            )
            matched_keys = (
                target.select(*key_cols)
                .join(keys, on=key_cols, how="left_semi")
                .distinct()
                .withColumn("__mg_m", F.lit(1))
            )
            stats_branch = (
                source.groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias("__mg_n"))
                .join(matched_keys, on=key_cols, how="left")
                .agg(
                    F.max("__mg_n").alias("__mg_mx"),
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("__mg_m").isNull(), F.col("__mg_n")
                            )
                        ),
                        F.lit(0),
                    ).alias("__mg_ins"),
                )
                .select(
                    F.lit(0).alias("__mg_tag"),
                    F.lit(None).cast("string").alias("_sg_file"),
                    F.lit(None).cast("long").alias("count"),
                    "__mg_mx",
                    "__mg_ins",
                )
            )
            rows = hits_branch.unionByName(stats_branch).collect()
            hit = [r for r in rows if r["__mg_tag"] == 1]
            matched_rows = sum(r["count"] for r in hit)
            st = next(r for r in rows if r["__mg_tag"] == 0)
            if (st["__mg_mx"] or 0) > 1:
                _raise_dup()
        affected = set(self._files_of(hit)) if hit else set()

        def _align(df: DataFrame) -> DataFrame:
            return _align_to(df, merged_schema)

        if affected:
            aff_df = self._scan_with_meta(spark, sorted(affected), schema, prev_dv)
            aff_keys = aff_df.select(*key_cols).distinct()
        else:
            aff_df = None
            aff_keys = None
        if reserved & set(key_cols) or "_sg_file" in key_cols:
            dup = (
                source.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                _raise_dup()
            ins_would = (
                source.join(aff_keys, on=key_cols, how="left_anti")
                if aff_keys is not None
                else source
            ).count()
        else:
            ins_would = int(st["__mg_ins"])
        src_parts: list[DataFrame] = []
        inserted_rows = 0
        if when_matched == "update" and when_not_matched == "insert":
            src_parts.append(_align(source))  # updates ∪ inserts = all of source
            inserted_rows = ins_would
        else:
            if when_matched == "update" and aff_keys is not None:
                src_parts.append(
                    _align(source.join(aff_keys, on=key_cols, how="left_semi"))
                )
            if when_not_matched == "insert":
                ins = (
                    source.join(aff_keys, on=key_cols, how="left_anti")
                    if aff_keys is not None
                    else source
                )
                inserted_rows = ins_would
                src_parts.append(_align(ins))
        if not affected and not inserted_rows and when_not_matched != "insert":
            return {
                "version": head,
                "rewritten_files": 0,
                "kept_files": len(m["files"]),
                "matched_rows": 0,
                "inserted_rows": 0,
            }
        version = head + 1
        if mode == "mor":
            # Merge-on-read: deletion-vector every matched target row
            # (whether being updated or deleted) and APPEND the source's
            # contribution — zero files rewritten; the read-side DV
            # anti-join hides the superseded rows until compact().
            dv_new: list[str] = []
            if aff_df is not None:
                hits = aff_df.join(keys, on=key_cols, how="left_semi").select(
                    F.col("_sg_k3").alias("k3"), F.col("_sg_pos").alias("pos")
                )
                dv_new = self._write_dv(hits, version)
            new_files: list[str] = []
            if src_parts:
                out = src_parts[0]
                for p in src_parts[1:]:
                    out = out.unionByName(p)
                new_files = self._write_data(out, version, schema_json)
            man = self._cow_manifest(
                version, head, "merge", schema_json, list(m["files"]),
                new_files, m,
            )
            if prev_dv or dv_new:
                man["dv_files"] = prev_dv + dv_new
            self._publish(version, man)
            return {
                "version": version,
                "rewritten_files": 0,
                "kept_files": len(m["files"]),
                "matched_rows": matched_rows,
                "inserted_rows": inserted_rows,
            }
        parts = list(src_parts)
        if aff_df is not None:
            # survivors of the affected files: rows whose key the source
            # does NOT carry ride along into the rewrite
            parts.insert(
                0, _align(aff_df.join(keys, on=key_cols, how="left_anti"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        new_files = self._write_data(out, version, schema_json)
        kept = [f for f in m["files"] if f not in affected]
        man = self._cow_manifest(
            version, head, "merge", schema_json, kept, new_files, m
        )
        if prev_dv:
            man["dv_files"] = prev_dv
        self._publish(version, man)
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "matched_rows": matched_rows,
            "inserted_rows": inserted_rows,
        }

    def _keys_and_hits(
        self,
        spark: SparkSession,
        kagg: DataFrame,
        key_cols: list[str],
        cap: int,
    ):
        """ONE collect serving a maintenance window's two bookkeeping
        consumers (guide §1.2 — same fold as ``apply_changes``'s
        combined discovery/stats pass): the caller's per-key aggregate
        ``kagg`` (key columns first, any extra stat columns after) and
        THIS table's affected-file discovery for those keys — the
        semi-join ``replace_where_keys`` would otherwise run as its own
        job. The two subtrees union under a tag column and collect
        once.

        Returns ``(key_rows, (m, affected, replaced_rows))`` where
        ``key_rows`` are the tag-0 rows (the caller's aggregate,
        ≤ ``cap`` of them) and the second element is the precomputed
        discovery ``replace_where_keys`` accepts — both computed
        against the SAME manifest ``m``, so the swap that follows
        operates on exactly the state the discovery saw (concurrent
        commits still surface at publish through the normal rebase
        path). Returns ``None`` — callers fall back to the two-job
        shape — when the fused pass doesn't apply: fresh table,
        bloom-indexed keys (the sidecar probe needs driver-side key
        values before the scan), a synthetic-name collision, or more
        than ``cap`` keys (the caller's inline paths don't apply
        either, and the exact count path re-runs from lineage)."""
        from functools import reduce as _reduce

        from pyspark.sql import functions as F

        if self.latest_version() is None or self._bloom_cols:
            return None
        reserved = {"__kh_tag", "__kh_cnt", "_sg_file", "_sg_k3", "_sg_pos"}
        kagg_cols = [f.name for f in kagg.schema.fields]
        if reserved & set(kagg_cols):
            return None
        m = self.manifest()
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        ktypes = {f.name: f.dataType for f in kagg.schema.fields}
        tagged_keys = kagg.limit(cap + 1).select(
            F.lit(0).alias("__kh_tag"),
            *[F.col(c) for c in kagg_cols],
            F.lit(None).cast("string").alias("_sg_file"),
            F.lit(None).cast("long").alias("__kh_cnt"),
        )
        candidates = list(m["files"])
        if candidates:
            target = self._scan_with_meta(
                spark, candidates, schema, m.get("dv_files")
            )
            cond = _reduce(
                lambda a, b: a & b,
                [
                    F.col(f"__kt.{c}").eqNullSafe(F.col(f"__kk.{c}"))
                    for c in key_cols
                ],
            )
            hits = (
                target.alias("__kt")
                .join(kagg.select(*key_cols).alias("__kk"), cond, "left_semi")
                .groupBy("_sg_file")
                .agg(F.count(F.lit(1)).alias("__kh_cnt"))
                .select(
                    F.lit(1).alias("__kh_tag"),
                    *[
                        F.lit(None).cast(ktypes[c]).alias(c)
                        for c in kagg_cols
                    ],
                    F.col("_sg_file"),
                    F.col("__kh_cnt"),
                )
            )
            combined = tagged_keys.unionByName(hits)
        else:
            combined = tagged_keys
        rows = combined.collect()
        key_rows = [r for r in rows if r["__kh_tag"] == 0]
        if len(key_rows) > cap:
            return None
        hit = [r for r in rows if r["__kh_tag"] == 1]
        replaced_rows = sum(r["__kh_cnt"] for r in hit)
        affected = set(self._files_of(hit)) if hit else set()
        return key_rows, (m, affected, replaced_rows)

    def replace_where_keys(
        self,
        spark: SparkSession,
        keys: DataFrame,
        replacement: DataFrame,
        key_cols: list[str],
        epoch_id: int | None = None,
        validate: bool = True,
        manifest_extra: dict | None = None,
        _precomputed: "tuple | None" = None,
    ) -> dict:
        """Atomic key-scoped overwrite: delete every target row whose
        key tuple appears in ``keys``, append ``replacement``'s rows —
        ONE copy-on-write commit (the key-set analog of Delta's
        ``replaceWhere``). The primitive incremental view maintenance
        needs (operators recompute a set of groups and swap them in),
        and the GDPR "re-key this customer's rows" shape.

        Semantics differ from :meth:`merge_rows` in three load-bearing
        ways: ``replacement`` may carry ZERO OR MANY rows per key (a
        group can shrink to nothing — the key is simply deleted — or
        expand); key matching is NULL-SAFE (a NULL group key is a
        legitimate GROUP BY value, and ``eqNullSafe`` keeps it
        addressable, where a plain equi-join would strand it forever);
        and the delete+insert publishes as one manifest, so no reader
        ever observes the half-applied state. ``validate=True`` (the
        default) asserts every replacement row's key is inside the
        ``keys`` scope — a row outside it would silently duplicate
        against the untouched copy still in the table. ``epoch_id`` is
        stamped into the manifest (same field the streaming sinks use
        for replay detection); incremental maintainers use it to record
        the upstream version a refresh applied, atomically with the
        data it produced.

        Scale shape: affected-file discovery is one key semi-join
        against the candidate scan (bloom sidecars prune candidates
        first when the table indexes a key column); survivors of
        affected files rewrite, untouched files carry by reference,
        and ``replacement`` lands as fresh files — O(affected + new),
        never O(table). Returns ``{"version", "rewritten_files",
        "kept_files", "replaced_rows", "inserted_rows"}``; a call that
        matches nothing and inserts nothing publishes NO new version.

        ``_precomputed`` (maintenance fast path, see
        :meth:`_keys_and_hits`): the ``(manifest, affected_files,
        replaced_rows)`` triple of a discovery the caller already rode
        on one of its own jobs — this call then skips its discovery
        job and swaps against exactly that manifest (a concurrent
        commit still surfaces at publish via the rebase path, same as
        always)."""
        from functools import reduce

        from pyspark.sql import functions as F

        extra_keys = _check_manifest_extra(manifest_extra)
        keys = keys.select(*key_cols).distinct()

        def _key_cond(left_alias: str, right_alias: str):
            return reduce(
                lambda a, b: a & b,
                [
                    F.col(f"{left_alias}.{c}").eqNullSafe(
                        F.col(f"{right_alias}.{c}")
                    )
                    for c in key_cols
                ],
            )

        if validate:
            # the replacement is consumed twice on this path (stray
            # probe + file write) and is often an expensive derived
            # frame — pin it for the op's duration
            replacement = replacement.persist()
            stray = (
                replacement.alias("__rr")
                .join(keys.alias("__rk"), _key_cond("__rr", "__rk"), "left_anti")
                .limit(1)
                .collect()
            )
            if stray:
                replacement.unpersist()
                raise ValueError(
                    f"replacement row outside the keys scope, e.g. "
                    f"{tuple(stray[0][c] for c in key_cols)!r} — it would "
                    f"duplicate against the untouched copy; widen `keys` "
                    f"or pass validate=False if the scope is intentional"
                )
        if self.latest_version() is None:  # fresh table: pure insert
            n = replacement.count()
            if validate:
                replacement.unpersist()
            if n == 0:
                return {
                    "version": None,
                    "rewritten_files": 0,
                    "kept_files": 0,
                    "replaced_rows": 0,
                    "inserted_rows": 0,
                }
            v = self.commit(
                replacement,
                mode="append",
                epoch_id=epoch_id,
                manifest_extra=extra_keys,
            )
            return {
                "version": v,
                "rewritten_files": 0,
                "kept_files": 0,
                "replaced_rows": 0,
                "inserted_rows": n,
            }
        if _precomputed is not None:
            m, affected, replaced_rows = _precomputed
            affected = set(affected)
            head = m["version"]
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            schema_json = _merge_schema(m, replacement.schema)
            merged_schema = T.StructType.fromJson(json.loads(schema_json))
            prev_dv = m.get("dv_files", [])
        else:
            m = self.manifest()
            head = m["version"]
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            schema_json = _merge_schema(m, replacement.schema)
            merged_schema = T.StructType.fromJson(json.loads(schema_json))
            prev_dv = m.get("dv_files", [])
            candidates = list(m["files"])
            if self._bloom_cols and candidates:
                candidates = self._bloom_prune_files(
                    candidates, self._bloom_batch_canons(keys)
                )
            affected = set()
            replaced_rows = 0
            if candidates:
                target = self._scan_with_meta(
                    spark, candidates, schema, prev_dv
                )
                hit = (
                    target.alias("__rt")
                    .join(
                        keys.alias("__rk"),
                        _key_cond("__rt", "__rk"),
                        "left_semi",
                    )
                    .groupBy("_sg_file")
                    .count()
                    .collect()
                )
                replaced_rows = sum(r["count"] for r in hit)
                if hit:
                    affected = set(self._files_of(hit))

        def _align(df: DataFrame) -> DataFrame:
            return _align_to(df, merged_schema)

        # inserted_rows rides the WRITE job as an observed metric
        # instead of a dedicated count() action (guide §1.2: one Spark
        # job fewer per call; the old shape also had to persist the
        # replacement to bridge the two consumers — with a single
        # consumer the persist goes too on the validate=False path)
        from pyspark.sql import Observation

        obs = Observation()
        observed = replacement.observe(
            obs, F.count(F.lit(1)).alias("__rwk_n")
        )
        parts = [_align(observed)]
        if affected:
            aff_df = self._scan_with_meta(
                spark, sorted(affected), schema, prev_dv
            )
            survivors = (
                aff_df.alias("__rt")
                .join(keys.alias("__rk"), _key_cond("__rt", "__rk"), "left_anti")
                .drop("_sg_file", "_sg_k3", "_sg_pos")
            )
            parts.insert(0, _align(survivors))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        version = head + 1
        new_files = self._write_data(out, version, schema_json)
        try:
            inserted_rows = int(obs.get["__rwk_n"])
        except Exception:
            # the optimizer removes CollectMetrics when it can prove
            # the observed subtree empty (PropagateEmptyRelation — e.g.
            # a recompute post-image over a fully-deleted partition's
            # now-empty pruned scan), and getRow() then yields a
            # schema-less empty row toPyRow refuses. Count directly:
            # on that path the plan is an empty relation, so the job is
            # instant; any other metrics miss recomputes the real count.
            inserted_rows = replacement.count()
        if not affected and inserted_rows == 0:
            # nothing matched, nothing inserted: publish NO version.
            # The (empty) write already happened — drop its never-
            # referenced directory; crash-leftover garbage of the same
            # shape is already vacuum's business, so best-effort.
            if validate:
                replacement.unpersist()
            shutil.rmtree(
                os.path.join(self.root, self._last_write_reldir),
                ignore_errors=True,
            )
            return {
                "version": head,
                "rewritten_files": 0,
                "kept_files": len(m["files"]),
                "replaced_rows": 0,
                "inserted_rows": 0,
            }
        kept = [f for f in m["files"] if f not in affected]
        man = self._cow_manifest(
            version, head, "replace", schema_json, kept, new_files, m
        )
        if prev_dv:
            # DV rows aimed at dropped files match nothing — carried
            # harmlessly until compaction clears them (delete_where's
            # documented contract)
            man["dv_files"] = prev_dv
        if epoch_id is not None:
            man["epoch_id"] = epoch_id
        man.update(extra_keys)
        for _attempt in range(_MAX_COMMIT_REBASE):
            try:
                self._publish(version, man)
                break
            except ConcurrentCommitError:
                m2 = self._rebase_dml(m, sorted(affected))
                try:
                    self._check_epoch_unclaimed(m, m2, epoch_id)
                except ConcurrentCommitError:
                    if validate:
                        replacement.unpersist()
                    raise
                version = m2["version"] + 1
                kept = [f for f in m2["files"] if f not in affected]
                man = self._cow_manifest(
                    version, m2["version"], "replace", schema_json, kept,
                    new_files, m2,
                )
                if prev_dv:
                    man["dv_files"] = prev_dv
                if epoch_id is not None:
                    man["epoch_id"] = epoch_id
                man.update(extra_keys)
        else:
            if validate:
                replacement.unpersist()
            raise ConcurrentCommitError(
                f"replace lost the version race {_MAX_COMMIT_REBASE} "
                f"times — sustained contention"
            )
        if validate:
            replacement.unpersist()
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "replaced_rows": replaced_rows,
            "inserted_rows": inserted_rows,
        }

    def apply_changes(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        op_col: str = "_op",
        seq_col: str | None = None,
        mode: str = "cow",
        epoch_id: int | None = None,
    ) -> dict:
        """Apply a CDC CHANGELOG (mixed upserts + deletes, possibly
        out of order) as ONE atomic version — the table-format form of
        Delta's APPLY CHANGES INTO, and the batch half of
        :class:`SnapshotMergeSink`.

        ``source`` carries the table's columns plus ``op_col`` with
        values ``'upsert'`` / ``'delete'`` (anything else is rejected —
        an unknown op is a data bug, not a row to guess about).

        Sequencing: with ``seq_col`` (a totally-ordered change-sequence
        column — commit LSN, event time), the batch is first reduced to
        the LATEST change per key (ties broken toward ``'upsert'``,
        then — for equal-seq duplicate upserts — by a hash of the full
        payload so the winner is stable across runs and
        partitionings), and — because ``seq_col`` is stored as an
        ordinary table column — STALE changes whose sequence does not
        exceed the target row's are skipped entirely, and every applied
        DELETE leaves a (key, seq) TOMBSTONE sidecar so its sequence
        keeps guarding the key after the row is gone (a re-insert older
        than the delete is rejected; Delta's tombstone-retention
        contract). Together these make the apply idempotent and fully
        order-insensitive ACROSS batches: any interleaving of
        micro-batches converges to the sequence-ordered batch apply.
        Tombstones are retained until :meth:`expire_tombstones` (expire
        only past the source's max lateness). Without ``seq_col``,
        duplicate keys in a batch are rejected (no order to resolve
        them by) and cross-batch ordering is the caller's contract.

        ``mode='cow'`` rewrites only the files containing changed keys
        (the :meth:`merge_rows` discovery shape); ``'mor'``
        deletion-vectors the superseded rows and appends the upserts —
        O(changes) written. ``epoch_id`` lands in the manifest for the
        streaming sink's replay detection. Like :meth:`merge_rows`,
        assumes key-unique target maintenance (every matched target row
        is superseded by the key's single effective change).

        Returns ``{"version", "rewritten_files", "kept_files",
        "upserted_rows", "deleted_rows", "skipped_stale"}``."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(f"apply_changes mode: {mode!r}")
        if op_col not in source.columns:
            raise ValueError(f"op column {op_col!r} not in source")
        # the bad-op-value guard rides the batch's FIRST job as an
        # observed metric instead of a dedicated full-scan collect
        # (guide §1.2); it is checked before anything publishes, and
        # _obs_metric falls back to the direct query if the optimizer
        # collapsed the observed subtree (statically-empty source)
        from pyspark.sql import Observation

        bad_cond = ~F.col(op_col).isin("upsert", "delete")
        obs_src = Observation()
        source = source.observe(
            obs_src,
            F.count(F.when(bad_cond, True)).alias("__ac_bad"),
            F.max(F.when(bad_cond, F.col(op_col))).alias("__ac_badex"),
        )

        def _check_bad_ops():
            n_bad = _obs_metric(
                obs_src,
                "__ac_bad",
                lambda: source.filter(bad_cond).limit(1).count(),
            )
            if n_bad:
                ex = _obs_metric(
                    obs_src,
                    "__ac_badex",
                    lambda: source.filter(bad_cond)
                    .limit(1)
                    .collect()[0][op_col],
                )
                raise ValueError(
                    f"unknown {op_col} value {ex!r}: expected "
                    f"'upsert' or 'delete'"
                )

        changes = source
        if seq_col is not None:
            if seq_col not in source.columns:
                raise ValueError(f"sequence column {seq_col!r} not in source")
            # ADVICE r6: (seq desc, op desc) alone leaves two equal-seq
            # upserts for the same key tied on both sort keys — row_number
            # would pick an arbitrary winner that can differ across runs
            # and partitionings. A payload hash as the final key makes
            # the choice deterministic (and the op-desc key above still
            # guarantees upsert beats delete on seq ties).
            payload_hash = F.xxhash64(
                *[F.col(c) for c in source.columns if c != op_col]
            )
            w = W.partitionBy(*key_cols).orderBy(
                F.col(seq_col).desc(), F.col(op_col).desc(),
                payload_hash.desc(),
            )
            changes = (
                changes.withColumn("_sg_rn", F.row_number().over(w))
                .filter(F.col("_sg_rn") == 1)
                .drop("_sg_rn")
            )
        else:
            dup = (
                source.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            _check_bad_ops()
            if dup:
                raise ValueError(
                    f"changelog batch has multiple changes for key "
                    f"{tuple(dup[0][k] for k in key_cols)!r} and no "
                    f"seq_col to order them by"
                )
        head = self.latest_version()
        if head is None:
            ups = changes.filter(F.col(op_col) != "delete").drop(op_col)
            n = ups.count()
            _check_bad_ops()
            dels = (
                changes.filter(F.col(op_col) == "delete")
                .select(*key_cols, seq_col)
                if seq_col is not None
                else None
            )
            n_dels = dels.count() if dels is not None else 0
            if n == 0 and n_dels == 0:
                return {
                    "version": None,
                    "rewritten_files": 0,
                    "kept_files": 0,
                    "upserted_rows": 0,
                    "deleted_rows": 0,
                    "skipped_stale": 0,
                }
            # first commit built manually so a delete-before-its-insert
            # leaves a TOMBSTONE in the same atomic version
            version = 1
            schema_json = _fresh_schema_json(ups.schema)
            spec = self.partition_spec()
            files = self._write_data(ups, version, schema_json) if n else []
            man = {
                "version": version,
                "base": None,
                "mode": "append",
                "schema": schema_json,
                "files": files,
            }
            if spec:
                man["partition_spec"] = spec
            if self._pending_file_partitions:
                man["file_partitions"] = {
                    f: self._pending_file_partitions[f]
                    for f in files
                    if f in self._pending_file_partitions
                }
            if n_dels:
                man["tombstone_files"] = self._write_tombstones(dels, version)
            if epoch_id is not None:
                man["epoch_id"] = epoch_id
            self._publish(version, man)
            return {
                "version": version,
                "rewritten_files": 0,
                "kept_files": 0,
                "upserted_rows": n,
                "deleted_rows": 0,
                "skipped_stale": 0,
            }
        m = self.manifest(head)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        schema_json = _merge_schema(m, changes.drop(op_col).schema)
        merged_schema = T.StructType.fromJson(json.loads(schema_json))
        prev_dv = m.get("dv_files", [])
        prev_ts = m.get("tombstone_files", [])
        # Partition-pruned candidate selection: when the table is
        # identity-partitioned on a SUBSET OF THE MERGE KEY (tenant,
        # region, event date — the time-partitioned CDC norm), a key's
        # target rows can only live in files whose partition tuple
        # matches the key's own values, so the affected-file discovery
        # scan — and the stale-skip max-seq scan riding on it — needs
        # only the files of partitions PRESENT IN THE BATCH plus
        # unrecorded (pre-spec) files. Manifest arithmetic over the
        # batch's distinct partition tuples; correctness never depends
        # on it (keys outside the pruned set simply can't exist there).
        # Skipped when the batch touches implausibly many partitions
        # (collect stays bounded) or when partition cols aren't all in
        # the key (a key could then match rows in any partition).
        candidate_files = list(m["files"])
        p_spec = m.get("partition_spec")
        if p_spec and m.get("file_partitions"):
            types = {f.name: f.dataType for f in schema.fields}
            pfields = [_parse_spec_entry(e) for e in p_spec]
            sources = [pf.source for pf in pfields]
            if (
                set(sources) <= set(key_cols)
                and all(c in types for c in sources)
            ):
                pv_rows = (
                    changes.select(*sources)
                    .distinct()
                    .limit(10001)
                    .collect()
                )
                if len(pv_rows) <= 10_000:
                    # map each key's source values through the spec's
                    # transforms — a bucket/month-partitioned CDC
                    # target prunes exactly like an identity one
                    batch_tuples = {
                        tuple(
                            pf.py_apply(r[pf.source], types[pf.source])
                            for pf in pfields
                        )
                        for r in pv_rows
                    }
                    names = [pf.name for pf in pfields]
                    fp = m["file_partitions"]
                    # a file whose recorded tuple lacks ANY spec field
                    # (written under an older spec) can hold any key —
                    # keep it, exactly like _prune_partition_files does
                    candidate_files = [
                        f
                        for f in m["files"]
                        if (e := fp.get(f)) is None
                        or any(c not in e for c in names)
                        or tuple(e[c] for c in names) in batch_tuples
                    ]
        if self._bloom_cols and candidate_files:
            # Bloom-sidecar pruning, the key-scoped complement to the
            # partition arithmetic above: a CDC target NOT partitioned
            # by the merge key still skips every candidate file whose
            # per-column blooms reject the whole batch's key set. The
            # drop is exact (no bloom false negatives), so the
            # stale-skip max-seq scan riding on the candidate set stays
            # correct: a pruned file provably holds none of the
            # changed keys, hence no sequence that could guard them.
            candidate_files = self._bloom_prune_files(
                candidate_files,
                self._bloom_batch_canons(changes.select(*key_cols)),
            )
        self.last_apply_candidates = (len(candidate_files), len(m["files"]))
        if candidate_files:
            target = self._scan_with_meta(
                spark, candidate_files, schema, prev_dv
            )
            target_seq_src = target
        else:
            # no candidate can match: hand _apply_resolved no target at
            # all (an empty-LocalRelation target would let the optimizer
            # collapse the combined stats join, taking the observed
            # metrics with it); the stale-skip scan below still needs an
            # empty typed frame for its union shape
            target = None
            target_seq_src = spark.createDataFrame([], schema).select(
                "*",
                F.lit(None).cast("string").alias("_sg_file"),
                F.lit(None).cast("string").alias("_sg_k3"),
                F.lit(None).cast("long").alias("_sg_pos"),
            )
        skipped_stale = 0
        if seq_col is not None and (
            seq_col in {f.name for f in schema.fields} or prev_ts
        ):
            # Stale-skip: one column-pruned pass over the target (plus
            # the delete-tombstone sidecars — a deleted row's sequence
            # must keep guarding its key) for the max stored sequence
            # per CHANGED key (semi-join bounds it to the change set),
            # then drop changes it supersedes.
            seq_srcs = []
            if seq_col in {f.name for f in schema.fields}:
                seq_srcs.append(target_seq_src.select(*key_cols, seq_col))
            if prev_ts:
                seq_srcs.append(
                    spark.read.parquet(
                        *[os.path.join(self.root, f) for f in prev_ts]
                    ).select(*key_cols, seq_col)
                )
            allseq = seq_srcs[0]
            for extra in seq_srcs[1:]:
                allseq = allseq.unionByName(extra)
            tgt_seq = (
                allseq.join(
                    changes.select(*key_cols).distinct(),
                    on=key_cols,
                    how="left_semi",
                )
                .groupBy(*key_cols)
                .agg(F.max(seq_col).alias("_sg_tseq"))
            )
            fresh_cond = F.col("_sg_tseq").isNull() | (
                F.col(seq_col) > F.col("_sg_tseq")
            )
            obs_stale = Observation()
            with_t = changes.join(tgt_seq, on=key_cols, how="left").observe(
                obs_stale,
                F.count(F.when(~fresh_cond, True)).alias("__ac_stale"),
            )
            stale_src = with_t
            changes = with_t.filter(fresh_cond).drop("_sg_tseq")

            def _skipped_stale():
                # read after the first downstream job fired the metric;
                # the fallback recount only runs if the optimizer
                # collapsed the observed subtree (statically empty)
                return int(
                    _obs_metric(
                        obs_stale,
                        "__ac_stale",
                        lambda: stale_src.filter(~fresh_cond).count(),
                    )
                )

        else:
            def _skipped_stale():
                return 0
        # The resolved change set feeds the downstream jobs (combined
        # discovery/stats pass, classification splits, the write);
        # persist it once so the window-dedup + stale-skip joins don't
        # recompute per job — at big-batch scale that recomputation is
        # the memory and wall-clock hot spot. The first downstream job
        # materializes it (no dedicated count).
        from pyspark import StorageLevel

        changes = changes.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._apply_resolved(
                spark, changes, key_cols, op_col, seq_col, mode, epoch_id,
                m, head, schema, schema_json, merged_schema, target,
                prev_dv, prev_ts, _skipped_stale, _check_bad_ops,
            )
        finally:
            changes.unpersist()

    def _apply_resolved(
        self, spark, changes, key_cols, op_col, seq_col, mode, epoch_id,
        m, head, schema, schema_json, merged_schema, target, prev_dv,
        prev_ts, _skipped_stale, _check_bad_ops,
    ) -> dict:
        """The post-resolution half of :meth:`apply_changes`:
        ``changes`` is the deduped, stale-filtered (and persisted)
        effective change set; everything here is classification,
        writes, and the manifest.

        ONE combined discovery/stats pass (guide §1.2, §2.4): the
        per-key change stats (has-a-delete flag, upsert/delete row
        counts) aggregate once, join the target's candidate scan
        INNER (keys are distinct, so target rows never multiply), and
        a single collect yields the affected files, the matched-row
        count AND the deleted-row count, while the batch totals ride
        the same job as observed metrics. The old shape ran five jobs
        (hit semi-join, ups.count, dels.count, deleted_rows semi-join,
        plus the pre-persist materializing count)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        kstats = changes.groupBy(*key_cols).agg(
            F.max((F.col(op_col) == "delete").cast("int")).alias(
                "__ac_hasdel"
            ),
            F.sum((F.col(op_col) != "delete").cast("long")).alias(
                "__ac_nup"
            ),
            F.sum((F.col(op_col) == "delete").cast("long")).alias(
                "__ac_ndel"
            ),
        )
        obs_k = Observation()
        kstats = kstats.observe(
            obs_k,
            F.sum("__ac_nup").alias("__ac_tup"),
            F.sum("__ac_ndel").alias("__ac_tdel"),
        )

        def _tot(col_name, metric):
            return int(
                _obs_metric(
                    obs_k,
                    metric,
                    lambda: changes.filter(
                        (F.col(op_col) == "delete")
                        == (col_name == "__ac_ndel")
                    ).count(),
                )
                or 0
            )

        if target is not None:
            hit = (
                target.select(*key_cols, "_sg_file")
                .join(kstats, on=key_cols, how="inner")
                .groupBy("_sg_file")
                .agg(
                    F.count(F.lit(1)).alias("count"),
                    F.sum("__ac_hasdel").alias("__ac_delhits"),
                )
                .collect()
            )
            deleted_rows = int(
                sum(r["__ac_delhits"] or 0 for r in hit)
            )
        else:  # every candidate bloom/partition-rejected: no matches
            kstats.agg(F.count(F.lit(1))).collect()  # fire the metrics
            hit = []
            deleted_rows = 0
        affected = set(self._files_of(hit)) if hit else set()
        upserted_rows = _tot("__ac_nup", "__ac_tup")
        n_dels = _tot("__ac_ndel", "__ac_tdel") if seq_col is not None else 0
        _check_bad_ops()
        skipped_stale = _skipped_stale()
        keys = changes.select(*key_cols).distinct()
        ups = changes.filter(F.col(op_col) != "delete").drop(op_col)
        dels = (
            changes.filter(F.col(op_col) == "delete")
            .select(*key_cols, seq_col)
            if seq_col is not None
            else None
        )
        aff_df = (
            self._scan_with_meta(spark, sorted(affected), schema, prev_dv)
            if affected
            else None
        )
        if not affected and upserted_rows == 0 and n_dels == 0:
            return {  # nothing to publish: everything missed / stale
                "version": head,
                "rewritten_files": 0,
                "kept_files": len(m["files"]),
                "upserted_rows": 0,
                "deleted_rows": 0,
                "skipped_stale": skipped_stale,
            }

        def _align(df: DataFrame) -> DataFrame:
            return _align_to(df, merged_schema)

        version = head + 1
        if mode == "mor":
            dv_new: list[str] = []
            if aff_df is not None:
                hits = aff_df.join(keys, on=key_cols, how="left_semi").select(
                    F.col("_sg_k3").alias("k3"), F.col("_sg_pos").alias("pos")
                )
                dv_new = self._write_dv(hits, version)
            new_files = (
                self._write_data(_align(ups), version, schema_json)
                if upserted_rows
                else []
            )
            ts_new = self._write_tombstones(dels, version) if n_dels else []
            base_files, base_dv, base_ts, base_head, base_m2 = (
                list(m["files"]), prev_dv, prev_ts, head, m,
            )
            for _attempt in range(_MAX_COMMIT_REBASE):
                man = self._cow_manifest(
                    version, base_head, "merge", schema_json, base_files,
                    new_files, base_m2,
                )
                if base_dv or dv_new:
                    man["dv_files"] = base_dv + dv_new
                if ts_new or base_ts:
                    man["tombstone_files"] = base_ts + ts_new
                if epoch_id is not None:
                    man["epoch_id"] = epoch_id
                try:
                    self._publish(version, man)
                    break
                except ConcurrentCommitError:
                    # disjoint-writer rebase (two CDC streams on
                    # disjoint partitions, or apply vs append): safe
                    # iff the affected files are untouched and the DV
                    # base didn't shift under the matched-row scan —
                    # AND, for epoch-stamped applies (streaming sinks),
                    # no concurrent commit already claimed this epoch
                    # (a zombie writer racing its failover replacement
                    # would otherwise double-apply an insert-only
                    # batch, whose affected set is empty).
                    m2 = self._rebase_dml(m, sorted(affected))
                    self._check_epoch_unclaimed(m, m2, epoch_id)
                    version = m2["version"] + 1
                    base_head, base_m2 = m2["version"], m2
                    base_files = list(m2["files"])
                    base_dv = m2.get("dv_files", [])
                    base_ts = m2.get("tombstone_files", [])
            else:
                raise ConcurrentCommitError(
                    f"CDC apply lost the version race "
                    f"{_MAX_COMMIT_REBASE} times — sustained contention"
                )
            return {
                "version": version,
                "rewritten_files": 0,
                "kept_files": len(base_files),
                "upserted_rows": upserted_rows,
                "deleted_rows": deleted_rows,
                "skipped_stale": skipped_stale,
            }
        parts = []
        if aff_df is not None:
            parts.append(_align(aff_df.join(keys, on=key_cols, how="left_anti")))
        if upserted_rows:
            parts.append(_align(ups))
        if parts:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            new_files = self._write_data(out, version, schema_json)
        else:
            new_files = []  # tombstone-only batch: metadata + sidecar
        ts_new = self._write_tombstones(dels, version) if n_dels else []
        base_head, base_m2, base_ts = head, m, prev_ts
        kept = [f for f in m["files"] if f not in affected]
        for _attempt in range(_MAX_COMMIT_REBASE):
            man = self._cow_manifest(
                version, base_head, "merge", schema_json, kept, new_files,
                base_m2,
            )
            if prev_dv:
                man["dv_files"] = prev_dv
            if ts_new or base_ts:
                man["tombstone_files"] = base_ts + ts_new
            if epoch_id is not None:
                man["epoch_id"] = epoch_id
            try:
                self._publish(version, man)
                break
            except ConcurrentCommitError:
                # see the MOR branch's rebase note; the epoch fence
                # applies here too (an insert-only COW apply has an
                # empty affected set — without the fence two racers
                # with the same epoch would both land)
                m2 = self._rebase_dml(m, sorted(affected))
                self._check_epoch_unclaimed(m, m2, epoch_id)
                version = m2["version"] + 1
                base_head, base_m2 = m2["version"], m2
                base_ts = m2.get("tombstone_files", [])
                kept = [f for f in m2["files"] if f not in affected]
        else:
            raise ConcurrentCommitError(
                f"CDC apply lost the version race {_MAX_COMMIT_REBASE} "
                f"times — sustained contention"
            )
        return {
            "version": version,
            "rewritten_files": len(affected),
            "kept_files": len(kept),
            "upserted_rows": upserted_rows,
            "deleted_rows": deleted_rows,
            "skipped_stale": skipped_stale,
        }


_BLOOM_K = 6  # hash functions; with 64Ki bits / ~6k keys -> ~1% fp
_BLOOM_SUFFIX = ".bloom"


def _bloom_impl():
    """Factory for the bloom math + sidecar builder. The names are
    bound at module level right below, but the functions' qualnames
    carry ``<locals>`` so cloudpickle serializes them BY VALUE when
    the ``_write_bloom_sidecars`` mapInPandas closure captures them
    (ADVICE r8: a plain module-level function pickles BY REFERENCE
    and breaks on executors whose working directory can't import
    this package — the repo's documented foreign-cwd trap; every
    other executor closure in the repo is already self-contained).
    One source of truth for the build side AND the probe side; the
    only shared state is stdlib imports, resolved executor-side."""
    k_default = 6  # keep in sync with _BLOOM_K (captured by value)
    suffix = ".bloom"

    def canon(v) -> "str | None":
        """ONE canonical string form per value, shared by the build
        side (pyarrow ``to_pylist`` of the just-written parquet) and
        the probe side (batch key values collected VIA ARROW, so
        timestamps arrive tz-aware and normalize to the same UTC
        wall-clock string as the build side's read; see
        ``_bloom_batch_canons``) — int/string/date/timestamp/decimal/
        bool/binary agree by construction because both sides call
        THIS function. ``None`` means "not bloomable" (the build
        skips nulls, the probe declines to prune on a column whose
        batch contains one). Floats are refused: hash-equality on
        floats is a modeling bug, same stance as partition values
        (``_BANNED_PARTITION_TYPES``)."""
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

    def positions(canon_s: str, bits: int, k: int = k_default) -> list:
        """k bit positions via double hashing over one sha1 — the
        standard Kirsch-Mitzenmacher construction, so build and probe
        agree with no salt/seed bookkeeping."""
        import hashlib

        d = hashlib.sha1(canon_s.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1
        return [(h1 + i * h2) % bits for i in range(k)]

    def sm64_h1h2(vals):
        """Vectorized double-hash pair for INTEGER keys: two
        splitmix64 finalizer mixes (Vigna's public-domain constants)
        over the value's two's-complement uint64 form — the per-key
        sha1 loop was the write path's hottest driver/executor Python
        (guide §4.2: hand whole batches to vectorized native code;
        measured 15× on a 250k-key build). ``vals`` is a uint64 numpy
        array; returns (h1, h2) uint64 arrays with h2 forced odd.
        Build and probe both route through THIS function, and the
        sidecar marks the column ``sm64`` so old (sha1) sidecars keep
        probing exactly as written."""
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

    def fnv1a64_buf(data, offsets):
        """Vectorized FNV-1a 64 over a CONTIGUOUS byte buffer sliced
        by ``offsets`` (int64, len n+1) — one hash per slice. The
        per-key sha1 loop for STRING bloom columns was the last
        row-at-a-time Python on the write path (guide §4.2); FNV's
        byte-serial dependency vectorizes ACROSS keys instead: one
        masked fancy-indexed pass per byte position, so a column of
        n keys with max length L costs L vector ops over n lanes, not
        n Python hash calls. The 64-bit FNV output then feeds the SAME
        splitmix64 double-hash machinery as integer keys, so fill and
        probe share one code path. Build and probe both route through
        THIS function; the sidecar marks such columns ``fnv1a64`` so
        old (sha1) sidecars keep probing exactly as written."""
        import numpy as np

        m = np.uint64(0xFFFFFFFFFFFFFFFF)
        prime = np.uint64(0x100000001B3)
        lens = offsets[1:] - offsets[:-1]
        n = len(lens)
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        if n == 0:
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

    def fnv1a64_strs(strs):
        """Probe-side adapter: the same FNV-1a 64 over a list of canon
        strings (utf-8 bytes), byte-identical to the build side's
        buffer form."""
        import numpy as np

        bs = [s.encode("utf-8") for s in strs]
        offsets = np.zeros(len(bs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in bs], out=offsets[1:])
        data = np.frombuffer(b"".join(bs), dtype=np.uint8)
        return fnv1a64_buf(data, offsets)

    def sm64_fill(arr_u8, vals, bits: int, k: int = k_default):
        """Set the k bloom bits of every value in ``vals`` (uint64
        numpy array) into ``arr_u8`` (uint8 numpy array of bits/8),
        fully vectorized."""
        import numpy as np

        h1, h2 = sm64_h1h2(vals)
        for i in range(k):
            h = (h1 + np.uint64(i) * h2) % np.uint64(bits)
            np.bitwise_or.at(
                arr_u8,
                (h >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (h & np.uint64(7))).astype(np.uint8),
            )

    def sm64_may_contain_any(
        data: bytes, vals, bits: int, k: int = k_default
    ) -> bool:
        """True unless the bloom rejects EVERY probe value — the
        vectorized probe twin of :func:`sm64_fill`."""
        import numpy as np

        arr = np.frombuffer(data, dtype=np.uint8)
        h1, h2 = sm64_h1h2(vals)
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

    def build_sidecar(root: str, rel: str, cols: list, bits: int) -> int:
        """Compute and atomically write one data file's bloom sidecar.
        Runs executor-side (mapInPandas task) or driver-side for tiny
        commits — pure function of (file, cols, bits). Columns absent
        from the file's schema are skipped (schema evolution: an
        old-schema rewrite simply carries no bloom for the new column
        -> probe keeps the file). Returns the count of bloomed cols."""
        import base64
        import json as _json
        import os as _os
        import tempfile as _tf
        import zlib as _zlib

        import pyarrow.parquet as pq

        path = _os.path.join(root, rel)
        pf = pq.ParquetFile(path)
        names = set(pf.schema_arrow.names)
        present = [c for c in cols if c in names]
        blooms: dict = {}
        hashes: dict = {}
        if present:
            import pyarrow as _pa

            tbl = pf.read(columns=present)
            for c in present:
                col = tbl.column(c)
                if _pa.types.is_integer(col.type):
                    # vectorized build for integer keys (the common
                    # bloom column shape): two's-complement uint64 →
                    # splitmix64 double hashing, whole column at once.
                    # The sidecar marks the column "sm64" so the probe
                    # picks the matching math; sha1 stays the format
                    # for every other type and for old sidecars.
                    import numpy as _np

                    vals = (
                        col.drop_null()
                        .cast(_pa.int64())
                        .to_numpy(zero_copy_only=False)
                        .astype(_np.uint64)
                    )
                    arr_u8 = _np.zeros(bits // 8, dtype=_np.uint8)
                    if len(vals):
                        sm64_fill(arr_u8, vals, bits)
                    blooms[c] = base64.b64encode(
                        _zlib.compress(arr_u8.tobytes())
                    ).decode("ascii")
                    hashes[c] = "sm64"
                    continue
                if _pa.types.is_string(col.type) or _pa.types.is_large_string(
                    col.type
                ):
                    # vectorized build for STRING keys (the other common
                    # bloom shape): FNV-1a 64 straight over the Arrow
                    # data buffer + offsets (no per-row Python), then the
                    # shared splitmix64 double-hash fill. Pathologically
                    # long keys (> 256 bytes max) keep the sha1 loop —
                    # the vectorized form costs max-length passes, and a
                    # kilobyte join key is a modeling smell anyway.
                    import numpy as _np

                    a = (
                        col.combine_chunks()
                        if isinstance(col, _pa.ChunkedArray)
                        else col
                    )
                    a = a.drop_null().cast(_pa.large_string())
                    offsets = _np.frombuffer(
                        a.buffers()[1], dtype=_np.int64
                    )[a.offset : a.offset + len(a) + 1]
                    lens = offsets[1:] - offsets[:-1]
                    if len(a) == 0 or int(lens.max(initial=0)) <= 256:
                        data = (
                            _np.frombuffer(a.buffers()[2], dtype=_np.uint8)
                            if a.buffers()[2] is not None
                            else _np.zeros(0, dtype=_np.uint8)
                        )
                        vals = fnv1a64_buf(data, offsets)
                        arr_u8 = _np.zeros(bits // 8, dtype=_np.uint8)
                        if len(vals):
                            sm64_fill(arr_u8, vals, bits)
                        blooms[c] = base64.b64encode(
                            _zlib.compress(arr_u8.tobytes())
                        ).decode("ascii")
                        hashes[c] = "fnv1a64"
                        continue
                arr = bytearray(bits // 8)
                for v in col.to_pylist():
                    canon_s = canon(v)
                    if canon_s is None:
                        continue
                    for h in positions(canon_s, bits):
                        arr[h >> 3] |= 1 << (h & 7)
                blooms[c] = base64.b64encode(
                    _zlib.compress(bytes(arr))
                ).decode("ascii")
        payload = _json.dumps(
            {
                "bits": bits,
                "k": k_default,
                "codec": "zlib",
                "blooms": blooms,
                **({"hashes": hashes} if hashes else {}),
            }
        )
        d = _os.path.dirname(path)
        fd, tmp = _tf.mkstemp(dir=d, suffix=".bloomtmp")
        try:
            with _os.fdopen(fd, "w") as f:
                f.write(payload)
            _os.replace(tmp, path + suffix)
        except BaseException:
            try:
                _os.unlink(tmp)
            except OSError:
                pass
            raise
        return len(blooms)

    return canon, positions, build_sidecar, sm64_may_contain_any, fnv1a64_strs


(
    _bloom_canon,
    _bloom_positions,
    _build_bloom_sidecar,
    _sm64_may_contain_any,
    _fnv1a64_strs,
) = _bloom_impl()


def _bloom_sidecar_path(root: str, rel: str) -> str:
    return os.path.join(root, rel + _BLOOM_SUFFIX)


def _load_bloom_sidecar(root: str, rel: str) -> "dict | None":
    """The decoded sidecar, or None if absent/corrupt (both mean
    'cannot prune this file')."""
    import base64

    try:
        with open(_bloom_sidecar_path(root, rel)) as f:
            raw = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return None
    try:
        blooms = {
            c: zlib.decompress(base64.b64decode(b64))
            for c, b64 in raw.get("blooms", {}).items()
        }
        return {"bits": int(raw["bits"]), "k": int(raw["k"]),
                "blooms": blooms,
                "hashes": dict(raw.get("hashes", {}))}
    except (KeyError, ValueError, zlib.error):
        return None


def _bloom_may_contain_any(
    sidecar: dict, col: str, canons: list[str]
) -> bool:
    """False ONLY when the file's bloom for ``col`` rejects EVERY
    probe value — the one case pruning may drop the file. A sidecar
    without this column constrains nothing (conservative True)."""
    data = sidecar["blooms"].get(col)
    if data is None:
        return True
    bits, k = sidecar["bits"], sidecar["k"]
    kind = sidecar.get("hashes", {}).get(col)
    if kind == "sm64":
        # integer-vectorized sidecar: recover the ints from the canon
        # strings (canon of a non-bool integer IS str(v)); anything
        # unparseable means a cross-type probe we cannot disprove
        import numpy as np

        try:
            vals = np.array(
                [int(c0) & 0xFFFFFFFFFFFFFFFF for c0 in canons],
                dtype=np.uint64,
            )
        except (ValueError, TypeError):
            return True
        return _sm64_may_contain_any(data, vals, bits, k)
    if kind == "fnv1a64":
        # string-vectorized sidecar: hash the canon strings' utf-8
        # bytes exactly like the build side hashed the Arrow buffer
        # (canon of a string IS the string, so the bytes agree)
        return _sm64_may_contain_any(
            data, _fnv1a64_strs(canons), bits, k
        )
    if kind is not None and kind != "sha1":
        return True  # future format: conservatively keep
    for canon in canons:
        if all(
            (data[h >> 3] >> (h & 7)) & 1
            for h in _bloom_positions(canon, bits, k)
        ):
            return True
    return False


def _file_stats(path: str, columns: list[str]) -> dict:
    """Per-file column min/max from the parquet FOOTER (pyarrow) —
    computed once at commit time, stored in the manifest. No data pages
    are read. Alongside the column entries, two RESERVED keys record
    file-level facts the footer gives for free: ``_nrows`` (row count)
    and ``_bytes`` (file size) — they feed :meth:`StatsSnapshotTable.
    row_count`'s metadata-only COUNT(*) and the ``files_df`` metadata
    table (a data column literally named ``_nrows``/``_bytes`` would
    shadow them; don't do that)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {"_nrows": md.num_rows, "_bytes": os.path.getsize(path)}
    for col in columns:
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
        if ok and lo is not None:
            out[col] = [lo, hi]
    return out


class StatsSnapshotTable(SnapshotTable):
    """SnapshotTable that also records per-file column min/max in the
    manifest and can PRUNE files manifest-side before Spark ever plans
    the scan.

    This is the second half of the Iceberg pattern: parquet row-group
    stats prune *within* a file only after the scan has opened it; at
    millions of files the win is never opening the file at all. The
    manifest carries footer stats captured at commit time, so a
    predicate like ``ts BETWEEN a AND b`` on time-ordered data plans
    O(matching files) — file listing, footer fetches, and scheduling
    for everything else disappear. Combine with Z-order clustering
    (operators/zorder.py) to make multi-column ranges sparse in the
    same way.

    ``read_pruned`` is a planning optimization ONLY: files without
    recorded stats are conservatively kept, and the predicate is
    re-applied by Spark, so results are always identical to
    ``read().filter(...)`` (asserted in tests/test_snapshot.py).
    """

    def __init__(
        self,
        root: str,
        stats_cols: list[str],
        partition_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 65536,
    ):
        super().__init__(
            root,
            partition_by=partition_by,
            bloom_cols=bloom_cols,
            bloom_bits=bloom_bits,
        )
        self.stats_cols = list(stats_cols)

    def _write_data(
        self, df: DataFrame, version: int, schema_json: str | None = None
    ) -> list[str]:
        files = super()._write_data(df, version, schema_json)
        stats = {
            f: _file_stats(os.path.join(self.root, f), self.stats_cols)
            for f in files
        }
        self._pending_stats = stats
        return files

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        epoch_id: int | None = None,
        rewrite_only: bool = False,
        manifest_extra: dict | None = None,
    ) -> int:
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        extra_keys = _check_manifest_extra(manifest_extra)
        head = self.latest_version()
        version = (head + 1) if head is not None else 1
        extras: dict = {}
        dv_files: list[str] = []
        prev_fp: dict = {}
        if head and mode == "append":
            prev_m = self.manifest(head)
            prev_files = prev_m["files"]
            prev_stats = prev_m.get("stats", {})
            schema_json = _merge_schema(prev_m, df.schema)
            extras = _schema_extras(prev_m)
            dv_files = prev_m.get("dv_files", [])
            prev_fp = prev_m.get("file_partitions", {})
        elif head:
            prev_files, prev_stats = [], {}
            schema_json, extras = _overwrite_schema(self.manifest(head), df.schema)
        else:
            prev_files, prev_stats = [], {}
            schema_json = _fresh_schema_json(df.schema)
        spec = self.partition_spec()
        files = self._write_data(df, version, schema_json)
        pend_fp = dict(self._pending_file_partitions)
        for _attempt in range(_MAX_COMMIT_REBASE):
            manifest = {
                "version": version,
                "base": head,
                "mode": mode,
                "schema": schema_json,
                "files": prev_files + files,
                "stats": {**prev_stats, **self._pending_stats},
                **extras,
            }
            if spec:
                manifest["partition_spec"] = spec
            fp = {
                **{f: prev_fp[f] for f in prev_files if f in prev_fp},
                **{f: pend_fp[f] for f in files if f in pend_fp},
            }
            if fp:
                manifest["file_partitions"] = fp
            if dv_files:
                manifest["dv_files"] = dv_files
            if epoch_id is not None:
                manifest["epoch_id"] = epoch_id
            if rewrite_only:
                manifest["rewrite_only"] = True
            manifest.update(extra_keys)
            try:
                self._publish(version, manifest)
                return version
            except ConcurrentCommitError:
                if mode != "append":
                    raise
                head, version, prev_files, schema_json, extras, dv_files, \
                    prev_fp, spec, files, pend_fp = self._rebase_append(
                        df, files, pend_fp, schema_json
                    )
                prev_stats = self.manifest(head).get("stats", {})
                prev_stats = {
                    f: prev_stats[f] for f in prev_files if f in prev_stats
                }
        else:
            raise ConcurrentCommitError(
                f"append lost the version race {_MAX_COMMIT_REBASE} "
                f"times — sustained contention; batch the writers"
            )

    def _cow_manifest(
        self,
        version: int,
        head: int,
        mode: str,
        schema_json: str,
        kept_files: list[str],
        new_files: list[str],
        prev_m: dict,
    ) -> dict:
        """Copy-on-write commits keep the kept files' EXISTING stats by
        reference (immutable files, immutable stats) and attach the
        rewrite's freshly-footer-read stats — so a delete stays
        stats-prunable without re-reading any untouched footer."""
        man = super()._cow_manifest(
            version, head, mode, schema_json, kept_files, new_files, prev_m
        )
        prev_stats = prev_m.get("stats", {})
        man["stats"] = {
            **{f: prev_stats[f] for f in kept_files if f in prev_stats},
            **getattr(self, "_pending_stats", {}),
        }
        return man

    def _attach_staged_stats(self, man: dict, new_files: list[str]) -> None:
        """Staged commits carry complete stats (carried files by
        reference + the new files' footer stats), so the published
        manifest — and audits that stats-prune — see the same coverage
        a direct commit would produce."""
        prev = {}
        if man.get("staged_from"):
            prev = self.manifest(man["staged_from"]).get("stats", {})
        keep = set(man["files"])
        new = set(new_files)
        man["stats"] = {
            **{f: s for f, s in prev.items() if f in keep},
            **{
                f: s
                for f, s in getattr(self, "_pending_stats", {}).items()
                if f in new
            },
        }

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Scan only files whose [min, max] for ``col`` overlaps
        [lo, hi] (files lacking stats are kept), then re-apply the
        predicate exactly."""
        from pyspark.sql import functions as F

        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        keep = []
        for f in m["files"]:
            rng = m.get("stats", {}).get(f, {}).get(col)
            if rng is None or (rng[0] <= hi and rng[1] >= lo):
                keep.append(os.path.join(self.root, f))
        self.last_pruned_counts = (len(keep), len(m["files"]))
        if not keep:
            empty = _strip_field_ids(spark.createDataFrame([], schema), schema)
            return empty.filter(F.col(col).between(lo, hi))
        _ensure_fieldid_read(spark, schema)
        return _strip_field_ids(
            spark.read.schema(schema)
            .parquet(*keep)
            .filter(F.col(col).between(lo, hi)),
            schema,
        )

    def row_count(self, version: int | None = None) -> "int | None":
        """Metadata-only COUNT(*): the sum of per-file ``_nrows``
        recorded at commit time — zero files opened, zero Spark jobs,
        O(manifest) at any table size (the Iceberg count-from-manifests
        pushdown). Returns ``None`` — caller falls back to
        ``read(spark).count()`` — whenever metadata can't answer
        EXACTLY: merge-on-read deletion vectors are present (hidden
        rows), or any live file predates ``_nrows`` recording. Never
        guesses."""
        m = self.manifest(version)
        if m.get("dv_files"):
            return None
        stats = m.get("stats", {})
        total = 0
        for f in m["files"]:
            n = stats.get(f, {}).get("_nrows")
            if n is None:
                return None
            total += int(n)
        return total


def changes(
    tbl: SnapshotTable, spark: SparkSession, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Incremental read: the rows ADDED between two versions, planned
    from the manifest file-list diff — the consumer-side half of CDC.
    A downstream job that processed version N yesterday reads only the
    new files today (O(delta), not O(table)). Only meaningful across
    append commits; an overwrite in the range resets lineage, which
    this detects and rejects rather than silently double-counting."""
    to_version = to_version if to_version is not None else tbl.latest_version()
    cur = tbl.manifest(to_version)
    new_files: list[str] = []
    v = to_version
    while v is not None and v > from_version:
        m = tbl.manifest(v)
        if m.get("rewrite_only"):
            # logically-neutral rewrite (compaction/optimize): adds no
            # rows — pass through instead of resetting lineage
            v = m["base"]
            continue
        if m["mode"] != "append":
            raise ValueError(
                f"version {v} is {m['mode']!r}: file-diff changes are only "
                f"defined across append commits — re-read the full snapshot"
            )
        base_v = m["base"]
        parent_files = (
            set(tbl.manifest(base_v)["files"]) if base_v else set()
        )
        new_files[:0] = [f for f in m["files"] if f not in parent_files]
        v = base_v
    schema = T.StructType.fromJson(json.loads(cur["schema"]))
    if not new_files:
        return spark.createDataFrame([], schema)
    _ensure_fieldid_read(spark, schema)
    return _strip_field_ids(
        spark.read.schema(schema).parquet(
            *[os.path.join(tbl.root, f) for f in new_files]
        ),
        schema,
    )


def row_changes(
    tbl: SnapshotTable,
    spark: SparkSession,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Exact row-level diff between two versions, derived from the
    file-list diff alone — the change-data-feed of the copy-on-write
    format, with NO change files written at commit time.

    Returns the destination schema plus ``_change_type``
    (``'insert'`` | ``'delete'``); an update surfaces as a delete of
    the old row and an insert of the new one (the Delta CDF convention
    minus ``update_pre/postimage``, which would require key metadata
    the format doesn't mandate).

    Why it's exact: data files are immutable, so every row born after
    ``from_version`` lives in a file added to the manifest, and every
    row removed lives in a file dropped from it. Rows CARRIED through a
    copy-on-write rewrite appear on both sides and cancel under
    multiset difference (``exceptAll``). Cost is O(files touched by the
    range) — a delete that rewrote 3 files diffs 3 files' worth of
    rows, never the table — and unlike :func:`changes` this is sound
    across delete/merge/compact commits (compaction's diff is empty, as
    it should be). Overwrite commits still reset lineage: every old row
    deletes, every new row inserts — sound, if large."""
    from pyspark.sql import functions as F

    to_version = to_version if to_version is not None else tbl.latest_version()
    base = tbl.manifest(from_version)
    cur = tbl.manifest(to_version)
    schema = T.StructType.fromJson(json.loads(cur["schema"]))
    added = [f for f in cur["files"] if f not in set(base["files"])]
    dropped = [f for f in base["files"] if f not in set(cur["files"])]
    base_dv, cur_dv = base.get("dv_files", []), cur.get("dv_files", [])

    # Merge-on-read deletes change NO files — the delta hides in the
    # deletion vectors. Files whose DV membership changed join the
    # touched region on both sides; their carried rows cancel under
    # exceptAll exactly like a copy-on-write rewrite's. A file's rel
    # path IS its DV key (data/c{N}-*/<part> — three components), so
    # the touched set comes straight off the DV row diff, bounded by
    # the file count.
    touched_common: list[str] = []
    if base_dv != cur_dv:
        common = set(base["files"]) & set(cur["files"])

        def _dv_rows(dv_files: list[str]) -> DataFrame:
            if not dv_files:
                return spark.createDataFrame([], "k3 string, pos long")
            return spark.read.parquet(
                *[os.path.join(tbl.root, f) for f in dv_files]
            )

        b_rows, c_rows = _dv_rows(base_dv), _dv_rows(cur_dv)
        diff_keys = (
            c_rows.exceptAll(b_rows)
            .unionByName(b_rows.exceptAll(c_rows))
            .select("k3")
            .distinct()
            .collect()
        )
        touched_common = sorted(
            {r.k3 for r in diff_keys} & common
        )

    def _load(files: list[str], dv_files: list[str]) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        return tbl._read_files(spark, files, schema, dv_files)

    cur_side = _load(added + touched_common, cur_dv)
    base_side = _load(dropped + touched_common, base_dv)
    # Signed multiset difference in ONE shuffle: tag each side, group on
    # every data column, keep rows whose net count is non-zero, re-expand
    # to |net| copies. Row-for-row identical to the previous
    # cur.exceptAll(base) ∪ base.exceptAll(cur) shape (both resolve
    # NULL/NaN equality through the same SQL grouping semantics), but
    # each side is scanned ONCE and the plan carries ONE Exchange where
    # the two exceptAll's cost four scans and two full-width shuffles —
    # this function sits under every refresh/CDC window, so the fixed
    # cost is paid per maintenance commit.
    cols = [f.name for f in schema.fields]
    if {"__rc_sign", "__rc_net", "__rc_dup"} & set(cols):
        # a (pathological) schema claims the synthetic names: take the
        # equivalent two-exceptAll shape rather than mis-group
        inserts = cur_side.exceptAll(base_side).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = base_side.exceptAll(cur_side).withColumn(
            "_change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes)
    signed = cur_side.withColumn("__rc_sign", F.lit(1)).unionByName(
        base_side.withColumn("__rc_sign", F.lit(-1))
    )
    net = (
        signed.groupBy(*cols)
        .agg(F.sum("__rc_sign").alias("__rc_net"))
        .filter(F.col("__rc_net") != 0)
    )
    return net.select(
        *cols,
        F.when(F.col("__rc_net") > 0, F.lit("insert"))
        .otherwise(F.lit("delete"))
        .alias("_change_type"),
        F.explode(
            F.sequence(F.lit(1), F.abs(F.col("__rc_net")))
        ).alias("__rc_dup"),
    ).drop("__rc_dup")


class SnapshotCommitSink:
    """``foreachBatch`` target committing each micro-batch as one
    snapshot version — the streaming writer of the table format.

    Effectively-once WITHOUT a side ledger: the manifest itself records
    ``epoch_id``, so a replayed batch (Spark re-runs the last epoch
    after a crash-restart) is detected by scanning committed manifests
    and skipped. A writer that crashed after writing data files but
    before publishing left no visible version (snapshot atomicity), so
    the replay re-writes and publishes cleanly — the exact contract the
    epoch-ledger JDBC sinks provide, expressed in the table format's
    own commit protocol. Appends-only by design: streaming upserts
    belong to CdcDbApiSink / the keyed SQL sinks.
    """

    def __init__(self, table: SnapshotTable):
        self.table = table
        self._epochs: set[int] | None = None  # seeded from disk on first use

    def committed_epochs(self) -> set[int]:
        """Epoch ids already visible on disk. Scanned ONCE per sink
        instance (a restart builds a fresh instance, re-seeding from
        the manifests); within a run the set grows in memory — a
        per-batch rescan would make a long-running stream O(versions²)
        in manifest reads."""
        if self._epochs is None:
            self._epochs = set()
            for v in self.table.versions():
                # raw read: epoch_id is verbatim in delta-form manifests
                e = self.table._read_raw_manifest(v).get("epoch_id")
                if e is not None:
                    self._epochs.add(e)
        return self._epochs

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.committed_epochs():
            return  # replayed batch — its version is already visible
        head = self.table.latest_version()
        version = (head + 1) if head is not None else 1
        if head:
            prev_m = self.table.manifest(head)
            prev, schema_json = prev_m["files"], _merge_schema(
                prev_m, batch_df.schema
            )
            extras = _schema_extras(prev_m)
        else:
            prev, schema_json = [], _fresh_schema_json(batch_df.schema)
            extras = {}
        files = self.table._write_data(batch_df, version, schema_json)
        man = {
            "version": version,
            "base": head,
            "mode": "append",
            "epoch_id": epoch_id,
            "schema": schema_json,
            "files": prev + files,
            **extras,
        }
        if head:
            dv = self.table.manifest(head).get("dv_files", [])
            if dv:
                man["dv_files"] = dv
        self.table._publish(version, man)
        self.committed_epochs().add(epoch_id)


class SnapshotMergeSink:
    """``foreachBatch`` target applying a CDC CHANGELOG stream INTO the
    snapshot table — each micro-batch of upserts + deletes becomes ONE
    merge version via :meth:`SnapshotTable.apply_changes`. This closes
    the loop between the two proven halves: the JDBC ``CdcDbApiSink``
    (changelog → database upserts) and the table format's row-level DML
    — the same changelog now maintains a lakehouse table instead of a
    database.

    Effectively-once exactly as :class:`SnapshotCommitSink`: the merge
    manifest records ``epoch_id``, a replayed batch (Spark re-runs the
    last epoch after crash-restart) is detected from committed
    manifests and skipped, and a writer that crashed after writing data
    files but before publishing left no visible version, so the replay
    re-applies cleanly.

    With a ``seq_col``, within-batch disorder AND cross-batch stale
    arrivals are resolved by the sequence (see ``apply_changes``), so
    the maintained table converges to the sequence-ordered batch apply
    regardless of micro-batch boundaries. ``mode`` picks copy-on-write
    or merge-on-read per batch — a MOR stream should schedule
    ``compact()`` periodically or reads accumulate DV anti-joins.
    """

    def __init__(
        self,
        table: SnapshotTable,
        key_cols: list[str],
        op_col: str = "_op",
        seq_col: str | None = None,
        mode: str = "cow",
    ):
        self.table = table
        self.key_cols = list(key_cols)
        self.op_col = op_col
        self.seq_col = seq_col
        self.mode = mode
        self._epochs: set[int] | None = None

    def committed_epochs(self) -> set[int]:
        """Seeded from the manifests once per sink instance (a restart
        re-seeds), grown in memory per batch — same O(versions) once,
        not O(versions²), as SnapshotCommitSink."""
        if self._epochs is None:
            self._epochs = set()
            for v in self.table.versions():
                # raw read: epoch_id is verbatim in delta-form manifests
                e = self.table._read_raw_manifest(v).get("epoch_id")
                if e is not None:
                    self._epochs.add(e)
        return self._epochs

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.committed_epochs():
            return  # replayed batch — its version is already visible
        self.table.apply_changes(
            batch_df.sparkSession,
            batch_df,
            self.key_cols,
            op_col=self.op_col,
            seq_col=self.seq_col,
            mode=self.mode,
            epoch_id=epoch_id,
        )
        self.committed_epochs().add(epoch_id)


def vacuum(
    tbl: SnapshotTable,
    retain_last: int = 1,
    min_retained_version: int | None = None,
) -> dict:
    """Garbage-collect the table: keep the newest ``retain_last``
    manifests, delete older manifests AND any data file no retained
    version references. Returns counts for observability.

    This is the piece that stops an append/compact workload from
    growing without bound: compaction rewrites data but the OLD files
    stay on disk for time travel until vacuum reclaims them — exactly
    Delta VACUUM / Iceberg expire_snapshots. Ordering matters for
    crash safety: manifests are deleted FIRST, so a crash mid-vacuum
    can orphan data files (harmless, re-vacuumable) but can never
    leave a live manifest pointing at deleted data.

    **Streaming-reader retention**: a lagging ``snapshot_changes``
    consumer checkpointed at offset version V needs every manifest in
    (V, head] *plus* manifest V itself (the file-list diff base) to
    plan its next batch. Pass ``min_retained_version=V`` (the slowest
    consumer's checkpointed offset) to pin manifests ≥ V through the
    vacuum; without it, vacuuming past a lagging reader makes that
    reader FAIL LOUDLY on its next batch (a clear vacuumed-lineage
    error, never silently wrong or duplicated rows) and it must
    restart from a full snapshot."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    versions = tbl.versions()
    keep_v = set(versions[-retain_last:])
    if min_retained_version is not None:
        keep_v.update(v for v in versions if v >= min_retained_version)
    # TAGGED versions are pinned regardless of the retention window —
    # the point of a tag (the quarterly compliance snapshot survives
    # while the daily churn around it ages out)
    keep_v.update(v for v in tbl.tags().values() if v in set(versions))
    drop_v = [v for v in versions if v not in keep_v]
    referenced: set[str] = set()
    for v in sorted(keep_v):
        m = tbl.manifest(v)
        referenced.update(m["files"])
        referenced.update(m.get("dv_files", []))  # DV sidecars are live data
        referenced.update(m.get("tombstone_files", []))  # so are tombstones
    # staged-but-unpublished commits pin their files too: an audit in
    # flight must not have its evidence collected from under it
    for name in tbl.staged():
        sm = tbl._read_staged_manifest(name)
        referenced.update(sm["files"])
        referenced.update(sm.get("dv_files", []))
    # Delta-encoded manifests reconstruct through their parents: before
    # deleting any manifest, MATERIALIZE every retained version whose
    # parent is being dropped (tags make keep_v non-contiguous, so any
    # kept version can lose its parent, not just the minimum). Ascending
    # order, while the chains are still intact; the rewrite is
    # content-equivalent — os.replace keeps readers atomic.
    if drop_v:
        drop_set = set(drop_v)
        for v in sorted(keep_v):
            raw = tbl._read_raw_manifest(v)
            if "delta_of" in raw and raw["delta_of"] in drop_set:
                full = tbl.manifest(v)  # reconstruct while chain intact
                fd, tmp = tempfile.mkstemp(dir=tbl._mdir, suffix=".tmp")
                with os.fdopen(fd, "w") as f:
                    json.dump(full, f)
                os.replace(tmp, tbl._manifest_path(v))
    for v in drop_v:  # manifests first — see docstring
        os.unlink(tbl._manifest_path(v))
    removed_files = 0
    removed_sidecars = 0
    data_root = os.path.join(tbl.root, "data")
    if os.path.isdir(data_root):
        for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
            for name in filenames:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, tbl.root)
                if name.endswith(".bloomtmp"):
                    # crash leftover from an interrupted sidecar build
                    # (the build writes tmp then os.replace's) — always
                    # dead, and it would block the rmdir below
                    os.unlink(full)
                    removed_sidecars += 1
                elif name.endswith(_BLOOM_SUFFIX):
                    # a bloom sidecar is live iff ITS DATA FILE is
                    # referenced — this both rides along with the data
                    # file's deletion (ADVICE r8: vacuum previously
                    # matched only *.parquet, orphaning sidecars
                    # forever) and sweeps orphans a crashed earlier
                    # vacuum left behind
                    if rel[: -len(_BLOOM_SUFFIX)] not in referenced:
                        os.unlink(full)
                        removed_sidecars += 1
                elif name.endswith(".parquet") and rel not in referenced:
                    os.unlink(full)
                    removed_files += 1
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
    return {
        "dropped_versions": len(drop_v),
        "removed_files": removed_files,
        "removed_sidecars": removed_sidecars,
        "retained_versions": sorted(keep_v),
    }


def expire_snapshots(
    tbl: SnapshotTable,
    older_than_ms: int,
    min_retained_version: int | None = None,
) -> dict:
    """Time-based retention (Iceberg ``expireSnapshots(olderThan)`` /
    Delta ``logRetentionDuration``): drop every version whose
    ``committed_at_ms`` is at or before ``older_than_ms`` — except the
    HEAD, which is always retained (the live table never expires) —
    then reclaim any data file no retained version references.
    Versions from before commit timestamps existed count as
    arbitrarily old. ``min_retained_version`` pins a lagging stream
    consumer's lineage exactly as in :func:`vacuum`, and an expired
    version's time travel fails loudly (``manifest()`` names the
    retained window). Returns the :func:`vacuum`-shaped counts."""
    versions = tbl.versions()
    if not versions:
        return {"dropped_versions": 0, "removed_files": 0,
                "retained_versions": []}
    head = versions[-1]
    keep = [
        v for v in versions
        if v == head
        or tbl._read_raw_manifest(v).get("committed_at_ms", 0) > older_than_ms
    ]
    # translate the time cutoff into vacuum's version-count contract:
    # retain everything from the oldest time-retained version up
    oldest_keep = min(keep)
    if min_retained_version is not None:
        oldest_keep = min(oldest_keep, min_retained_version)
    return vacuum(
        tbl,
        retain_last=len([v for v in versions if v >= oldest_keep]),
        min_retained_version=min_retained_version,
    )


class ExpectationError(ValueError):
    """A commit violated a declared expectation; carries the per-rule
    violation counts in ``.violations``."""

    def __init__(self, violations: dict):
        self.violations = violations
        super().__init__(
            "expectations violated: "
            + ", ".join(f"{k}={v} rows" for k, v in violations.items())
        )


def commit_with_expectations(
    tbl: SnapshotTable,
    df: DataFrame,
    expectations: dict,
    mode: str = "append",
    on_violation: str = "fail",
) -> dict:
    """Commit gated by declared data-quality CHECK constraints (the
    Delta expectations pattern): each entry of ``expectations`` is
    name → boolean predicate (SQL string or Column) that every incoming
    row must satisfy — NULL counts as a violation (a constraint you
    can't prove is a constraint you don't have).

    ``on_violation='fail'`` commits NOTHING and raises
    :class:`ExpectationError` with per-rule counts;
    ``'drop'`` quarantines violating rows (any rule) and commits the
    clean remainder. One aggregation pass computes every rule's count —
    at 100 TB the validation costs one extra scan of the BATCH, never
    of the table. Returns ``{"version", "violations", "committed"}``
    (``version`` None when nothing commits)."""
    from pyspark.sql import functions as F

    if on_violation not in ("fail", "drop"):
        raise ValueError(f"on_violation: {on_violation!r}")
    preds = {
        name: (F.expr(p) if isinstance(p, str) else p)
        for name, p in expectations.items()
    }
    counts_row = df.agg(
        *[
            F.sum(
                F.when(~p.eqNullSafe(F.lit(True)), 1).otherwise(0)
            ).alias(name)
            for name, p in preds.items()
        ]
    ).collect()[0]
    violations = {
        name: int(counts_row[name] or 0)
        for name in preds
        if (counts_row[name] or 0) > 0
    }
    if violations and on_violation == "fail":
        raise ExpectationError(violations)
    clean = df
    for p in preds.values():
        clean = clean.filter(p.eqNullSafe(F.lit(True)))
    n_clean = clean.count() if violations else None
    if violations and n_clean == 0:
        return {"version": None, "violations": violations, "committed": 0}
    version = tbl.commit(clean, mode=mode)
    return {
        "version": version,
        "violations": violations,
        "committed": n_clean,
    }


def commit_with_retry(
    tbl: SnapshotTable, df: DataFrame, mode: str = "append", attempts: int = 5
) -> int:
    """The standard optimistic-concurrency loop around
    :meth:`SnapshotTable.commit`: on losing a version race, re-read the
    head and try again (append lineage re-bases cleanly; data files of
    lost attempts stay unreferenced for vacuum). Gives up after
    ``attempts`` losses — sustained contention means the writers should
    be batched, not retried forever."""
    last: ConcurrentCommitError | None = None
    for _ in range(attempts):
        try:
            return tbl.commit(df, mode)
        except ConcurrentCommitError as e:
            last = e
    raise last  # type: ignore[misc]
