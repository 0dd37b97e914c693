"""Incrementally-maintained materialized views over snapshot tables.

A materialized view here is a grouped aggregate of ONE base (fact)
snapshot table — optionally JOINED through broadcast dimension
snapshot tables (``join_spec``, the star-schema shape of VERDICT r12
item 1) — itself stored as a snapshot table, so an MV composes with
everything tables already do (time travel, tags, compaction, the
declarative DataSource, metadata tables). What this module adds is the
MAINTENANCE loop:

* ``MaterializedView.create`` computes the aggregate once at the base
  table's head and records the view definition (group columns +
  aggregate specs) in ``mv.json`` under the view's root. The
  definition is static; the only moving part — WHICH base version the
  view reflects — lives in the view table's own manifests.
* ``refresh`` reads the base table's exact row-level diff since the
  last applied version (``row_changes`` — the copy-on-write format's
  change-data-feed, O(files touched), sound across delete/merge/
  compaction commits), derives the touched groups' POST-IMAGE by one of
  two strategies, and swaps them into the view with ONE atomic
  :meth:`SnapshotTable.replace_where_keys` commit stamped
  ``epoch_id = base head version``:

  - **delta** (all-COUNT/SUM/AVG views): the change rows apply
    ARITHMETICALLY against the view's own current rows — the base is
    never re-read. Exactly-once rather than merely idempotent: the
    delta takes effect iff the commit recording it publishes. SQL NULL
    semantics for SUM and group drop-on-empty ride hidden non-null /
    row counters (``__nn__*``), stripped from :meth:`read`.
  - **recompute** (MIN/MAX/COUNT-DISTINCT — the aggregates deletes
    make non-self-maintainable): touched groups recompute from the
    base head. EXCEPTION: an INSERT-ONLY change window keeps even
    MIN/MAX self-maintainable (least/greatest merge of the inserts'
    partial aggregate — ``delta_insert_only``); only windows carrying
    deletes/updates pay the re-read. Recompute reads the base via
    :meth:`SnapshotTable.read_partition` with the key
    values inlined (manifest-level partition pruning + a plain JVM
    scan; composite keys add an exact null-safe semi-join over the
    cross-product scope), falling back to a broadcast semi-join for
    huge key sets. A pure function of base state → replays converge.

Both paths keep the applied-version bookkeeping atomic WITH the data
(one manifest), so the failure mode of a separate pointer file
(pointer advanced, data not, or vice versa) cannot exist; reads are
version-pinned, so a concurrent base commit cannot leak newer rows
into a post-image stamped with an older head.

Star joins (``join_spec``): the view may be defined over fact ⋈
dimension tables — each dimension a snapshot table PINNED at a
version, joined (inner/left, broadcast-hinted under a byte cap) before
grouping. The pins live in the SAME manifests as the applied-base
marker (``dim_pins`` via ``manifest_extra``), so dim bookkeeping is
atomic with the data — never a torn side file. Maintenance composes
cleanly because pinned dims make the join a PURE function of fact
rows: the delta path joins the fact's CHANGE ROWS through the pinned
dims (O(change rows) — R4's dimension-filtered fact scan,
kafka-database-import.go:148-170, run over the diff instead of the
table), then applies arithmetically exactly as single-table views do;
the recompute path prunes the fact scan by fact-side group values AND
by fact keys derived from the touched dimension attributes
(dimension-driven pruning), re-joins, re-aggregates. A LOGICAL
dimension change (anything beyond rewrite-only compaction) is detected
by version walk; a SINGLE changed dimension maintains INCREMENTALLY —
the SCD delta (:meth:`MaterializedView._dim_delta_rows`): remove the
changed keys' fact rows joined through the OLD pinned dim, add them
joined through the new one, union with the fact window's own diff, and
feed the standard machinery (arithmetic for counter-backed views,
touched-group recompute otherwise) — O(changed keys' fact rows), pins
advanced atomically in the same swap; several dims changing at once
chain one SCD pass per dim (each pass its own consistent swap). Only
an UNPROVABLE window (vacuumed dim history, foreign pins) pays the
full rebuild (``strategy='rebuild_dims'``), the only O(base)
maintenance event besides ``create``.

Scale shape at 100 TB: the diff is O(rows in files the change range
touched); the delta path then costs O(change rows + touched view
groups), the recompute path O(affected partitions' files); the swap
rewrites O(affected groups) of the view. Nothing is ever O(base table)
except the initial ``create`` (and a dimension-change rebuild).

Reference framing: the reference pipeline materializes nothing — every
query re-reads the source (kafka-database-import.go:148-158 re-scans
per run). An engine serving repeated aggregate queries over a mutating
100 TB table needs the view maintained, not re-derived.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    row_changes,
)

_SPEC_FILE = "mv.json"

#: aggregate builders: name -> (needs_col, builder(col) -> Column)
_AGG_FNS = {
    "count": (False, lambda c: F.count(F.lit(1)).cast("long")),
    "sum": (True, lambda c: F.sum(c)),
    "min": (True, lambda c: F.min(c)),
    "max": (True, lambda c: F.max(c)),
    "avg": (True, lambda c: F.avg(c)),
    "countd": (True, lambda c: F.count_distinct(F.col(c))),
}


#: hidden per-SUM non-null counter column prefix (delta-eligible views
#: persist one per sum so SUM's NULL semantics survive +/- maintenance:
#: a group whose non-null count falls to 0 must read SUM = NULL, which
#: running arithmetic alone cannot distinguish from SUM = 0)
_NN = "__nn__"

#: hidden running-sum column prefix for AVG aggregates (VERDICT r11
#: item 7): AVG is not self-maintainable as a single value, but it
#: DECOMPOSES to hidden SUM + non-null COUNT, both of which are — the
#: visible average is re-derived as sum/count at every maintenance
_SUM = "__sum__"

#: hidden mergeable-bitmap state prefix for COUNT-DISTINCT aggregates
#: (VERDICT r12 item 2): one ``map<bucket, 4KB bitmap>`` column per
#: countd alias — the q99zg exact-distinct state (plans/sketches.py)
#: persisted as view state, so INSERT-ONLY windows self-maintain by
#: OR-merging the inserts' bitmap partials into the stored maps
#: (``bitmap_or_agg``), no base re-read. Deletes still recompute
#: (bitmaps cannot subtract). Only integral-typed countd columns get
#: state (the bitmap functions index by long); others stay
#: recompute-always. A NULL map is VALID state meaning "no non-null
#: values yet" — the healing probe distinguishes it from the
#: schema-widened-unhealed case by requiring visible countd == 0.
_BM = "__bm__"

_HIDDEN_PREFIXES = (_NN, _SUM, _BM)


def _delta_eligible(aggs: list[dict]) -> bool:
    """COUNT, SUM and AVG are self-maintainable: insert/delete deltas
    apply arithmetically with no base re-read (AVG through its hidden
    SUM + non-null-COUNT decomposition). MIN/MAX/COUNT-DISTINCT need
    the surviving rows when a delete removes the extreme value, so
    views carrying them refresh by affected-group recompute."""
    return all(a["fn"] in ("count", "sum", "avg") for a in aggs)


def _agg_exprs(aggs: list[dict], with_nn: bool = False):
    out = []
    for a in aggs:
        fn = a["fn"]
        if fn not in _AGG_FNS:
            raise ValueError(
                f"unsupported aggregate {fn!r} — supported: "
                f"{sorted(_AGG_FNS)}"
            )
        needs_col, build = _AGG_FNS[fn]
        if needs_col and not a.get("col"):
            raise ValueError(f"aggregate {fn!r} needs a 'col'")
        if with_nn and fn == "avg":
            # delta-eligible AVG: the visible value is DEFINED as
            # exact-sum / non-null-count (identical to what the delta
            # path re-derives arithmetically) rather than F.avg, whose
            # double-accumulating sum could drift from the exact
            # decomposition on pathological inputs
            c = F.col(a["col"])
            out.append(
                F.when(
                    F.count(c) > 0, F.sum(c).cast("double") / F.count(c)
                ).alias(a["alias"])
            )
        else:
            out.append(build(a.get("col")).alias(a["alias"]))
    if with_nn:
        # hidden row counter: group liveness under +/- maintenance (a
        # group whose row count reaches 0 must DROP, which a sum-only
        # visible spec cannot detect)
        out.append(F.count(F.lit(1)).cast("long").alias(_NN + "rows"))
        for a in aggs:
            if a["fn"] == "sum":
                out.append(
                    F.count(F.col(a["col"]))
                    .cast("long")
                    .alias(_NN + a["alias"])
                )
            elif a["fn"] == "avg":
                out.append(
                    F.sum(F.col(a["col"])).alias(_SUM + a["alias"])
                )
                out.append(
                    F.count(F.col(a["col"]))
                    .cast("long")
                    .alias(_NN + a["alias"])
                )
    return out


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _bitmap_eligible(aggs: list[dict], src: DataFrame) -> list[dict]:
    """The countd aggregates whose column is integral-typed in the
    (joined) source frame — the ones that get persisted bitmap state.
    Non-integral countd columns (strings, doubles) keep today's
    recompute-always behavior: hashing them into the bitmap domain
    would trade exactness for maintainability, the wrong default."""
    types = dict(src.dtypes)
    return [
        a
        for a in aggs
        if a["fn"] == "countd" and types.get(a["col"]) in _INTEGRAL_TYPES
    ]


def _bitmap_state(
    df: DataFrame, group_cols: list[str], col: str, alias: str
) -> DataFrame:
    """EXACT mergeable distinct state per group: ``(group_cols…,
    __bm__<alias>: map<bucket, bitmap>)``. Spark's bitmap family packs
    the column's long values into 4 KB segments keyed by
    ``bitmap_bucket_number`` (32 768 ids each); the per-(group, bucket)
    ``bitmap_construct_agg`` is map-side combinable, and the map
    collapses the buckets into one view-row-shaped column. NULL values
    are skipped (SQL COUNT DISTINCT semantics); a group with only NULL
    values simply has no state row — read back as an empty map."""
    v = F.col(col).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            *group_cols, F.bitmap_bucket_number(v).alias("__bkt")
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(v)).alias("__bmp")
        )
        .groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__bkt"), F.col("__bmp")))
            ).alias(_BM + alias)
        )
    )


def _attach_state(
    post: DataFrame, states: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Left-join per-agg hidden-state frames onto a post-image,
    null-safe on the group key (NULL is a legitimate GROUP BY value)."""
    for st in states:
        renamed = st
        for c in group_cols:
            renamed = renamed.withColumnRenamed(c, "__bs_" + c)
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(c).eqNullSafe(F.col("__bs_" + c))
                for c in group_cols
            ],
        )
        post = post.join(renamed, cond, "left").drop(
            *["__bs_" + c for c in group_cols]
        )
    return post


#: dimension sides broadcast-hint only under this many bytes of data
#: files (summed from the manifest — a metadata-only probe, no scan);
#: a genuinely large dimension joins plain and AQE decides at runtime,
#: the same driver-OOM guard _BROADCAST_KEY_CAP gives the key paths
_DIM_BROADCAST_BYTES_CAP = 256 * 1024 * 1024


def _pin_key(root: str) -> str:
    return os.path.abspath(root)


def _check_join_spec(join_spec: list[dict], base_cols: list[str]) -> list[dict]:
    """Validate and normalize a star ``join_spec``: every entry is
    ``{"dim_root": <snapshot table root>, "fact_keys": [...],
    "dim_keys": [...], "cols": [...dim columns projected into the
    joined frame...], "how": "inner"|"left"}``. Projected names must
    be unambiguous in the joined frame (disjoint from fact columns and
    from every other dimension's projection)."""
    seen: set[str] = set(base_cols)
    out = []
    for e in join_spec:
        if not e.get("dim_root"):
            raise ValueError("join_spec entry needs a 'dim_root'")
        fk, dk = list(e.get("fact_keys") or []), list(e.get("dim_keys") or [])
        if not fk or len(fk) != len(dk):
            raise ValueError(
                f"join_spec {e['dim_root']}: fact_keys and dim_keys must "
                f"be non-empty and the same length: {fk!r} vs {dk!r}"
            )
        how = e.get("how", "inner")
        if how not in ("inner", "left"):
            raise ValueError(
                f"join_spec {e['dim_root']}: how={how!r} — inner/left only "
                f"(right/outer would make the FACT side nullable, which "
                f"the change-row arithmetic cannot attribute)"
            )
        cols = list(e.get("cols") or [])
        if len(set(cols)) != len(cols):
            raise ValueError(
                f"join_spec {e['dim_root']}: duplicate cols {cols!r}"
            )
        reserved = [
            c
            for c in cols
            if c == "_change_type" or c.startswith(_HIDDEN_PREFIXES)
        ]
        if reserved:
            # ADVICE r13: these names are maintenance-internal — a dim
            # projecting `_change_type` (the change-row sign column) or
            # a hidden-prefix name would pass create() but produce a
            # duplicate/ambiguous column in the joined change-row
            # frame, failing at refresh time. Fail at create instead.
            raise ValueError(
                f"join_spec {e['dim_root']}: projected cols collide "
                f"with maintenance-internal names: {reserved!r} — "
                f"'_change_type' and the {_HIDDEN_PREFIXES} prefixes "
                f"are reserved; rename in the dim"
            )
        clash = set(cols) & seen
        if clash:
            raise ValueError(
                f"join_spec {e['dim_root']}: projected cols shadow fact "
                f"or earlier-dimension columns: {sorted(clash)!r} — "
                f"ambiguous references downstream; rename in the dim"
            )
        seen |= set(cols)
        out.append(
            {
                "dim_root": _pin_key(e["dim_root"]),
                "fact_keys": fk,
                "dim_keys": dk,
                "cols": cols,
                "how": how,
            }
        )
    return out


def _schema_names(tbl: SnapshotTable, version: int | None) -> list[str]:
    """Column names of a table version straight off the manifest's
    schema JSON — a pure-Python probe for schema checks that would
    otherwise build (and analyze) a throwaway read() DataFrame."""
    import json as _json

    return [
        f["name"]
        for f in _json.loads(tbl.manifest(version)["schema"])["fields"]
    ]


def _dim_bytes(dt: SnapshotTable, version: int) -> int:
    """Total data-file bytes of a dimension at a pinned version —
    manifest file list + os.stat, never a scan. Unknown (a missing
    file mid-probe) reads as 'too big': the join stays plain and AQE
    decides, which is always safe."""
    total = 0
    for f in dt.manifest(version)["files"]:
        try:
            total += os.path.getsize(os.path.join(dt.root, f))
        except OSError:
            return _DIM_BROADCAST_BYTES_CAP + 1
    return total


def _join_dims(
    spark: SparkSession,
    df: DataFrame,
    join_spec: list[dict],
    pins: dict,
) -> DataFrame:
    """Join a fact-shaped frame (the full base, a pruned scan, or the
    change-row diff — the join is agnostic) through every dimension at
    its PINNED version. Dim keys project under private aliases so join
    columns never collide with fact columns; each dim side broadcast-
    hints under :data:`_DIM_BROADCAST_BYTES_CAP` (the 100-TB plan: the
    fact never shuffles for a dimension lookup). Plain SQL equality on
    the keys — NULL fact keys never match, exactly the semantics the
    DuckDB oracle's JOIN computes."""
    out = df
    for i, e in enumerate(join_spec):
        dt = SnapshotTable(e["dim_root"])
        pin = pins[_pin_key(e["dim_root"])]
        priv = [f"__kdis_dk{i}_{j}" for j in range(len(e["dim_keys"]))]
        proj = dt.read(spark, version=pin, strip=False).select(
            *[
                F.col(k).alias(p)
                for k, p in zip(e["dim_keys"], priv)
            ],
            *[F.col(c) for c in e["cols"]],
        )
        if _dim_bytes(dt, pin) <= _DIM_BROADCAST_BYTES_CAP:
            proj = F.broadcast(proj)
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(fk) == F.col(p)
                for fk, p in zip(e["fact_keys"], priv)
            ],
        )
        out = out.join(proj, cond, e["how"]).drop(*priv)
    return out


class MaterializedView:
    """Handle on a materialized view created by :meth:`create`.

    Single-maintainer contract: one refresher at a time (concurrent
    refreshes raise ``ConcurrentCommitError`` from the underlying
    commit protocol rather than corrupt — re-run the loser). Readers
    are unrestricted: they see the last published view version, always
    a CONSISTENT image of some base version (never a partial refresh,
    because the swap is one commit)."""

    #: cost-based ``auto`` refresh (round 14, VERDICT r13 item 2): a
    #: dimension-change window picks a FULL REBUILD over the SCD delta
    #: when the base fact's total data bytes at head (manifest file
    #: list + os.stat — metadata-only, never a scan) fall under this
    #: cap. SCALE.md's round-13 measurement is the motivation: at
    #: fixture scale the SCD delta's fixed multi-pass overhead (dim
    #: diff, key-scoped fact scans, three-way union) costs ~10× a
    #: one-shot scan+aggregate+overwrite; the structural O(changed
    #: keys' fact rows) bound only wins once the base dwarfs the
    #: change. The cap errs low — past it the STRUCTURAL delta is the
    #: sound default at 100 TB; set to 0 (per-instance) to force the
    #: delta path always (the fuzz families do, so the hardest
    #: maintenance code keeps fuzzing regardless of fixture size).
    REBUILD_BYTES_CAP = 8 * 1024 * 1024

    def __init__(self, mv_root: str):
        self.root = mv_root
        spec_path = os.path.join(mv_root, _SPEC_FILE)
        with open(spec_path) as fh:
            self.spec = json.load(fh)
        self.table = SnapshotTable(mv_root)

    def _rebuild_cheaper(self, base: SnapshotTable, head: int) -> bool:
        """Manifest-stat cost probe for a dimension-change window: is
        the base small enough that one full scan+agg+overwrite beats
        the SCD delta's fixed multi-pass overhead? Unknown sizes (a
        file missing mid-probe) read as 'too big' — the structural
        delta is always the sound fallback."""
        cap = self.REBUILD_BYTES_CAP
        if cap <= 0:
            return False
        total = 0
        try:
            for f in base.manifest(head)["files"]:
                total += os.path.getsize(os.path.join(base.root, f))
                if total > cap:
                    return False
        except (OSError, KeyError):
            return False
        return True

    # ------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        base: SnapshotTable,
        mv_root: str,
        group_cols: list[str],
        aggs: list[dict],
        partition_cols: list[str] | None = None,
        join_spec: list[dict] | None = None,
    ) -> "MaterializedView":
        """Full first materialization at the base head. ``aggs`` is a
        list of ``{"fn": "count|sum|min|max|avg|countd", "col":
        <base column or None for count>, "alias": <output column>}``.
        Aliases must be unique and disjoint from ``group_cols``.

        ``join_spec`` (optional) declares STAR dimensions: a list of
        ``{"dim_root", "fact_keys", "dim_keys", "cols", "how"}``
        entries (see :func:`_check_join_spec`); ``group_cols`` and agg
        ``col``s may then reference the projected dimension columns.
        Each dimension is PINNED at its current head — the pins ride
        the data commit's manifest (atomic with the rows they
        produced) and every later refresh re-verifies them, rebuilding
        the view when a dimension logically changed.

        ``partition_cols`` (subset of ``group_cols``) partitions the
        VIEW table itself: the refresh machinery's touched-group scans
        (:meth:`_touched_view_rows`, the swap's affected-file
        discovery) then prune at the manifest instead of scanning the
        whole view — the piece that makes a LARGE view refresh in
        O(touched groups). Costs one extra rewrite of the initial
        aggregate at create time (spec evolution is metadata-only and
        applies to files written afterward)."""
        aliases = [a["alias"] for a in aggs]
        if len(set(aliases)) != len(aliases) or set(aliases) & set(group_cols):
            raise ValueError(
                f"aggregate aliases must be unique and disjoint from "
                f"group columns: {aliases!r} vs {group_cols!r}"
            )
        bad = [
            c
            for c in aliases + list(group_cols)
            if c.startswith(_HIDDEN_PREFIXES)
        ]
        if bad:
            raise ValueError(
                f"aliases/group columns must not start with the hidden "
                f"counter prefixes {_HIDDEN_PREFIXES}: {bad!r} — read() "
                f"strips those names and the maintenance arithmetic "
                f"could collide with them"
            )
        if partition_cols and not set(partition_cols) <= set(group_cols):
            raise ValueError(
                f"partition_cols must be a subset of group_cols: "
                f"{partition_cols!r} vs {group_cols!r} (partitioning on "
                f"an aggregate output would scatter every refresh)"
            )
        base_head = base.latest_version()
        if base_head is None:
            raise ValueError(f"base table {base.root} is empty")
        pins: dict = {}
        if join_spec:
            join_spec = _check_join_spec(
                join_spec, _schema_names(base, base_head)
            )
            for e in join_spec:
                dv = SnapshotTable(e["dim_root"]).latest_version()
                if dv is None:
                    raise ValueError(
                        f"dimension table {e['dim_root']} is empty"
                    )
                pins[_pin_key(e["dim_root"])] = dv
        os.makedirs(mv_root, exist_ok=True)
        spec_path = os.path.join(mv_root, _SPEC_FILE)
        if os.path.exists(spec_path):
            raise ValueError(f"view already exists at {mv_root}")
        if SnapshotTable(mv_root).latest_version() is not None:
            # a prior create crashed between the data commit and the
            # spec write: re-running would APPEND a second full
            # aggregate (duplicate rows per group) past the spec-exists
            # check above — refuse instead
            raise ValueError(
                f"{mv_root} already holds committed data but no view "
                f"spec (a prior create crashed between commit and spec "
                f"write?) — remove the directory and re-create"
            )
        # PINNED at the recorded head (round-13 review): the epoch
        # stamp and the aggregated rows must describe the same base
        # state — an unpinned read racing a concurrent append would
        # fold newer rows in, and the next refresh would re-apply that
        # same diff on top (double count)
        src = base.read(spark, version=base_head, strip=False)
        if join_spec:
            src = _join_dims(spark, src, join_spec, pins)
        full = src.groupBy(*group_cols).agg(
            *_agg_exprs(aggs, with_nn=_delta_eligible(aggs))
        )
        full = _attach_state(
            full,
            [
                _bitmap_state(src, list(group_cols), a["col"], a["alias"])
                for a in _bitmap_eligible(aggs, src)
            ],
            list(group_cols),
        )
        tbl = SnapshotTable(mv_root)
        tbl.commit(
            full,
            mode="append",
            epoch_id=base_head,
            manifest_extra={"dim_pins": pins} if join_spec else None,
        )
        if partition_cols:
            # spec evolution is metadata-only (applies to future
            # files); the compact rewrite lands the initial aggregate
            # as partitioned files so pruning works from day one. Both
            # commits are epoch-less rewrite_only metadata/layout —
            # the applied-version marker stays on the data commit and
            # the manifest walk passes through them.
            tbl.set_partition_spec(list(partition_cols))
            tbl.compact(spark)
        spec = {
            "base_root": os.path.abspath(base.root),
            "group_cols": list(group_cols),
            "aggs": list(aggs),
            # Every row of this view has carried its full hidden-state
            # family (__nn__/__sum__ counters, __bm__ bitmaps) since
            # creation: create() writes them atomically with the first
            # data commit, and every maintenance path preserves them
            # (delta/recompute emit them; insert-only is statically off
            # for counter views). Refresh and the transparent rewriter
            # therefore SKIP the per-window NULL-state probe jobs that
            # exist for views schema-widened by healing (guide §1.2:
            # one fewer Spark job per refresh and per answered rollup).
            # Views without the flag (pre-round-14 / foreign) keep the
            # probes.
            "state_from_birth": True,
        }
        if join_spec:
            spec["join_spec"] = join_spec
        tmp = spec_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, indent=2)
        os.replace(tmp, spec_path)
        return cls(mv_root)

    # ----------------------------------------------------------- queries
    def base(self) -> SnapshotTable:
        return SnapshotTable(self.spec["base_root"])

    def read(self, spark: SparkSession) -> DataFrame:
        df = self.table.read(spark)
        vis = [
            c
            for c in df.columns
            if not c.startswith(_HIDDEN_PREFIXES)
        ]
        return df.select(*vis)

    def marker_version(self) -> int:
        """The view VERSION holding the newest applied-base marker:
        walk back from the head past epoch-less commits (compaction on
        the view stamps none — metadata commits deliberately exclude
        the parent's markers). Retention must never drop this version;
        :meth:`expire` clamps to it."""
        v = self.table.latest_version()
        while v is not None:
            try:
                m = self.table.manifest(v)
            except Exception as e:  # expired/vacuumed mid-walk
                raise ValueError(
                    f"the applied-version marker below view version {v} "
                    f"was expired (retention ran without the "
                    f"MaterializedView.expire clamp?) — rebuild the view "
                    f"or restore the manifests: {e}"
                ) from e
            if "epoch_id" in m:
                return v
            v = m.get("base")
        raise ValueError(
            f"no applied-version marker in any manifest under "
            f"{self.root} — not a MaterializedView table?"
        )

    def applied_base_version(self) -> int:
        """The base version the view currently reflects — the
        ``epoch_id`` of :meth:`marker_version`'s manifest. The DELTA
        refresh path's exactly-once contract rides this value being
        exactly right, which is why it lives in the commit protocol
        (atomic with the data) and not in a side file."""
        return self.table.manifest(self.marker_version())["epoch_id"]

    def applied_dim_pins(self) -> dict:
        """The dimension versions the view's rows currently reflect —
        stamped (``dim_pins``) into the same marker manifest as the
        applied-base ``epoch_id``, so fact bookkeeping and dim
        bookkeeping can never tear apart."""
        return self.table.manifest(self.marker_version()).get(
            "dim_pins", {}
        )

    def _dim_state(self) -> tuple[dict, list[str], bool]:
        """(effective pins, logically-changed dim roots, unprovable):
        compare each dimension's head against the applied pin, walking
        the in-between commits — rewrite-only commits (compaction/
        optimize on the dim) are LOGICALLY neutral, so the pin silently
        advances to the new head (same rows, and the old version's
        files may be vacuumed out from under a stale pin); a
        data-carrying commit lands the dim on the CHANGED list (a
        single changed dim may still maintain incrementally — see
        :meth:`_dim_delta_rows`); ``unprovable`` (vacuumed walk range,
        foreign/pre-star pins, lost history) forces the full rebuild,
        the always-sound answer."""
        pins = self.applied_dim_pins()
        eff: dict = {}
        changed: list[str] = []
        unprovable = False
        for e in self.spec.get("join_spec") or []:
            k = _pin_key(e["dim_root"])
            dt = SnapshotTable(e["dim_root"])
            dv = dt.latest_version()
            if dv is None:
                raise ValueError(
                    f"dimension table {e['dim_root']} is empty/lost — "
                    f"rebuild the view against a restored dimension"
                )
            pv = pins.get(k)
            if pv is None or dv < pv:
                # foreign/pre-star view or a dim that lost history:
                # only a rebuild re-establishes a sound pin
                unprovable = True
            elif dv > pv:
                try:
                    if not all(
                        dt.manifest(v).get("rewrite_only")
                        for v in range(pv + 1, dv + 1)
                    ):
                        changed.append(k)
                except FileNotFoundError:
                    # the walk range was vacuumed/expired: neutrality is
                    # unprovable, and the pinned version itself may be
                    # gone — a rebuild at the head is the sound answer,
                    # not an error (retention on dims is legitimate)
                    unprovable = True
            eff[k] = dv
        return eff, changed, unprovable

    def _check_spec_columns(
        self, spark: SparkSession, base: SnapshotTable, head: int
    ) -> None:
        """Schema-evolution guard (round 14, VERDICT r13 item 6): the
        view definition references base (and dim-projected) columns by
        NAME — additive evolution (new columns) and safe widening are
        transparent to the aggregates, but a DROP or RENAME of a
        referenced column must fail refresh LOUDLY with the view's own
        vocabulary, up front, not as a mid-plan AnalysisException (or,
        worse, a silently NULL-filled aggregate on a re-added column of
        different meaning). Manifest-only: the committed schema JSON
        already names every column, so this probe costs zero Spark
        calls (building a read() DataFrame per refresh just for
        ``.columns`` forced a full analyzer pass each time)."""
        avail = set(_schema_names(base, head))
        join_spec = self.spec.get("join_spec") or []
        for e in join_spec:
            dt = SnapshotTable(e["dim_root"])
            dcols = set(_schema_names(dt, dt.latest_version()))
            missing_d = sorted(
                c
                for c in list(e["dim_keys"]) + list(e["cols"])
                if c not in dcols
            )
            if missing_d:
                raise ValueError(
                    f"dimension {e['dim_root']} no longer has columns "
                    f"{missing_d} referenced by the view's join_spec — "
                    f"the dim schema evolved incompatibly (drop/"
                    f"rename); re-create the view against the new "
                    f"schema"
                )
            missing_fk = sorted(
                c for c in e["fact_keys"] if c not in avail
            )
            if missing_fk:
                raise ValueError(
                    f"base {base.root} no longer has fact join keys "
                    f"{missing_fk} referenced by the view's join_spec "
                    f"— incompatible schema evolution; re-create the "
                    f"view"
                )
            avail |= set(e["cols"])
        need = set(self.spec["group_cols"]) | {
            a["col"] for a in self.spec["aggs"] if a.get("col")
        }
        missing = sorted(c for c in need if c not in avail)
        if missing:
            raise ValueError(
                f"base {base.root} (⋈ dims) no longer provides columns "
                f"{missing} referenced by the view definition "
                f"(group_cols/aggs) — a referenced column was dropped "
                f"or renamed; refresh would silently misaggregate, so "
                f"it refuses. Re-create the view for the new schema"
            )

    def expire(self, older_than_ms: int) -> dict:
        """Retention for the VIEW's own history, marker-safe: delegate
        to :func:`expire_snapshots` with ``min_retained_version``
        clamped to :meth:`marker_version` — time-based expiry can never
        orphan the applied-version marker, no matter how the head has
        been compacted. (Raw ``expire_snapshots`` on a view whose head
        is an epoch-less compact WOULD orphan it: head-only retention
        keeps the compact, drops the marker, and the next refresh
        cannot tell what was applied.)"""
        from kafka_database_import_spark.sources.snapshot import (
            expire_snapshots,
        )

        return expire_snapshots(
            self.table,
            older_than_ms,
            min_retained_version=self.marker_version(),
        )

    # ----------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession, strategy: str = "auto") -> dict:
        """Advance the view to the base table's current head.

        Two maintenance paths, both crash-safe (the swap and the
        applied-version stamp publish as ONE commit, and nothing is
        applied before it):

        * **delta** (all-COUNT/SUM/AVG views, ``strategy='auto'``
          default; AVG rides a hidden exact-SUM + non-null-COUNT
          decomposition):
          the exact change rows apply ARITHMETICALLY against the view's
          own current rows — O(change rows + touched groups), the base
          is never re-read. Exactly-once, not merely idempotent: the
          delta applies iff the commit that records it publishes.
        * **recompute** (MIN/MAX/COUNT-DISTINCT, or
          ``strategy='recompute'``): touched groups recompute from the
          base head via a pruned scan / semi-join — a pure function of
          base state, so replays converge. An INSERT-ONLY window on a
          COUNT/SUM/MIN/MAX view upgrades itself to the arithmetic
          ``delta_insert_only`` merge (no base re-read) — deletes and
          updates in the window fall back here.

        Star views add the DIMENSION handling described in the module
        docstring: logically-changed dims maintain via the SCD delta
        (one chained pass per dim; the result then carries
        ``dim_delta: True``), unprovable windows rebuild
        (``strategy='rebuild_dims'``).

        Returns ``{"noop", "base_version", "applied_from",
        "mv_version", "groups_touched", "strategy"[, "dim_delta"]}``."""
        if strategy not in ("auto", "delta", "recompute"):
            raise ValueError(f"strategy: {strategy!r}")
        base = self.base()
        head = base.latest_version()
        last = self.applied_base_version()
        if head < last:
            raise ValueError(
                f"base head {head} is older than the applied version "
                f"{last} — the base table lost history (manifests "
                f"removed?); rebuild the view"
            )
        join_spec = self.spec.get("join_spec") or []
        self._check_spec_columns(spark, base, head)
        pins: dict = {}
        if join_spec:
            pins, dims_changed, unprovable = self._dim_state()
            if unprovable:
                if strategy == "delta":
                    raise ValueError(
                        "strategy='delta' but dimension history is "
                        "unprovable (vacuumed walk range / foreign "
                        "pins) — only a rebuild is sound"
                    )
                return self._rebuild_for_dims(spark, base, head, pins, last)
            if dims_changed:
                if strategy == "auto" and self._rebuild_cheaper(
                    base, head
                ):
                    # cost-based choice (round 14): manifest stats say
                    # the base is small enough that one rebuild beats
                    # the SCD delta's fixed overhead — measured 10× at
                    # fixture scale (SCALE.md). strategy='delta' still
                    # forces the structural path; 'recompute' keeps
                    # its touched-group semantics through the SCD rows.
                    res = self._rebuild_for_dims(
                        spark, base, head, pins, last
                    )
                    res["rebuild_reason"] = "cost"
                    return res
                # one SCD pass per changed dim, each its own atomic
                # swap advancing exactly that dim's pin — readers
                # between passes see a CONSISTENT aggregate of a mixed
                # but well-defined dim-version vector; the fact diff is
                # consumed by the first pass (later passes see
                # applied_base == head and contribute B-rows only)
                applied = self.applied_dim_pins()
                done: set[str] = set()
                result: dict | None = None
                for k in dims_changed:
                    step_pins = dict(pins)
                    for other in dims_changed:
                        if other != k and other not in done:
                            step_pins[other] = applied[other]
                    last_now = self.applied_base_version()
                    synthetic = self._dim_delta_rows(
                        spark, base, head, last_now, step_pins, k
                    )
                    if synthetic is None:  # old pin vacuumed mid-build
                        if strategy == "delta":
                            raise ValueError(
                                "strategy='delta' but the changed "
                                "dimension's pinned history is gone — "
                                "only a rebuild is sound"
                            )
                        return self._rebuild_for_dims(
                            spark, base, head, pins, last
                        )
                    synthetic = synthetic.persist()
                    try:
                        result = self._refresh_from_delta(
                            spark, base, synthetic, head, last_now,
                            strategy, dim_pins=step_pins, dim_delta=True,
                        )
                    finally:
                        synthetic.unpersist()
                    done.add(k)
                result["applied_from"] = last
                return result
        if head == last:
            mv_version = self.table.latest_version()
            if join_spec and pins != self.applied_dim_pins():
                # ADVICE r13: the pins silently advanced past
                # rewrite-only dim commits (compaction) — persist them,
                # or an idle view re-walks the same dim manifest range
                # on every refresh and, once dim retention expires that
                # range, pays an O(base) rebuild despite no logical
                # change. Same files, one marker commit.
                mv_version = self._publish_marker(head, dim_pins=pins)
            return {
                "noop": True,
                "base_version": head,
                "applied_from": last,
                "mv_version": mv_version,
                "groups_touched": 0,
            }
        # the diff replays for every downstream action (group count,
        # post-image, swap bookkeeping) — pin it once; it is O(changed
        # rows), the one size refresh is allowed to hold. Star views
        # join the CHANGE ROWS through the pinned dims up front: every
        # downstream path (arithmetic delta, insert-only merge, touched-
        # group discovery) then sees the same joined shape create saw.
        delta = row_changes(base, spark, from_version=last, to_version=head)
        if join_spec:
            delta = _join_dims(spark, delta, join_spec, pins)
        delta = delta.persist()
        try:
            return self._refresh_from_delta(
                spark, base, delta, head, last, strategy, dim_pins=pins
            )
        finally:
            delta.unpersist()

    def _dim_delta_rows(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        head: int,
        last: int,
        new_pins: dict,
        changed_root: str,
    ) -> DataFrame | None:
        """Synthetic change-row frame for a window where ONE dimension
        logically changed — the SCD answer that replaces an O(base)
        rebuild with O(fact rows of the changed dimension keys):

        view ≡ Agg(fact@last ⋈ dims@old).  Target: Agg(fact@head ⋈
        dims@new).  Decomposition (dims agree outside the changed
        keys K, so the difference is confined to K's fact rows)::

            A        = Δfact(last→head) ⋈ dims@OLD     (native signs)
            B_remove = fact@head|key∈K ⋈ dims@OLD      (all 'delete')
            B_add    = fact@head|key∈K ⋈ dims@NEW      (all 'insert')

        The union feeds the STANDARD refresh machinery: arithmetic
        delta for counter-backed COUNT/SUM/AVG views, touched-group
        recompute at the new pins for everything else (B carries
        deletes, so the insert-only branch stays correctly off unless
        the dim window was pure key-insert) — either way ONE atomic
        swap stamped with the fact head and the NEW dim pins.
        ``fact@head|K`` prunes through :meth:`SnapshotTable.
        read_partition` on the fact's join column when K is small
        (partition/bloom/stats skipping — the dimension-driven fact
        scope again). Returns None when the changed dim's pinned
        history is unreadable (vacuumed) — the caller rebuilds."""
        join_spec = self.spec["join_spec"]
        e = next(
            x for x in join_spec if _pin_key(x["dim_root"]) == changed_root
        )
        dt = SnapshotTable(changed_root)
        old_pins = self.applied_dim_pins()
        pins_old = dict(new_pins)
        pins_old[changed_root] = old_pins[changed_root]
        try:
            ddiff = row_changes(
                dt,
                spark,
                from_version=old_pins[changed_root],
                to_version=new_pins[changed_root],
            )
            # NULL dim keys never join — they cannot affect any group
            kdf = ddiff.select(*e["dim_keys"]).na.drop().distinct()
            fact_k = self._fact_rows_for_dim_keys(spark, base, head, e, kdf)
            if head > last:
                a = _join_dims(
                    spark,
                    row_changes(
                        base, spark, from_version=last, to_version=head
                    ),
                    join_spec,
                    pins_old,
                )
            else:  # dims changed under an unchanged fact: B-only window
                a = None
            b_remove = _join_dims(spark, fact_k, join_spec, pins_old).withColumn(
                "_change_type", F.lit("delete")
            )
            b_add = _join_dims(spark, fact_k, join_spec, new_pins).withColumn(
                "_change_type", F.lit("insert")
            )
        except FileNotFoundError:
            return None
        out = b_remove.unionByName(b_add)
        return a.unionByName(out) if a is not None else out

    def _fact_rows_for_dim_keys(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        head: int,
        e: dict,
        kdf: DataFrame,
    ) -> DataFrame:
        """fact@head restricted to rows whose join key matches one of
        the changed dimension keys (``kdf``: distinct non-NULL key
        tuples). Small single-column key sets inline into
        read_partition (manifest/partition/bloom pruning, exact for
        equality INs); composite or large sets take an exact
        plain-equality semi-join against the key frame (NULL keys were
        already excluded — they never join), broadcast-hinted only
        under the probe bound."""
        fks, dks = e["fact_keys"], e["dim_keys"]
        krows = kdf.limit(self._INLINE_KEY_CAP + 1).collect()
        if len(fks) == 1 and len(krows) <= self._INLINE_KEY_CAP:
            vals = sorted({r[0] for r in krows}, key=str)
            return base.read_partition(
                spark, {fks[0]: vals}, version=head, strip=False
            )
        side = kdf.toDF(*[f"__ck_{i}" for i in range(len(dks))])
        if len(krows) <= self._INLINE_KEY_CAP:
            side = F.broadcast(side)  # known-small; else AQE decides
        cond = reduce(
            lambda x, y: x & y,
            [
                F.col(fk) == F.col(f"__ck_{i}")
                for i, fk in enumerate(fks)
            ],
        )
        return base.read(spark, version=head, strip=False).join(
            side, cond, "left_semi"
        )

    def _rebuild_for_dims(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        head: int,
        new_pins: dict,
        last: int,
    ) -> dict:
        """Full rebuild at (fact head, new dimension pins) as ONE
        atomic overwrite commit carrying both markers — the response
        to a logical dimension change, which invalidates every
        existing group's contribution (a delta cannot express "this
        customer moved segments" against already-folded aggregates).
        O(base) by necessity; the new pins make every subsequent
        fact-only window incremental again."""
        join_spec = self.spec["join_spec"]
        group_cols = self.spec["group_cols"]
        src = _join_dims(
            spark, base.read(spark, version=head, strip=False), join_spec,
            new_pins,
        )
        full = src.groupBy(*group_cols).agg(
            *_agg_exprs(
                self.spec["aggs"],
                with_nn=_delta_eligible(self.spec["aggs"]),
            )
        )
        full = _attach_state(
            full,
            [
                _bitmap_state(src, group_cols, a["col"], a["alias"])
                for a in _bitmap_eligible(self.spec["aggs"], src)
            ],
            group_cols,
        )
        v = self.table.commit(
            full,
            mode="overwrite",
            epoch_id=head,
            manifest_extra={"dim_pins": new_pins},
        )
        return {
            "noop": False,
            "base_version": head,
            "applied_from": last,
            "mv_version": v,
            # every group is touched by definition; counting them would
            # cost one extra full-view pass for a number nobody gates on
            "groups_touched": -1,
            "strategy": "rebuild_dims",
        }

    def _refresh_from_delta(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        delta: DataFrame,
        head: int,
        last: int,
        strategy: str,
        dim_pins: dict | None = None,
        dim_delta: bool = False,
    ) -> dict:
        group_cols = self.spec["group_cols"]
        extra = {"dim_pins": dim_pins} if dim_pins else None
        keys = delta.select(*group_cols).distinct()
        # One bounded collect serves every downstream consumer of the
        # touched-key set (the exact count, the inline pruning lists,
        # the NULL-counter probes) AND answers "does this window carry
        # a delete" for the insert-only branch: the old shape ran
        # count() here, re-collected the same tiny frame inside each
        # helper, and probed the delta separately for deletes — three
        # extra Spark jobs per refresh window. Round 15 folds a THIRD
        # consumer onto the same job: the view table's affected-file
        # discovery (the semi-join ``replace_where_keys`` would run as
        # its own action) unions in under a tag column via
        # ``_keys_and_hits``, so a delta window pays two actions total
        # (this collect + the swap's write) instead of three.
        kagg = delta.groupBy(*group_cols).agg(
            F.max(
                (F.col("_change_type") == "delete").cast("int")
            ).alias("__has_del")
        )
        pre_hits = None
        fused = self.table._keys_and_hits(
            spark, kagg, group_cols, self._INLINE_KEY_CAP
        )
        if fused is not None:
            key_rows, pre_hits = fused
        else:
            key_rows = kagg.limit(self._INLINE_KEY_CAP + 1).collect()
        has_delete: bool | None = None
        if len(key_rows) <= self._INLINE_KEY_CAP:
            n_groups = len(key_rows)
            has_delete = any(r["__has_del"] for r in key_rows)
            # swap the lineage-heavy keys frame (scan-diff → distinct)
            # for a LocalRelation of the collected tuples: every
            # downstream consumer (the swap's affected-file semi-join,
            # the recompute's exact tuple join) then broadcasts a
            # driver-local frame instead of re-running the delta plan
            # per job
            keys = spark.createDataFrame(
                [tuple(r[c] for c in group_cols) for r in key_rows],
                keys.schema,
            )
        else:  # genuinely large key set: exact count, no inlining
            key_rows = None
            pre_hits = None  # fused pass caps at _INLINE_KEY_CAP
            n_groups = keys.count()
        if n_groups == 0:
            # a pure rewrite range (compaction / a delta that nets to
            # zero rows): the view's DATA is already right, but the
            # applied-version marker must still advance or every future
            # refresh re-diffs this same range forever.
            out = {
                "noop": True,
                "base_version": head,
                "applied_from": last,
                "mv_version": self._publish_marker(head, dim_pins=dim_pins),
                "groups_touched": 0,
            }
            if dim_delta:
                out["dim_delta"] = True  # pins advanced with the marker
            return out
        aggs = self.spec["aggs"]
        mv_cols = set(_schema_names(self.table, None))
        use_delta = (
            _delta_eligible(aggs)
            and strategy != "recompute"
            # the hidden counters only exist if the view was CREATED
            # delta-eligible; an older/foreign view falls back
            and _NN + "rows" in mv_cols
            and all(
                _NN + a["alias"] in mv_cols
                for a in aggs
                if a["fn"] in ("sum", "avg")
            )
            and all(
                _SUM + a["alias"] in mv_cols
                for a in aggs
                if a["fn"] == "avg"
            )
        )
        if use_delta and not self.spec.get("state_from_birth"):
            # column PRESENCE is not enough: a view created BEFORE its
            # aggregates became delta-eligible (e.g. a pre-round-12 AVG
            # view) gets schema-WIDENED by its first recompute refresh —
            # touched groups gain counters, untouched rows read NULL.
            # Running the arithmetic path against NULL counters would
            # coalesce them to 0 (wrong averages, live groups wrongly
            # dropped). Probe the TOUCHED rows only (pruned scan): any
            # NULL counter → recompute this window, which rewrites
            # those groups WITH counters — the view self-heals toward
            # the delta path group by group. Views whose spec carries
            # ``state_from_birth`` skip the probe: NULL counters beside
            # live values are impossible by construction (create wrote
            # counters for every group and every path preserves them).
            touched = self._touched_view_rows(
                spark, keys, n_groups, key_rows=key_rows
            )
            if (
                touched.filter(F.col(_NN + "rows").isNull())
                .limit(1)
                .count()
                > 0
            ):
                use_delta = False
        if strategy == "delta" and not use_delta:
            raise ValueError(
                "strategy='delta' needs an all-COUNT/SUM/AVG view "
                "created by this module (hidden counters present on "
                "every touched row)"
            )
        # insert-only eligibility: MIN/MAX (and hidden-counter-less
        # foreign COUNT/SUM views) ARE self-maintainable when no row
        # was deleted; COUNT-DISTINCT joins them when its persisted
        # bitmap state is present (OR-merge of the inserts' partials).
        # Views CARRYING __nn__ counters never take this branch
        # (ADVICE r12): its post-image emits no counter columns, so
        # the swap's schema alignment would NULL-fill healthy counters
        # on every touched group — un-healing exactly the rows the
        # NULL-counter probe above sent here to be healed; those
        # recompute, whose _agg_exprs(with_nn=True) rewrites the
        # touched groups WITH counters.
        insert_only_ok = (
            not use_delta
            and strategy != "recompute"
            and all(
                a["fn"] in ("count", "sum", "min", "max", "countd")
                for a in aggs
            )
            and _NN + "rows" not in mv_cols
            and all(
                _BM + a["alias"] in mv_cols
                for a in aggs
                if a["fn"] == "countd"
            )
        )
        countd_aliases = [a["alias"] for a in aggs if a["fn"] == "countd"]
        if (
            insert_only_ok
            and countd_aliases
            and not self.spec.get("state_from_birth")
        ):
            # bitmap analog of the __nn__ NULL probe: a NULL map is
            # valid state ONLY for a zero-count group; NULL map beside
            # a live count is the schema-widened-unhealed artifact (a
            # pre-bitmap view recompute-widened) — merging inserts
            # into it would undercount. Recompute heals it with state.
            # (``state_from_birth`` views skip the probe — see above.)
            touched = self._touched_view_rows(
                spark, keys, n_groups, key_rows=key_rows
            )
            unhealed = reduce(
                lambda a, b: a | b,
                [
                    F.col(_BM + al).isNull() & (F.col(al) > 0)
                    for al in countd_aliases
                ],
            )
            if touched.filter(unhealed).limit(1).count() > 0:
                insert_only_ok = False
        strategy_used = "recompute"
        if use_delta:
            post = self._delta_post_image(
                spark, delta, keys, n_groups=n_groups, key_rows=key_rows
            )
            strategy_used = "delta"
        elif insert_only_ok and not (
            has_delete
            if has_delete is not None
            else delta.filter(F.col("_change_type") == "delete")
            .limit(1)
            .count()
            > 0
        ):
            # insert-only window: merge the inserts arithmetically /
            # bitmap-OR, skip the base re-read entirely. Deletes and
            # updates in the window (updates surface as delete+insert)
            # fall back to the pruned recompute below, which remains
            # the correctness anchor for non-self-maintainable
            # aggregates.
            post = self._insert_only_post_image(
                spark, delta, keys, n_groups=n_groups, key_rows=key_rows
            )
            strategy_used = "delta_insert_only"
        else:
            post = self._recompute_post_image(
                spark, base, keys, head, n_groups=n_groups,
                dim_pins=dim_pins, key_rows=key_rows,
            )
        v_before = self.table.latest_version()
        res = self.table.replace_where_keys(
            spark,
            keys,
            post,
            key_cols=group_cols,
            epoch_id=head,
            validate=False,  # post keys ⊆ touched keys by construction
            manifest_extra=extra,
            _precomputed=pre_hits,
        )
        mv_version = res["version"]
        if mv_version == v_before:
            # replace_where_keys publishes NO version when it matched
            # nothing and inserted nothing — possible when every
            # touched group was both created and fully deleted inside
            # the refresh window (keys non-empty, post-image empty, no
            # matching view rows). The data is right, but the
            # applied-version marker must still advance or every later
            # refresh re-diffs this same range forever.
            mv_version = self._publish_marker(head, dim_pins=dim_pins)
        out = {
            "noop": False,
            "base_version": head,
            "applied_from": last,
            "mv_version": mv_version,
            "groups_touched": n_groups,
            "strategy": strategy_used,
        }
        if dim_delta:
            # the window carried a LOGICAL dimension change handled
            # incrementally (SCD delta) — callers distinguishing a
            # plain fact window from an attribute migration read this
            out["dim_delta"] = True
        return out

    def _touched_view_rows(
        self,
        spark: SparkSession,
        keys: DataFrame,
        n_groups: int | None,
        key_rows: "list | None" = None,
    ) -> DataFrame:
        """The VIEW's current rows scoped to the touched groups — the
        same pruning ladder the recompute path applies to the BASE,
        here applied to the view side of the arithmetic join (reading
        the whole view per refresh would be O(view), breaking the
        delta paths' O(change rows + touched groups) bound the moment
        the view itself is large). Small key sets inline into
        :meth:`SnapshotTable.read_partition` (manifest/partition/bloom
        pruning when the view is partitioned; a pushdown-friendly IN
        otherwise; composite keys yield a cross-product SUPERSET —
        harmless, the caller's left join from the delta side drops
        unmatched rows); large sets semi-join, broadcast-hinted only
        under :attr:`_BROADCAST_KEY_CAP`."""
        group_cols = self.spec["group_cols"]
        if n_groups is not None and n_groups <= self._INLINE_KEY_CAP:
            if key_rows is None:  # caller didn't pre-collect
                key_rows = keys.collect()
            where = {
                c: sorted(
                    {r[c] for r in key_rows if r[c] is not None}, key=str
                )
                + ([None] if any(r[c] is None for r in key_rows) else [])
                for c in group_cols
            }
            return self.table.read_partition(spark, where, strip=False)
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__mv.{c}").eqNullSafe(F.col(f"__mk.{c}"))
                for c in group_cols
            ],
        )
        side = keys.alias("__mk")
        if n_groups is None or n_groups <= self._BROADCAST_KEY_CAP:
            side = F.broadcast(side)
        return (
            self.table.read(spark, strip=False)
            .alias("__mv")
            .join(side, cond, "left_semi")
        )

    def _insert_only_post_image(
        self,
        spark: SparkSession,
        delta: DataFrame,
        keys: DataFrame,
        n_groups: int | None = None,
        key_rows: "list | None" = None,
    ) -> DataFrame:
        """Post-image for an INSERT-ONLY change window over a
        COUNT/SUM/MIN/MAX view: each aggregate merges its old value
        with the inserts' partial aggregate — COUNT adds, SUM adds
        with SQL NULL semantics preserved WITHOUT hidden counters
        (inserts-only means the old visible SUM is NULL iff the group
        held zero non-null values, so old-NULL + all-NULL-delta stays
        NULL), MIN/MAX take least/greatest (null-skipping on both
        engines' semantics). Group liveness needs no counter either:
        inserts never empty a group. Cost is O(change rows + touched
        view groups) — the base is not re-read."""
        group_cols = self.spec["group_cols"]
        aggs = self.spec["aggs"]
        countd_aggs = [a for a in aggs if a["fn"] == "countd"]
        d_exprs = []
        for a in aggs:
            al = a["alias"]
            if a["fn"] == "countd":
                continue  # merged below through the bitmap state
            if a["fn"] == "count":
                d_exprs.append(
                    F.count(F.lit(1)).cast("long").alias(f"__d_{al}")
                )
            else:  # sum / min / max: partial aggregate of the inserts
                _, build = _AGG_FNS[a["fn"]]
                d_exprs.append(build(a["col"]).alias(f"__d_{al}"))
        d = (
            delta.groupBy(*group_cols).agg(*d_exprs)
            if d_exprs
            # all-countd view: no arithmetic partials, just the
            # touched group tuples (the bitmap merges carry the data)
            else delta.select(*group_cols).distinct()
        ).alias("__d")
        cur = self._touched_view_rows(
            spark, keys, n_groups, key_rows=key_rows
        )
        curA = cur.alias("__m")
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__d.{c}").eqNullSafe(F.col(f"__m.{c}"))
                for c in group_cols
            ],
        )
        j = d.join(curA, cond, "left")
        out_cols = [F.col(f"__d.{c}").alias(c) for c in group_cols]
        for a in aggs:
            al = a["alias"]
            if a["fn"] == "countd":
                continue
            old, dlt = F.col(f"__m.{al}"), F.col(f"__d.__d_{al}")
            if a["fn"] == "count":
                out_cols.append(
                    (F.coalesce(old, F.lit(0)) + dlt).alias(al)
                )
            elif a["fn"] == "sum":
                out_cols.append(
                    F.when(
                        old.isNull() & dlt.isNull(), F.lit(None)
                    )
                    .otherwise(
                        F.coalesce(old, F.lit(0)) + F.coalesce(dlt, F.lit(0))
                    )
                    .alias(al)
                )
            elif a["fn"] == "min":
                out_cols.append(F.least(old, dlt).alias(al))
            else:  # max
                out_cols.append(F.greatest(old, dlt).alias(al))
        post = j.select(*out_cols)
        # COUNT-DISTINCT merges through the persisted bitmap state
        # (VERDICT r12 item 2): OR the inserts' bitmap partials into
        # the touched groups' stored maps, re-count — exact, no base
        # re-read, O(touched groups × buckets + change rows). Only
        # reached when every countd alias HAS state and no touched row
        # carries the NULL-map-with-live-count widening artifact (the
        # caller's probes) — a NULL map here genuinely means "no
        # non-null values yet".
        for a in countd_aggs:
            al, col = a["alias"], a["col"]
            v = F.col(col).cast("long")
            old_st = cur.select(
                *group_cols,
                F.explode_outer(F.col(_BM + al)).alias("__bkt", "__bmp"),
            ).filter(F.col("__bmp").isNotNull())
            new_st = (
                delta.filter(F.col(col).isNotNull())
                .groupBy(
                    *group_cols, F.bitmap_bucket_number(v).alias("__bkt")
                )
                .agg(
                    F.bitmap_construct_agg(
                        F.bitmap_bit_position(v)
                    ).alias("__bmp")
                )
            )
            merged = (
                old_st.unionByName(new_st)
                .groupBy(*group_cols, "__bkt")
                .agg(F.bitmap_or_agg("__bmp").alias("__bmp"))
                .groupBy(*group_cols)
                .agg(
                    F.sum(F.bitmap_count("__bmp")).alias(al),
                    F.map_from_entries(
                        F.collect_list(F.struct("__bkt", "__bmp"))
                    ).alias(_BM + al),
                )
            )
            post = _attach_state(post, [merged], group_cols)
            # a touched group with zero non-null values has no merged
            # row: COUNT DISTINCT of nothing is 0, never NULL
            post = post.withColumn(al, F.coalesce(F.col(al), F.lit(0)))
        return post

    def _publish_marker(
        self, head: int, dim_pins: dict | None = None
    ) -> int:
        """Publish a files-unchanged marker commit: same file list,
        flagged ``rewrite_only`` so lineage walkers pass through,
        stamped with the caught-up base epoch (and, for star views,
        the dimension pins — stamped EXPLICITLY, never inherited: the
        head this copies from may be a compaction commit that carries
        no pins at all). Parent-commit markers are EXCLUDED from the
        copy (the round-6 metadata-commit lesson: inheriting them
        corrupts semantics)."""
        m = self.table.manifest()
        marker = {
            k: v
            for k, v in m.items()
            if k
            not in ("version", "base", "epoch_id", "committed_at_ms",
                    "rewrite_only", "dim_pins")
        }
        marker.update(
            version=m["version"] + 1,
            base=m["version"],
            mode="replace",
            epoch_id=head,
            rewrite_only=True,
        )
        if dim_pins:
            marker["dim_pins"] = dim_pins
        self.table._publish(marker["version"], marker)
        return marker["version"]

    #: single-column touched-key sets up to this size inline into a
    #: read_partition key list (manifest-pruned JVM scan); beyond it
    #: (or for composite keys) the broadcast semi-join path applies
    _INLINE_KEY_CAP = 1000

    #: above this many touched keys the semi-join fallback drops the
    #: forced F.broadcast hint — a backfill that touches ~all groups of
    #: a high-cardinality view would otherwise OOM the driver at exactly
    #: the scale MVs exist for; a plain semi-join lets AQE broadcast at
    #: runtime iff the built side is actually small
    _BROADCAST_KEY_CAP = 1_000_000

    def _recompute_post_image(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        keys: DataFrame,
        head: int,
        n_groups: int | None = None,
        dim_pins: dict | None = None,
        key_rows: "list | None" = None,
    ) -> DataFrame:
        """Exact post-image of the touched groups from the base head.
        Star views route to :meth:`_recompute_post_image_star`.

        Two scan strategies, same semantics: when the touched-key set
        is small, the per-column key values inline into
        :meth:`SnapshotTable.read_partition` pinned to ``head`` —
        manifest-level partition pruning plans only the affected
        partitions' files when the base is partitioned on the group
        column, the exact predicate re-applies on the survivors (so an
        unpartitioned base degrades to read+filter, never to wrong
        answers), and the scan stays a plain JVM parquet read (the
        Python DataSource's per-row Arrow path measured SLOWER than
        the pruning saved at 10×: 14.1 s vs 9.2 s — manifest pruning
        wants to live driver-side, not behind a Python reader).
        Version pinning keeps the snapshot contract — a concurrent
        base commit cannot leak newer rows into a post-image stamped
        with ``head``. Composite keys prune through the per-column
        cross-product scope with an exact null-safe semi-join on top
        (the scope is a SUPERSET of the touched tuples — sound for
        pruning, not for the aggregate); huge key sets fall back to
        a semi-join on the same pinned read — broadcast-hinted only
        up to :attr:`_BROADCAST_KEY_CAP` touched keys, plain (AQE
        decides) beyond it."""
        if self.spec.get("join_spec"):
            return self._recompute_post_image_star(
                spark, base, keys, head, dim_pins or {}, n_groups,
                key_rows=key_rows,
            )
        group_cols = self.spec["group_cols"]
        aggs = self.spec["aggs"]
        agg_exprs = _agg_exprs(aggs, with_nn=_delta_eligible(aggs))
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__b.{c}").eqNullSafe(F.col(f"__k.{c}"))
                for c in group_cols
            ],
        )
        if key_rows is None:
            if n_groups is not None and n_groups > self._INLINE_KEY_CAP:
                pass  # known-large: skip the probe collect
            else:
                key_rows = keys.limit(self._INLINE_KEY_CAP + 1).collect()
        if key_rows is not None and len(key_rows) <= self._INLINE_KEY_CAP:
            where = {
                c: sorted(
                    {r[c] for r in key_rows if r[c] is not None},
                    key=str,
                )
                + ([None] if any(r[c] is None for r in key_rows) else [])
                for c in group_cols
            }
            scan = base.read_partition(
                spark, where, version=head, strip=False
            )
            if len(group_cols) == 1:
                # single column: the scope IS the exact key set
                return self._post_from_scoped(
                    scan, group_cols, aggs, agg_exprs
                )
            # composite keys: the per-column scope is a CROSS-PRODUCT
            # superset of the touched tuples — pruning is sound, the
            # aggregate is not (it would emit post-rows for untouched
            # groups, which the swap would then insert as duplicates).
            # An exact null-safe semi-join on the touched tuples rides
            # the pruned scan.
            return self._post_from_scoped(
                scan.alias("__b").join(
                    F.broadcast(keys.alias("__k")), cond, "left_semi"
                ),
                group_cols,
                aggs,
                agg_exprs,
            )
        side = keys.alias("__k")
        if n_groups is None or n_groups <= self._BROADCAST_KEY_CAP:
            side = F.broadcast(side)
        return self._post_from_scoped(
            base.read(spark, version=head, strip=False)
            .alias("__b")
            .join(side, cond, "left_semi"),
            group_cols,
            aggs,
            agg_exprs,
        )

    def _post_from_scoped(
        self,
        scoped: DataFrame,
        group_cols: list[str],
        aggs: list[dict],
        agg_exprs: list,
    ) -> DataFrame:
        """Aggregate a scoped (pruned + semi-joined) scan into the
        touched groups' post-image, attaching hidden bitmap state for
        every integral-typed countd aggregate — ALWAYS emitted, so a
        pre-bitmap view heals toward the insert-only path group by
        group exactly the way __nn__ counters heal (the recompute that
        touches a group rewrites it WITH state). The scoped scan is
        consumed once per countd agg plus once for the main aggregate —
        all passes over the already-pruned files, never the table."""
        post = scoped.groupBy(*group_cols).agg(*agg_exprs)
        return _attach_state(
            post,
            [
                _bitmap_state(scoped, group_cols, a["col"], a["alias"])
                for a in _bitmap_eligible(aggs, scoped)
            ],
            group_cols,
        )

    def _recompute_post_image_star(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        keys: DataFrame,
        head: int,
        pins: dict,
        n_groups: int | None,
        key_rows: "list | None" = None,
    ) -> DataFrame:
        """Exact post-image of the touched groups for a STAR view:
        fact@head ⋈ pinned dims, semi-joined on the touched group
        tuples, re-aggregated.

        The pruning ladder extends the single-table one with
        DIMENSION-DRIVEN fact pruning: a touched group keyed by a
        dimension attribute (say c_mktsegment) cannot prune the fact
        at the manifest directly — but the dims are small, so filter
        the DIM to the touched attribute values, collect its join
        keys (bounded at _INLINE_KEY_CAP), and THOSE inline into
        :meth:`read_partition` on the fact's join column, where
        partition/bloom/file pruning applies. Fact-side group columns
        inline as before. Every scope is a SUPERSET of the touched
        tuples (per-column INs, per-dim key unions), so an exact
        null-safe semi-join on the tuples always rides on top —
        pruning can only drop non-contributors, never change the
        aggregate. Dims joined 'left' contribute no fact scope (a
        touched NULL-attribute group's contributors are exactly the
        UNMATCHED fact rows)."""
        join_spec = self.spec["join_spec"]
        group_cols = self.spec["group_cols"]
        aggs = self.spec["aggs"]
        agg_exprs = _agg_exprs(aggs, with_nn=_delta_eligible(aggs))
        fact_cols = set(_schema_names(base, head))
        fact_side = [c for c in group_cols if c in fact_cols]

        if key_rows is None and (
            n_groups is None or n_groups <= self._INLINE_KEY_CAP
        ):
            key_rows = keys.limit(self._INLINE_KEY_CAP + 1).collect()
        if key_rows is not None and len(key_rows) > self._INLINE_KEY_CAP:
            key_rows = None
        where: dict = {}
        if key_rows is not None:
            for c in fact_side:
                vals = {r[c] for r in key_rows}
                where[c] = sorted(
                    (v for v in vals if v is not None), key=str
                ) + ([None] if None in vals else [])
            for e in join_spec:
                dcols = [c for c in group_cols if c in e["cols"]]
                if (
                    not dcols
                    or len(e["fact_keys"]) != 1
                    or e["how"] != "inner"
                ):
                    continue
                dt = SnapshotTable(e["dim_root"])
                dscan = dt.read(
                    spark, version=pins[_pin_key(e["dim_root"])], strip=False
                )
                for c in dcols:
                    vals = {r[c] for r in key_rows}
                    non_null = [v for v in vals if v is not None]
                    cond_c = (
                        F.col(c).isin(non_null)
                        if non_null
                        else F.lit(False)
                    )
                    if None in vals:
                        cond_c = cond_c | F.col(c).isNull()
                    dscan = dscan.filter(cond_c)
                fk_rows = (
                    dscan.select(e["dim_keys"][0])
                    .distinct()
                    .limit(self._INLINE_KEY_CAP + 1)
                    .collect()
                )
                if len(fk_rows) > self._INLINE_KEY_CAP:
                    continue  # too many keys: this dim adds no scope
                fvals = sorted(
                    {r[0] for r in fk_rows if r[0] is not None}, key=str
                )
                # NULL dim keys never inner-join: the scope stays
                # NULL-free, and NULL fact keys (also never matching)
                # are rightly excluded by the IN
                fk = e["fact_keys"][0]
                if fk in where:
                    # intersect with an existing scope on the same col
                    where[fk] = [v for v in where[fk] if v in set(fvals)]
                else:
                    where[fk] = fvals
        scan = (
            base.read_partition(spark, where, version=head, strip=False)
            if where
            else base.read(spark, version=head, strip=False)
        )
        joined = _join_dims(spark, scan, join_spec, pins)
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__b.{c}").eqNullSafe(F.col(f"__k.{c}"))
                for c in group_cols
            ],
        )
        side = keys.alias("__k")
        if n_groups is None or n_groups <= self._BROADCAST_KEY_CAP:
            side = F.broadcast(side)
        return self._post_from_scoped(
            joined.alias("__b").join(side, cond, "left_semi"),
            group_cols,
            aggs,
            agg_exprs,
        )

    # --------------------------------------------------- streaming drive
    def maintain_stream(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """Continuously maintain the view off the base table's CHANGES
        STREAM (sources/snapshot_stream.py): each micro-batch of newly
        committed base versions triggers one :meth:`refresh`. The
        stream is the TRIGGER, not the data path — refresh re-derives
        its exact delta from the manifests, so a replayed micro-batch
        (crash-restart) or a batch that lags the head refreshes
        idempotently; the view never double-applies. APPEND-ONLY bases
        only (the changes stream's documented contract — a delete/merge
        commit fails the stream; mutating bases refresh batch-side on
        whatever cadence the maintainer chooses). Star views: only the
        FACT's commits trigger a batch; a dimension change is detected
        and answered (rebuild) by whichever refresh runs next, so a
        dim-mutating deployment should follow with one batch-side
        refresh rather than waiting on fact traffic. Returns the
        StreamingQuery; availableNow=True drains the backlog and stops
        (the ingest-then-report pattern); pass
        ``processing_time='30 seconds'`` instead for a long-running
        maintainer."""
        from kafka_database_import_spark.sources.snapshot_stream import (
            register,
        )

        register(spark)
        stream = (
            spark.readStream.format("kdis_snapshot_changes")
            .option("path", self.spec["base_root"])
            .load()
        )

        def _refresh_batch(batch_df, _epoch):
            # batch content is deliberately unused: versions, not rows,
            # drive the refresh (exactly-once lives in the manifest
            # epoch stamp, not in Spark's sink-commit log)
            self.refresh(spark)

        w = stream.writeStream.foreachBatch(_refresh_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif processing_time:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    def _delta_post_image(
        self,
        spark: SparkSession,
        delta: DataFrame,
        keys: DataFrame,
        n_groups: int | None = None,
        key_rows: "list | None" = None,
    ) -> DataFrame:
        """Post-image of the touched groups by ARITHMETIC — COUNT/SUM/AVG
        views never re-read the base: each change row contributes
        ``+value`` (insert) or ``-value`` (delete) and the view's own
        current row supplies the running totals, so refresh cost is
        O(change rows) + O(touched view groups). SUM's SQL semantics
        ride the hidden non-null counters: a sum is NULL exactly when
        its group holds zero non-null values, which the persisted
        ``__nn__*`` column tracks through inserts AND deletes (running
        sums alone cannot tell "all values deleted" from "sums to 0").
        Groups whose row count reaches zero are omitted — the swap
        deletes them."""
        group_cols = self.spec["group_cols"]
        aggs = self.spec["aggs"]
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        d_exprs = [F.sum(sign).alias("__d_rows")]
        for a in aggs:
            al = a["alias"]
            if a["fn"] == "count":
                d_exprs.append(F.sum(sign).alias(f"__d_{al}"))
            else:  # sum / avg: both ride (signed sum, signed nn count)
                c = F.col(a["col"])
                d_exprs.append(
                    F.sum(sign * F.coalesce(c, F.lit(0))).alias(f"__d_{al}")
                )
                d_exprs.append(
                    F.sum(sign * c.isNotNull().cast("long")).alias(
                        f"__dnn_{al}"
                    )
                )
        d = delta.groupBy(*group_cols).agg(*d_exprs).alias("__d")
        cur = self._touched_view_rows(
            spark, keys, n_groups, key_rows=key_rows
        ).alias("__m")
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__d.{c}").eqNullSafe(F.col(f"__m.{c}"))
                for c in group_cols
            ],
        )
        j = d.join(cur, cond, "left")
        out_cols = [F.col(f"__d.{c}").alias(c) for c in group_cols]
        new_rows = F.coalesce(
            F.col(f"__m.{_NN}rows"), F.lit(0)
        ) + F.col("__d.__d_rows")
        out_cols.append(new_rows.alias(_NN + "rows"))
        for a in aggs:
            al = a["alias"]
            if a["fn"] == "count":
                out_cols.append(
                    (
                        F.coalesce(F.col(f"__m.{al}"), F.lit(0))
                        + F.col(f"__d.__d_{al}")
                    ).alias(al)
                )
            elif a["fn"] == "avg":
                # AVG decomposition (VERDICT r11 item 7): maintain the
                # hidden exact sum and non-null count arithmetically,
                # re-derive the visible average — NULL when the group
                # holds zero non-null values, matching SQL AVG
                new_nn = F.coalesce(
                    F.col(f"__m.{_NN}{al}"), F.lit(0)
                ) + F.col(f"__d.__dnn_{al}")
                new_sum = F.coalesce(
                    F.col(f"__m.{_SUM}{al}"), F.lit(0)
                ) + F.col(f"__d.__d_{al}")
                out_cols.append(
                    F.when(
                        new_nn > 0, new_sum.cast("double") / new_nn
                    ).alias(al)
                )
                out_cols.append(new_sum.alias(_SUM + al))
                out_cols.append(new_nn.alias(_NN + al))
            else:
                new_nn = F.coalesce(
                    F.col(f"__m.{_NN}{al}"), F.lit(0)
                ) + F.col(f"__d.__dnn_{al}")
                new_sum = F.when(
                    new_nn == 0, F.lit(None)
                ).otherwise(
                    F.coalesce(F.col(f"__m.{al}"), F.lit(0))
                    + F.col(f"__d.__d_{al}")
                )
                out_cols.append(new_sum.alias(al))
                out_cols.append(new_nn.alias(_NN + al))
        return j.select(*out_cols).filter(F.col(_NN + "rows") > 0)
