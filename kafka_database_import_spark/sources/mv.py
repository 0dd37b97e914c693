"""Incrementally-maintained materialized views over snapshot tables.

A materialized view here is a grouped aggregate of ONE base snapshot
table, itself stored as a snapshot table — so an MV composes with
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
  compaction commits), takes the DISTINCT GROUP KEYS the diff touches,
  recomputes ONLY those groups from the base head, and swaps them into
  the view with ONE atomic :meth:`SnapshotTable.replace_where_keys`
  commit stamped ``epoch_id = base head version``.

Why affected-group RECOMPUTE instead of algebraic +/- deltas: delta
maintenance is exact only for self-maintainable aggregates (COUNT/SUM);
MIN/MAX/COUNT(DISTINCT) under deletes need the base rows anyway. The
recompute path supports every aggregate uniformly AND is idempotent —
the post-image is a pure function of the base head, so a crash between
any two steps (or a re-run of a half-applied refresh) converges instead
of double-applying. The applied-version bookkeeping is atomic WITH the
data because ``replace_where_keys`` publishes both in one manifest; the
failure mode of a separate pointer file (pointer advanced, data not, or
vice versa) cannot exist.

Scale shape at 100 TB: the diff is O(rows in files the change range
touched); the recompute scans the base ONCE filtered by a broadcast
null-safe semi-join on the touched keys (when the group column is a
partition-spec source or bloom-indexed column, that scan prunes at the
manifest/sidecar level too); the swap rewrites O(affected groups) of
the view. Nothing is ever O(base table) except the initial ``create``.

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


def _agg_exprs(aggs: list[dict]):
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
        out.append(build(a.get("col")).alias(a["alias"]))
    return out


class MaterializedView:
    """Handle on a materialized view created by :meth:`create`.

    Single-maintainer contract: one refresher at a time (concurrent
    refreshes raise ``ConcurrentCommitError`` from the underlying
    commit protocol rather than corrupt — re-run the loser). Readers
    are unrestricted: they see the last published view version, always
    a CONSISTENT image of some base version (never a partial refresh,
    because the swap is one commit)."""

    def __init__(self, mv_root: str):
        self.root = mv_root
        spec_path = os.path.join(mv_root, _SPEC_FILE)
        with open(spec_path) as fh:
            self.spec = json.load(fh)
        self.table = SnapshotTable(mv_root)

    # ------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        base: SnapshotTable,
        mv_root: str,
        group_cols: list[str],
        aggs: list[dict],
    ) -> "MaterializedView":
        """Full first materialization at the base head. ``aggs`` is a
        list of ``{"fn": "count|sum|min|max|avg|countd", "col":
        <base column or None for count>, "alias": <output column>}``.
        Aliases must be unique and disjoint from ``group_cols``."""
        aliases = [a["alias"] for a in aggs]
        if len(set(aliases)) != len(aliases) or set(aliases) & set(group_cols):
            raise ValueError(
                f"aggregate aliases must be unique and disjoint from "
                f"group columns: {aliases!r} vs {group_cols!r}"
            )
        base_head = base.latest_version()
        if base_head is None:
            raise ValueError(f"base table {base.root} is empty")
        os.makedirs(mv_root, exist_ok=True)
        spec_path = os.path.join(mv_root, _SPEC_FILE)
        if os.path.exists(spec_path):
            raise ValueError(f"view already exists at {mv_root}")
        full = (
            base.read(spark)
            .groupBy(*group_cols)
            .agg(*_agg_exprs(aggs))
        )
        tbl = SnapshotTable(mv_root)
        tbl.commit(full, mode="append", epoch_id=base_head)
        spec = {
            "base_root": os.path.abspath(base.root),
            "group_cols": list(group_cols),
            "aggs": list(aggs),
        }
        tmp = spec_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, indent=2)
        os.replace(tmp, spec_path)
        return cls(mv_root)

    # ----------------------------------------------------------- queries
    def base(self) -> SnapshotTable:
        return SnapshotTable(self.spec["base_root"])

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)

    def applied_base_version(self) -> int:
        """The base version the view currently reflects: walk back from
        the view head past epoch-less commits (compaction on the view
        itself stamps none) to the newest refresh/create manifest."""
        v = self.table.latest_version()
        while v is not None:
            m = self.table.manifest(v)
            if "epoch_id" in m:
                return m["epoch_id"]
            v = m.get("base")
        raise ValueError(
            f"no applied-version marker in any manifest under "
            f"{self.root} — not a MaterializedView table?"
        )

    # ----------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> dict:
        """Advance the view to the base table's current head.

        Idempotent and crash-safe: the affected groups' post-image is
        recomputed from the base HEAD (pure function of base state),
        and the swap + applied-version stamp publish as one commit.
        Returns ``{"noop", "base_version", "applied_from",
        "mv_version", "groups_touched"}``."""
        base = self.base()
        head = base.latest_version()
        last = self.applied_base_version()
        group_cols = self.spec["group_cols"]
        if head == last:
            return {
                "noop": True,
                "base_version": head,
                "applied_from": last,
                "mv_version": self.table.latest_version(),
                "groups_touched": 0,
            }
        if head < last:
            raise ValueError(
                f"base head {head} is older than the applied version "
                f"{last} — the base table lost history (manifests "
                f"removed?); rebuild the view"
            )
        delta = row_changes(base, spark, from_version=last, to_version=head)
        keys = delta.select(*group_cols).distinct()
        n_groups = keys.count()
        if n_groups == 0:
            # a pure rewrite range (compaction / a delta that nets to
            # zero rows): the view's DATA is already right, but the
            # applied-version marker must still advance or every future
            # refresh re-diffs this same range forever. Publish a
            # files-unchanged marker commit: same file list, flagged
            # rewrite_only so lineage walkers pass through, stamped
            # with the caught-up epoch. Parent-commit markers are
            # EXCLUDED from the copy (the round-6 metadata-commit
            # lesson: inheriting them corrupts semantics).
            m = self.table.manifest()
            marker = {
                k: v
                for k, v in m.items()
                if k
                not in ("version", "base", "epoch_id", "committed_at_ms",
                        "rewrite_only")
            }
            marker.update(
                version=m["version"] + 1,
                base=m["version"],
                mode="replace",
                epoch_id=head,
                rewrite_only=True,
            )
            self.table._publish(marker["version"], marker)
            return {
                "noop": True,
                "base_version": head,
                "applied_from": last,
                "mv_version": marker["version"],
                "groups_touched": 0,
            }
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__b.{c}").eqNullSafe(F.col(f"__k.{c}"))
                for c in group_cols
            ],
        )
        post = (
            base.read(spark)
            .alias("__b")
            .join(F.broadcast(keys.alias("__k")), cond, "left_semi")
            .groupBy(*group_cols)
            .agg(*_agg_exprs(self.spec["aggs"]))
        )
        res = self.table.replace_where_keys(
            spark,
            keys,
            post,
            key_cols=group_cols,
            epoch_id=head,
            validate=False,  # post keys ⊆ touched keys by construction
        )
        return {
            "noop": False,
            "base_version": head,
            "applied_from": last,
            "mv_version": res["version"],
            "groups_touched": n_groups,
        }
