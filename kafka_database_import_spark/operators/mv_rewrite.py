"""Transparent materialized-view query rewrite (round 14, VERDICT r13
item 1).

The MV machinery (``sources/mv.py``) maintains grouped-aggregate state
incrementally, but through round 13 a user had to KNOW the view
existed and call ``mv.read()`` — an aggregate query written against
the base table re-scanned the base, which is exactly the reference's
own sin (kafka-database-import.go:148-158 re-reads the source on
every run). This module closes that gap: declare the aggregate query
once, register the views in a :class:`ViewCatalog`, and
:meth:`ViewCatalog.answer` routes the query to a maintained view
whenever the view's state DERIVES the answer — refreshing the view
first if it lags the base — and falls back to the base scan otherwise.
The caller never changes shape: one call, a DataFrame back, plus an
explanation dict saying which route fired and why.

Derivability (the classic summary-table rewrite conditions, specialised
to this engine's maintained state):

* same base table, same star ``join_spec`` (as an unordered multiset of
  ``(dim_root, fact_keys, dim_keys, how)`` — keyed equi-joins commute,
  and a view joining a DIFFERENT dimension set describes a different
  relation, so anything else falls through);
* query group columns ⊆ view group columns (the view's grouping is as
  fine or finer — query groups are unions of whole view groups);
* every query filter references view GROUP columns only (such
  predicates partition view groups whole; a filter on a non-group
  column would need row detail the view no longer holds);
* every query aggregate derives from view state when view groups roll
  up (``G_query ⊂ G_view``):

  - COUNT        → SUM(view count)
  - SUM(c)       → SUM(view sum(c))           (SQL NULL semantics free:
                   SUM skips NULLs and is NULL over all-NULL)
  - MIN/MAX(c)   → MIN/MAX(view min/max(c))
  - AVG(c)       → SUM(``__sum__``)/SUM(``__nn__``) — the hidden exact
                   decomposition delta-eligible views already maintain
                   (a view without the counters falls through: AVG of
                   AVGs is wrong, and this module never approximates)
  - COUNT DISTINCT(c) → OR-merge of the hidden ``__bm__`` bitmap maps
                   (``sources/mv.py::_bitmap_state``) then
                   ``bitmap_count`` — EXACT across group boundaries,
                   the whole point of persisting mergeable state

  With ``G_query = G_view`` every aggregate additionally derives by
  plain projection (no shuffle at all).

Hidden-state soundness: a view that was schema-widened by healing
(``sources/mv.py`` round-12/13 lessons) can carry NULL counters or
NULL bitmap maps beside live visible values on not-yet-healed rows.
Deriving through such state would silently drop those rows' weight, so
the rewriter PROBES the (filtered) view rows it is about to use —
LIMIT-1 existence checks, O(pruned view scan) — and falls back to the
base on any hit. Wrong-but-fast is never on the menu.

Freshness: ``refresh='auto'`` (default) calls
:meth:`MaterializedView.refresh` before answering — the maintenance
cost the engine already optimised (O(change rows), cost-based
rebuild-vs-delta for dim windows). ``refresh='stale_ok'`` answers from
the view as-is (dashboard mode); ``refresh='none'`` uses the view only
if it is ALREADY at the base head and otherwise falls back to the base
scan, never mutating view state.

Scale shape at 100 TB: an answered query costs O(filtered view rows) —
the view is partition-pruned by the pushed group filters — versus
O(base partition scan) for the fallback; the bitmap COUNT-DISTINCT
rollup moves 4 KB buckets per (group, bucket), never re-touching the
fact. The catalog prefers the SMALLEST derivable view by manifest data
bytes (metadata probe, no scan), so a wide rollup lattice routes each
query to its cheapest summary.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.mv import (
    _BM,
    _NN,
    _SUM,
    _agg_exprs,
    _join_dims,
    _pin_key,
    _schema_names,
    MaterializedView,
)
from kafka_database_import_spark.sources.snapshot import SnapshotTable

__all__ = ["AggregateQuery", "ViewCatalog"]


#: filter operators the rewriter understands — each compiles to the
#: same predicate on the view (pushed into its pruned scan) and on the
#: base fallback, and to the obvious ANSI SQL for oracles
_OPS = {"=", "!=", "<", "<=", ">", ">=", "in", "between",
        "is_null", "is_not_null"}


class AggregateQuery:
    """A declarative grouped-aggregate query over ONE base snapshot
    table, optionally star-joined through dimension snapshot tables —
    the query shape :meth:`ViewCatalog.answer` can transparently
    answer from a maintained view.

    ``aggs`` uses the same ``{"fn", "col", "alias"}`` spec as
    :meth:`MaterializedView.create` (fns: count/sum/min/max/avg/
    countd). ``filters`` is a conjunctive list of
    ``{"col", "op", ...}`` predicates with ``op`` one of ``=, !=, <,
    <=, >, >=, in (values), between (low, high), is_null,
    is_not_null``. ``join_spec`` matches create()'s shape."""

    def __init__(
        self,
        base_root: str,
        group_cols: list[str],
        aggs: list[dict],
        filters: list[dict] | None = None,
        join_spec: list[dict] | None = None,
    ):
        if not aggs:
            raise ValueError("an aggregate query needs at least one agg")
        aliases = [a["alias"] for a in aggs]
        if len(set(aliases)) != len(aliases):
            raise ValueError(f"duplicate agg aliases: {aliases!r}")
        for f in filters or []:
            if f.get("op") not in _OPS:
                raise ValueError(
                    f"filter op {f.get('op')!r} — supported: {sorted(_OPS)}"
                )
        self.base_root = os.path.abspath(base_root)
        self.group_cols = list(group_cols)
        self.aggs = [dict(a) for a in aggs]
        self.filters = [dict(f) for f in filters or []]
        self.join_spec = [dict(e) for e in join_spec or []]


def _pred(f: dict):
    c = F.col(f["col"])
    op = f["op"]
    if op == "=":
        return c == F.lit(f["value"])
    if op == "!=":
        return c != F.lit(f["value"])
    if op == "<":
        return c < F.lit(f["value"])
    if op == "<=":
        return c <= F.lit(f["value"])
    if op == ">":
        return c > F.lit(f["value"])
    if op == ">=":
        return c >= F.lit(f["value"])
    if op == "in":
        return c.isin(list(f["values"]))
    if op == "between":
        return c.between(F.lit(f["low"]), F.lit(f["high"]))
    if op == "is_null":
        return c.isNull()
    return c.isNotNull()


def _apply_filters(df: DataFrame, filters: list[dict]) -> DataFrame:
    for f in filters:
        df = df.filter(_pred(f))
    return df


def _join_shape(join_spec: list[dict]) -> set:
    """Order-free fingerprint of a star join: keyed equi-joins against
    distinct dimensions commute, so two specs joining the same dims on
    the same keys the same way describe the same relation regardless
    of entry order or which dim columns they project."""
    return {
        (
            _pin_key(e["dim_root"]),
            tuple(e.get("fact_keys") or []),
            tuple(e.get("dim_keys") or []),
            e.get("how", "inner"),
        )
        for e in join_spec
    }


class _NotDerivable(Exception):
    pass


def _find_view_agg(view_aggs: list[dict], fn: str, col):
    for a in view_aggs:
        if a["fn"] == fn and (not col or a.get("col") == col):
            return a
    return None


class ViewCatalog:
    """Registry of maintained views + the transparent-rewrite planner.

    ``register`` accepts a view root or a :class:`MaterializedView`;
    ``answer`` routes an :class:`AggregateQuery` to the cheapest
    derivable view (or the base). Registration is idempotent."""

    def __init__(self):
        self._roots: list[str] = []

    def register(self, view) -> "ViewCatalog":
        root = os.path.abspath(
            view.root if isinstance(view, MaterializedView) else view
        )
        # loading validates the spec file exists / parses
        MaterializedView(root)
        if root not in self._roots:
            self._roots.append(root)
        return self

    # ------------------------------------------------------ planning
    def _check_derivable(
        self, mv: MaterializedView, q: AggregateQuery
    ) -> None:
        """Raise :class:`_NotDerivable` with the reason unless ``mv``
        can answer ``q`` exactly. Pure-metadata checks only — the
        hidden-state NULL probes run later, against the pruned rows."""
        spec = mv.spec
        if spec["base_root"] != q.base_root:
            raise _NotDerivable("different base table")
        if _join_shape(spec.get("join_spec") or []) != _join_shape(
            q.join_spec
        ):
            raise _NotDerivable(
                "star join shape differs (dim set / keys / how)"
            )
        vg = set(spec["group_cols"])
        if not set(q.group_cols) <= vg:
            raise _NotDerivable(
                f"query groups {sorted(set(q.group_cols) - vg)} are "
                f"finer than the view's grouping"
            )
        bad = [f["col"] for f in q.filters if f["col"] not in vg]
        if bad:
            raise _NotDerivable(
                f"filters on non-group columns {sorted(set(bad))} need "
                f"row detail the view no longer holds"
            )
        exact = set(q.group_cols) == vg
        for a in q.aggs:
            fn, col = a["fn"], a.get("col")
            if fn in ("count", "sum", "min", "max"):
                if not _find_view_agg(spec["aggs"], fn, col):
                    raise _NotDerivable(
                        f"no view aggregate derives "
                        f"{fn}({col or '*'})"
                    )
            elif fn == "avg":
                # rolling up needs the hidden exact decomposition
                # (presence checked against the view's actual columns
                # in _answer_from_view); at exact grouping the visible
                # value suffices
                if _find_view_agg(spec["aggs"], "avg", col) is None:
                    raise _NotDerivable(f"no view aggregate for avg({col})")
            elif fn == "countd":
                if _find_view_agg(spec["aggs"], "countd", col) is None:
                    raise _NotDerivable(
                        f"no view aggregate for count_distinct({col})"
                    )
            else:
                raise _NotDerivable(f"unsupported aggregate fn {fn!r}")

    def _view_bytes(self, mv: MaterializedView) -> int:
        total = 0
        try:
            for f in mv.table.manifest()["files"]:
                total += os.path.getsize(os.path.join(mv.root, f))
        except (OSError, KeyError):
            return 1 << 62
        return total

    # ------------------------------------------------------ answering
    def answer(
        self,
        spark: SparkSession,
        q: AggregateQuery,
        refresh: str = "auto",
    ) -> tuple[DataFrame, dict]:
        """Answer ``q`` from the cheapest derivable registered view,
        else from the base. Returns ``(df, info)`` where ``info`` is
        ``{"source": "view"|"base", "view_root": ..., "refresh":
        <refresh result or None>, "rejected": {root: reason, ...}}``.
        The DataFrame's columns are exactly ``group_cols + [a["alias"]
        for a in aggs]`` on BOTH routes — callers cannot tell which
        fired except through ``info`` (that is the point)."""
        if refresh not in ("auto", "stale_ok", "none"):
            raise ValueError(f"refresh: {refresh!r}")
        rejected: dict = {}
        candidates: list[MaterializedView] = []
        for root in self._roots:
            mv = MaterializedView(root)
            try:
                self._check_derivable(mv, q)
                candidates.append(mv)
            except _NotDerivable as e:
                rejected[root] = str(e)
        candidates.sort(key=lambda m: self._view_bytes(m))
        for mv in candidates:
            info = {"source": "view", "view_root": mv.root,
                    "refresh": None, "rejected": rejected}
            if refresh == "auto":
                info["refresh"] = mv.refresh(spark)
            elif refresh == "none":
                base = mv.base()
                stale = (
                    mv.applied_base_version() != base.latest_version()
                )
                if not stale and mv.spec.get("join_spec"):
                    _, changed, unprovable = mv._dim_state()
                    stale = bool(changed) or unprovable
                if stale:
                    rejected[mv.root] = (
                        "stale under refresh='none' (base/dims moved)"
                    )
                    continue
            df = self._answer_from_view(spark, mv, q)
            if df is None:  # unhealed hidden state — probe hit
                rejected[mv.root] = (
                    "hidden state not healed on touched rows "
                    "(NULL counters/bitmaps beside live values)"
                )
                continue
            return df, info
        return (
            self._answer_from_base(spark, q),
            {"source": "base", "view_root": None, "refresh": None,
             "rejected": rejected},
        )

    def _answer_from_view(
        self, spark: SparkSession, mv: MaterializedView, q: AggregateQuery
    ) -> DataFrame | None:
        spec = mv.spec
        full = _apply_filters(mv.table.read(spark), q.filters)
        gq = list(q.group_cols)
        exact = set(gq) == set(spec["group_cols"])
        # column PRESENCE from the committed manifest schema (zero
        # Spark calls) — forcing full.columns here costs an analyzer
        # pass per answered query
        cols = set(_schema_names(mv.table, None))

        # soundness probes over the rows the rewrite would consume:
        # healing (sources/mv.py) widens schemas lazily, so NULL hidden
        # state can sit beside live visible values — derive from it and
        # those rows' weight silently vanishes. State-column presence
        # first (a view created before its state family existed simply
        # lacks the column), then one LIMIT-1 probe per aggregate,
        # against the already-filtered frame. Views whose spec carries
        # ``state_from_birth`` (created by this module's create(), which
        # writes the full state family atomically with the first commit
        # and whose every maintenance path preserves it) skip the probe
        # JOBS — the presence checks stay, they are free.
        if not exact:
            probed = not spec.get("state_from_birth")
            for a in q.aggs:
                fn, col = a["fn"], a.get("col")
                if fn == "avg":
                    v = _find_view_agg(spec["aggs"], "avg", col)
                    need = (_SUM + v["alias"], _NN + v["alias"])
                    if any(s not in cols for s in need):
                        return None
                    probe = (
                        F.col(_NN + v["alias"]).isNull()
                        & F.col(v["alias"]).isNotNull()
                    )
                    if probed and full.filter(probe).limit(1).count() > 0:
                        return None
                elif fn == "countd":
                    v = _find_view_agg(spec["aggs"], "countd", col)
                    if _BM + v["alias"] not in cols:
                        return None
                    probe = (
                        F.col(_BM + v["alias"]).isNull()
                        & (F.col(v["alias"]) > 0)
                    )
                    if probed and full.filter(probe).limit(1).count() > 0:
                        return None

        if exact:
            # finest case: pure projection + rename, zero shuffle
            sel = [F.col(c) for c in gq]
            for a in q.aggs:
                v = _find_view_agg(spec["aggs"], a["fn"], a.get("col"))
                sel.append(F.col(v["alias"]).alias(a["alias"]))
            return full.select(*sel)

        # rollup: view groups are unions of query groups
        exprs = []
        countd_aggs = []
        for a in q.aggs:
            fn, col, alias = a["fn"], a.get("col"), a["alias"]
            v = _find_view_agg(spec["aggs"], fn, col)
            va = F.col(v["alias"])
            if fn == "count":
                exprs.append(F.sum(va).cast("long").alias(alias))
            elif fn == "sum":
                exprs.append(F.sum(va).alias(alias))
            elif fn == "min":
                exprs.append(F.min(va).alias(alias))
            elif fn == "max":
                exprs.append(F.max(va).alias(alias))
            elif fn == "avg":
                s, n = F.sum(F.col(_SUM + v["alias"])), F.sum(
                    F.col(_NN + v["alias"])
                )
                exprs.append(
                    F.when(n > 0, s.cast("double") / n).alias(alias)
                )
            else:  # countd — merged below through the bitmap maps
                countd_aggs.append((a, v))
        main = (
            full.groupBy(*gq).agg(*exprs)
            if exprs
            else full.select(*gq).distinct()
        )
        for a, v in countd_aggs:
            alias = a["alias"]
            cd = (
                full.select(
                    *gq,
                    F.explode_outer(F.col(_BM + v["alias"])).alias(
                        "__bkt", "__bmp"
                    ),
                )
                .filter(F.col("__bmp").isNotNull())
                .groupBy(*gq, "__bkt")
                .agg(F.bitmap_or_agg("__bmp").alias("__bmp"))
                .groupBy(*gq)
                .agg(
                    F.sum(F.bitmap_count("__bmp"))
                    .cast("long")
                    .alias(alias)
                )
            )
            if gq:
                cond = reduce(
                    lambda x, y: x & y,
                    [
                        F.col(f"__mn.{c}").eqNullSafe(F.col(f"__cd.{c}"))
                        for c in gq
                    ],
                )
                main = (
                    main.alias("__mn")
                    .join(cd.alias("__cd"), cond, "left")
                    .select(
                        *[F.col(f"__mn.{c}") for c in main.columns],
                        F.col(f"__cd.{alias}"),
                    )
                )
            else:
                main = main.crossJoin(cd)
            # a query group whose rows held only NULL values has no
            # merged bitmap row: COUNT DISTINCT of nothing is 0
            main = main.withColumn(
                alias, F.coalesce(F.col(alias), F.lit(0))
            )
        # present columns in the declared order
        return main.select(
            *gq, *[a["alias"] for a in q.aggs]
        )

    def _answer_from_base(
        self, spark: SparkSession, q: AggregateQuery
    ) -> DataFrame:
        """The fallback: the same answer computed from the base head
        (⋈ dims at their heads for star queries) — correctness anchor
        and the route for anything no view derives."""
        base = SnapshotTable(q.base_root)
        df = base.read(spark)
        if q.join_spec:
            pins = {
                _pin_key(e["dim_root"]): SnapshotTable(
                    e["dim_root"]
                ).latest_version()
                for e in q.join_spec
            }
            df = _join_dims(spark, df, q.join_spec, pins)
        df = _apply_filters(df, q.filters)
        if q.group_cols:
            out = df.groupBy(*q.group_cols).agg(
                *_agg_exprs(q.aggs, with_nn=False)
            )
        else:
            out = df.agg(*_agg_exprs(q.aggs, with_nn=False))
        return out.select(
            *q.group_cols, *[a["alias"] for a in q.aggs]
        )
