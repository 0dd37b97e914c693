"""Transparent MV query rewrite (operators/mv_rewrite.py, round 14):
an aggregate query declared against the BASE table must be answered
from a maintained view whenever the view's state derives the answer
exactly — refreshing first when stale — and from the base otherwise.
Every rewrite asserts BOTH value-equality against a from-scratch base
computation AND (where claimed) the plan pin that no base file is
read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.operators.mv_rewrite import (
    AggregateQuery,
    ViewCatalog,
)
from kafka_database_import_spark.sources.mv import MaterializedView
from kafka_database_import_spark.sources.snapshot import SnapshotTable


@pytest.fixture(autouse=True)
def _structural_auto(monkeypatch):
    # keep refresh('auto') on the structural paths for tiny fixtures
    monkeypatch.setattr(MaterializedView, "REBUILD_BYTES_CAP", 0)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _mk_base(spark, tmp_path, name="base"):
    base = SnapshotTable(str(tmp_path / name))
    base.commit(
        spark.createDataFrame(
            [
                ("a", 1, 10, 100),
                ("a", 1, 20, 100),
                ("a", 2, None, 200),
                ("b", 1, 5, 100),
                ("b", 2, 7, 300),
                ("b", 2, 7, 100),  # duplicate k=100 across (b,2)
            ],
            "g string, h long, x long, k long",
        )
    )
    return base


def _reads_only(df, root):
    files = df.inputFiles()
    assert files, "expected a file-backed plan"
    import os

    r = os.path.abspath(root)
    return all(os.path.abspath(f.replace("file:", "")).startswith(r)
               for f in files)


def test_exact_grouping_is_pure_projection(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g", "h"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "min", "col": "x", "alias": "mn"},
            {"fn": "max", "col": "x", "alias": "mx"},
        ],
    )
    cat = ViewCatalog().register(mv)
    q = AggregateQuery(
        base.root, ["g", "h"],
        [
            {"fn": "sum", "col": "x", "alias": "total"},
            {"fn": "count", "alias": "cnt"},
            {"fn": "max", "col": "x", "alias": "mx"},
        ],
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view" and info["view_root"] == mv.root
    assert df.columns == ["g", "h", "total", "cnt", "mx"]
    assert _reads_only(df, mv.root)
    expected = base.read(spark).groupBy("g", "h").agg(
        F.sum("x").alias("total"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("x").alias("mx"),
    )
    assert _rows(df) == _rows(expected)


def test_coarsened_rollup_with_avg_decomposition(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g", "h"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "avg", "col": "x", "alias": "ax"},
        ],
    )
    cat = ViewCatalog().register(mv)
    q = AggregateQuery(
        base.root, ["g"],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "avg", "col": "x", "alias": "ax"},
        ],
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert _reads_only(df, mv.root)
    expected = base.read(spark).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.avg("x").alias("ax"),
    )
    assert _rows(df) == _rows(expected)
    # global rollup (no GROUP BY) derives too
    qg = AggregateQuery(
        base.root, [],
        [
            {"fn": "count", "alias": "n"},
            {"fn": "avg", "col": "x", "alias": "ax"},
        ],
    )
    dfg, infog = cat.answer(spark, qg)
    assert infog["source"] == "view"
    [(n, ax)] = dfg.collect()
    assert n == 6 and abs(ax - (10 + 20 + 5 + 7 + 7) / 5) < 1e-12


def test_countd_rolls_up_through_bitmaps_exactly(spark, tmp_path):
    """b's k values are {100} in (b,1) and {300, 100} in (b,2):
    summing per-view-group COUNT(DISTINCT) would double-count the
    shared k=100 and give b→3; the bitmap OR-merge must give the
    true b→2."""
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g", "h"],
        [
            {"fn": "countd", "col": "k", "alias": "nd"},
            {"fn": "count", "alias": "n"},
        ],
    )
    cat = ViewCatalog().register(mv)
    q = AggregateQuery(
        base.root, ["g"], [{"fn": "countd", "col": "k", "alias": "nd"}]
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert _reads_only(df, mv.root)
    assert _rows(df) == [("a", 2), ("b", 2)]
    # and the view's own per-(g,h) counts WOULD naively sum to b→3
    naive = dict(
        (g, n)
        for g, n in mv.read(spark)
        .groupBy("g")
        .agg(F.sum("nd").alias("n"))
        .collect()
    )
    assert naive["b"] == 3


def test_stale_view_refreshes_first_or_falls_back(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"],
        [{"fn": "sum", "col": "x", "alias": "sx"}],
    )
    base.commit(
        spark.createDataFrame(
            [("a", 9, 1000, 1)], "g string, h long, x long, k long"
        )
    )
    cat = ViewCatalog().register(mv)
    q = AggregateQuery(
        base.root, ["g"], [{"fn": "sum", "col": "x", "alias": "sx"}]
    )
    # stale_ok: the pre-append image, straight off the view
    df, info = cat.answer(spark, q, refresh="stale_ok")
    assert info["source"] == "view" and dict(_rows(df))["a"] == 30
    # none: stale view is skipped, base answers, view NOT mutated
    df, info = cat.answer(spark, q, refresh="none")
    assert info["source"] == "base"
    assert "stale" in info["rejected"][mv.root]
    assert dict(_rows(df))["a"] == 1030
    assert MaterializedView(mv.root).applied_base_version() == 1
    # auto (default): refresh fires, then the view answers
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert info["refresh"] and not info["refresh"]["noop"]
    assert dict(_rows(df))["a"] == 1030
    assert _reads_only(df, mv.root)
    # now fresh: refresh='none' uses the view
    df, info = cat.answer(spark, q, refresh="none")
    assert info["source"] == "view"


def test_non_derivable_queries_fall_back_to_base(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g"],
        [
            {"fn": "sum", "col": "x", "alias": "sx"},
            {"fn": "count", "alias": "n"},
        ],
    )
    cat = ViewCatalog().register(mv)

    def ans(q):
        return cat.answer(spark, q)

    # finer grouping than the view
    df, info = ans(AggregateQuery(
        base.root, ["g", "h"], [{"fn": "count", "alias": "n"}]
    ))
    assert info["source"] == "base" and "finer" in info["rejected"][mv.root]
    assert _rows(df) == _rows(
        base.read(spark).groupBy("g", "h").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    # aggregate the view does not carry
    df, info = ans(AggregateQuery(
        base.root, ["g"], [{"fn": "min", "col": "x", "alias": "mn"}]
    ))
    assert info["source"] == "base"
    # filter on a non-group column needs row detail
    df, info = ans(AggregateQuery(
        base.root, ["g"], [{"fn": "count", "alias": "n"}],
        filters=[{"col": "k", "op": "=", "value": 100}],
    ))
    assert info["source"] == "base"
    assert _rows(df) == [("a", 2), ("b", 2)]
    # avg rollup over a view WITHOUT the hidden decomposition (view
    # carries min → not delta-eligible → no __sum__/__nn__): must fall
    # back, never average averages
    mv2 = MaterializedView.create(
        spark, base, str(tmp_path / "mv2"), ["g", "h"],
        [
            {"fn": "avg", "col": "x", "alias": "ax"},
            {"fn": "min", "col": "x", "alias": "mn"},
        ],
    )
    cat2 = ViewCatalog().register(mv2)
    df, info = cat2.answer(spark, AggregateQuery(
        base.root, ["g"], [{"fn": "avg", "col": "x", "alias": "ax"}]
    ))
    assert info["source"] == "base"
    assert "not healed" in info["rejected"][mv2.root]
    expected = base.read(spark).groupBy("g").agg(F.avg("x").alias("ax"))
    assert _rows(df) == _rows(expected)


def test_group_filter_pushes_into_view(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mv = MaterializedView.create(
        spark, base, str(tmp_path / "mv"), ["g", "h"],
        [{"fn": "sum", "col": "x", "alias": "sx"}],
    )
    cat = ViewCatalog().register(mv)
    # filter col h is a VIEW group col but not a query group col:
    # groups partition whole, so the view still answers
    q = AggregateQuery(
        base.root, ["g"],
        [{"fn": "sum", "col": "x", "alias": "sx"}],
        filters=[{"col": "h", "op": "=", "value": 2}],
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert _reads_only(df, mv.root)
    assert _rows(df) == _rows(
        base.read(spark)
        .filter(F.col("h") == 2)
        .groupBy("g")
        .agg(F.sum("x").alias("sx"))
    )


def test_catalog_prefers_smallest_derivable_view(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    fine = MaterializedView.create(
        spark, base, str(tmp_path / "fine"), ["g", "h", "k"],
        [{"fn": "count", "alias": "n"}],
    )
    coarse = MaterializedView.create(
        spark, base, str(tmp_path / "coarse"), ["g"],
        [{"fn": "count", "alias": "n"}],
    )
    cat = ViewCatalog().register(fine).register(coarse)
    df, info = cat.answer(spark, AggregateQuery(
        base.root, ["g"], [{"fn": "count", "alias": "n"}]
    ))
    assert info["source"] == "view" and info["view_root"] == coarse.root
    assert _rows(df) == [("a", 3), ("b", 3)]
    # a (g,h) query can only use the finer view
    df, info = cat.answer(spark, AggregateQuery(
        base.root, ["g", "h"], [{"fn": "count", "alias": "n"}]
    ))
    assert info["view_root"] == fine.root


def test_star_query_matches_star_view(spark, tmp_path):
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "d_id long, color string"
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(1, 10), (1, 20), (2, 5), (9, 99)], "f_did long, x long"
        )
    )
    js = [{"dim_root": dim.root, "fact_keys": ["f_did"],
           "dim_keys": ["d_id"], "cols": ["color"], "how": "inner"}]
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"],
        [{"fn": "sum", "col": "x", "alias": "sx"}], join_spec=js,
    )
    cat = ViewCatalog().register(mv)
    # same star shape (projected cols need not match) → view answers
    q = AggregateQuery(
        fact.root, ["color"],
        [{"fn": "sum", "col": "x", "alias": "sx"}], join_spec=js,
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert _reads_only(df, mv.root)
    assert _rows(df) == [("blue", 5), ("red", 30)]
    # the SAME aggregate without the join is a DIFFERENT relation
    # (inner join drops f_did=9): must fall back to the base
    qq = AggregateQuery(
        fact.root, [], [{"fn": "sum", "col": "x", "alias": "sx"}]
    )
    df, info = cat.answer(spark, qq)
    assert info["source"] == "base"
    assert [tuple(r) for r in df.collect()] == [(134,)]


def test_rewrite_reflects_dim_change_through_refresh(spark, tmp_path):
    """The full transparency story in one arc: dim mutates, the user
    re-asks the SAME query, auto-refresh maintains the view (SCD delta
    under the pinned cap) and the answer moves — still reading only
    view files."""
    fact = SnapshotTable(str(tmp_path / "fact"))
    dim = SnapshotTable(str(tmp_path / "dim"))
    dim.commit(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "d_id long, color string"
        )
    )
    fact.commit(
        spark.createDataFrame(
            [(1, 10), (1, 20), (2, 5)], "f_did long, x long"
        )
    )
    js = [{"dim_root": dim.root, "fact_keys": ["f_did"],
           "dim_keys": ["d_id"], "cols": ["color"], "how": "inner"}]
    mv = MaterializedView.create(
        spark, fact, str(tmp_path / "mv"), ["color"],
        [{"fn": "sum", "col": "x", "alias": "sx"}], join_spec=js,
    )
    cat = ViewCatalog().register(mv)
    q = AggregateQuery(
        fact.root, ["color"],
        [{"fn": "sum", "col": "x", "alias": "sx"}], join_spec=js,
    )
    dim.merge_rows(
        spark,
        spark.createDataFrame([(1, "blue")], "d_id long, color string"),
        key_cols=["d_id"],
    )
    df, info = cat.answer(spark, q)
    assert info["source"] == "view"
    assert info["refresh"] and info["refresh"].get("dim_delta")
    assert _reads_only(df, mv.root)
    assert _rows(df) == [("blue", 35)]
