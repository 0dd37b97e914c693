"""Connected components over an edge list — the clustering step that
turns near-duplicate *pairs* (MinHash/LSH candidates, q44) into
duplicate *groups* with one keeper each. The reference has no graph
operator; this is declared engine surface for training-data dedup,
where "A≈B, B≈C ⇒ {A,B,C} keep one" requires transitive closure.

Scale design (the 100 TB question): label propagation by iterated
join — each iteration is one shuffle join of the label table (|V|
rows, 2 narrow columns) against the symmetrized edge list, followed by
a min-aggregate. Rounds needed = eccentricity of each component's
minimum node (measured: 2 on the sf0.1 MinHash near-dup graph, 21 on
the sparser q63 co-occurrence graph) — but every per-round join keys
on a UNIQUE node id, so rounds stay flat-cost no matter how the label
distribution degenerates. The tempting pointer-jumping upgrade
(label := label-of-label, Kiveris et al. SOCC'14 style) was measured
WORSE here: it joins on the label value, which concentrates onto one
hot key exactly as components collapse — the last rounds went 0.5 s →
4 s (and 33–150 s with a second label-keyed join) while saving only 2
of 21 rounds. If diameters outgrow this, the fix is the full
large-star/small-star alternation (which re-keys by node each phase),
not a label-keyed shortcut join. Two things keep the loop
cluster-safe:

* ``localCheckpoint`` every round truncates lineage — without it the
  plan doubles per iteration and Catalyst analysis time explodes;
* convergence is detected with a cheap ``changed == 0`` count on the
  already-materialized checkpoint, so the loop runs exactly as many
  rounds as the graph needs, not ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable via undirected
    edges. Raises if ``max_iter`` rounds don't converge (a dedup graph
    that deep means the edge set is wrong, not the algorithm)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # Min label among self and neighbors. The join shuffles on the
        # node id both sides; the aggregate reuses that partitioning.
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(sym.u.alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
                (F.col("nmin") < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("node", "label")
        if n_changed == 0:
            return labels.withColumnRenamed("label", "component")
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_ppm: int = 850_000,
    tol_ppm: int = 100,
    max_iter: int = 120,
) -> DataFrame:
    """(node, rank) PageRank over the undirected view of ``edges``,
    converged to a per-node delta below ``tol_ppm`` micro-units.

    Same loop discipline as :func:`connected_components`: per-round one
    node-keyed join of the rank vector against the degree-annotated
    edge list + one aggregation, ``localCheckpoint`` each round to
    truncate lineage, convergence detected on the already-materialized
    result. ALL arithmetic is integer micro-units (rank 1.0 =
    1_000_000): distributed sums are order-independent, results are
    bit-reproducible run-to-run and engine-to-engine — the property the
    catalog's q99z differential check relies on. Damping is expressed
    as the exact rational damping_ppm/1e6 via integer div. Round
    budget: bipartite-ish structures (stars) oscillate with spectral
    radius = damping, so reaching tol needs ~log(amplitude/tol)/
    log(1/damping) rounds — ~60 for 100 ppm at 0.85; the default
    budget leaves headroom."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    elist = sym.join(deg, "u").localCheckpoint()
    base = 1_000_000 - damping_ppm
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(1_000_000).cast("bigint").alias("rank")
    ).localCheckpoint()

    for _ in range(max_iter):
        contrib = elist.join(ranks, elist.u == ranks.node).select(
            F.col("v"),
            # `div` is true integer division; bigint `/` returns double
            # and its IEEE rounding can cross an integer boundary for
            # large degree × 1e6 denominators, breaking the
            # bit-reproducibility contract (q99z uses div for the same
            # reason).
            F.expr(f"(rank * {damping_ppm}) div ({1_000_000} * d)").alias("c"),
        )
        nxt = (
            contrib.groupBy("v")
            .agg((F.lit(base) + F.sum("c")).alias("new_rank"))
            .select(F.col("v").alias("node"), "new_rank")
        )
        joined = (
            ranks.join(nxt, "node", "left")
            .select(
                "node",
                F.coalesce("new_rank", F.lit(base)).alias("rank"),
                F.abs(F.coalesce("new_rank", F.lit(base)) - F.col("rank")).alias(
                    "delta"
                ),
            )
            .localCheckpoint()
        )
        max_delta = joined.agg(F.max("delta")).collect()[0][0]
        ranks = joined.select("node", "rank")
        if max_delta is not None and max_delta <= tol_ppm:
            return ranks
    raise RuntimeError(f"pagerank: no convergence in {max_iter} rounds")


def count_triangles(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected simple graph given as an
    edge DataFrame with columns ``(a, b)`` — degree-ordered wedge
    algorithm (q99zk's core, factored out for reuse and model-based
    testing).

    Self-loops are dropped, multi-edges and both orientations collapse
    via distinct; each triangle is counted exactly once by pivoting
    every wedge on its lowest-(degree, id) vertex, bounding join work
    at Σ outdeg² with outdeg ≤ O(√m) for any graph — the property that
    keeps hub-heavy 100 TB graphs from exploding the naive Σ deg²
    self-join. The (deg, id) total order is compared per-edge rather
    than materialized as a global rank (which would be its own
    single-partition bottleneck). Returns one row: ``n_triangles``."""
    und = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    lex_lt = (F.col("e1.dst_deg") < F.col("e2.dst_deg")) | (
        (F.col("e1.dst_deg") == F.col("e2.dst_deg"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    wedges = e1.join(e2, (F.col("e1.src") == F.col("e2.src")) & lex_lt).select(
        F.col("e1.dst").alias("src"), F.col("e2.dst").alias("dst")
    )
    tri = wedges.join(oriented.select("src", "dst"), ["src", "dst"], "inner")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
