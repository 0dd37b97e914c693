"""Connected components over an edge list — the clustering step that
turns near-duplicate *pairs* (MinHash/LSH candidates, q44) into
duplicate *groups* with one keeper each. The reference has no graph
operator; this is declared engine surface for training-data dedup,
where "A≈B, B≈C ⇒ {A,B,C} keep one" requires transitive closure.

Scale design (the 100 TB question): label propagation by iterated
join — each iteration is one shuffle join of the label table (|V|
rows, 2 narrow columns) against the symmetrized edge list, followed by
a min-aggregate. Rounds needed = graph diameter, which for dedup
graphs is tiny (near-dup clusters are dense blobs, diameter ≤ ~5; the
alternating large-star/small-star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14, converges in
O(log²) rounds and is the drop-in upgrade if diameters grow). Two
things keep the loop cluster-safe:

* ``localCheckpoint`` every round truncates lineage — without it the
  plan doubles per iteration and Catalyst analysis time explodes;
* convergence is detected with a cheap ``changed == 0`` count on the
  already-materialized checkpoint, so the loop runs diameter+1 rounds,
  not ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
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
