"""Distributed connected components — dup-pair edges → dup clusters.

Near-duplicate detection produces PAIRS; deduplication needs CLUSTERS (keep
one survivor per component). Components are an iterative fixpoint — not
expressible in one SQL query (Spark has no recursive CTE) — so this is a
genuine custom operator: large-star/small-star-style label propagation on
DataFrames.

Algorithm: every node starts labeled with itself; each round, a node adopts
the minimum label in its closed neighborhood; stop when no label changes.
Rounds = O(graph diameter); near-dup graphs are unions of small dense
blobs, so 2-4 rounds in practice.

Scale notes:
- Each round is one join (edges ⋈ labels) + one groupBy(min) — two shuffles
  on node id, both AQE-managed. Labels are (node, long) — tiny next to the
  edge list.
- The driver only sees the single changed-row COUNT per round (the loop
  condition), never data.
- Iteration count is capped (``max_iter``) as a runaway guard; the cap
  raising is a config, not a redesign, for adversarial diameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Undirected connected components. ``edges``: two long columns.

    Returns ``(node, component)`` where ``component`` is the minimum node id
    in the node's component — deterministic, join-able back onto the doc
    table to pick keep-first survivors.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrize once; self-loops are harmless but dropped for volume
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u") != F.col("v")
    )
    # materialize the edge list once — labels join it every round, and its
    # upstream (e.g. the whole MinHash-LSH pipeline) must not re-execute
    # per iteration
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # each node: min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nmin"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # truncate lineage per round
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def dedup_survivors(
    docs: DataFrame,
    dup_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep-first dedup over near-dup clusters: every doc gets its component
    (itself when un-duplicated) and ``is_survivor`` = (id == component min).
    One broadcast-able label join back onto the corpus."""
    comp = connected_components(dup_edges, src, dst)
    out = docs.join(comp, docs[id_col] == comp["node"], "left").select(
        docs[id_col],
        F.coalesce(F.col("component"), docs[id_col]).alias("component"),
    )
    return out.withColumn("is_survivor", F.col(id_col) == F.col("component"))
