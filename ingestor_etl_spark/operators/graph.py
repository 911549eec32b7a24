"""Distributed connected components (near-dup cluster assignment).

Dedup at training-data scale needs more than candidate *pairs*: the
pairs form a graph whose connected components are the duplicate
clusters (keep one doc per component). The reference has no such
operator (its dedup is per-key dict lookups); this is an engine
extension in the spirit of SURVEY §8.1.

Algorithm: iterative min-label propagation — every node starts
labeled with itself; each round every node takes the min label among
itself and its neighbors; converged when no label changes. Rounds =
graph diameter. For 100 TB-scale graphs with long chains, swap the
propagation step for the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) which converges in O(log n) rounds with the same
join-groupBy building blocks; near-dup graphs are dense and shallow
(diameter ≲ 5), so plain propagation is the right default.

Every round is two shuffles (join on v, groupBy u) over the same
key; the label frame is persisted per round and the previous round
unpersisted so lineage stays O(1) deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id in its component. Returns ``(node, component)``
    for every node that appears in at least one edge."""
    # localCheckpoint (eager) after every round TRUNCATES LINEAGE —
    # without it each round's plan nests the previous round's and
    # planning/execution cost grows exponentially with iterations.
    # (A lazy persist is NOT enough: the convergence probe's
    # limit(1) short-circuits before the cache fully materializes.)
    # On a long-lived production cluster prefer checkpoint() to a
    # reliable store so executor loss stays recoverable.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left_outer")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .where(F.col("new_label") < F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select(F.col("node"), F.col("label").alias("component"))
