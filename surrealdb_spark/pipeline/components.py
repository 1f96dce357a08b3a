"""Connected components over near-duplicate pair graphs: turn dedup PAIRS
into dedup GROUPS (each document → its cluster's canonical id).

This is the step after MinHash/SimHash pair mining in a real training-data
pipeline: pairs (a,b) form an undirected graph; every component keeps one
canonical document.  Algorithm: iterative min-label propagation — each
round every node adopts the smallest label among itself and its neighbors;
converges in O(diameter) rounds.  Same execution discipline as graph
recursion (operators/graph.py): one eager localCheckpoint per round, stop
when no label changes.  At 100 TB this is the standard alternating-star
family of algorithms; min-label propagation is its simplest member and
shuffles only on the edge endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "id1",
    right: str = "id2",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node
    id reachable (the canonical representative)."""
    edges = (
        pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
        .unionByName(pairs.select(F.col(right).alias("a"), F.col(left).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__changed")).isEmpty() is False
        labels = updated.drop("__changed")
        if not changed:
            break
    return labels


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str, left: str = "id1", right: str = "id2"
) -> DataFrame:
    """Every document → its canonical id (itself when unpaired): the final
    keep/drop assignment of a dedup pipeline."""
    comp = connected_components(pairs, left, right)
    return (
        docs.join(comp, docs[id_col] == comp.node, "left")
        .withColumn("canonical", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("node", "component")
    )
