"""Graph layer: RELATE-shaped edge tables, hop traversal, bounded recursion.

Reference semantics (surrealdb/surrealdb):
  - edges are ordinary records with ``in``/``out`` RecordId fields created by
    RELATE (core/src/doc/edges.rs, core/src/doc/relate.rs);
  - traversal ``->edge->target`` / ``<-edge<-`` / ``<->`` expands via
    GraphEdgeScan (core/src/exec/operators/scan/graph.rs:43,64) with
    direction enum Dir::{In,Out,Both} (core/src/expr/dir.rs:18-26);
  - reverse-reference lookup ``<~`` (core/src/exec/operators/scan/reference.rs:48);
  - bounded recursion ``@{min..max}`` with +collect/+shortest instructions
    (core/src/exec/operators/recursion.rs:1-44; depth cap IDIOM_RECURSION_LIMIT
    core/src/cnf/mod.rs:53).

Spark mapping: an edge table is a DataFrame with string record-id columns
``in``/``out`` (canonical form ``table:key``); one hop is one equi-join
(broadcast when the edge table is small); recursion is an iterative BFS
driver loop — each round joins the frontier against the edge table and
anti-joins the visited set (cycle handling per recursion.rs:8-15).  At
scale the edge table is hash-partitioned on the join side's key so
successive hops reuse the shuffle; frontiers are localCheckpointed every
few rounds to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IN, OUT = "in", "out"
# Reference default recursion cap (core/src/cnf/mod.rs:53-54).
RECURSION_LIMIT = 256


def record_id(table: str, key: Column | str) -> Column:
    """Canonical string form of a RecordId: ``table:key``
    (types/src/value/record_id/mod.rs:22 — Struct{tb, key} rendered as tb:key).
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.concat(F.lit(table), F.lit(":"), k.cast("string"))


def record_table(rid: Column | str) -> Column:
    """record::tb() — table part of a record id."""
    c = F.col(rid) if isinstance(rid, str) else rid
    return F.substring_index(c, ":", 1)


def record_key(rid: Column | str) -> Column:
    """record::id() — key part of a record id."""
    c = F.col(rid) if isinstance(rid, str) else rid
    return F.substring_index(c, ":", -1)


def relate(
    src: DataFrame,
    src_table: str,
    src_key: str,
    dst_table: str,
    dst_key: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """RELATE src->edge->dst over a DataFrame of (src_key, dst_key[, payload]).

    Returns the edge table: ``in``, ``out`` + payload columns
    (core/src/doc/relate.rs — edge records carry in/out plus user fields).
    """
    cols = [
        record_id(src_table, src_key).alias(IN),
        record_id(dst_table, dst_key).alias(OUT),
    ]
    cols += [F.col(c) for c in (payload or [])]
    return src.select(*cols)


def graph_hop(
    start: DataFrame,
    edges: DataFrame,
    direction: str = "out",
    edge_filter: Column | None = None,
    start_id: str = "id",
    broadcast_edges: bool = False,
) -> DataFrame:
    """One traversal hop: expand each start record id along the edge table.

    Returns the start DataFrame's columns plus ``nbr`` (neighbor record id).
    direction 'out' = ``->``, 'in' = ``<-``, 'both' = ``<->``
    (core/src/expr/dir.rs:18-26).  ``edge_filter`` is the
    ``->(edge WHERE ...)->`` predicate (core/src/expr/lookup.rs:63).
    """
    if edge_filter is not None:
        edges = edges.filter(edge_filter)
    if direction == "both":
        return graph_hop(start, edges, "out", None, start_id, broadcast_edges).unionByName(
            graph_hop(start, edges, "in", None, start_id, broadcast_edges)
        )
    here, there = (IN, OUT) if direction == "out" else (OUT, IN)
    e = edges.select(F.col(here).alias("__here"), F.col(there).alias("nbr"))
    if broadcast_edges:
        e = F.broadcast(e)
    return start.join(e, start[start_id] == e.__here).drop("__here")


def reference_lookup(
    start: DataFrame, referrers: DataFrame, ref_field: str, start_id: str = "id"
) -> DataFrame:
    """``<~`` reverse-reference lookup: who references me
    (core/src/exec/operators/scan/reference.rs:48) — an equi-join with the
    sides swapped: referrers.ref_field == start.id.
    """
    return start.join(referrers, referrers[ref_field] == start[start_id], "inner")


def recurse(
    start: DataFrame,
    edges: DataFrame,
    min_depth: int = 1,
    max_depth: int = 1,
    direction: str = "out",
    start_id: str = "id",
) -> DataFrame:
    """Bounded-depth traversal ``@{min..max}`` (+collect semantics).

    Returns (start_id, node, depth): every node reachable from each start at
    its minimum depth in [min_depth, max_depth].  BFS with a per-start
    visited set (anti-join) — matches the reference's cycle rule of not
    re-expanding a node already on the path (recursion.rs:8-15; BFS min-depth
    is the +collect reading).

    Every frontier is eagerly localCheckpointed: each round's result is
    referenced by the next frontier, the visited set, AND the output union —
    without materialization the lineage re-executes prior rounds 2^depth
    times (and grows unboundedly at scale).  One materialized frontier per
    round is the GraphFrames-style iteration pattern; an early-exit check
    (frontier.isEmpty) stops dead traversals.
    """
    if max_depth > RECURSION_LIMIT:
        raise ValueError(f"max_depth {max_depth} exceeds IDIOM_RECURSION_LIMIT {RECURSION_LIMIT}")
    here, there = (IN, OUT) if direction == "out" else (OUT, IN)
    e = edges.select(F.col(here).alias("__here"), F.col(there).alias("__there"))

    frontier = start.select(
        F.col(start_id).alias("start"), F.col(start_id).alias("node")
    ).localCheckpoint(eager=True)
    visited = frontier  # depth-0 nodes are visited but not emitted
    steps: list[DataFrame] = []
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == e.__here)
            .select("start", F.col("__there").alias("node"))
            .distinct()
            .join(visited, ["start", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        if depth >= min_depth:
            steps.append(nxt.select("start", "node", F.lit(depth).alias("depth")))
        visited = visited.unionByName(nxt)
        frontier = nxt
    if not steps:
        return start.sparkSession.createDataFrame(
            [], "start string, node string, depth int"
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def shortest_depth(
    start: DataFrame,
    edges: DataFrame,
    target: Column,
    max_depth: int,
    direction: str = "out",
    start_id: str = "id",
) -> DataFrame:
    """``@{..max}+shortest=<target>``: length of the shortest path from each
    start to the target node (recursion instruction in recursion.rs).
    Returns (start, depth) for starts that reach the target within max_depth.
    """
    reach = recurse(start, edges, 1, max_depth, direction, start_id)
    return (
        reach.filter(F.col("node") == target)
        .groupBy("start")
        .agg(F.min("depth").alias("depth"))
    )


def recurse_paths(
    start: DataFrame,
    edges: DataFrame,
    min_depth: int = 1,
    max_depth: int = 1,
    direction: str = "out",
    start_id: str = "id",
) -> DataFrame:
    """``@{min..max}+path`` — collect every path, not just reached nodes
    (recursion.rs path instruction).  Returns (start, node, depth, path)
    where path is '->'-joined record ids including the start.

    Cycle rule: a path never revisits one of its own nodes
    (recursion.rs:8-15) — checked with array_contains against the path
    accumulator.  No cross-path visited set: distinct paths to the same
    node are all kept (that's the +path semantics).  One eager
    localCheckpoint per round, as in recurse().
    """
    if max_depth > RECURSION_LIMIT:
        raise ValueError(f"max_depth {max_depth} exceeds IDIOM_RECURSION_LIMIT {RECURSION_LIMIT}")
    here, there = (IN, OUT) if direction == "out" else (OUT, IN)
    e = edges.select(F.col(here).alias("__here"), F.col(there).alias("__there"))

    frontier = start.select(
        F.col(start_id).alias("start"),
        F.col(start_id).alias("node"),
        F.array(F.col(start_id)).alias("__path"),
    ).localCheckpoint(eager=True)
    steps: list[DataFrame] = []
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == e.__here)
            .filter(~F.array_contains(F.col("__path"), F.col("__there")))
            .select(
                "start",
                F.col("__there").alias("node"),
                F.array_append(F.col("__path"), F.col("__there")).alias("__path"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        if depth >= min_depth:
            steps.append(
                nxt.select(
                    "start",
                    "node",
                    F.lit(depth).alias("depth"),
                    F.array_join(F.col("__path"), "->").alias("path"),
                )
            )
        frontier = nxt
    if not steps:
        return start.sparkSession.createDataFrame(
            [], "start string, node string, depth int, path string"
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out
