"""Motif and traversal queries over the (vertices, edges) tables.

The Cypher-pattern analogs (SURVEY §2.11 graph algorithms): fixed-shape
motifs compile to join chains (Catalyst reorders/broadcasts them);
variable-length reachability is an iterative frontier expansion — one
shuffle per hop, lineage cut per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_motif(
    edges: DataFrame,
    rel_ab: str,
    rel_bc: str,
) -> DataFrame:
    """Motif ``(a)-[rel_ab]->(b)-[rel_bc]->(c)`` → (a, b, c).

    A join chain on the edge table; with the edge table partitioned by
    rel_type on disk, each side prunes to one partition before the join.
    """
    ab = edges.filter(F.col("rel_type") == rel_ab).select(
        F.col("src_key").alias("a"), F.col("dst_key").alias("b")
    )
    bc = edges.filter(F.col("rel_type") == rel_bc).select(
        F.col("src_key").alias("b"), F.col("dst_key").alias("c")
    )
    return ab.join(bc, "b").select("a", "b", "c")


def shortest_paths(
    vertices: DataFrame,
    edges: DataFrame,
    landmarks: DataFrame,
    *,
    max_hops: int = 10,
    directed: bool = True,
) -> DataFrame:
    """GraphFrames ``shortestPaths(landmarks)`` analog (SURVEY §2.11):
    fewest-hop distance from each landmark to every vertex it reaches,
    following edge direction (pass reversed edges — or
    ``directed=False`` — for GraphFrames' vertex→landmark direction).

    Output is relational — ``(id, landmark, dist)`` rows — instead of
    GraphFrames' per-vertex map column: at 100 TB a map of |L| entries
    per vertex forces a wide row and defeats column pruning, while rows
    shuffle-partition evenly and unreachable pairs cost nothing. State
    is the per-(vertex, landmark) visited set; each hop is one shuffle
    keyed on vertex id, lineage cut per hop (same frontier discipline
    as ``bfs_distances``).
    """
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)

    visited = (
        landmarks.select("id")
        .distinct()
        .select("id", F.col("id").alias("landmark"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "landmark")
            .distinct()
            .join(visited.select("id", "landmark"), ["id", "landmark"], "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.join(vertices.select("id"), "id", "left_semi")


def bfs_distances(
    vertices: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int = 10,
    directed: bool = True,
) -> DataFrame:
    """Multi-source BFS: (id, dist) = fewest hops from any source.

    Frontier expansion with an anti-join against the visited set; each
    hop is one shuffle on vertex id, lineage cut per hop. Unreached
    vertices are omitted (Cypher path-match semantics, not ∞ rows).
    """
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)

    visited = (
        sources.select("id").distinct().withColumn("dist", F.lit(0)).localCheckpoint(eager=True)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.join(vertices.select("id"), "id", "left_semi")
