"""Result-hull operators — planned in the reference CLI but never built
(docs/backends_filestore.adoc:908-982): ``result_outer_hull`` adds every
edge between result nodes; ``result_inner_hull`` drops edges that leave
the result set."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import PropertyGraph

__all__ = ["outer_hull", "inner_hull"]


def outer_hull(graph: PropertyGraph, vertex_ids: DataFrame) -> DataFrame:
    """All graph edges with BOTH endpoints in ``vertex_ids`` (DF[id]) —
    two semi-joins, no shuffle of the vertex set when it broadcasts."""
    v = vertex_ids.select("id").distinct()
    return (
        graph.edges.join(
            F.broadcast(v.select(F.col("id").alias("src"))), "src", "leftsemi"
        ).join(F.broadcast(v.select(F.col("id").alias("dst"))), "dst", "leftsemi")
    ).select("edge_id", "src", "dst", "prop_hash")


def inner_hull(
    graph: PropertyGraph, edge_ids: DataFrame, vertex_ids: DataFrame
) -> DataFrame:
    """Filter ``edge_ids`` (DF[id]) down to edges whose endpoints BOTH lie
    in ``vertex_ids`` — the 'drop edges leaving the result set' operator."""
    edges = graph.edges.join(
        edge_ids.select(F.col("id").alias("edge_id")).distinct(), "edge_id", "leftsemi"
    )
    v = vertex_ids.select("id").distinct()
    return (
        edges.join(
            F.broadcast(v.select(F.col("id").alias("src"))), "src", "leftsemi"
        ).join(F.broadcast(v.select(F.col("id").alias("dst"))), "dst", "leftsemi")
    ).select("edge_id", "src", "dst", "prop_hash")
