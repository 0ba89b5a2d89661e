"""Iterative graph analytics — the beyond-reference analytics layer
(project north star: GraphX-style analytics; in PySpark these are
DataFrame-iterated fixpoints with lineage truncation).

The zoe language has no recursion (author note,
docs/query_language.adoc:717-718), so these are additions, not ports:
connected components (small-star/large-star-style label propagation) and
PageRank. Each iteration is one join + one aggregation; ``localCheckpoint``
truncates lineage so plans stay O(1) per iteration instead of growing —
the same plan-size discipline as the set-op compiler (SCALE.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import PropertyGraph

__all__ = ["connected_components", "pagerank"]


def _undirected(graph: PropertyGraph) -> DataFrame:
    e = graph.edges.select("src", "dst")
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def connected_components(graph: PropertyGraph, max_iters: int = 20) -> DataFrame:
    """DF[id, component] — component = min vertex id (lexicographic) in the
    weakly-connected component. Label propagation to fixpoint: each vertex
    adopts the min label among itself and its neighbors."""
    edges = _undirected(graph).localCheckpoint(eager=False)
    labels = graph.vertices.select("id", F.col("id").alias("component"))
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage: O(1) plan per iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank(
    graph: PropertyGraph, iters: int = 10, damping: float = 0.85
) -> DataFrame:
    """DF[id, rank] — standard power iteration with dangling-mass
    redistribution. Deterministic given fixed iteration count."""
    n = graph.vertices.count()
    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = graph.vertices.select("id", F.lit(1.0 / n).alias("rank"))
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=False)
    for _ in range(iters):
        contribs = (
            edges.join(out_deg, "src")
            .join(ranks, edges.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("in_rank"))
        )
        dangling = (
            ranks.join(out_deg, ranks.id == out_deg.src, "leftanti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        ranks = (
            graph.vertices.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
