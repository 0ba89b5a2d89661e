"""Motif (pattern) matching — GraphFrames-style structural queries.

Beyond the reference's linear zoe chains: a motif is a conjunction of
edge patterns ``(src_var)-[edge_var]->(dst_var)`` compiled into a chain
of equi-joins over the edges table, one join per pattern edge, with
shared variables expressed as join keys. Optional per-variable type
constraints become broadcast semi-joins against the type-tag dimension
*before* the big joins (predicate pushdown by construction).

Result: one row per binding, one column per named variable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..graph import PropertyGraph
from .analytics import edges_of_type, vertices_of_type

__all__ = ["match_pattern"]


def match_pattern(
    graph: PropertyGraph,
    pattern: Sequence[tuple[str, str, str]],
    vertex_types: Optional[dict[str, str]] = None,
    edge_types: Optional[dict[str, str]] = None,
) -> DataFrame:
    """``pattern``: [(src_var, edge_var, dst_var), ...]. Variables starting
    with ``_`` are anonymous (matched but not returned, never unified).
    ``vertex_types`` / ``edge_types`` constrain a variable to a schema type.

    Example — cocktails and their glass via shared ingredient:
        match_pattern(g,
            [("c", "_e1", "i"), ("c", "_e2", "gl")],
            vertex_types={"c": "Cocktail", "i": "Ingredient", "gl": "Glass"})
    """
    vertex_types = vertex_types or {}
    edge_types = edge_types or {}

    def edge_rel(edge_var: str) -> DataFrame:
        if edge_var in edge_types:
            return edges_of_type(graph, edge_types[edge_var])
        return graph.edges

    bound: Optional[DataFrame] = None
    bound_vars: set[str] = set()

    for src_var, edge_var, dst_var in pattern:
        if edge_var in (src_var, dst_var):
            raise ValueError(
                f"edge variable {edge_var!r} reuses a vertex variable"
            )
        base = edge_rel(edge_var)
        if src_var == dst_var:
            # self-loop pattern (a)-[e]->(a): unify the endpoints as an
            # equality filter instead of aliasing two columns to one name
            rel = base.filter(F.col("src") == F.col("dst")).select(
                F.col("src").alias(src_var), F.col("edge_id").alias(edge_var)
            )
            pat_vars = [src_var, edge_var]
        else:
            rel = base.select(
                F.col("src").alias(src_var),
                F.col("edge_id").alias(edge_var),
                F.col("dst").alias(dst_var),
            )
            pat_vars = [src_var, edge_var, dst_var]
        if bound is None:
            bound = rel
            bound_vars = set(pat_vars)
        else:
            join_keys = [
                v for v in pat_vars if v in bound_vars and not v.startswith("_")
            ]
            if not join_keys:
                raise ValueError(
                    f"pattern edge ({src_var})-[{edge_var}]->({dst_var}) shares "
                    "no variable with the previous edges (cross joins refused)"
                )
            # avoid duplicate columns: rename unshared, join on shared
            rel = rel.select(
                *[F.col(v) for v in pat_vars if v not in bound_vars or v in join_keys]
            )
            bound = bound.join(rel, join_keys)
            bound_vars |= set(pat_vars)

    assert bound is not None, "empty pattern"

    # per-variable type constraints: broadcast semi-joins on the tiny
    # type-tag index
    for var, type_name in vertex_types.items():
        typed = vertices_of_type(graph, type_name).select(F.col("id").alias(var))
        bound = bound.join(F.broadcast(typed), var, "leftsemi")

    out_vars = [v for v in bound_vars if not v.startswith("_")]
    return bound.select(*sorted(out_vars)).distinct()
