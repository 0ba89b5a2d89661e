"""First-class graph analytics operators.

The reference has NO aggregation engine ("TODO Aggregate",
docs/query_language.adoc:297); its test suite computes statistics host-side
over query results (gravitydb-test-utils/src/lib.rs:230-315) — per-group
counts by schema type, min/max/avg over group counts, value frequency,
top-k with deterministic tiebreak. Those capabilities become DataFrame
operators here: one shuffle per groupBy, map-side partial aggregation for
free, broadcast joins for the (tiny) type-tag dimension.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import PropertyGraph
from ..schema import SCHEMA_TYPE, Prop

__all__ = [
    "vertices_of_type",
    "edges_of_type",
    "traverse",
    "type_counts",
    "top_k_by_count",
]


def _typed_prop_hashes(graph: PropertyGraph, type_name: str) -> DataFrame:
    """prop hashes tagged SchemaType(type_name) — the type-tag closure
    (SchemaType tags are nested properties, gravitydb_derive/src/lib.rs:10-94)."""
    tag_hash = Prop(SCHEMA_TYPE, type_name).hash
    return (
        graph.prop_refs.filter(
            (F.col("ref_kind") == "prop") & (F.col("prop_hash") == tag_hash)
        )
        .select(F.col("ref_id").alias("prop_hash"))
        .distinct()
    )


def vertices_of_type(graph: PropertyGraph, type_name: str) -> DataFrame:
    """DF[id, prop_hash] — all vertices whose property is tagged with the
    type. Equivalent to ``SchemaType(T).start().referencing_properties()
    .referencing_vertices()`` (lib.rs:768-782 usage) as a direct plan."""
    typed = _typed_prop_hashes(graph, type_name)
    return graph.vertices.join(F.broadcast(typed), "prop_hash", "leftsemi").select(
        "id", "prop_hash"
    )


def edges_of_type(graph: PropertyGraph, type_name: str) -> DataFrame:
    """DF[edge_id, src, dst, prop_hash] — edges tagged with the type.

    An edge-label filter is a broadcast semi-join against the tiny property
    dimension — the 'semi-join pushdown' idiom from SURVEY.md §2.3.
    """
    typed = _typed_prop_hashes(graph, type_name)
    return graph.edges.join(F.broadcast(typed), "prop_hash", "leftsemi")


def traverse(
    graph: PropertyGraph,
    from_vertices: DataFrame,
    edge_type: Optional[str] = None,
    direction: str = "out",
) -> DataFrame:
    """One hop: DF[from_id, edge_id, to_id].

    ``from_vertices`` must have an ``id`` column. Edge-type filtering happens
    *before* the join so the scan is pruned (predicate reaches parquet).
    """
    edges = graph.edges if edge_type is None else edges_of_type(graph, edge_type)
    if direction == "out":
        key, other = "src", "dst"
    elif direction == "in":
        key, other = "dst", "src"
    else:
        raise ValueError(direction)
    fv = from_vertices.select(F.col("id").alias("from_id"))
    return edges.join(fv, F.col(key) == F.col("from_id")).select(
        "from_id", "edge_id", F.col(other).alias("to_id")
    )


def type_counts(graph: PropertyGraph, pairs: DataFrame) -> DataFrame:
    """Per-``from_id`` counts of ``to_id`` neighbors by schema type:
    DF[from_id, schema_type, n]. (lib.rs:249-267 made first-class.)"""
    to_types = graph.vertices.select(
        F.col("id").alias("to_id"), "prop_hash"
    ).join(graph.properties.select("prop_hash", "schema_type"), "prop_hash")
    return (
        pairs.join(to_types, "to_id")
        .groupBy("from_id", "schema_type")
        .agg(F.count("*").alias("n"))
    )


def degrees(graph: PropertyGraph) -> DataFrame:
    """DF[id, out_degree, in_degree] for every vertex (0 for isolated).
    Two aggregations over edges + one outer join against vertices — the
    adjacency the reference materializes per-node, computed on demand."""
    out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        graph.vertices.select("id")
        .join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .fillna(0, ["out_degree", "in_degree"])
        .select("id", F.col("out_degree").cast("long"), F.col("in_degree").cast("long"))
    )


def top_k_by_count(
    df: DataFrame, key_col: str, count_col: str, k: int
) -> DataFrame:
    """Top-k with the reference's deterministic tiebreak: count desc, key asc
    (lib.rs:298-312)."""
    w = Window.orderBy(F.col(count_col).desc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
