"""Loader: cocktail fixture data → PropertyGraph.

Deterministic vertex ids (uuid5 over a fixed namespace + the fixture var
name) so golden outputs are stable across runs, per FIXTURES.md §1.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from gravitydb_spark import GraphBatchBuilder, Prop, PropertyGraph

from .cocktail_data import EDGES, NODES

NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # uuid.NAMESPACE_DNS


def node_id(var: str) -> str:
    return str(uuid.uuid5(NAMESPACE, f"cocktail:{var}"))


def build_cocktail_graph(spark: SparkSession) -> PropertyGraph:
    b = GraphBatchBuilder()
    ids: dict[str, str] = {}
    for var, kind, value in NODES:
        ids[var] = b.add_node(Prop(kind, value), id=node_id(var))
    for src, dst, edge_type in EDGES:
        b.add_edge(ids[src], ids[dst], Prop(edge_type))
    return b.build(spark)
