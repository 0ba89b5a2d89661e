"""Edge-list import — the workhorse interchange format (CSV/TSV/parquet
of ``src,dst[,label]`` rows, e.g. SNAP datasets, exported adjacency).

Unlike GraphML (driver-side, metadata-sized) this path is fully
distributed: vertices are DISCOVERED from the endpoints (union + dedup),
ids pass through verbatim, and all content hashing happens JVM-side via
``ingest_graph``. At 100 TB the only shuffles are the endpoint dedup and
the content-hash dedups.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import Schema
from .ingest import ingest_graph

__all__ = ["import_edge_list"]


def import_edge_list(
    spark: SparkSession,
    edges: DataFrame,
    vertex_type: str = "Vertex",
    edge_type: str = "Edge",
    schema: Optional[Schema] = None,
):
    """``edges``: DataFrame with ``src``, ``dst`` (string) and optionally
    ``label`` (used as the edge property payload). Vertex properties are
    ``{vertex_type: <raw id>}`` so imported ids stay queryable by content.
    """
    src = edges.select(F.col("src").cast("string").alias("id"))
    dst = edges.select(F.col("dst").cast("string").alias("id"))
    vertices = (
        src.unionByName(dst)
        .distinct()
        .select(
            "id",
            F.lit(vertex_type).alias("schema_type"),
            F.col("id").alias("payload"),
        )
    )
    label = (
        F.col("label").cast("string")
        if "label" in edges.columns
        else F.lit(None).cast("string")
    )
    e = edges.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        F.lit(edge_type).alias("schema_type"),
        label.alias("payload"),
    )
    return ingest_graph(spark, vertices, e, schema)
