"""gravitydb_spark — a PySpark-native property-graph + analytics engine
with the query and data-processing capabilities of kober-systems/gravitydb,
re-expressed Spark-first (DataFrames + Catalyst, not a KV-store port).

Layers:

- ``graph``     — the four content-addressed graph tables + batch CRUD
- ``ql``        — the "zoe" traversal AST (serde-JSON wire compatible)
- ``plans``     — AST → Catalyst DataFrame compiler, QueryResult
- ``schema``    — property shapes, type-tag nesting
- ``operators`` — first-class analytics (agg/top-k), dedup, similarity,
                  text analysis, multimodal plumbing
- ``sources``   — GraphML import, bulk DataFrame ingest
- ``streaming`` — Structured Streaming changefeed surface
"""

from .graph import GraphBatchBuilder, NodeExistsError, PropertyGraph
from .plans.compiler import QueryResult, execute
from .ql import (
    BasicQuery,
    EdgeQuery,
    ExprFilter,
    PandasFilter,
    PropertyQuery,
    ShellFilter,
    VertexQuery,
    eq_all,
    eq_from_ids,
    eq_from_property,
    pq_from_id,
    pq_from_to,
    query_from_json,
    query_to_json,
    vq_all,
    vq_from_ids,
    vq_from_property,
)
from .schema import SCHEMA_TYPE, Prop, Schema
from .session import get_spark

__version__ = "0.1.0"
