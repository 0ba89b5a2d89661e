from .analytics import (
    edges_of_type,
    top_k_by_count,
    traverse,
    type_counts,
    vertices_of_type,
)

__all__ = [
    "edges_of_type",
    "top_k_by_count",
    "traverse",
    "type_counts",
    "vertices_of_type",
]
