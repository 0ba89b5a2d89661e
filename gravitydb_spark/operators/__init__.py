from .analytics import (
    degrees,
    edges_of_type,
    top_k_by_count,
    traverse,
    type_counts,
    vertices_of_type,
)
from .hull import inner_hull, outer_hull

__all__ = [
    "degrees",
    "edges_of_type",
    "inner_hull",
    "outer_hull",
    "top_k_by_count",
    "traverse",
    "type_counts",
    "vertices_of_type",
]
