from .changefeed import stream_edges, stream_vertices, stream_type_counts
from .dedup import stream_dedup_exact

__all__ = [
    "stream_dedup_exact",
    "stream_edges",
    "stream_vertices",
    "stream_type_counts",
]
