from .changefeed import stream_edges, stream_vertices, stream_type_counts

__all__ = ["stream_edges", "stream_vertices", "stream_type_counts"]
