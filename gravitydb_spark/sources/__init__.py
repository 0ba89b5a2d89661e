from .edgelist import import_edge_list
from .graphml import import_graphml
from .ingest import ingest_graph, prop_hash_col, tagged_json_col

__all__ = [
    "import_edge_list",
    "import_graphml",
    "ingest_graph",
    "prop_hash_col",
    "tagged_json_col",
]
