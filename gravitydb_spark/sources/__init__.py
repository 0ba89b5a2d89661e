from .documents import DOCUMENTS_SCHEMA, read_documents, write_documents
from .edgelist import import_edge_list
from .graphml import import_graphml
from .ingest import ingest_graph, prop_hash_col, tagged_json_col

__all__ = [
    "DOCUMENTS_SCHEMA",
    "import_edge_list",
    "import_graphml",
    "ingest_graph",
    "prop_hash_col",
    "read_documents",
    "tagged_json_col",
    "write_documents",
]
