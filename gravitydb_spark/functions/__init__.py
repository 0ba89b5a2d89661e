"""Scalar-function surface (SURVEY.md §2.8): the reference's internal
scalar operations — content hashing, canonical JSON, uuid/key encoding —
as both Python helpers and JVM-side Column expressions."""

from ..hashing import canonical_json, edge_hash, prop_hash, sha256_hex, tagged_property
from ..sources.ingest import (
    edge_hash_col,
    prop_hash_col,
    tagged_json_col,
    value_json_col,
)

__all__ = [
    "canonical_json",
    "sha256_hex",
    "prop_hash",
    "edge_hash",
    "tagged_property",
    "prop_hash_col",
    "edge_hash_col",
    "tagged_json_col",
    "value_json_col",
]
