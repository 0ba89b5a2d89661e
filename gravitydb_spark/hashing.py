"""Content addressing: canonical JSON + SHA-256.

The reference stores properties content-addressed by the SHA-256 of their
serde-JSON serialization and edges by the SHA-256 of their serialized record
(kv_graph_store.rs:823-847, schema.rs:65-70, docs/key_value_store.adoc:59-75).
Byte-level compatibility with the Rust encoder is NOT a goal (the oracle runs
over our own tables); *internal determinism* is: the same logical property or
edge must always map to the same hash on every executor and every run, so that
``dropDuplicates`` on the hash column implements dedup-by-content.

Canonical encoding: JSON with sorted object keys, no whitespace,
non-ASCII preserved (UTF-8). Unit variants encode as a bare string
(mirroring serde's externally-tagged enums, e.g. ``"Includes"``), tuple
variants as a single-key object ``{"Cocktail": "Alexander"}``.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

__all__ = [
    "canonical_json",
    "sha256_hex",
    "prop_hash",
    "edge_hash",
    "tagged_property",
]


def canonical_json(value: Any) -> str:
    """Deterministic JSON encoding (sorted keys, compact, UTF-8)."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def sha256_hex(data: str) -> str:
    return hashlib.sha256(data.encode("utf-8")).hexdigest()


def tagged_property(schema_type: str, payload: Any = None) -> Any:
    """Externally-tagged representation of a property.

    ``tagged_property("Includes")`` → ``"Includes"`` (unit variant);
    ``tagged_property("Cocktail", "Alexander")`` → ``{"Cocktail": "Alexander"}``.
    """
    if payload is None:
        return schema_type
    return {schema_type: payload}


def prop_hash(schema_type: str, payload: Any = None) -> str:
    """Content hash of a property (reference: schema.rs:65-70)."""
    return sha256_hex(canonical_json(tagged_property(schema_type, payload)))


def edge_hash(src: str, dst: str, properties_hash: str) -> str:
    """Content hash of an edge record.

    Mirrors EdgeData::get_key (kv_graph_store.rs:832-835): the edge id is a
    hash of (properties, n1, n2), so re-creating the same edge collapses to
    the same id (duplicate-edge dedup, exercised by the Royal fizz / Silver
    fizz fixtures).
    """
    record = {"n1": src, "n2": dst, "properties": properties_hash}
    return sha256_hex(canonical_json(record))
