"""Schema system: property shapes + nested type-tag closure.

The reference derives a schema from a Rust enum: each variant is a property
shape, and ``NestableProperty::nested()`` returns *type-tag* properties so
"all elements of type T" is a property-index lookup
(gravitydb/src/schema.rs:3-28, gravitydb_derive/src/lib.rs:10-94).

Here a schema is a plain Python object. A property literal is
``Prop(schema_type, payload)``. The default nesting rule matches the
reference's derive: every variant nests ``SchemaType(<variant name>)``,
except ``SchemaType`` itself (and any types listed in ``no_tag``).
Custom nesting (the derive's ``additional_types`` / ``custom`` attributes)
is supported via ``extra_nested``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from .hashing import canonical_json, prop_hash, tagged_property

SCHEMA_TYPE = "SchemaType"

__all__ = ["Prop", "Schema", "SCHEMA_TYPE"]


@dataclass(frozen=True)
class Prop:
    """A property literal: an externally-tagged (schema_type, payload) pair.

    ``key`` overrides the content hash as the property id — the reference's
    custom ``get_key`` mechanism for range-ordered keys (e.g. ``la_48.13``
    for geo scans, docs/tutorials/designing_a_schema.adoc:240-300). With a
    custom key, ``FromTo(lo, hi)`` range queries prune on meaningful order;
    content dedup then keys on the custom id, exactly like the reference.
    """

    schema_type: str
    payload: Any = None
    key: str = None  # type: ignore[assignment]

    @property
    def hash(self) -> str:
        if self.key is not None:
            return self.key
        return prop_hash(self.schema_type, self.payload)

    @property
    def value_json(self) -> str:
        """Canonical JSON of the payload (``null`` for unit variants)."""
        return canonical_json(self.payload)

    @property
    def tagged_json(self) -> str:
        return canonical_json(tagged_property(self.schema_type, self.payload))

    def __repr__(self) -> str:  # Prop('Cocktail', 'Alexander')
        if self.payload is None:
            return f"Prop({self.schema_type!r})"
        return f"Prop({self.schema_type!r}, {self.payload!r})"


@dataclass
class Schema:
    """Nesting rules for a property universe.

    ``nested(prop)`` returns the directly-nested properties of ``prop``
    (one level), like ``NestableProperty::nested()``. The transitive
    closure is unrolled at ingest time into ``prop_refs`` rows.
    """

    # schema types that do NOT get a SchemaType(<name>) tag
    no_tag: frozenset = frozenset({SCHEMA_TYPE})
    # extra nested properties per schema type: either static list or callable
    extra_nested: dict[str, Callable[[Prop], list[Prop]]] = field(default_factory=dict)

    def nested(self, prop: Prop) -> list[Prop]:
        out: list[Prop] = []
        if prop.schema_type not in self.no_tag:
            out.append(Prop(SCHEMA_TYPE, prop.schema_type))
        extra = self.extra_nested.get(prop.schema_type)
        if extra is not None:
            out.extend(extra(prop))
        return out

    def closure(self, prop: Prop) -> list[tuple[Prop, Prop]]:
        """All (parent, child) nesting pairs reachable from ``prop``.

        Mirrors create_property's recursion (kv_graph_store.rs:710-734).
        Guards against cycles (a known hazard in the reference,
        docs/schema.adoc:164).
        """
        pairs: list[tuple[Prop, Prop]] = []
        seen: set[str] = set()
        stack = [prop]
        while stack:
            p = stack.pop()
            if p.hash in seen:
                continue
            seen.add(p.hash)
            for child in self.nested(p):
                pairs.append((p, child))
                stack.append(child)
        return pairs


DEFAULT_SCHEMA = Schema()
