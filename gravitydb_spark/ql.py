"""Query AST — the "zoe" traversal language as serializable Python objects.

Mirrors the reference AST (gravitydb/src/ql.rs:10-250): three node families
(``VertexQuery``, ``EdgeQuery``, ``PropertyQuery``) with the same constructor
ergonomics (``start()``, ``referencing_vertices()``, ``outgoing()``,
``intersect()``, …) and a serde-compatible externally-tagged JSON wire format
(``{"V":{"Property":{"Specific":"<hash>"}}}``), so serialized reference
queries replay unchanged (EP2 compat, cli_helpers.rs:271-277).

The AST is *declarative*: nothing executes until
``gravitydb_spark.plans.compiler.execute(graph, query)`` compiles it into a
Catalyst-optimized DataFrame plan.

Traversal direction conventions (kv_graph_store.rs:271-300, 192-207):

- ``EdgeQuery.Out(vq)``  — edges whose **source** is in vq (vertex.outgoing)
- ``EdgeQuery.In(vq)``   — edges whose **target** is in vq (vertex.incoming)
- ``VertexQuery.Out(eq)``— target vertices (``n2``) of edges in eq
- ``VertexQuery.In(eq)`` — source vertices (``n1``) of edges in eq

Filters: the reference declares ``ShellFilter{interpreter, script}`` but its
interpreter arms are ``unreachable!()`` (kv_graph_store.rs:208,301). We
execute filters for real, but as Spark expressions / Pandas UDFs — never by
shelling out. ``ShellFilter`` round-trips through JSON for wire compat and
raises at compile time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Union

__all__ = [
    "VertexQuery",
    "EdgeQuery",
    "PropertyQuery",
    "BasicQuery",
    "ShellFilter",
    "ExprFilter",
    "PandasFilter",
    "FilterContext",
    "vq_all",
    "vq_from_ids",
    "vq_from_property",
    "eq_all",
    "eq_from_ids",
    "eq_from_property",
    "pq_from_id",
    "pq_from_to",
    "query_from_json",
    "query_to_json",
]


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ShellFilter:
    """Wire-compatible shell filter spec (ql.rs:354-358). Never executed:
    compiling it raises — use ExprFilter / PandasFilter instead."""

    interpreter: str
    script: str


@dataclass(frozen=True)
class FilterContext:
    """The query context the documented filter contract hands to filter
    programs (docs/query_language.adoc:536-543; VertexQueryContext/
    EdgeQueryContext, ql.rs:246-352): the reached element's id, the path
    that led there, the starting edge (if the chain began at an edge), and
    the side-effect variables map.

    For :class:`ExprFilter` the fields are Spark ``Column``s (``path`` is
    ``array<struct<v,e>>``, never null — empty array when no hops yet);
    for :class:`PandasFilter` they are ``pd.Series`` per Arrow batch.
    ``variables`` is the query's variables map — a plain dict, empty today
    because nothing writes variables (true of the reference as well)."""

    id: Any
    path: Any
    start: Any
    variables: dict


@dataclass(frozen=True)
class ExprFilter:
    """Fast-path filter: ``fn(value_col, schema_type_col) -> bool Column``,
    or ``fn(value_col, schema_type_col, ctx: FilterContext) -> bool Column``
    (arity is inspected; the 3-arg form receives the documented query
    context — element id, path, start, variables).

    Runs JVM-side inside whole-stage codegen; ``value_col`` is the element's
    property payload as a JSON string column, ``schema_type_col`` its type.
    """

    fn: Callable  # (Column, Column[, FilterContext]) -> Column
    name: str = "expr_filter"


@dataclass(frozen=True)
class PandasFilter:
    """Slow-path filter: ``fn(value: pd.Series, schema_type: pd.Series) ->
    bool pd.Series`` — Arrow-batched, for predicates SQL can't express.
    A 3-arg form ``fn(value, schema_type, ctx: FilterContext)`` receives
    the documented query context as per-batch ``pd.Series`` fields."""

    fn: Callable
    name: str = "pandas_filter"


Filter = Union[ShellFilter, ExprFilter, PandasFilter]


# ---------------------------------------------------------------------------
# PropertyQuery
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PropertyQuery:
    """One of: Specific(id) | FromTo(id1, id2) | ReferencingProperties(q) |
    ReferencedProperties(q)  (ql.rs:176-185)."""

    kind: str
    args: tuple = ()

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_id(prop_id: str) -> "PropertyQuery":
        return PropertyQuery("Specific", (prop_id,))

    @staticmethod
    def from_to(id1: str, id2: str) -> "PropertyQuery":
        """Range scan over ordered property ids (docs: "all properties in
        between the two property ids"). Implemented per-doc as a range
        predicate on the properties table; the reference's code path
        additionally restricts to ids appearing in its nesting index
        (kv_graph_store.rs:336-340,429-447) — an artifact of its storage
        layout, not the documented semantics."""
        return PropertyQuery("FromTo", (id1, id2))

    # -- chainers ----------------------------------------------------------
    def referencing_properties(self) -> "PropertyQuery":
        """Properties that *use* (nest) this property."""
        return PropertyQuery("ReferencingProperties", (self,))

    def referenced_properties(self) -> "PropertyQuery":
        """Properties *used by* this property. (Reference declares this but
        stubs it to empty — kv_graph_store.rs:348-351; we implement it.)"""
        return PropertyQuery("ReferencedProperties", (self,))

    def referencing_vertices(self) -> "VertexQuery":
        return VertexQuery("Property", (self,))

    def referencing_edges(self) -> "EdgeQuery":
        return EdgeQuery("Property", (self,))


# ---------------------------------------------------------------------------
# Shared set-op / chain machinery for VertexQuery and EdgeQuery
# ---------------------------------------------------------------------------


class _ElementQuery:
    kind: str
    args: tuple

    def union(self, q):
        return type(self)("Union", (self, q))

    def intersect(self, q):
        return type(self)("Intersect", (self, q))

    def substract(self, q):  # reference spelling (ql.rs:74)
        return type(self)("Substract", (self, q))

    subtract = substract  # alias with standard spelling

    def disjunctive_union(self, q):
        """Documented semantics: symmetric difference
        (docs/query_language.adoc:461-474). NOTE the reference's helper
        computes an intersection instead (kv_graph_store.rs:921-936) — an
        acknowledged bug with no test coverage; we implement the docs."""
        return type(self)("DisjunctiveUnion", (self, q))

    def filter(self, flt: Filter):
        return type(self)("Filter", (self, flt))

    def store(self):
        """Stash the current selection into the result context
        (documented in query_language.adoc:662-695; the reference declares
        but never executes it — kv_graph_store.rs:191,270)."""
        return type(self)("Store", (self,))


def _with_edge_filter(eq: "EdgeQuery", flt) -> "EdgeQuery":
    """Lua-sugar: ``outgoing(filter)`` auto-intersects the traversal with a
    property/edge filter query (lua.rs:130-177,202-249). The traversal is the
    *left* operand so its path contexts are the ones kept."""
    if flt is None:
        return eq
    if isinstance(flt, PropertyQuery):
        return eq.intersect(flt.referencing_edges())
    if isinstance(flt, EdgeQuery):
        return eq.intersect(flt)
    raise TypeError(f"unsupported traversal filter: {type(flt).__name__}")


def _with_vertex_filter(vq: "VertexQuery", flt) -> "VertexQuery":
    """Edge→vertex flavor of the same Lua sugar (lua.rs:202-249):
    ``eq:outgoing(filter)`` intersects the reached vertices with a
    property/vertex filter query."""
    if flt is None:
        return vq
    if isinstance(flt, PropertyQuery):
        return vq.intersect(flt.referencing_vertices())
    if isinstance(flt, VertexQuery):
        return vq.intersect(flt)
    raise TypeError(f"unsupported traversal filter: {type(flt).__name__}")


@dataclass(frozen=True)
class VertexQuery(_ElementQuery):
    kind: str
    args: tuple = ()

    @staticmethod
    def all() -> "VertexQuery":
        return VertexQuery("All")

    @staticmethod
    def from_ids(ids: list[str]) -> "VertexQuery":
        return VertexQuery("Specific", (tuple(ids),))

    @staticmethod
    def from_property(p: PropertyQuery) -> "VertexQuery":
        return VertexQuery("Property", (p,))

    def outgoing(self, flt=None) -> "EdgeQuery":
        """Edges leaving these vertices."""
        return _with_edge_filter(EdgeQuery("Out", (self,)), flt)

    def ingoing(self, flt=None) -> "EdgeQuery":
        """Edges arriving at these vertices."""
        return _with_edge_filter(EdgeQuery("In", (self,)), flt)


@dataclass(frozen=True)
class EdgeQuery(_ElementQuery):
    kind: str
    args: tuple = ()

    @staticmethod
    def all() -> "EdgeQuery":
        return EdgeQuery("All")

    @staticmethod
    def from_ids(ids: list[str]) -> "EdgeQuery":
        return EdgeQuery("Specific", (tuple(ids),))

    @staticmethod
    def from_property(p: PropertyQuery) -> "EdgeQuery":
        return EdgeQuery("Property", (p,))

    def outgoing(self, flt=None) -> "VertexQuery":
        """Target vertices (n2) of these edges."""
        return _with_vertex_filter(VertexQuery("Out", (self,)), flt)

    def ingoing(self, flt=None) -> "VertexQuery":
        """Source vertices (n1) of these edges."""
        return _with_vertex_filter(VertexQuery("In", (self,)), flt)


@dataclass(frozen=True)
class BasicQuery:
    """Top-level dispatch: V | E | P (ql.rs:228-250)."""

    kind: str  # "V" | "E" | "P"
    query: Union[VertexQuery, EdgeQuery, PropertyQuery]

    @staticmethod
    def of(q) -> "BasicQuery":
        if isinstance(q, BasicQuery):
            return q
        if isinstance(q, VertexQuery):
            return BasicQuery("V", q)
        if isinstance(q, EdgeQuery):
            return BasicQuery("E", q)
        if isinstance(q, PropertyQuery):
            return BasicQuery("P", q)
        raise TypeError(f"not a query: {type(q).__name__}")


# ---------------------------------------------------------------------------
# Module-level constructors (the Lua builder surface, lua.rs:88-113)
# ---------------------------------------------------------------------------


def vq_all() -> VertexQuery:
    return VertexQuery.all()


def vq_from_ids(ids: list[str]) -> VertexQuery:
    return VertexQuery.from_ids(ids)


def vq_from_property(p: PropertyQuery) -> VertexQuery:
    return VertexQuery.from_property(p)


def eq_all() -> EdgeQuery:
    return EdgeQuery.all()


def eq_from_ids(ids: list[str]) -> EdgeQuery:
    return EdgeQuery.from_ids(ids)


def eq_from_property(p: PropertyQuery) -> EdgeQuery:
    return EdgeQuery.from_property(p)


def pq_from_id(prop_id: str) -> PropertyQuery:
    return PropertyQuery.from_id(prop_id)


def pq_from_to(id1: str, id2: str) -> PropertyQuery:
    return PropertyQuery.from_to(id1, id2)


# ---------------------------------------------------------------------------
# serde-JSON wire format (externally tagged enums)
# ---------------------------------------------------------------------------

_SET_OPS = ("Union", "Intersect", "Substract", "DisjunctiveUnion")


def query_to_json(q) -> Any:
    """Encode to the reference's serde JSON shape."""
    if isinstance(q, BasicQuery):
        return {q.kind: query_to_json(q.query)}
    if isinstance(q, PropertyQuery):
        if q.kind == "Specific":
            return {"Specific": q.args[0]}
        if q.kind == "FromTo":
            return {"FromTo": [q.args[0], q.args[1]]}
        return {q.kind: query_to_json(q.args[0])}
    if isinstance(q, (VertexQuery, EdgeQuery)):
        if q.kind == "All":
            return "All"
        if q.kind == "Specific":
            return {"Specific": list(q.args[0])}
        if q.kind == "Property":
            return {"Property": query_to_json(q.args[0])}
        if q.kind in ("Out", "In"):
            return {q.kind: query_to_json(q.args[0])}
        if q.kind in _SET_OPS:
            return {q.kind: [query_to_json(q.args[0]), query_to_json(q.args[1])]}
        if q.kind == "Store":
            return {"Store": query_to_json(q.args[0])}
        if q.kind == "Filter":
            flt = q.args[1]
            if not isinstance(flt, ShellFilter):
                raise ValueError(
                    "only ShellFilter round-trips through the serde wire format"
                )
            return {
                "Filter": [
                    query_to_json(q.args[0]),
                    {"interpreter": flt.interpreter, "script": flt.script},
                ]
            }
    raise TypeError(f"cannot serialize {type(q).__name__}")


def _pq_from_json(data) -> PropertyQuery:
    (tag, payload), = data.items()
    if tag == "Specific":
        return PropertyQuery("Specific", (payload,))
    if tag == "FromTo":
        return PropertyQuery("FromTo", (payload[0], payload[1]))
    if tag in ("ReferencingProperties", "ReferencedProperties"):
        return PropertyQuery(tag, (_pq_from_json(payload),))
    raise ValueError(f"unknown PropertyQuery tag: {tag}")


def _eq_from_json(data, cls, other_cls):
    """Decode a VertexQuery/EdgeQuery; ``other_cls`` is the dual family for
    Out/In (VertexQuery.Out wraps an EdgeQuery and vice versa)."""
    if data == "All":
        return cls("All")
    (tag, payload), = data.items()
    if tag == "Specific":
        return cls("Specific", (tuple(payload),))
    if tag == "Property":
        return cls("Property", (_pq_from_json(payload),))
    if tag in ("Out", "In"):
        return cls(tag, (_eq_from_json(payload, other_cls, cls),))
    if tag in _SET_OPS:
        return cls(
            tag,
            (
                _eq_from_json(payload[0], cls, other_cls),
                _eq_from_json(payload[1], cls, other_cls),
            ),
        )
    if tag == "Store":
        return cls("Store", (_eq_from_json(payload, cls, other_cls),))
    if tag == "Filter":
        flt = ShellFilter(payload[1]["interpreter"], payload[1]["script"])
        return cls("Filter", (_eq_from_json(payload[0], cls, other_cls), flt))
    raise ValueError(f"unknown query tag: {tag}")


def query_from_json(data) -> BasicQuery:
    """Decode the reference's serde JSON (kv_graph_store.rs:867-873)."""
    (tag, payload), = data.items()
    if tag == "V":
        return BasicQuery("V", _eq_from_json(payload, VertexQuery, EdgeQuery))
    if tag == "E":
        return BasicQuery("E", _eq_from_json(payload, EdgeQuery, VertexQuery))
    if tag == "P":
        return BasicQuery("P", _pq_from_json(payload))
    raise ValueError(f"unknown BasicQuery tag: {tag}")
