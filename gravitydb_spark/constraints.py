"""Schema constraints (SURVEY.md §2.11).

The reference declares ``SchemaConstraint::{Requiered, Prohibited}(query)``
— run each constraint query after a mutation batch; Required ⇒ ≥1 result,
Prohibited ⇒ 0 results — but ships no enforcement engine
(gravitydb/src/schema.rs:30-33; semantics docs/schema.adoc:174-197).
Here enforcement is a post-batch assertion over the compiled query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from .graph import PropertyGraph
from .plans.compiler import execute
from .ql import BasicQuery, EdgeQuery, VertexQuery

__all__ = ["Required", "Prohibited", "ConstraintViolation", "check_constraints"]


class ConstraintViolation(Exception):
    pass


@dataclass(frozen=True)
class Required:
    """Constraint query must match at least one element.
    (Reference spells it 'Requiered' — schema.rs:31.)"""

    query: Union[VertexQuery, EdgeQuery, BasicQuery]
    name: str = "required"


@dataclass(frozen=True)
class Prohibited:
    """Constraint query must match nothing."""

    query: Union[VertexQuery, EdgeQuery, BasicQuery]
    name: str = "prohibited"


def _result_count(graph: PropertyGraph, q) -> int:
    res = execute(graph, q)
    bq = BasicQuery.of(q)
    if bq.kind == "V":
        return res.vertices.count()
    if bq.kind == "E":
        return res.edges.count()
    return res.properties.count()


def check_constraints(graph: PropertyGraph, constraints) -> None:
    """Run after a mutation batch (the reference's intended
    transaction-end hook). Raises ConstraintViolation on the first failure."""
    for c in constraints:
        n = _result_count(graph, c.query)
        if isinstance(c, Required) and n < 1:
            raise ConstraintViolation(f"required constraint {c.name!r}: 0 matches")
        if isinstance(c, Prohibited) and n > 0:
            raise ConstraintViolation(
                f"prohibited constraint {c.name!r}: {n} matches"
            )
