"""Set-operation semantics (SURVEY.md §2.4, FIXTURES.md §6).

Minimal 4-vertex fixture A={1,2}, B={2,3}: DisjunctiveUnion must return
{1,3} — the DOCUMENTED symmetric difference (docs/query_language.adoc:
461-474) — NOT {2}, which is what the reference's buggy helper computes
(kv_graph_store.rs:921-936, untested there)."""

import pytest

from gravitydb_spark import Prop, PropertyGraph, execute
from gravitydb_spark.ql import eq_from_ids, pq_from_id, pq_from_to, vq_from_ids
from gravitydb_spark.schema import Schema

RAW = Schema(no_tag=frozenset({"T"}))

V1, V2, V3, V4 = (f"00000000-0000-0000-0000-00000000000{i}" for i in range(1, 5))


@pytest.fixture(scope="module")
def tiny(spark):
    g, _ = PropertyGraph.empty(spark, RAW).create_nodes(
        [(v, Prop("T", f"v{i}")) for i, v in enumerate([V1, V2, V3, V4], 1)]
    )
    return g


def ids(result):
    return sorted(r["id"] for r in result.vertices.collect())


def test_union(tiny):
    q = vq_from_ids([V1, V2]).union(vq_from_ids([V2, V3]))
    assert ids(execute(tiny, q)) == sorted([V1, V2, V3])


def test_intersect(tiny):
    q = vq_from_ids([V1, V2]).intersect(vq_from_ids([V2, V3]))
    assert ids(execute(tiny, q)) == [V2]


def test_substract(tiny):
    q = vq_from_ids([V1, V2]).substract(vq_from_ids([V2, V3]))
    assert ids(execute(tiny, q)) == [V1]


def test_disjunctive_union_documented_semantics(tiny):
    q = vq_from_ids([V1, V2]).disjunctive_union(vq_from_ids([V2, V3]))
    assert ids(execute(tiny, q)) == sorted([V1, V3])  # NOT [V2]


def test_store_side_effect(tiny):
    """Store stashes the selection into the result (documented semantics,
    query_language.adoc:662-695; unreachable!() in the reference)."""
    q = vq_from_ids([V1]).store().union(vq_from_ids([V2]))
    res = execute(tiny, q)
    assert ids(res) == sorted([V1, V2])


def test_referenced_properties(tiny, spark):
    """Inverse nesting lookup — implemented for real (the reference stubs it
    to empty, kv_graph_store.rs:348-351)."""
    g, _ = PropertyGraph.empty(spark).create_nodes(
        [(V1, Prop("Cocktail", "X"))]
    )
    value_hash = Prop("Cocktail", "X").hash
    tag_hash = Prop("SchemaType", "Cocktail").hash
    res = execute(g, pq_from_id(value_hash).referenced_properties())
    assert [r["prop_hash"] for r in res.properties.collect()] == [tag_hash]
    res2 = execute(g, pq_from_id(tag_hash).referencing_properties())
    assert [r["prop_hash"] for r in res2.properties.collect()] == [value_hash]


def test_top_level_p_query_returns_matches(tiny):
    """Reference's query_property_nodes is a stub returning nothing
    (kv_graph_store.rs:307-317); we return the matched properties."""
    h = Prop("T", "v1").hash
    res = execute(tiny, pq_from_id(h))
    assert [r["prop_hash"] for r in res.properties.collect()] == [h]


def test_from_to_range(tiny):
    """FromTo = range scan over ordered property ids (documented)."""
    hashes = sorted(Prop("T", f"v{i}").hash for i in range(1, 5))
    lo, hi = hashes[0], hashes[2]
    res = execute(tiny, pq_from_to(lo, hi))
    got = sorted(r["prop_hash"] for r in res.properties.collect())
    assert got == hashes[:3]


def test_edge_set_ops(tiny, spark):
    g = tiny
    g, eids = g.create_edges(
        [
            (V1, V2, Prop("T", "e12")),
            (V2, V3, Prop("T", "e23")),
            (V3, V4, Prop("T", "e34")),
        ]
    )
    a = eq_from_ids([eids[0], eids[1]])
    b = eq_from_ids([eids[1], eids[2]])
    res = execute(g, a.disjunctive_union(b))
    assert sorted(r["id"] for r in res.edges.collect()) == sorted([eids[0], eids[2]])
