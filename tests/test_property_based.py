"""Property-based tests (hypothesis): set-op algebra against a Python
set-model oracle, and wire-format round-trips for random ASTs."""

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from gravitydb_spark import Prop, PropertyGraph, execute
from gravitydb_spark.hashing import canonical_json, prop_hash
from gravitydb_spark.ql import query_from_json, query_to_json, vq_from_ids
from gravitydb_spark.schema import Schema

RAW = Schema(no_tag=frozenset({"T"}))

UNIVERSE = [f"00000000-0000-0000-0000-0000000000{i:02x}" for i in range(8)]

subset = st.lists(st.sampled_from(UNIVERSE), min_size=0, max_size=8, unique=True)


_graph_cache = {}


def _graph(spark):
    if "g" not in _graph_cache:
        g, _ = PropertyGraph.empty(spark, RAW).create_nodes(
            [(v, Prop("T", f"v{i}")) for i, v in enumerate(UNIVERSE)]
        )
        _graph_cache["g"] = g.cache()
    return _graph_cache["g"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=subset, b=subset, op=st.sampled_from(["union", "intersect", "substract", "disjunctive_union"]))
def test_set_ops_match_python_sets(spark, a, b, op):
    """Engine set algebra ≡ Python set algebra on ids, for all inputs —
    incl. the documented (symmetric-difference) disjunctive union."""
    g = _graph(spark)
    qa, qb = vq_from_ids(a), vq_from_ids(b)
    q = getattr(qa, op)(qb)
    got = {r["id"] for r in execute(g, q).vertices.collect()}
    sa, sb = set(a), set(b)
    expected = {
        "union": sa | sb,
        "intersect": sa & sb,
        "substract": sa - sb,
        "disjunctive_union": sa ^ sb,
    }[op]
    assert got == expected


# random ASTs via the JSON wire grammar (round-trip ⇒ parser ≡ printer)
pq_json = st.deferred(
    lambda: st.one_of(
        st.fixed_dictionaries({"Specific": st.text("0123456789abcdef", min_size=1, max_size=8)}),
        st.fixed_dictionaries({"FromTo": st.tuples(st.just("0"), st.just("f")).map(list)}),
        st.fixed_dictionaries({"ReferencingProperties": pq_json}),
        st.fixed_dictionaries({"ReferencedProperties": pq_json}),
    )
)


def eq_json(depth):
    if depth <= 0:
        return st.one_of(
            st.just("All"),
            st.fixed_dictionaries({"Specific": st.lists(st.text("abc", min_size=1, max_size=3), max_size=3)}),
            st.fixed_dictionaries({"Property": pq_json}),
        )
    sub = eq_json(depth - 1)
    vsub = vq_json(depth - 1)
    return st.one_of(
        sub,
        st.fixed_dictionaries({"Out": vsub}),
        st.fixed_dictionaries({"In": vsub}),
        st.fixed_dictionaries({"Union": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Intersect": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Substract": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"DisjunctiveUnion": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Store": sub}),
    )


def vq_json(depth):
    if depth <= 0:
        return st.one_of(
            st.just("All"),
            st.fixed_dictionaries({"Specific": st.lists(st.text("abc", min_size=1, max_size=3), max_size=3)}),
            st.fixed_dictionaries({"Property": pq_json}),
        )
    sub = vq_json(depth - 1)
    esub = eq_json(depth - 1)
    return st.one_of(
        sub,
        st.fixed_dictionaries({"Out": esub}),
        st.fixed_dictionaries({"In": esub}),
        st.fixed_dictionaries({"Union": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Intersect": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Substract": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"DisjunctiveUnion": st.tuples(sub, sub).map(list)}),
        st.fixed_dictionaries({"Store": sub}),
    )


basic_json = st.one_of(
    st.fixed_dictionaries({"V": vq_json(3)}),
    st.fixed_dictionaries({"E": eq_json(3)}),
    st.fixed_dictionaries({"P": pq_json}),
)


@settings(max_examples=200, deadline=None)
@given(data=basic_json)
def test_wire_format_round_trip(data):
    assert query_to_json(query_from_json(data)) == data


@settings(max_examples=100, deadline=None)
@given(
    payload=st.recursive(
        st.one_of(
            st.none(),
            st.booleans(),
            st.integers(min_value=-(2**31), max_value=2**31),
            st.text(max_size=20),
        ),
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=8), children, max_size=4),
        ),
        max_leaves=10,
    )
)
def test_canonical_json_deterministic(payload):
    """Hash stability: canonical encoding is order-insensitive for dicts
    and round-trips through json.loads."""
    a = canonical_json(payload)
    assert json.loads(a) == payload
    assert prop_hash("T", payload) == prop_hash("T", json.loads(a))
