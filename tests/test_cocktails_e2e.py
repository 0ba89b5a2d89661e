"""The reference's end-to-end query tests, ported 1:1.

Mirrors gravitydb-test-utils/src/lib.rs: trivial_queries (:7-36),
alexander_ingredients (:38-103), which_cocktails_include_gin (:105-228)
including the 3-equivalent-formulations property, and path assertions
(:162-185). Expected outputs transcribed in FIXTURES.md §2.
"""

import json

import pytest

from gravitydb_spark import Prop, execute
from gravitydb_spark.ql import vq_from_ids


def start(prop: Prop):
    """``prop.start()`` from the reference — a PropertyQuery probe for the
    property's content hash (schema.rs:89-101)."""
    from gravitydb_spark.ql import pq_from_id

    return pq_from_id(prop.hash)


def tagged_list(df):
    return sorted(r["tagged"] for r in df.collect())


GIN_COCKTAILS = [
    "Alexander", "Angel face", "Aviation", "Casino", "Clover Club",
    "Dry Martini", "Gin fizz", "Golden fizz", "Hanky panky", "John Collins",
    "Last Word", "Martini", "Monkey Gland", "Negroni", "Paradise",
    "Ramos gin fizz", "Royal fizz", "Silver fizz", "Tuxedo", "White lady",
    "maiden's prayer",
]


def test_trivial_queries(cocktail_graph):
    g = cocktail_graph
    q = start(Prop("Glass", "teacup")).referencing_vertices()
    result = execute(g, q)
    assert result.extract_properties().count() == 0

    q = start(Prop("Glass", "Cocktail glass")).referencing_vertices()
    result = execute(g, q)
    assert tagged_list(result.extract_properties()) == [
        json.dumps({"Glass": "Cocktail glass"}, separators=(",", ":"))
    ]


def test_alexander_ingredients(cocktail_graph):
    g = cocktail_graph
    alexander = Prop("Cocktail", "Alexander")
    includes = Prop("Includes")

    result = execute(g, start(alexander).referencing_vertices())
    variants = [r["id"] for r in result.vertices.collect()]
    assert len(variants) == 2

    def ingredients_q(vid):
        return (
            vq_from_ids([vid])
            .outgoing()
            .intersect(start(includes).referencing_edges())
            .outgoing()
        )

    q1, q2 = ingredients_q(variants[0]), ingredients_q(variants[1])

    common = execute(g, q1.intersect(q2))
    assert tagged_list(common.extract_properties()) == sorted(
        [
            json.dumps({"Garnish": "nutmeg"}, separators=(",", ":")),
            json.dumps({"Ingredient": "cream"}, separators=(",", ":")),
            json.dumps({"Ingredient": "crème de cacao"}, separators=(",", ":"), ensure_ascii=False),
        ]
    )

    only_1 = tagged_list(execute(g, q1.substract(q2)).extract_properties())
    only_2 = tagged_list(execute(g, q2.substract(q1)).extract_properties())
    gin = [json.dumps({"Ingredient": "gin"}, separators=(",", ":"))]
    cognac = [json.dumps({"Ingredient": "cognac"}, separators=(",", ":"))]
    assert sorted([tuple(only_1), tuple(only_2)]) == sorted(
        [tuple(gin), tuple(cognac)]
    )


def gin_query_formulations():
    gin = Prop("Ingredient", "gin")
    cocktail_tag = Prop("SchemaType", "Cocktail")
    includes = Prop("Includes")

    q1 = (
        start(gin)
        .referencing_vertices()
        .ingoing()
        .intersect(start(includes).referencing_edges())
        .ingoing()
        .intersect(start(cocktail_tag).referencing_properties().referencing_vertices())
    )
    q2 = (
        start(cocktail_tag)
        .referencing_properties()
        .referencing_vertices()
        .intersect(
            start(gin)
            .referencing_vertices()
            .ingoing()
            .intersect(start(includes).referencing_edges())
            .ingoing()
        )
    )
    q3 = (
        start(includes)
        .referencing_edges()
        .ingoing()
        .intersect(start(gin).referencing_vertices().ingoing().ingoing())
        .intersect(start(cocktail_tag).referencing_properties().referencing_vertices())
    )
    return [q1, q2, q3]


@pytest.mark.parametrize("formulation", [0, 1, 2])
def test_which_cocktails_include_gin(cocktail_graph, formulation):
    q = gin_query_formulations()[formulation]
    result = execute(cocktail_graph, q)
    expected = sorted(
        json.dumps({"Cocktail": n}, separators=(",", ":")) for n in GIN_COCKTAILS
    )
    assert tagged_list(result.extract_properties()) == expected


def test_gin_paths(cocktail_graph):
    """Formulation 1 path assertion (lib.rs:159-185): 21 paths, each
    [Ingredient(gin), Includes, Cocktail(<name>)]."""
    q = gin_query_formulations()[0]
    result = execute(cocktail_graph, q)
    rows = result.extract_path_properties().collect()
    paths = sorted(tuple(r["props"]) for r in rows)
    gin = json.dumps({"Ingredient": "gin"}, separators=(",", ":"))
    includes = json.dumps("Includes")
    expected = sorted(
        (gin, includes, json.dumps({"Cocktail": n}, separators=(",", ":")))
        for n in GIN_COCKTAILS
    )
    assert paths == expected
