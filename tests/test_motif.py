"""Motif matching on the cocktail graph."""

import pytest

from gravitydb_spark.operators.motif import match_pattern


def test_motif_cocktail_ingredient_glass(cocktail_graph):
    """(c:Cocktail)-[:Includes]->(i:Ingredient), (c)-[:ServedIn]->(gl:Glass)
    — cocktails with their gin binding and glass."""
    g = cocktail_graph
    m = match_pattern(
        g,
        [("c", "_e1", "i"), ("c", "_e2", "gl")],
        vertex_types={"c": "Cocktail", "i": "Ingredient", "gl": "Glass"},
        edge_types={"_e1": "Includes", "_e2": "ServedIn"},
    )
    # every binding: c is a cocktail with both edges; count matches the
    # relational expectation (ingredient-includes x served-in per cocktail)
    from pyspark.sql import functions as F
    from gravitydb_spark.operators import edges_of_type, vertices_of_type

    inc = edges_of_type(g, "Includes").select(
        F.col("src").alias("c"), F.col("dst").alias("i")
    )
    ing = vertices_of_type(g, "Ingredient").select(F.col("id").alias("i"))
    served = edges_of_type(g, "ServedIn").select(
        F.col("src").alias("c"), F.col("dst").alias("gl")
    )
    expected = (
        inc.join(ing, "i", "leftsemi").join(served, "c").distinct().count()
    )
    assert m.count() == expected
    assert set(m.columns) == {"c", "i", "gl"}


def test_motif_refuses_cartesian(cocktail_graph):
    with pytest.raises(ValueError):
        match_pattern(
            cocktail_graph, [("a", "_e1", "b"), ("x", "_e2", "y")]
        )
