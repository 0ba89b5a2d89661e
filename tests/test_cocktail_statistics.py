"""cocktail_statistic ported (gravitydb-test-utils/src/lib.rs:230-315):
the host-side loops become one-shuffle DataFrame aggregations."""

from pyspark.sql import functions as F

from gravitydb_spark.operators import (
    top_k_by_count,
    traverse,
    type_counts,
    vertices_of_type,
)


def test_cocktail_statistics(cocktail_graph):
    g = cocktail_graph
    cocktails = vertices_of_type(g, "Cocktail")
    assert cocktails.count() == 45

    pairs = traverse(g, cocktails, edge_type="Includes", direction="out")
    counts = type_counts(g, pairs)

    # pivot to per-cocktail (ingredients, garnishes, other); cocktails with
    # no garnish must appear with 0 -> left join from the full cocktail set
    per_cocktail = (
        cocktails.select(F.col("id").alias("from_id"))
        .join(
            counts.groupBy("from_id").pivot(
                "schema_type", ["Ingredient", "Garnish", "Glass", "Cocktail"]
            ).sum("n"),
            "from_id",
            "left",
        )
        .fillna(0)
        .withColumn("other", F.col("Glass") + F.col("Cocktail"))
    )

    row = per_cocktail.agg(
        F.min("Ingredient").alias("i_min"),
        F.max("Ingredient").alias("i_max"),
        F.min("Garnish").alias("g_min"),
        F.max("Garnish").alias("g_max"),
        F.sum("other").alias("other_sum"),
        F.format_number(F.avg("Ingredient"), 3).alias("i_avg"),
        F.format_number(F.avg("Garnish"), 3).alias("g_avg"),
    ).first()

    assert row["i_min"] == 1
    assert row["i_max"] == 9
    assert row["g_min"] == 0
    assert row["g_max"] == 2
    assert row["other_sum"] == 0
    assert row["i_avg"] == "3.578"
    assert row["g_avg"] == "0.844"

    # most used ingredients: value frequency + deterministic top-k
    ing_names = (
        g.vertices.join(
            g.properties.filter(F.col("schema_type") == "Ingredient"), "prop_hash"
        ).select(F.col("id").alias("to_id"), F.col("value").alias("name"))
    )
    freq = (
        pairs.join(ing_names, "to_id")
        .groupBy("name")
        .agg(F.count("*").alias("n_cocktails"))
    )
    top5 = [
        (r["name"], r["n_cocktails"])
        for r in top_k_by_count(freq, "name", "n_cocktails", 5).collect()
    ]
    assert top5 == [
        ('"gin"', 21),
        ('"lemon juice"', 16),
        ('"sugar syrup"', 8),
        ('"club soda"', 7),
        ('"maraschino"', 7),
    ]
