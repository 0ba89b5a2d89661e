"""Streaming dedup (bounded-state) + bucketed storage (shuffle-free joins)."""

from pyspark.sql import functions as F

from gravitydb_spark import PropertyGraph
from gravitydb_spark.streaming import stream_dedup_exact


def test_stream_dedup_exact(spark, tmp_path, sf_dir):
    # feed the documents table through as a stream with a synthetic ts
    static = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    src = str(tmp_path / "docs_stream")
    static.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(static.schema).parquet(src)
    deduped = stream_dedup_exact(stream, ts_col="ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("docs_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select count(*) n, count(distinct content_hash) d from docs_dedup").first()
    expected = static.select(F.countDistinct("text")).first()[0]
    assert got["n"] == got["d"] == expected


def test_bucketed_save_no_exchange_on_bucketed_side(spark, cocktail_graph, tmp_path):
    cocktail_graph.save_bucketed("bt", buckets=4)
    g2 = PropertyGraph.load_bucketed(spark, "bt")
    assert g2.edges.count() == cocktail_graph.edges.count()

    # a groupBy on the bucket key must not need an exchange above the scan
    plan = (
        g2.edges.groupBy("src")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]
