"""GraphML import (FIXTURES.md §4) + bulk-ingest hash parity."""

import json

from pyspark.sql import functions as F

from gravitydb_spark import Prop, execute
from gravitydb_spark.ql import eq_all, vq_all
from gravitydb_spark.sources import import_graphml, ingest_graph
from gravitydb_spark.sources.ingest import edge_hash_col, prop_hash_col
from gravitydb_spark.hashing import edge_hash, prop_hash

GRAPHML = """
<graph>
    <node id="1"><Label>Node 1</Label></node>
    <node id="2"><Label>Node 2</Label></node>
    <edge source="1" target="2"><Label>Edge from Node 1 to Node 2</Label></edge>
</graph>
"""


def test_import_simple_graphml(spark):
    g, mappings = import_graphml(spark, GRAPHML)
    assert len(mappings) == 2

    res = execute(g, vq_all())
    got = sorted(r["tagged"] for r in res.extract_properties().collect())
    assert got == [
        json.dumps({"Label": f"Node {i}"}, separators=(",", ":")) for i in (1, 2)
    ]

    res = execute(g, eq_all())
    got = [r["tagged"] for r in res.extract_properties().collect()]
    assert got == [
        json.dumps({"Label": "Edge from Node 1 to Node 2"}, separators=(",", ":"))
    ]


def test_bulk_ingest_hash_parity(spark, cocktail_graph):
    """Spark-side sha2(tagged JSON) must equal Python-side hashing for
    every property value in the cocktail fixture (incl. non-ASCII
    'crème de cacao') and for edge hashes."""
    from tests.fixtures.cocktail_data import NODES

    pdf = spark.createDataFrame(
        [(kind, value) for _, kind, value in NODES], "schema_type string, payload string"
    )
    got = pdf.select(
        "schema_type",
        "payload",
        prop_hash_col(F.col("schema_type"), F.col("payload")).alias("h"),
    ).collect()
    for r in got:
        assert r["h"] == prop_hash(r["schema_type"], r["payload"]), r

    e = spark.createDataFrame(
        [("a", "b", prop_hash("Includes"))], "src string, dst string, ph string"
    ).select(edge_hash_col(F.col("src"), F.col("dst"), F.col("ph")).alias("h"))
    assert e.first()["h"] == edge_hash("a", "b", prop_hash("Includes"))


def test_ingest_graph_matches_builder(spark, cocktail_graph):
    """Bulk-ingesting the cocktail fixture must produce the exact same four
    tables as the row-at-a-time GraphBatchBuilder."""
    from tests.fixtures.cocktail_data import EDGES, NODES
    from tests.fixtures.cocktails import node_id

    vertices = spark.createDataFrame(
        [(node_id(var), kind, value) for var, kind, value in NODES],
        "id string, schema_type string, payload string",
    )
    edges = spark.createDataFrame(
        [(node_id(s), node_id(d), et, None) for s, d, et in EDGES],
        "src string, dst string, schema_type string, payload string",
    )
    g2 = ingest_graph(spark, vertices, edges)

    for table in ("vertices", "edges", "properties", "prop_refs"):
        a = sorted(tuple(r) for r in getattr(cocktail_graph, table).collect())
        b = sorted(tuple(r) for r in getattr(g2, table).collect())
        assert a == b, f"{table} mismatch"


def test_import_edge_list(spark):
    """Distributed edge-list import: vertices discovered from endpoints,
    ids preserved, traversals work immediately."""
    from gravitydb_spark.ql import pq_from_id
    from gravitydb_spark.schema import Prop
    from gravitydb_spark.sources import import_edge_list

    edges = spark.createDataFrame(
        [("u1", "u2", "follows"), ("u2", "u3", "follows"), ("u1", "u3", "blocks")],
        "src string, dst string, label string",
    )
    g = import_edge_list(spark, edges, vertex_type="User", edge_type="Rel")
    assert g.vertices.count() == 3
    assert g.edges.count() == 3

    # traverse: who does u1 reach via 'follows'?
    q = (
        pq_from_id(Prop("User", "u1").hash)
        .referencing_vertices()
        .outgoing(pq_from_id(Prop("Rel", "follows").hash))
        .outgoing()
    )
    res = execute(g, q)
    assert sorted(r["id"] for r in res.vertices.collect()) == ["u2"]


def test_document_corpus_roundtrip(spark, tmp_path):
    """JSONL and partitioned-parquet round-trips preserve the canonical
    corpus exactly; CSV reads with explicit schema (no inference pass);
    n_chars is derived when absent."""
    from gravitydb_spark.sources import read_documents, write_documents

    src = read_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    baseline = sorted(tuple(r) for r in src.collect())
    assert len(baseline) == 500

    # JSONL round-trip
    jl = str(tmp_path / "docs_jsonl")
    write_documents(src, jl, fmt="jsonl")
    back = read_documents(spark, jl, fmt="jsonl")
    assert sorted(tuple(r) for r in back.collect()) == baseline

    # partitioned parquet round-trip (+ partition pruning works)
    pq = str(tmp_path / "docs_pq")
    write_documents(src, pq, fmt="parquet", partition_by=["lang"])
    back2 = read_documents(spark, pq, fmt="parquet")
    assert sorted(tuple(r) for r in back2.select(*src.columns).collect()) == baseline
    one_lang = back2.filter(F.col("lang") == baseline[0][2])
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan

    # CSV round-trip of a text-safe subset (CSV can't carry arbitrary
    # whitespace runs losslessly; corpus text here is single-spaced)
    cs = str(tmp_path / "docs_csv")
    write_documents(src, cs, fmt="csv")
    back3 = read_documents(spark, cs, fmt="csv")
    assert sorted(tuple(r) for r in back3.collect()) == baseline

    # n_chars derived when missing
    partial = src.select("doc_id", "text")
    from gravitydb_spark.sources.documents import _canonicalize
    d = _canonicalize(partial).filter(F.col("n_chars") != F.length("text"))
    assert d.isEmpty()

    # format validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_documents(src, str(tmp_path / "x"), fmt="avro")
    with _pytest.raises(ValueError):
        write_documents(src, str(tmp_path / "y"), fmt="jsonl", partition_by=["lang"])


def test_clean_corpus_materialization(spark, tmp_path):
    """clean_corpus writes exactly the kept documents, partitioned by
    source, and the result reads back as a valid canonical corpus."""
    from gravitydb_spark.pipeline_queries import clean_corpus
    from gravitydb_spark.sources import read_documents

    out = str(tmp_path / "clean")
    kept = clean_corpus(spark, "/root/testdata/sf0.001", out_path=out)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert 0 < len(kept_ids) < 500

    back = read_documents(spark, out)
    back_ids = {r["doc_id"] for r in back.collect()}
    assert back_ids == kept_ids
    # partitioned layout on disk
    import os
    assert any(d.startswith("source=") for d in os.listdir(out))


def test_document_corpus_orc_roundtrip(spark, tmp_path):
    """ORC round-trip preserves the canonical corpus exactly (second
    columnar format beside parquet; Spark-native writer/reader)."""
    from gravitydb_spark.sources import read_documents, write_documents

    src = read_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    baseline = sorted(tuple(r) for r in src.collect())
    oc = str(tmp_path / "docs_orc")
    write_documents(src, oc, fmt="orc")
    back = read_documents(spark, oc, fmt="orc")
    assert sorted(tuple(r) for r in back.collect()) == baseline


def test_export_jsonl_shards_manifest_round_trip(spark, sf_dir, tmp_path):
    """Shards respect the record cap, the manifest's counts/checksums are
    recomputable from the shard bytes, and a read-back equals the input."""
    import hashlib
    import json
    import os

    from gravitydb_spark.sources.documents import (
        export_jsonl_shards,
        read_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "export")
    manifest = export_jsonl_shards(docs, out, max_records_per_file=100)

    n_docs = docs.count()
    assert sum(m["rows"] for m in manifest) == n_docs
    assert len(manifest) >= 2  # the cap actually split the corpus
    on_disk = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert on_disk == manifest

    for m in manifest:
        shard_path = os.path.join(out, m["shard"])
        rows = 0
        csum = 0
        with open(shard_path, "rb") as fh:
            for line in fh:
                line = line.rstrip(b"\n")
                rows += 1
                csum += int(hashlib.sha256(line).hexdigest()[:15], 16) % 2**32
        assert rows == m["rows"] <= 100
        assert csum % 2**61 == m["checksum"], m["shard"]

    back = read_documents(spark, out, fmt="jsonl")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_verify_jsonl_shards_detects_tampering(spark, sf_dir, tmp_path):
    """Consumer-side manifest verification: clean corpus verifies; a
    byte-altered line, a truncated shard, and an extra shard each raise
    ManifestMismatch naming the shard."""
    import os

    import pytest as _pytest

    from gravitydb_spark.sources.documents import (
        ManifestMismatch,
        export_jsonl_shards,
        verify_jsonl_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "vexport")
    manifest = export_jsonl_shards(docs, out, max_records_per_file=100)
    # drop Hadoop local-FS .crc sidecars: they'd catch the tamper before
    # the manifest does, and object stores (the 100 TB home) have none —
    # the manifest is exactly the portable replacement for them
    for f in os.listdir(out):
        if f.endswith(".crc"):
            os.unlink(os.path.join(out, f))
    assert verify_jsonl_shards(spark, out) == sorted(
        manifest, key=lambda m: m["shard"]
    )

    # tamper: flip one byte in the first shard's first line
    shard = os.path.join(out, manifest[0]["shard"])
    with open(shard, "rb") as fh:
        data = fh.read()
    with open(shard, "wb") as fh:
        fh.write(b"X" + data[1:])
    with _pytest.raises(ManifestMismatch, match="checksum mismatch"):
        verify_jsonl_shards(spark, out)
    with open(shard, "wb") as fh:
        fh.write(data)  # restore

    # truncate: drop the last line of the second shard
    shard2 = os.path.join(out, manifest[1]["shard"])
    with open(shard2, "rb") as fh:
        lines = fh.read().splitlines(keepends=True)
    with open(shard2, "wb") as fh:
        fh.writelines(lines[:-1])
    with _pytest.raises(ManifestMismatch, match="rows"):
        verify_jsonl_shards(spark, out)
    with open(shard2, "wb") as fh:
        fh.writelines(lines)

    # extra shard not in the manifest
    with open(os.path.join(out, "part-extra.json"), "w") as fh:
        fh.write('{"doc_id": 1}\n')
    with _pytest.raises(ManifestMismatch, match="not in manifest"):
        verify_jsonl_shards(spark, out)


def test_graphml_export_import_round_trip(spark, cocktail_graph):
    """export_graphml ∘ import_graphml preserves the whole graph:
    identical property hash set (content addressing survives the XML
    trip) and identical topology up to the importer's id re-mapping."""
    from gravitydb_spark.sources.graphml import export_graphml, import_graphml

    xml = export_graphml(cocktail_graph)
    g2, mapping = import_graphml(spark, xml)

    def phashes(g):
        return sorted(r["prop_hash"] for r in g.properties.select("prop_hash").collect())

    assert phashes(g2) == phashes(cocktail_graph)
    assert g2.vertices.count() == cocktail_graph.vertices.count()
    assert g2.edges.count() == cocktail_graph.edges.count()
    # topology preserved through the id re-mapping: compare edges as
    # (src prop, dst prop, edge prop) triples, which are id-free
    def triples(g):
        v = {r["id"]: r["prop_hash"] for r in g.vertices.collect()}
        return sorted(
            (v[r["src"]], v[r["dst"]], r["prop_hash"]) for r in g.edges.collect()
        )

    assert triples(g2) == triples(cocktail_graph)


def test_graphml_export_quotes_attrs_and_rejects_bad_tags(spark):
    """r5 ADVICE: ids containing '"' must round-trip (quoteattr), and a
    property tag that is not an XML Name must be rejected loudly instead
    of silently emitting a malformed document."""
    import pytest

    from gravitydb_spark import GraphBatchBuilder, Prop
    from gravitydb_spark.sources.graphml import export_graphml, import_graphml

    b = GraphBatchBuilder()
    evil = 'a"b<&>\'c'
    b.add_node(Prop("City", 'Ber"lin'), id=evil)
    b.add_node(Prop("City", "Rome"), id="plain")
    b.add_edge(evil, "plain", Prop("Road", "E55"))
    g = b.build(spark)

    xml = export_graphml(g)
    g2, mapping = import_graphml(spark, xml)
    assert set(mapping) == {evil, "plain"}  # raw ids survive the trip
    assert g2.edges.count() == 1
    ph = lambda gg: sorted(r["prop_hash"] for r in gg.properties.collect())
    assert ph(g2) == ph(g)

    b2 = GraphBatchBuilder()
    b2.add_node(Prop("not an<xml>name", "x"), id="n1")
    with pytest.raises(ValueError, match="not an XML Name"):
        export_graphml(b2.build(spark))
