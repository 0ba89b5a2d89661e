"""Sharding — the last of the reference's declared-but-unimplemented
infrastructure essays (docs/key_value_store.adoc:600-619): split the
database into smaller connected sub-databases so a small device can hold
just its relevant slice, work offline, and sync back into the big store
— with cross-shard edges called out there as the hard problem.

Spark-first answer, built on the content-addressed store + the r4
ChangeSet layer:

- :func:`extract_shard` — self-contained induced sub-store for a vertex
  membership set. Cross-shard edges are OWNED BY THE SOURCE's shard (each
  edge lives in exactly one shard), and their far endpoints are included
  as *ghost vertices* (full content rows), so every shard passes
  ``doctor()`` on its own: no dangling edges, full property-blob closure
  (via changeset._closure_properties), backlink index rebuilt.
- :func:`shard_graph` — partition the whole store by an assignment
  DataFrame[id, shard]; every vertex lands in exactly one shard.
- :func:`reassemble` — union + content-addressed dedup of any shard set.
  Ghost rows collapse with their home-shard originals (identical bytes by
  content addressing), so reassembling a full partition is EXACTLY the
  original store — the round-trip law test_sharding pins.
- offline sync-back is the existing ChangeSet machinery: edit a shard,
  then ``apply_change(big, graph_diff(shard_base, shard_edited))`` — or
  ``merge_graphs`` when the big store moved too. The adoc's "sync all
  these small databases" is diff/apply/merge over shards; nothing new
  is needed.

Scale posture: extraction is semi/anti joins keyed on id + the property
closure walk; sharding N ways is one pass per shard over pruned columns
(or a single ``partitionBy(shard)`` write of the four tables when all
shards materialize at once). No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .changeset import _closure_properties, _rebuild_refs
from .graph import PropertyGraph

__all__ = ["extract_shard", "reassemble", "shard_graph"]


def extract_shard(g: PropertyGraph, member_ids: DataFrame) -> PropertyGraph:
    """Self-contained sub-store for the vertices in ``member_ids`` (DF
    with an ``id`` column): member vertices + edges they SOURCE (edge
    ownership = src's shard) + ghost rows for far endpoints + the full
    property closure, with the backlink index rebuilt."""
    members = member_ids.select("id").distinct()
    vs = g.vertices.join(members, "id", "leftsemi")
    es = g.edges.join(
        members.select(F.col("id").alias("src")), "src", "leftsemi"
    ).select(*g.edges.columns)
    ghosts = (
        g.vertices.join(
            es.select(F.col("dst").alias("id")).distinct(), "id", "leftsemi"
        )
        .join(members, "id", "leftanti")
    )
    all_vs = vs.unionByName(ghosts)
    seed = all_vs.select("prop_hash").unionByName(es.select("prop_hash"))
    props = _closure_properties(g, seed)
    return _rebuild_refs(g, all_vs, es, props)


def shard_graph(g: PropertyGraph, assignment: DataFrame) -> dict:
    """Partition the store by ``assignment`` (DF[id, shard]): one
    self-contained :func:`extract_shard` per distinct shard value.
    Vertices absent from the assignment go to no shard (validate
    upstream if full coverage is required); the shard count is
    driver-known by definition (it's the partition scheme)."""
    shards = [r["shard"] for r in assignment.select("shard").distinct().collect()]
    return {
        s: extract_shard(
            g, assignment.filter(F.col("shard") == s).select("id")
        )
        for s in sorted(shards)
    }


def reassemble(shards: list) -> PropertyGraph:
    """Union + content-addressed dedup of shard stores. Ghost vertex rows
    are byte-identical to their home-shard originals, so duplicates
    collapse; for a full partition of an original store the result is
    exactly that store (round-trip law)."""
    if not shards:
        raise ValueError("reassemble needs at least one shard")
    first = shards[0]
    vertices = first.vertices
    edges = first.edges
    properties = first.properties
    refs = first.prop_refs
    for s in shards[1:]:
        vertices = vertices.unionByName(s.vertices)
        edges = edges.unionByName(s.edges)
        properties = properties.unionByName(s.properties)
        refs = refs.unionByName(s.prop_refs)
    return first._with(
        vertices=vertices.dropDuplicates(["id"]),
        edges=edges.dropDuplicates(["edge_id"]),
        properties=properties.dropDuplicates(["prop_hash"]),
        prop_refs=refs.dropDuplicates(),
    )
