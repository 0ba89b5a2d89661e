"""GraphML importer.

Mirrors the reference importer's behavior (import/graphml.rs:7-165): walk
``<node id=...>`` / ``<edge source=... target=...>`` elements, map the raw
string id through a pluggable ``node_key_mapper`` (default: stable fresh
uuid per distinct id), map each element's *inner XML* through a pluggable
``prop_mapper`` (default: parse the single child element ``<Tag>text</Tag>``
into ``Prop(Tag, text)``), and create nodes/edges.

Parsing is driver-side (GraphML files are metadata-sized); the resulting
graph lives in DataFrames. For bulk data use ``sources.ingest`` instead.
"""

from __future__ import annotations

import uuid
import xml.etree.ElementTree as ET
from typing import Callable, Optional

from pyspark.sql import SparkSession

from ..graph import GraphBatchBuilder, PropertyGraph
from ..schema import Prop, Schema

__all__ = ["export_graphml", "import_graphml", "default_prop_mapper", "uuid_mapper"]


def uuid_mapper(raw_id: str, mappings: dict[str, str]) -> str:
    """Stable fresh uuid per distinct GraphML id (graphml.rs:90-97)."""
    if raw_id not in mappings:
        mappings[raw_id] = str(uuid.uuid4())
    return mappings[raw_id]


def default_prop_mapper(element: ET.Element) -> Prop:
    """Parse ``<Tag>text</Tag>`` inner content into ``Prop(Tag, text)`` —
    the serde `from_str::<Schema>` pattern of the reference test
    (tests/test_import_graphml.rs)."""
    children = list(element)
    if len(children) == 1:
        child = children[0]
        # strip any xmlns prefix so a namespaced document hashes/types
        # identically to the same document without xmlns
        return Prop(child.tag.rsplit("}", 1)[-1], child.text)
    if element.text and element.text.strip():
        return Prop("Value", element.text.strip())
    raise ValueError(f"cannot map properties of <{element.tag}>")


def import_graphml(
    spark: SparkSession,
    xml_data: str,
    node_key_mapper: Callable[[str, dict], str] = uuid_mapper,
    prop_mapper: Callable[[ET.Element], Prop] = default_prop_mapper,
    schema: Optional[Schema] = None,
) -> tuple[PropertyGraph, dict[str, str]]:
    """Import a GraphML document; returns (graph, raw-id → vertex-id map)."""
    root = ET.fromstring(xml_data)
    # {*} wildcard: accept spec-conformant namespaced GraphML
    # (xmlns="http://graphml.graphdrawing.org/xmlns") as well as bare tags
    graph_el = (
        root
        if root.tag.rsplit("}", 1)[-1] == "graph"
        else root.find(".//{*}graph")
    )
    if graph_el is None:
        raise ValueError("no <graph> element found")

    b = GraphBatchBuilder(schema)
    mappings: dict[str, str] = {}
    for el in graph_el:
        tag = el.tag.rsplit("}", 1)[-1]  # tolerate namespaces
        if tag == "node":
            raw = el.attrib["id"]
            b.add_node(prop_mapper(el), id=node_key_mapper(raw, mappings))
        elif tag == "edge":
            src = node_key_mapper(el.attrib["source"], mappings)
            dst = node_key_mapper(el.attrib["target"], mappings)
            b.add_edge(src, dst, prop_mapper(el))
        else:
            raise ValueError(f"unexpected element <{tag}>")
    return b.build(spark), mappings


def export_graphml(graph: PropertyGraph) -> str:
    """GraphML EXPORT — the missing inverse of :func:`import_graphml`
    (the reference only imports; an engine a user migrates ONTO also has
    to let them leave). Each vertex/edge element carries its tagged
    property as the same ``<Tag>text</Tag>`` inner-element convention the
    importer parses, so export∘import round-trips: identical property
    hashes, identical topology (vertex ids map through the importer's
    key mapper like any GraphML input).

    Rendering is driver-side like the importer (GraphML is a
    metadata-sized interchange format, not a bulk path — bulk egress is
    parquet via ``PropertyGraph.save``); the collects are the graph's
    vertex/edge lists, which any XML export must enumerate anyway."""
    import json as _json
    import re as _re
    from xml.sax.saxutils import escape, quoteattr

    # property tags are interpolated into element position: only XML
    # Names are representable — anything else would silently produce a
    # malformed document (r5 ADVICE), so reject it loudly
    _xml_name = _re.compile(r"^[A-Za-z_][\w.\-]*$")

    def tag_of(obj) -> str:
        tag = obj if isinstance(obj, str) else next(iter(obj))
        if not _xml_name.match(tag):
            raise ValueError(
                f"property tag {tag!r} is not an XML Name; it cannot be"
                " rendered as a GraphML element — export this graph via"
                " parquet (PropertyGraph.save) instead"
            )
        return tag

    def tagged_inner(tagged: str) -> str:
        obj = _json.loads(tagged)
        if isinstance(obj, str):  # payload-less Prop("Type"): bare tag
            tag = tag_of(obj)
            return f"<{tag}></{tag}>"
        if isinstance(obj, dict) and len(obj) == 1:
            tag = tag_of(obj)
            val = obj[tag]
            if val is None:
                return f"<{tag}></{tag}>"
            return f"<{tag}>{escape(str(val))}</{tag}>"
        raise ValueError(f"cannot render property payload {tagged!r}")

    props = {
        r["prop_hash"]: r["tagged"]
        for r in graph.properties.select("prop_hash", "tagged").collect()
    }
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <graph edgedefault="directed">',
    ]
    for r in sorted(
        graph.vertices.select("id", "prop_hash").collect(),
        key=lambda r: r["id"],
    ):
        # quoteattr, not escape: escape() leaves '"' intact, so an id
        # containing a double quote would break out of the attribute
        lines.append(
            f"    <node id={quoteattr(r['id'])}>"
            f"{tagged_inner(props[r['prop_hash']])}</node>"
        )
    for r in sorted(
        graph.edges.select("edge_id", "src", "dst", "prop_hash").collect(),
        key=lambda r: r["edge_id"],
    ):
        lines.append(
            f"    <edge id={quoteattr(r['edge_id'])}"
            f" source={quoteattr(r['src'])}"
            f" target={quoteattr(r['dst'])}>"
            f"{tagged_inner(props[r['prop_hash']])}</edge>"
        )
    lines += ["  </graph>", "</graphml>"]
    return "\n".join(lines)
