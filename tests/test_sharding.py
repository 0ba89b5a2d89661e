"""Sharding (sharding.py): the reference's split/offline/sync-back essay
(docs/key_value_store.adoc:600-619) — shards are self-contained
(doctor-clean, cross-shard edges owned by source + ghost endpoints),
reassembling a full partition reproduces the original store exactly, and
an offline shard edit syncs back through the ChangeSet layer."""

from pyspark.sql import functions as F

from gravitydb_spark import GraphBatchBuilder, Prop
from gravitydb_spark.changeset import apply_change, graph_diff, merge_graphs
from gravitydb_spark.sharding import extract_shard, reassemble, shard_graph

IDS = [f"00000000-0000-0000-0000-0000000000{i:02x}" for i in range(6)]


def _graph(spark):
    """Two clusters joined by one cross-cluster edge: 0-1-2 and 3-4-5,
    with 2 → 3 crossing."""
    b = GraphBatchBuilder()
    for i, vid in enumerate(IDS):
        b.add_node(Prop("City", f"C{i}"), id=vid)
    for i in (0, 1, 3, 4):
        b.add_edge(IDS[i], IDS[i + 1], Prop("Road", f"R{i}"))
    b.add_edge(IDS[2], IDS[3], Prop("Road", "CROSS"))
    return b.build(spark)


def _rows(g):
    return {
        "v": sorted(map(tuple, g.vertices.collect())),
        "e": sorted(map(tuple, g.edges.collect())),
        "p": sorted(map(tuple, g.properties.collect())),
        "r": sorted(map(tuple, g.prop_refs.collect())),
    }


def _assignment(spark):
    return spark.createDataFrame(
        [(vid, "west" if i < 3 else "east") for i, vid in enumerate(IDS)],
        "id string, shard string",
    )


class TestSharding:
    def test_shards_are_self_contained(self, spark):
        g = _graph(spark)
        shards = shard_graph(g, _assignment(spark))
        assert sorted(shards) == ["east", "west"]
        west, east = shards["west"], shards["east"]
        # cross edge 2->3 is owned by west (source side); its far endpoint
        # rides along as a ghost vertex so the shard is doctor-clean
        assert west.edges.count() == 3  # R0, R1, CROSS
        assert east.edges.count() == 2  # R3, R4
        west_ids = {r["id"] for r in west.vertices.collect()}
        assert west_ids == set(IDS[:3]) | {IDS[3]}  # + ghost
        for shard in (west, east):
            for name, df in shard.doctor().items():
                assert df.count() == 0, f"shard not self-contained: {name}"

    def test_reassembly_roundtrip_is_exact(self, spark):
        g = _graph(spark)
        shards = shard_graph(g, _assignment(spark))
        back = reassemble(list(shards.values()))
        assert _rows(back) == _rows(g.gc())

    def test_offline_shard_edit_syncs_back(self, spark):
        g = _graph(spark)
        shards = shard_graph(g, _assignment(spark))
        east_base = shards["east"]
        # offline on the small device: add a node + connect it
        edited, _ = east_base.create_nodes(
            [("00000000-0000-0000-0000-0000000000ff", Prop("City", "NEW"))]
        )
        edited, _ = edited.create_edges(
            [(IDS[4], "00000000-0000-0000-0000-0000000000ff", Prop("Road", "RN"))]
        )
        # sync back into the big store via the ChangeSet layer
        synced = apply_change(g, graph_diff(east_base, edited))
        ids = {r["id"] for r in synced.vertices.collect()}
        assert "00000000-0000-0000-0000-0000000000ff" in ids
        assert synced.edges.count() == 6
        # and the big store may have moved concurrently: three-way merge
        moved, _ = g.create_nodes([(None, Prop("City", "ELSEWHERE"))])
        merged = merge_graphs(g, moved, synced)
        assert merged.vertices.count() == 8  # 6 base + NEW + ELSEWHERE
        for name, df in merged.doctor().items():
            assert df.count() == 0, name
