"""ChangeSet export/apply/merge (changeset.py) — the reference's declared
VCS-sync structs (kv_graph_store.rs:848-864, docs/key_value_store.adoc
:528-598) exercised end-to-end: diff → JSON commit → replay reproduces a
branch; three-way merge of diverged snapshots reaches the golden store
state; real conflicts raise with the node ids."""

import pytest

from gravitydb_spark import GraphBatchBuilder, Prop
from gravitydb_spark.changeset import (
    MergeConflictError,
    apply_change,
    change_from_json,
    change_to_json,
    graph_diff,
    merge_graphs,
    snapshot_id,
)

A_ID = "00000000-0000-0000-0000-00000000000a"
B_ID = "00000000-0000-0000-0000-00000000000b"
C_ID = "00000000-0000-0000-0000-00000000000c"
D_ID = "00000000-0000-0000-0000-00000000000d"


def _base(spark):
    b = GraphBatchBuilder()
    b.add_node(Prop("City", "Berlin"), id=A_ID)
    b.add_node(Prop("City", "Paris"), id=B_ID)
    b.add_edge(A_ID, B_ID, Prop("Road", "A2"))
    return b.build(spark)


def _rows(g):
    return {
        "v": sorted(map(tuple, g.vertices.collect())),
        "e": sorted(map(tuple, g.edges.collect())),
        "p": sorted(map(tuple, g.properties.collect())),
        "r": sorted(map(tuple, g.prop_refs.collect())),
    }


def _branch_a(base):
    """create Rome + road Berlin→Rome; rename Paris."""
    g, _ = base.create_nodes([(C_ID, Prop("City", "Rome"))])
    g, _ = g.create_edges([(A_ID, C_ID, Prop("Road", "B1"))])
    return g.update_nodes([(B_ID, Prop("City", "Paris-2"))])


def _branch_b(base):
    """create Oslo + road Paris→Oslo."""
    g, _ = base.create_nodes([(D_ID, Prop("City", "Oslo"))])
    g, _ = g.create_edges([(B_ID, D_ID, Prop("Road", "E6"))])
    return g


class TestDiffApply:
    def test_json_roundtrip_replays_branch(self, spark):
        base = _base(spark)
        a = _branch_a(base)
        payload = change_to_json(graph_diff(base, a))
        replayed = apply_change(base, change_from_json(spark, payload))
        assert _rows(replayed) == _rows(a.gc())
        # idempotent: re-applying the same commit is a no-op
        again = apply_change(replayed, change_from_json(spark, payload))
        assert _rows(again) == _rows(replayed)

    def test_depends_on_is_base_snapshot(self, spark):
        base = _base(spark)
        ch = graph_diff(base, _branch_a(base))
        assert ch["depends_on"] == [snapshot_id(base)]
        # snapshot id is content-addressed: identical content, same id
        assert snapshot_id(base) == snapshot_id(_base(spark))
        assert snapshot_id(base) != snapshot_id(_branch_a(base))


class TestMerge:
    def test_merge_reaches_golden_state(self, spark):
        base = _base(spark)
        a, b = _branch_a(base), _branch_b(base)
        merged = merge_graphs(base, a, b)
        # golden = both edit sequences applied in sequence to one lineage
        golden = _branch_b(_branch_a(base)).gc()
        assert _rows(merged) == _rows(golden)
        # merge is symmetric for non-conflicting branches
        assert _rows(merge_graphs(base, b, a)) == _rows(golden)

    def test_merge_idempotent_and_identity(self, spark):
        base = _base(spark)
        a = _branch_a(base)
        assert _rows(merge_graphs(base, a, a)) == _rows(a.gc())
        assert _rows(merge_graphs(base, base, base)) == _rows(base.gc())

    def test_identical_concurrent_creation_collapses(self, spark):
        base = _base(spark)
        # both sides create the SAME edge content concurrently —
        # content addressing must collapse them to one edge
        a, _ = base.create_edges([(B_ID, A_ID, Prop("Road", "A2"))])
        b, _ = base.create_edges([(B_ID, A_ID, Prop("Road", "A2"))])
        merged = merge_graphs(base, a, b)
        assert merged.edges.count() == 2  # base edge + one collapsed new edge

    def test_deletion_propagates_with_cascade(self, spark):
        base = _base(spark)
        a = base.delete_nodes([B_ID])  # cascade drops the A→B road
        b = _branch_b(base)  # adds an edge ONTO the deleted vertex
        # delete vs create-edge-onto-deleted-vertex: b did not touch node
        # B itself, so the vertex deletion wins and b's dangling edge is
        # cascade-dropped; b's new node survives
        merged = merge_graphs(base, a, b)
        ids = {r["id"] for r in merged.vertices.collect()}
        assert ids == {A_ID, D_ID}
        assert merged.edges.count() == 0
        assert not merged.doctor()["dangling_edges"].count()

    def test_modify_modify_conflict_raises(self, spark):
        base = _base(spark)
        a = base.update_nodes([(B_ID, Prop("City", "Paris-A"))])
        b = base.update_nodes([(B_ID, Prop("City", "Paris-B"))])
        with pytest.raises(MergeConflictError) as ei:
            merge_graphs(base, a, b)
        assert B_ID in ei.value.node_ids

    def test_delete_modify_conflict_raises(self, spark):
        base = _base(spark)
        a = base.delete_nodes([B_ID])
        b = base.update_nodes([(B_ID, Prop("City", "Paris-B"))])
        with pytest.raises(MergeConflictError):
            merge_graphs(base, a, b)


class TestMergeRandomized:
    @pytest.mark.parametrize("seed", [5, 23])
    def test_disjoint_random_edits_merge_to_sequential_state(self, spark, seed):
        """Random id-disjoint edit batches on two branches: three-way
        merge must equal applying both batches sequentially to one
        lineage, and must be symmetric. Ops cover create/update/delete
        node and create-edge; batches are REPLAYABLE (op lists drawn
        once, created ids deterministic) so the sequential golden uses
        exactly the branches' edits."""
        import random

        rng = random.Random(seed)
        ids = [f"00000000-0000-0000-0000-0000000000{i:02x}" for i in range(8)]
        b = GraphBatchBuilder()
        for i, vid in enumerate(ids):
            b.add_node(Prop("City", f"C{i}"), id=vid)
        for i in range(4):
            b.add_edge(ids[i], ids[i + 1], Prop("Road", f"R{i}"))
        base = b.build(spark)

        def apply_ops(g, ops, victim_ids, tag):
            for k, op in enumerate(ops):
                if op == "create":
                    g, _ = g.create_nodes(
                        [(f"created-{tag}-{k}", Prop("City", f"new-{tag}-{k}"))]
                    )
                elif op == "update":
                    g = g.update_nodes(
                        [(victim_ids[0], Prop("City", f"upd-{tag}-{k}"))]
                    )
                elif op == "delete":
                    g = g.delete_nodes([victim_ids[1]])
                else:
                    g, _ = g.create_edges(
                        [(victim_ids[0], victim_ids[2], Prop("Road", f"e-{tag}-{k}"))]
                    )
            return g

        ops_a = rng.sample(["create", "update", "delete", "edge"], k=2)
        ops_b = rng.sample(["create", "update", "delete", "edge"], k=2)
        # branch A touches ids[0:3], branch B touches ids[3:6] — disjoint
        a = apply_ops(base, ops_a, ids[0:3], "a")
        b2 = apply_ops(base, ops_b, ids[3:6], "b")
        merged = merge_graphs(base, a, b2)
        golden = apply_ops(
            apply_ops(base, ops_a, ids[0:3], "a"), ops_b, ids[3:6], "b"
        ).gc()
        assert _rows(merged) == _rows(golden), (ops_a, ops_b)
        assert _rows(merge_graphs(base, b2, a)) == _rows(golden), (ops_a, ops_b)
