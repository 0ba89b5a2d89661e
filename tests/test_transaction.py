"""Transactional batch mutations (transaction.py): the WAL/shadow-paging
essay (docs/key_value_store.adoc:489-525) — an aborted batch (Prohibited
constraint trips) must leave the published store BYTE-identical, and a
committed batch swaps the CURRENT pointer atomically."""

import hashlib
import os

import pytest

from gravitydb_spark import GraphBatchBuilder, Prop
from gravitydb_spark.graph import PropertyGraph
from gravitydb_spark.constraints import ConstraintViolation, Prohibited, Required
from gravitydb_spark.ql import pq_from_id, vq_all
from gravitydb_spark.transaction import TransactionalStore, WriterLockHeld, transact

A_ID = "00000000-0000-0000-0000-00000000000a"


def _graph(spark):
    b = GraphBatchBuilder()
    b.add_node(Prop("City", "Berlin"), id=A_ID)
    return b.build(spark)


def _no_forbidden():
    # Prohibited: no vertex may carry the Forbidden property
    return Prohibited(
        pq_from_id(Prop("City", "Atlantis").hash).referencing_vertices(),
        name="no-atlantis",
    )


def _dir_digest(root):
    """sha256 over every file's path + bytes under root (pointer file and
    lock excluded — they're protocol, not store content)."""
    h = hashlib.sha256()
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for fn in sorted(files):
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            if rel.startswith("CURRENT") or rel == "WRITER_LOCK":
                continue
            h.update(rel.encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


class TestTransact:
    def test_abort_leaves_base_untouched(self, spark):
        g = _graph(spark)
        before = sorted(map(tuple, g.vertices.collect()))
        with pytest.raises(ConstraintViolation):
            transact(
                g,
                lambda gr: gr.create_nodes([(None, Prop("City", "Atlantis"))])[0],
                [_no_forbidden()],
            )
        assert sorted(map(tuple, g.vertices.collect())) == before

    def test_commit_returns_new_snapshot(self, spark):
        g = _graph(spark)
        out = transact(
            g,
            lambda gr: gr.create_nodes([(None, Prop("City", "Rome"))])[0],
            [_no_forbidden(), Required(vq_all(), name="nonempty")],
        )
        assert out.vertices.count() == 2 and g.vertices.count() == 1


class TestTransactionalStore:
    def test_aborted_commit_is_byte_identical(self, spark, tmp_path):
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        store.init(g)
        before_ptr = store.current_path()
        before_digest = _dir_digest(before_ptr)

        bad = g.create_nodes([(None, Prop("City", "Atlantis"))])[0]
        with pytest.raises(ConstraintViolation):
            store.commit(bad, [_no_forbidden()])

        # pointer still names the old snapshot and every byte of the
        # published snapshot (vertices/edges/properties/prop_refs parquet)
        # is identical; the failed snapshot dir is collected on abort
        assert store.current_path() == before_ptr
        assert _dir_digest(before_ptr) == before_digest
        reread = store.load(spark)
        assert sorted(map(tuple, reread.vertices.collect())) == sorted(
            map(tuple, g.vertices.collect())
        )

    def test_commit_succeeds_after_abort(self, spark, tmp_path):
        # an aborted commit must not poison the snapshot namespace: the
        # next commit allocates past any leftover dir and succeeds
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        store.init(g)
        bad = g.create_nodes([(None, Prop("City", "Atlantis"))])[0]
        with pytest.raises(ConstraintViolation):
            store.commit(bad, [_no_forbidden()])
        good = g.create_nodes([(None, Prop("City", "Rome"))])[0]
        name = store.commit(good, [_no_forbidden()])
        assert store._current_name() == name
        assert store.load(spark).vertices.count() == 2
        # crash-orphan case: an unreferenced dir left behind (simulating a
        # writer that died before cleanup) must also be skipped over
        os.makedirs(os.path.join(store.path, "snap-7"))
        name2 = store.commit(good, [_no_forbidden()])
        assert name2 == "snap-8"

    def test_commit_swaps_pointer(self, spark, tmp_path):
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        first = store.init(g)
        good = g.create_nodes([(None, Prop("City", "Rome"))])[0]
        second = store.commit(good, [_no_forbidden()])
        assert first != second
        assert store._current_name() == second
        assert store.load(spark).vertices.count() == 2
        # the previous snapshot's bytes survive for readers mid-scan
        assert os.path.isdir(os.path.join(store.path, first))

    def test_writer_lock_serializes(self, spark, tmp_path):
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        store.init(g)
        lock = os.path.join(store.path, TransactionalStore.LOCK)
        open(lock, "w").close()  # a concurrent writer
        with pytest.raises(WriterLockHeld):
            store.commit(g)
        os.unlink(lock)
        # lock is released after a successful commit
        store.commit(g)
        assert not os.path.exists(lock)


class TestTimeTravel:
    def test_load_at_reads_past_versions_and_diff_explains_them(
        self, spark, tmp_path
    ):
        """Three commits → every historical version stays readable by
        name or index, CURRENT is unaffected by time-travel reads, and
        the snapshot diff names exactly the vertex added in between."""
        store = TransactionalStore(str(tmp_path / "db"))
        g1 = _graph(spark)
        s1 = store.init(g1)
        g2 = g1.create_nodes(
            [("00000000-0000-0000-0000-00000000000b", Prop("City", "Paris"))]
        )[0]
        s2 = store.commit(g2)
        g3 = g2.delete_nodes([A_ID])
        s3 = store.commit(g3)

        assert store.snapshots() == [s1, s2, s3]
        # by name and by (negative) index
        v1 = store.load_at(spark, s1)
        assert [r["id"] for r in v1.vertices.collect()] == [A_ID]
        v2 = store.load_at(spark, -2)
        assert sorted(r["id"] for r in v2.vertices.collect()) == [
            A_ID,
            "00000000-0000-0000-0000-00000000000b",
        ]
        # CURRENT still points at the newest commit
        assert store.current_path().endswith(s3)
        cur_ids = [r["id"] for r in store.load(spark).vertices.collect()]
        assert cur_ids == ["00000000-0000-0000-0000-00000000000b"]

        d12 = store.diff(spark, s1, s2)
        assert [r["id"] for r in d12["created_nodes"].collect()] == [
            "00000000-0000-0000-0000-00000000000b"
        ]
        assert d12["deleted_nodes"].count() == 0
        d23 = store.diff(spark, s2, s3)
        assert [r["id"] for r in d23["deleted_nodes"].collect()] == [A_ID]

        with pytest.raises(FileNotFoundError):
            store.load_at(spark, "snap-99")

    def test_gc_snapshots_keeps_current_and_newest(self, spark, tmp_path):
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        names = [store.init(g)]
        for i in range(3):
            g = g.create_nodes(
                [(f"00000000-0000-0000-0000-00000000010{i}", Prop("City", f"C{i}"))]
            )[0]
            names.append(store.commit(g))

        removed = store.gc_snapshots(keep=2)
        assert removed == names[:2]
        assert store.snapshots() == names[2:]
        # current still loads, history bounded
        assert store.current_path().endswith(names[-1])
        assert store.load(spark).vertices.count() == 4
        # idempotent
        assert store.gc_snapshots(keep=2) == []

    def test_gc_grace_defers_byte_deletion_one_pass(self, spark, tmp_path):
        """Two-phase GC (reader/GC grace, r4 ADVICE): pass 1 only
        de-publishes (log shrink + GC_PENDING park) so an in-flight
        time-travel reader keeps its bytes; pass 2 deletes them."""
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        names = [store.init(g)]
        for i in range(3):
            g = g.create_nodes(
                [(f"00000000-0000-0000-0000-00000000011{i}", Prop("City", f"G{i}"))]
            )[0]
            names.append(store.commit(g))

        doomed = store.gc_snapshots(keep=2)
        assert doomed == names[:2]
        # de-published: new readers can't resolve the names...
        assert store.snapshots() == names[2:]
        with pytest.raises(FileNotFoundError):
            store.load_at(spark, names[0])
        # ...but the BYTES survive the pass — a reader holding the
        # resolved path can still finish its scan
        stale = os.path.join(store.path, names[0])
        assert os.path.isdir(stale)
        assert PropertyGraph.load(spark, stale).vertices.count() == 1
        # pass 2 (the next gc) drops the aged bytes
        assert store.gc_snapshots(keep=2) == []
        assert not os.path.isdir(stale)
        assert not os.path.exists(os.path.join(store.path, store.GC_PENDING))
        # grace=False restores immediate deletion
        g = g.create_nodes(
            [("00000000-0000-0000-0000-000000000120", Prop("City", "Gx"))]
        )[0]
        names.append(store.commit(g))
        doomed2 = store.gc_snapshots(keep=2, grace=False)
        assert doomed2 == [names[2]]
        assert not os.path.isdir(os.path.join(store.path, names[2]))

    def test_orphan_snapshot_dirs_are_not_published(self, spark, tmp_path):
        """A crashed commit's leftover snap dir (written, never swapped
        in) must be invisible to snapshots()/load_at(-1), and its number
        must not be reused by the next commit."""
        store = TransactionalStore(str(tmp_path / "db"))
        g = _graph(spark)
        s0 = store.init(g)
        # simulate the crash: a snap dir exists but was never published
        orphan = os.path.join(store.path, "snap-57")
        os.makedirs(orphan)
        assert store.snapshots() == [s0]
        assert store.load_at(spark, -1).vertices.count() == 1
        with pytest.raises(FileNotFoundError):
            store.load_at(spark, 3)
        # allocation still skips past the orphan's number
        s1 = store.commit(
            g.create_nodes(
                [("00000000-0000-0000-0000-000000000200", Prop("City", "Rome"))]
            )[0]
        )
        assert s1 == "snap-58"
        assert store.snapshots() == [s0, s1]


def test_versioned_view_store_publish_load_gc(spark, tmp_path):
    """VersionedViewStore: each publish is a full readable version;
    load_version by index/name; gc_versions de-publishes oldest but
    keeps the newest; orphan dirs stay invisible (shared _SnapshotLog
    contract)."""
    import pyspark.sql.functions as F

    from gravitydb_spark.transaction import VersionedViewStore

    store = VersionedViewStore(str(tmp_path / "views"))
    for n in (1, 2, 3):
        store.publish(spark.range(n).select(F.col("id").cast("long")))
    assert len(store.versions()) == 3
    assert store.load_version(spark, 0).count() == 1
    assert store.load_version(spark, -1).count() == 3
    name1 = store.versions()[1]
    assert store.load_version(spark, name1).count() == 2
    dropped = store.gc_versions(keep=1)
    assert len(dropped) == 2
    assert len(store.versions()) == 1
    assert store.load_version(spark, -1).count() == 3
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.load_version(spark, name1)
