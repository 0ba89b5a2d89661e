"""Amortized relabel-table maintenance for g_cc_maintained (r6 VERDICT
#2): eager per-batch path compression rewrote the WHOLE view every edge
batch — O(view) per trigger. The fix appends batch-sized relabel deltas,
pays the view-sized pointer-doubling flatten once per
``_CC_COMPACT_EVERY`` deltas, and pointer-CHASES probes through the
(bounded-depth) uncompacted chains with every round's scan pruned to
the frontier roots' buckets.

These tests drive the exact store shape the query's on_edges handler
uses (the test_streaming_dedup_buckets handle_like pattern) and assert:

- chains across uncompacted deltas resolve to the true current root;
- per-batch bytes WRITTEN track the batch's delta, not the view, on
  non-compaction batches;
- the chase's per-round scan carries a pb PartitionFilter.
"""

import os

from pyspark.sql import functions as F

from gravitydb_spark.graph_queries import _CC_COMPACT_EVERY
from gravitydb_spark.transaction import DatasetStore

NB = 8


def _bucket(col):
    return F.pmod(F.xxhash64(col), F.lit(NB)).cast("int")


def _compress(df):
    cur = df.groupBy("node").agg(F.min("root").alias("root"))
    for _ in range(4):
        r2 = cur.select(
            F.col("node").alias("r_node"), F.col("root").alias("r_root")
        )
        cur = cur.join(r2, cur["root"] == r2["r_node"], "left").select(
            "node", F.coalesce("r_root", "root").alias("root")
        )
    return cur.withColumn("pb", _bucket(F.col("node")))


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _chase(spark, merges, vals):
    """The query's bounded pointer-chase, verbatim shape."""
    cur = vals.select("v", F.col("v").alias("root")).localCheckpoint(eager=True)
    for _ in range(len(merges.snapshots())):
        buckets = [
            r.pb
            for r in cur.select(_bucket(F.col("root")).alias("pb"))
            .distinct()
            .collect()
        ]
        m = merges.load(spark, where=F.col("pb").isin(buckets))
        if m is None:
            break
        step = (
            cur.join(
                m.select(
                    F.col("node").alias("root"), F.col("root").alias("nroot")
                ),
                "root",
                "left",
            )
            .select("v", "root", "nroot")
            .localCheckpoint(eager=True)
        )
        if step.filter(F.col("nroot").isNotNull()).limit(1).count() == 0:
            break
        cur = step.select(
            "v", F.coalesce("nroot", "root").alias("root")
        ).localCheckpoint(eager=True)
    return cur


def test_chase_resolves_uncompacted_chains(spark, tmp_path):
    """Three merge batches build the chain 5 -> 3 -> 1 WITHOUT any
    compaction; probing 5 (and 7, linked to 5 afterwards) must chase to
    the true root 1 — the depth bound is the delta count."""
    merges = DatasetStore(str(tmp_path / "m"), partition_cols=("pb",))
    for node, root in ((5, 3), (3, 1)):
        merges.append(
            spark.createDataFrame(
                [(str(node), str(root))], "node string, root string"
            ).withColumn("pb", _bucket(F.col("node")))
        )
    assert len(merges.snapshots()) == 2  # chains live, nothing folded
    roots = {
        r["v"]: r["root"]
        for r in _chase(
            spark, merges, spark.createDataFrame([("5",), ("7",)], "v string")
        ).collect()
    }
    assert roots == {"5": "1", "7": "7"}


def test_per_batch_write_tracks_delta_not_view(spark, tmp_path):
    """Drive K+1 merge batches against a PRE-SEEDED view-sized relabel
    table: non-compaction batches must write bytes proportional to the
    one-row delta (far below the seeded table), and exactly one batch
    in the window pays the fold."""
    merges = DatasetStore(str(tmp_path / "m"), partition_cols=("pb",))
    # the standing view: 400 already-flat relabels
    seed = (
        spark.range(2, 402)
        .select(
            F.concat(F.lit("n"), F.col("id")).alias("node"),
            F.lit("n1").alias("root"),
        )
        .withColumn("pb", _bucket(F.col("node")))
    )
    merges.append(seed)
    merges.compact(spark, min_deltas=1, transform=_compress)
    view_bytes = _dir_bytes(str(tmp_path / "m"))

    per_batch_bytes = []
    compactions = 0
    for b in range(_CC_COMPACT_EVERY + 1):
        before = _dir_bytes(str(tmp_path / "m"))
        snaps_before = len(merges.snapshots())
        delta = spark.createDataFrame(
            [(f"x{b}", "n1")], "node string, root string"
        ).withColumn("pb", _bucket(F.col("node")))
        merges.append(delta)
        merges.compact(spark, min_deltas=_CC_COMPACT_EVERY, transform=_compress)
        if len(merges.snapshots()) < snaps_before + 1:
            compactions += 1
        per_batch_bytes.append(_dir_bytes(str(tmp_path / "m")) - before)

    assert compactions == 1  # exactly one fold in the K+1 window
    # every non-compaction batch wrote a one-row delta: well under the
    # standing view's bytes (parquet per-file overhead dominates a
    # one-row delta, so compare against the 400-row view, not zero)
    small = sorted(per_batch_bytes)[: _CC_COMPACT_EVERY]
    assert all(bts < view_bytes / 2 for bts in small), (
        per_batch_bytes,
        view_bytes,
    )
    # the final view is still correct after the mixed window
    folded = {
        r["node"]: r["root"] for r in _compress(merges.load(spark)).collect()
    }
    assert folded[f"x{_CC_COMPACT_EVERY}"] == "n1"
    assert len(folded) == 400 + _CC_COMPACT_EVERY + 1


def test_chase_scan_is_partition_pruned(spark, tmp_path):
    """Every chase round's store read must land a pb PartitionFilter in
    the parquet scan (the r5 contract, preserved by the r7 amortized
    rewrite)."""
    merges = DatasetStore(str(tmp_path / "m"), partition_cols=("pb",))
    merges.append(
        spark.createDataFrame(
            [("5", "3"), ("3", "1")], "node string, root string"
        ).withColumn("pb", _bucket(F.col("node")))
    )
    plan = (
        merges.load(spark, where=F.col("pb").isin([0, 3]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "pb" in plan.split("PartitionFilters")[1][:120]


def _labels_map(ivm):
    df = ivm.flat_labels()
    return {} if df is None else {r.id: r.component for r in df.collect()}


def test_ccivm_forest_skips_recompute_on_nontree_delete(spark, tmp_path):
    """r8 VERDICT directive #3, the O(1) path: CCIvm maintains a
    spanning forest; deleting a CYCLE edge (redundant by construction)
    must take the tombstone-only path — no member discovery, no
    component recompute, no label append — and deleting a BRIDGE must
    still split correctly."""
    from gravitydb_spark.graph_queries import CCIvm

    ivm = CCIvm(spark, str(tmp_path / "ccivm"))
    # batch 0: a 4-cycle a-b-c-d-a plus a pendant bridge d-e
    ivm.insert_batch(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("d", "e")],
            "src string, dst string",
        ),
        0,
    )
    ivm.compact()
    lab0 = _labels_map(ivm)
    assert len({lab0.get(v, v) for v in "abcde"}) == 1  # one component

    # batch 1: insert the chord b-d — lands INSIDE the component
    # (pre-batch roots equal), so it must NOT enter the forest
    ivm.insert_batch(
        spark.createDataFrame([("b", "d")], "src string, dst string"), 1
    )
    snaps_before = len(ivm.labels.snapshots())
    # batch 2: delete the chord — non-forest, O(batch): stats say no
    # recompute and the labels store got NO new snapshot
    ivm.delete_batch(
        spark.createDataFrame([("b", "d")], "src string, dst string"), 2
    )
    assert ivm.last_delete_stats == {"deleted": 1, "tree": 0, "recomputed": False}
    assert len(ivm.labels.snapshots()) == snaps_before
    assert _labels_map(ivm) == lab0  # labels untouched

    # batch 3: delete a CYCLE edge (a-b). It IS a forest representative
    # (inserted when endpoints had distinct roots), so the repair runs —
    # but the component survives via the rest of the cycle
    ivm.delete_batch(
        spark.createDataFrame([("a", "b")], "src string, dst string"), 3
    )
    assert ivm.last_delete_stats["recomputed"] is True
    lab3 = _labels_map(ivm)
    assert len({lab3.get(v, v) for v in "abcde"}) == 1  # still connected

    # the repair rebuilt the touched component's forest as a BFS tree;
    # surviving cycle edges that are now non-tree take the O(1) path:
    # after the rebuild the 4 surviving edges of {a,b,c,d,e} form a
    # tree (4 nodes' parents), so ONE of the former cycle edges may
    # remain tree — delete a bridge next and assert the split
    ivm.delete_batch(
        spark.createDataFrame([("d", "e")], "src string, dst string"), 4
    )
    assert ivm.last_delete_stats["recomputed"] is True  # pendant = bridge
    lab4 = _labels_map(ivm)
    comps = {lab4.get(v, v) for v in "abcd"}
    assert len(comps) == 1
    assert lab4.get("e", "e") not in comps  # e split off


def test_ccivm_forest_rebuild_thins_batch_cycles(spark, tmp_path):
    """Edges of a cycle inserted in ONE batch all enter the forest
    (each connects distinct pre-batch roots); the first repair rebuilds
    the touched component's forest as a BFS tree, after which deleting
    a non-tree survivor is O(batch)."""
    from gravitydb_spark.graph_queries import CCIvm

    ivm = CCIvm(spark, str(tmp_path / "ccivm2"))
    tri = [("x", "y"), ("y", "z"), ("x", "z")]
    ivm.insert_batch(
        spark.createDataFrame(tri, "src string, dst string"), 0
    )
    # all three entered the forest: deleting x-y triggers a repair
    ivm.delete_batch(
        spark.createDataFrame([("x", "y")], "src string, dst string"), 1
    )
    assert ivm.last_delete_stats["recomputed"] is True
    # the rebuilt forest is a BFS tree of the surviving path y-z-x:
    # both survivors are tree edges now; re-insert x-y (intra-component
    # -> non-forest) and delete it again: O(batch)
    ivm.insert_batch(
        spark.createDataFrame([("x", "y")], "src string, dst string"), 2
    )
    ivm.delete_batch(
        spark.createDataFrame([("x", "y")], "src string, dst string"), 3
    )
    assert ivm.last_delete_stats == {"deleted": 1, "tree": 0, "recomputed": False}
    lab = _labels_map(ivm)
    assert len({lab.get(v, v) for v in "xyz"}) == 1


def test_ccivm_deep_component_fallback_keeps_forest_spanning(spark, tmp_path):
    """The BFS-tree rebuild is capped at _CC_BFS_ROUNDS; a repaired
    component DEEPER than the cap must fall back to the fat-but-
    spanning forest (every live edge touching the unreached tail), or
    absence-from-forest would stop proving redundancy and a later
    bridge delete could be silently skipped. Build a path longer than
    the cap, split it (repair engages the fallback), then delete a
    TAIL edge — it must classify as a forest member (recompute), and
    the labels must stay correct through both splits."""
    from gravitydb_spark.graph_queries import _CC_BFS_ROUNDS, CCIvm

    n = _CC_BFS_ROUNDS + 40  # path deeper than the rebuild cap
    ivm = CCIvm(spark, str(tmp_path / "ccdeep"))
    path = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n)]
    ivm.insert_batch(
        spark.createDataFrame(path, "src string, dst string"), 0
    )
    # split near the head: the surviving tail component (~n nodes) is
    # deeper than the cap from its new root, so the fallback must admit
    # the unreached tail's edges into the forest
    ivm.delete_batch(
        spark.createDataFrame([("v005", "v006")], "src string, dst string"), 1
    )
    assert ivm.last_delete_stats["recomputed"] is True
    lab = _labels_map(ivm)
    head = {lab.get(f"v{i:03d}", f"v{i:03d}") for i in range(6)}
    tail = {lab.get(f"v{i:03d}", f"v{i:03d}") for i in range(6, n + 1)}
    assert len(head) == 1 and len(tail) == 1 and head != tail

    # a deep-tail edge: under an eagerly-capped (non-spanning) forest it
    # would be absent -> wrongly "redundant"; the fallback keeps it a
    # member, so this delete takes the recompute path and splits again
    deep = (f"v{n - 10:03d}", f"v{n - 9:03d}")
    ivm.delete_batch(
        spark.createDataFrame([deep], "src string, dst string"), 2
    )
    assert ivm.last_delete_stats["recomputed"] is True
    lab2 = _labels_map(ivm)
    mid = {lab2.get(f"v{i:03d}", f"v{i:03d}") for i in range(6, n - 10 + 1)}
    end = {lab2.get(f"v{i:03d}", f"v{i:03d}") for i in range(n - 9, n + 1)}
    assert len(mid) == 1 and len(end) == 1 and mid != end


def test_chase_and_members_match_full_store_reference(spark, tmp_path):
    """r13 ADVICE: the fused bucket-collect loops (chase/members_of use
    each round's advanced-root bucket list as BOTH the emptiness probe
    and the next pruned-load filter) must read every row the old
    probe-then-full-bucket-list plan read. Direct check on a store with
    MULTI-HOP UNCOMPACTED chains spanning several buckets: a path grown
    one edge per batch with NO compaction stacks relabel deltas whose
    root pointers hop buckets, and chase/members_of must agree with a
    driver-side reference computed from the FULL label log."""
    from gravitydb_spark.graph_queries import CCIvm

    ivm = CCIvm(spark, str(tmp_path / "ccchase"))
    verts = [f"n{i}" for i in range(8)]
    for b in range(7):
        # each batch merges the growing chain with one new vertex —
        # every batch's cc_labels relabel points an OLD root at a NEW
        # one, so the uncompacted log holds a multi-hop pointer chain
        ivm.insert_batch(
            spark.createDataFrame(
                [(verts[b], verts[b + 1])], "src string, dst string"
            ),
            b,
        )
    assert len(ivm.labels.snapshots()) >= 5  # genuinely uncompacted

    # driver-side reference: max-ep row per node over the FULL log,
    # then chase pointers to fixpoint in plain Python
    rows = ivm.labels.load(spark).collect()
    cur = {}
    for r in rows:
        if r.node not in cur or r.ep > cur[r.node][1]:
            cur[r.node] = (r.root, r.ep)
    mapping = {n: v[0] for n, v in cur.items()}

    def ref_root(v):
        while v in mapping and mapping[v] != v:
            v = mapping[v]
        return v

    expect = {v: ref_root(v) for v in verts}
    assert len(set(expect.values())) == 1  # one component by design

    got = {
        r.v: r.root
        for r in ivm.chase(
            spark.createDataFrame([(v,) for v in verts], "v string")
        ).collect()
    }
    assert got == expect

    # members_of(final root) over the same uncompacted chains must
    # recover every chain member exactly
    root = next(iter(expect.values()))
    members = {
        r.node
        for r in ivm.members_of(
            spark.createDataFrame([(root,)], "root string")
        ).collect()
    }
    assert members == set(verts)
