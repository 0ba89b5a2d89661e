"""Round-12 operators and guards.

Covers the r11 ADVICE closures and the r12 VERDICT directives as they
land:
- _maybe_broadcast's debug-mode bound assertion (ADVICE #4): a stale or
  wrong caller-supplied row bound must fail loudly under
  GRAVITYSPARK_DEBUG_BCAST=1 instead of silently reintroducing the
  driver-OOM hint.
"""

import os

import pytest
import pyspark.sql.functions as F

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY (lazy module loading)


def test_retractions_by_id_bloom_prunes_unknown_ids(spark, sf_dir):
    """The keymap's id-Bloom pre-filter (r11 VERDICT #4): the forget
    feed carries never-seen mirror ids; every one of them must be
    bloom-pruned before the keymap probe (no keymap rows exist for
    them), the surviving set must cover all REAL forgotten ids (no
    false negatives — admission is oracle-pinned e2e), and the kb
    bucket list must shrink. Batches 0/2 are insert-only (no probe)."""
    from gravitydb_spark import pipeline_queries as pq

    pq._retractid_probe.clear()
    pq._retractid_probe["enabled"] = True
    try:
        REGISTRY["stream_dedup_retractions_by_id"].fn(spark, sf_dir).count()
        stats = {
            k: v for k, v in pq._retractid_probe.items() if k != "enabled"
        }
    finally:
        pq._retractid_probe.clear()
    assert set(stats) == {0, 1, 2}
    assert stats[0]["ids"] == 0 and stats[2]["ids"] == 0
    d = stats[1]
    # half the feed is the never-existing mirror set: pruned down to
    # the real ids (+ a tiny false-positive allowance — fpp 2^-7 over
    # ~50 unknown ids; measured 0 at sf0.001/0.01/0.1)
    real = d["ids"] // 2
    assert real <= d["maybe"] <= real + 3
    assert d["kbs_pruned"] < d["kbs_all"]


def test_maybe_broadcast_debug_guard(spark):
    from gravitydb_spark import graph_queries as gq

    df = spark.range(100).select(F.col("id"))
    os.environ["GRAVITYSPARK_DEBUG_BCAST"] = "1"
    try:
        # correct bound: passes and returns a hinted frame
        out = gq._maybe_broadcast(df, 100)
        assert out.count() == 100
        # stale bound (claims fewer rows than the frame has): asserts
        with pytest.raises(AssertionError, match="bound violated"):
            gq._maybe_broadcast(df, 10)
    finally:
        os.environ.pop("GRAVITYSPARK_DEBUG_BCAST", None)
    # guard off: no count job, no assert, hint applied below the limit
    assert gq._maybe_broadcast(df, 10).count() == 100
