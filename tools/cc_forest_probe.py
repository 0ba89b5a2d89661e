"""CC delete-repair forest probe (r8 VERDICT directive #3 evidence).

Builds a GIANT COMPONENT (path backbone of N nodes => the worst case the
r7 SCALE.md boundary documented: any split touches the whole component)
plus chord edges, drives the REAL CCIvm machinery, and measures:

1. non-tree delete (a chord): must take the O(batch) path — no member
   discovery, no recompute, no label append — wall ~independent of N;
2. tree delete (a backbone edge): the component-scoped recompute the
   boundary always cost — wall grows with N.

The ratio is the directive's "non-tree deletes cost ~0 repair" row.

Usage: PYTHONPATH=/root/repo python tools/cc_forest_probe.py
Prints PROBE lines for SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from gravitydb_spark.graph_queries import CCIvm
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="cc_forest_probe", shuffle_partitions=16)

    for n in (10_000, 50_000):
        work = tempfile.mkdtemp(prefix="ccforest_probe_")
        try:
            ivm = CCIvm(spark, work)
            # backbone path v0-v1-...-v{n-1} (ONE giant component) in
            # batch 0; chords v_i - v_{i+100} for i % 1000 == 0 in
            # batch 1 (they land inside the component -> non-forest)
            backbone = spark.range(n - 1).select(
                F.concat(F.lit("v"), F.col("id")).alias("src"),
                F.concat(F.lit("v"), F.col("id") + 1).alias("dst"),
            )
            chords = spark.range(0, n - 200, 1000).select(
                F.concat(F.lit("v"), F.col("id")).alias("src"),
                F.concat(F.lit("v"), F.col("id") + 100).alias("dst"),
            )
            t0 = time.time()
            ivm.insert_batch(backbone, 0)
            ivm.insert_batch(chords, 1)
            ivm.compact()
            build_wall = time.time() - t0

            # non-tree delete: one chord
            t0 = time.time()
            ivm.delete_batch(
                spark.createDataFrame(
                    [("v0", "v100")], "src string, dst string"
                ),
                2,
            )
            nontree_wall = time.time() - t0
            assert ivm.last_delete_stats["recomputed"] is False, (
                ivm.last_delete_stats
            )

            # tree delete: one backbone edge deep in the component
            # (v500-v501 sits between two chords, so the component does
            # NOT split — but the repair can't know that without the
            # component-scoped recompute)
            t0 = time.time()
            ivm.delete_batch(
                spark.createDataFrame(
                    [("v500", "v501")], "src string, dst string"
                ),
                3,
            )
            tree_wall = time.time() - t0
            assert ivm.last_delete_stats["recomputed"] is True

            print(
                f"PROBE cc_forest giant_component n={n}: build={build_wall:.1f}s"
                f" nontree_delete={nontree_wall:.2f}s"
                f" tree_delete={tree_wall:.1f}s"
                f" ratio={tree_wall / max(nontree_wall, 1e-9):.0f}x",
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
