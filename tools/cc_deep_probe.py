"""Fat-forest fallback boundary probe (r9 VERDICT directive #4 evidence).

The CC spanning forest's BFS-tree rebuild is capped at _CC_BFS_ROUNDS
(64) Spark rounds; a repaired component whose diameter exceeds the cap
falls back to a FAT-but-spanning edge set (every live edge incident to
an unreached member). This probe constructs the worst case — a
PATH-SHAPED component (diameter = n) — splits it in the middle (a
forest-member delete → component-scoped recompute → BFS rebuild trips
the cap), and measures:

1. the repair wall (how much the capped BFS + fat append costs),
2. the fat fraction: folded forest rows vs live edges after the repair
   (a spanning TREE would be ~n-1 rows; the fat fallback approaches
   the full live edge set),
3. a subsequent delete in the fat region — degrades to recompute (the
   documented pre-forest behavior for deep components),
4. a subsequent non-tree delete in the SHALLOW (BFS-reached) region —
   must keep the O(batch) tombstone path even with a fat forest.

Usage: PYTHONPATH=/root/repo python tools/cc_deep_probe.py
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

    from gravitydb_spark.graph_queries import CCIvm, _CC_BFS_ROUNDS
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="cc_deep_probe", shuffle_partitions=16)

    for n in (5_000, 20_000):
        work = tempfile.mkdtemp(prefix="ccdeep_probe_")
        try:
            ivm = CCIvm(spark, work)
            # zero-padded vertex names keep lexicographic min == v0...0,
            # so BFS roots sit at the path ends after the split
            w = len(str(n))
            vid = lambda c: F.concat(F.lit("v"), F.lpad(c.cast("string"), w, "0"))  # noqa: E731
            backbone = spark.range(n - 1).select(
                vid(F.col("id")).alias("src"), vid(F.col("id") + 1).alias("dst")
            )
            # chords in the shallow region (within BFS reach of the root)
            # and in the deep tail (past the cap). Two parallel shallow
            # chords into v15: BFS reaches v15 first via the shorter
            # (9,15), so (10,15) stays NON-tree — a genuine redundant
            # edge inside the BFS-reached region
            chords = spark.createDataFrame(
                [(9, 15), (10, 15), (n - 100, n - 95)], "x long, y long"
            ).select(vid(F.col("x")).alias("src"), vid(F.col("y")).alias("dst"))
            ivm.insert_batch(backbone, 0)
            ivm.insert_batch(chords, 1)
            ivm.compact()

            def vs(i):
                return f"v{str(i).zfill(w)}"

            # split the path in the middle: forest member -> recompute;
            # both halves have diameter ~n/2 >> cap -> fat fallback
            t0 = time.time()
            ivm.delete_batch(
                spark.createDataFrame(
                    [(vs(n // 2), vs(n // 2 + 1))], "src string, dst string"
                ),
                2,
            )
            split_wall = time.time() - t0
            assert ivm.last_delete_stats["recomputed"] is True

            forest_rows = (
                ivm._fold_forest(ivm.forest.load(spark)).count()  # noqa: SLF001
            )
            live_edges = n - 1 + 3 - 1  # backbone + chords - deleted

            # delete in the deep (fat) region: fat member -> recompute
            t0 = time.time()
            ivm.delete_batch(
                spark.createDataFrame(
                    [(vs(n - 100), vs(n - 95))], "src string, dst string"
                ),
                3,
            )
            deep_wall = time.time() - t0
            deep_recomputed = ivm.last_delete_stats["recomputed"]

            # delete in the shallow region: chord v10-v15 is within BFS
            # reach; if the rebuilt tree didn't take it, absence from the
            # forest keeps the O(batch) path despite the fat tail
            t0 = time.time()
            ivm.delete_batch(
                spark.createDataFrame(
                    [(vs(10), vs(15))], "src string, dst string"
                ),
                4,
            )
            shallow_wall = time.time() - t0
            shallow_recomputed = ivm.last_delete_stats["recomputed"]

            print(
                f"PROBE cc_deep path n={n} cap={_CC_BFS_ROUNDS}:"
                f" split_repair={split_wall:.1f}s"
                f" forest_rows={forest_rows} live_edges={live_edges}"
                f" fat_fraction={forest_rows / live_edges:.2f}"
                f" deep_delete={deep_wall:.1f}s(recompute={deep_recomputed})"
                f" shallow_delete={shallow_wall:.1f}s"
                f"(recompute={shallow_recomputed})",
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
