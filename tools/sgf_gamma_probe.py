"""Full-vocab skip-gram γ-scale probe (r12 VERDICT #3, SCALE.md §4o).

g_skipgram_full_embed trains on γ = _SGF_GAMMA = 2 walks per vertex (the
demo constant); production DeepWalk uses γ = 10-80. The plan is
corpus-linear by construction — walk frontier γ·n rows, window pair join
wid-keyed, epochs proportional to pairs — but r12 shipped that claim
unmeasured. This probe holds the GRAPH constant (one sf_dir) and times
the full train chain (walk corpus → window+edge pairs + rendezvous
negatives → _SG_EPOCHS exact-integer epochs) at γ ∈ {2, 8, 20}, via the
probe-only gamma override (memo bypassed; registered queries untouched).

Linear means wall(γ=20)/wall(γ=2) ≈ pairs(γ=20)/pairs(γ=2) — NOT 1
(more data is more work) and NOT quadratic in γ.

Usage: PYTHONPATH=/root/repo python tools/sgf_gamma_probe.py [sf_dir]
       (default sf0.01 — γ=20 at sf0.1 is ~10× the 40s bench wall)
Prints one PROBE line per γ with wall seconds, pair count, and the
Spark JOB count of the chain (the trained frame is localCheckpointed
per epoch, so its visible plan is a checkpoint scan; the job count is
the honest "no new shuffle rounds" witness — the chain must run the
SAME number of jobs at every γ, each over γ-proportionally more rows).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from gravitydb_spark import graph_queries as gq
    from gravitydb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="sgf_gamma_probe", shuffle_partitions=8)
    # warm the shared graph memos outside the timers (the γ=2 bench wall
    # includes them once per session; here every γ should isolate the
    # corpus+pairs+train cost)
    gq._trade_nbr_arr(spark, sf_dir).count()
    e0 = gq._sgf_e0(spark, sf_dir)
    nvd = gq._sgf_nvd(spark, sf_dir)
    sc = spark.sparkContext
    base = None
    for gamma in (2, 8, 20):
        ids0 = sc.statusTracker().getJobIdsForGroup()
        j0 = max(ids0) if ids0 else -1
        t0 = time.perf_counter()
        pairs = gq._sgf_pairs(spark, sf_dir, gamma=gamma)
        n_pairs = pairs.count()
        emb = gq._sg_train_epochs(pairs, e0, nvd)
        emb.count()
        wall = time.perf_counter() - t0
        ids1 = sc.statusTracker().getJobIdsForGroup()
        j1 = max(ids1) if ids1 else -1
        ratio = "" if base is None else f" wall_ratio={wall / base:.2f}"
        if base is None:
            base = wall
        print(
            f"PROBE sgf_gamma sf={os.path.basename(sf_dir)} gamma={gamma}"
            f" wall={wall:.1f}s pairs={n_pairs} jobs={j1 - j0}{ratio}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
