"""ANN quality probe: recall@k of each approximate method against the
brute-force cosine baseline, per query and averaged.

Speed without recall is meaningless for approximate search — this is
the quality half of the evidence (SCALE.md §4h notes the numbers).

Usage: PYTHONPATH=/root/repo python tools/ann_recall_probe.py [sf_dir]
Prints one RECALL line per method.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from gravitydb_spark.registry import REGISTRY, queries
    from gravitydb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann_recall_probe", shuffle_partitions=8)
    queries()

    def topk_sets(name: str) -> dict[int, set[int]]:
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r.q_id, set()).add(r.vec_id)
        return out

    truth = topk_sets("ann_cosine_topk")
    for name in ("ann_lsh_topk", "ann_lsh_multiprobe_topk",
                 "ann_ivf_topk", "ann_pq_topk",
                 "ann_pq_rerank_topk", "ann_ivfpq_topk",
                 "stream_ann_index_upkeep", "stream_ivfpq_index_upkeep"):
        got = topk_sets(name)
        per_q = []
        for q, t in sorted(truth.items()):
            g = got.get(q, set())
            per_q.append(len(g & t) / len(t))
        avg = sum(per_q) / len(per_q)
        detail = " ".join(f"q{q}={r:.2f}" for q, r in
                          zip(sorted(truth), per_q))
        print(f"RECALL {name}: avg={avg:.3f} ({detail})", flush=True)


if __name__ == "__main__":
    main()
