"""Round-6 scale probe (SCALE.md §4h): the new operators at 1x vs 10x.

- ann_pq_topk / search_hybrid_rrf on a 10x-replicated corpus
  (pipeline_probe's builders: near-dup replicas, fresh ids) — checks the
  Arrow encode kernel and the RRF legs stay corpus-linear.
- layout_zorder_zonemap / g_cc_maintained on sf0.01 vs sf0.1 (a natural
  10x on every axis of the TPC-H tables).

Usage: PYTHONPATH=/root/repo python tools/r6_probe.py [base_sf_dir]
Prints PROBE lines; paste into SCALE.md §4h.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.pipeline_probe as pp
from tools.pipeline_probe import build_rep10_docs, build_rep10_emb, run


def main() -> None:
    from gravitydb_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    pp.REPLICAS = reps
    spark = get_spark(app_name="r6_probe", shuffle_partitions=32)
    out = f"/tmp/gravityspark_probe_r6_x{reps}"
    build_rep10_docs(spark, base, out)
    build_rep10_emb(spark, base, out)

    corpus_ops = [
        "ann_pq_topk",
        "search_hybrid_rrf",
        "ann_lsh_multiprobe_topk",
        "mix_token_budget",
    ]
    run(spark, base, "base", corpus_ops)
    run(spark, out, f"rep{reps}", corpus_ops)

    if reps == 10:
        tpch_ops = ["layout_zorder_zonemap", "g_cc_maintained"]
        run(spark, "/root/testdata/sf0.01", "sf0.01", tpch_ops)
        run(spark, "/root/testdata/sf0.1", "sf0.1", tpch_ops)


if __name__ == "__main__":
    main()
