"""Round-7 scale probes (SCALE.md §4i):

1. bpe_sampled_apply vs bpe_train_merges across corpus size (sf0.001 =
   500 docs, sf0.1 = 5,000 docs): sampled training is corpus-size-flat
   (fixed 64-doc sample) and the apply pass is one linear scan for ALL
   16 merges, while the exact trainer pays merges × corpus rewrites.
2. g_cc_maintained amortized compaction: per-batch bytes written to the
   relabel store, delta-sized except on every-Kth-batch folds (the
   store-level evidence lives in tests/test_cc_maintenance.py; this
   prints the query-level walls at two SFs).

Usage: PYTHONPATH=/root/repo python tools/r7_probe.py
Prints PROBE lines; paste-ready for SCALE.md.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gravitydb_spark.session import get_spark  # noqa: E402
from gravitydb_spark.registry import REGISTRY, queries  # noqa: E402

queries()  # populate REGISTRY (imports the query modules)


def main() -> None:
    spark = get_spark("r7_probe")
    for name in ("bpe_sampled_apply", "bpe_train_merges", "g_cc_maintained",
                 "g_cc_retractions", "ann_ivfpq_topk",
                 "stream_bm25_index_upkeep", "stream_ivfpq_index_upkeep",
                 "stream_join_maintained", "stream_join_retractions",
                 "quality_lr_train"):
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
            t0 = time.time()
            n = REGISTRY[name].fn(spark, sf_dir).count()
            print(
                f"PROBE {name} sf={sf_dir.rsplit('sf', 1)[1]} "
                f"rows={n} wall={time.time() - t0:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
