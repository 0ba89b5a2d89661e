"""Round-8 second-wave probes (SCALE.md §4h/§4j rows):

1. SQ8 recall@10 over 50 queries — a numpy replica of ann_sq8_topk's
   exact mid-bin dequant math (the operator itself is oracle-verified;
   this measures QUALITY at a query count the 5-query gate probe can't:
   memory/ann-measurement-pitfalls documents the 5-query noise bar).
2. Walls for the four second-wave ops at sf0.001 vs sf0.1 (flatness
   evidence: the walls are scheduling floors, not data costs).

Usage: PYTHONPATH=/root/repo python tools/r8_probe2.py
Prints PROBE/WALL lines.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sq8_recall(sf_dir: str, nq: int = 50) -> None:
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n, _d = E.shape
    mn, mx = E.min(0), E.max(0)
    span = mx - mn
    safe = np.where(span > 0, span, 1)
    codes = np.where(span > 0, np.floor((E - mn) * 254.0 / safe), 0)
    dq = mn + ((codes + 0.5) / 254.0) * span
    nrm = np.linalg.norm(E, axis=1)
    K, SHORT = 10, 50
    rec = []
    for q in range(nq):
        exact = (E @ E[q]) / (nrm * nrm[q])
        exact[q] = -np.inf
        truth = set(np.lexsort((np.arange(n), -exact))[:K])
        approx = dq @ E[q]
        approx[q] = -np.inf
        short = np.lexsort((np.arange(n), -approx))[:SHORT]
        got = set(short[np.lexsort((short, -exact[short]))][:K])
        rec.append(len(got & truth) / K)
    print(
        f"PROBE sq8 recall@10 over {nq} queries ({sf_dir}, n={n}):"
        f" avg={np.mean(rec):.3f} min={min(rec):.2f}",
        flush=True,
    )


def walls() -> None:
    from gravitydb_spark.registry import REGISTRY, queries
    from gravitydb_spark.session import get_spark

    queries()
    spark = get_spark(app_name="r8_probe2")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        for name in (
            "ann_sq8_topk",
            "mix_temperature_sample",
            "ann_recall_eval",
            "stream_kmeans_upkeep",
        ):
            t = time.time()
            n = REGISTRY[name].fn(spark, sf).count()
            print(
                f"WALL {name} @ {os.path.basename(sf)}:"
                f" {time.time() - t:.2f}s rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    sq8_recall("/root/testdata/sf0.01")
    walls()
