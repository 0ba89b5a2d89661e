"""Percolation guard-drift probe (r9 VERDICT directive #5 evidence).

Builds a corpus at index time, chooses guards (rarest term per standing
query), then DRIFTS the corpus: a large insert wave in which one
query's guard term became ubiquitous (the "everyone suddenly writes
about X" shape). Measures the candidate-set size of the guard-pruned
percolation join under the STALE guards vs after the re-guard trigger
(percolate_reguard_plan: one registry-sized agg comparing observed
guard corpus-rate vs at-build rate, factor 4), plus how many queries
re-guarded. Results are exact either way — this is the plan-cost
repair, and the probe quantifies the blow-up it prevents.

Usage: PYTHONPATH=/root/repo python tools/percolate_drift_probe.py
Prints PROBE lines for SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from gravitydb_spark.pipeline_queries import (
        _percolate_guard_map,
        percolate_reguard_plan,
    )
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="percolate_drift_probe", shuffle_partitions=16)

    for n_base in (5_000, 50_000):
        # build corpus: hash-spread vocabulary w0..w199, 8 tokens/doc;
        # the term 'surge' appears in ~0.2% of build docs (rare -> guard)
        base = spark.range(n_base).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(200)),
                    )
                    for i in range(8)
                ],
                F.when(F.col("id") % 500 == 0, F.lit("surge")).otherwise(
                    F.lit("pad")
                ),
            ).alias("text"),
        )
        qt = spark.createDataFrame(
            [(1, "surge", 2), (1, "w7", 2), (2, "w3", 2), (2, "w11", 2)],
            "query_id long, token string, n_terms int",
        )

        def toks(d):
            return d.select(
                "doc_id", F.explode(F.split("text", " ")).alias("token")
            ).distinct()

        guards0 = _percolate_guard_map(toks(base), qt)
        # drift wave: n_base new docs, 60% contain 'surge'
        wave = spark.range(n_base).select(
            (F.col("id") + n_base).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("u"),
                        F.pmod(F.xxhash64(F.col("id"), F.lit(i + 50)), F.lit(200)),
                    )
                    for i in range(8)
                ],
                F.when(F.col("id") % 5 < 3, F.lit("surge")).otherwise(
                    F.lit("pad")
                ),
            ).alias("text"),
        )
        now = base.unionByName(wave)
        toks_now = toks(now).localCheckpoint(eager=True)
        guards1, n_drifted = percolate_reguard_plan(
            toks_now, now.count(), qt, guards0, base.count()
        )

        def n_cand(gs):
            return (
                toks_now.join(
                    F.broadcast(gs.select("token").distinct()), "token"
                )
                .select("doc_id")
                .distinct()
                .count()
            )

        stale, repaired = n_cand(guards0), n_cand(guards1)
        print(
            f"PROBE percolate_drift n_docs={2 * n_base} drifted_queries="
            f"{n_drifted} candidates_stale={stale}"
            f" candidates_reguarded={repaired}"
            f" reduction={stale / max(repaired, 1):.1f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
