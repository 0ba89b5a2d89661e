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
                 "ann_pq_rerank_topk", "ann_ivfpq_topk", "ann_sq8_topk",
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

    # ---- ADC-only (pre-re-rank) code quality: raw vs residual -------
    # Same trained coarse cells, same probes — the ONLY difference is
    # what the PQ codes encode (raw vector vs residual). This is the
    # honest measure that residual encoding improved the codes, not the
    # re-rank tail (r7 VERDICT directive #2).
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from gravitydb_spark.pipeline_queries import (
        ANN_K, ANN_N_QUERIES, PQ_M, _ivfpq_kernels, _ivfpq_model,
        _pq_adc_score_expr, _pq_code_frames, load,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents, book = _ivfpq_model(spark, sf_dir)
    encode, probe, lut = _ivfpq_kernels(cents, book)
    import pyspark.sql.types as T
    codes_schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("cell", T.IntegerType())]
        + [T.StructField(f"pos{m}", T.IntegerType()) for m in range(PQ_M)]
    )
    lut_schema = T.StructType(
        [T.StructField("q_id", T.LongType())]
        + [T.StructField(f"lut{m}", T.ArrayType(T.LongType()))
           for m in range(PQ_M)]
    )
    rcodes = emb.select("vec_id", "embedding").mapInPandas(
        encode, codes_schema).cache()
    qemb = emb.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        "vec_id", "embedding")
    probes = qemb.mapInPandas(probe, "q_id long, cell int, qcdot long")
    rqlut = qemb.mapInPandas(lut, lut_schema)
    w = Window.partitionBy("q_id").orderBy(
        F.desc("score_scaled"), F.asc("vec_id"))

    def adc_recall(scored) -> float:
        rows = (scored.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= ANN_K).collect())
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.vec_id)
        return sum(len(got.get(q, set()) & t) / len(t)
                   for q, t in sorted(truth.items())) / len(truth)

    residual = (
        rcodes.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(rqlut), "q_id")
        .select("q_id", "vec_id",
                (F.col("qcdot") + _pq_adc_score_expr())
                .cast("long").alias("score_scaled"))
    )
    print(f"RECALL adc_only_residual_in_cells: avg={adc_recall(residual):.3f}",
          flush=True)
    raw_codes, raw_qlut = _pq_code_frames(spark, sf_dir)
    raw = (
        raw_codes.join(rcodes.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(probes.select("q_id", "cell")), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(raw_qlut), "q_id")
        .select("q_id", "vec_id",
                _pq_adc_score_expr().cast("long").alias("score_scaled"))
    )
    print(f"RECALL adc_only_raw_pq_in_cells: avg={adc_recall(raw):.3f}",
          flush=True)
    rcodes.unpersist()


if __name__ == "__main__":
    main()
