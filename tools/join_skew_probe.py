"""Skewed-key probe for the delta-join IVM (r7 VERDICT directive #6):
a celebrity okey concentrates ΔL in one kb bucket, and the
O_state ⋈ ΔL probe inherits the skew. Two measurements:

1. END-TO-END WALL: stream_join_maintained on equal-volume balanced vs
   celebrity corpora (50% of all lineitems on ONE okey) in /tmp — the
   equal-volume discipline from the r5 window-skew probe.
2. PLAN EVIDENCE for the state-probe join itself, outside the stream:
   with the default config the pruned state side broadcasts (skew on
   the probe side is free under BHJ — probe rows never co-locate); with
   broadcast disabled (forcing the 100 TB shape where pruned state
   exceeds the threshold) the executed AQE plan must show the
   skew-join split (``skew=true``) on the sort-merge join.

Usage: PYTHONPATH=/root/repo python tools/join_skew_probe.py [base_sf_dir]
Prints PROBE lines for SCALE.md §4i.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_ORDERS = 2_000
N_ITEMS = 120_000


def build(spark, out: str, skew: bool) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    spark.range(1, N_ORDERS + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 500).alias("o_custkey"),
    ).coalesce(4).write.parquet(f"{out}/orders.parquet")
    items = spark.range(N_ITEMS)
    if skew:
        # 50% of ALL items on okey 1; the rest uniform
        okey = F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(
            F.pmod(F.col("id"), F.lit(N_ORDERS)) + 1
        )
    else:
        okey = F.pmod(F.col("id"), F.lit(N_ORDERS)) + 1
    items.select(
        okey.alias("l_orderkey"),
        (F.col("id") % 97 + 1.0).alias("l_extendedprice"),
        (F.col("id") % 7).alias("l_linenumber"),
    ).coalesce(8).write.parquet(f"{out}/lineitem.parquet")


def main() -> None:
    from gravitydb_spark.pipeline_queries import _SJM_KB, stream_join_maintained
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="join_skew_probe", shuffle_partitions=32)
    work = "/tmp/join_skew_probe"
    walls = {}
    for tag in ("balanced", "celebrity"):
        d = os.path.join(work, tag)
        build(spark, d, skew=(tag == "celebrity"))
        t0 = time.time()
        n = stream_join_maintained(spark, d).count()
        walls[tag] = time.time() - t0
        print(f"PROBE join_skew {tag}: n_groups={n} wall={walls[tag]:.1f}s",
              flush=True)
    print(f"PROBE join_skew ratio celebrity/balanced = "
          f"{walls['celebrity'] / walls['balanced']:.2f}", flush=True)

    # ---- plan evidence on the state-probe join shape ----------------
    # celebrity ΔL (one kb bucket) against an order state relation
    dL = spark.read.parquet(f"{work}/celebrity/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    o_state = spark.read.parquet(f"{work}/celebrity/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), "o_custkey"
    ).withColumn("kb", F.pmod(F.xxhash64("okey"), F.lit(_SJM_KB)).cast("int"))

    def probe_plan():
        j = dL.join(o_state.select("okey", "o_custkey"), "okey").groupBy(
            "o_custkey"
        ).agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
        j.collect()  # AQE finalizes the plan only after execution
        return j._jdf.queryExecution().executedPlan().toString()

    p = probe_plan()
    print(f"PROBE join_skew default_plan: BroadcastHashJoin="
          f"{'BroadcastHashJoin' in p}", flush=True)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = probe_plan()
        print(f"PROBE join_skew forced_smj_plan: SortMergeJoin="
              f"{'SortMergeJoin' in p} skew_split={'skew=true' in p}"
              f" (celebrity partition below the 256MB default threshold —"
              f" no split NEEDED at probe scale)", flush=True)
        # scale proxy: at 100 TB the celebrity partition dwarfs the
        # threshold; lower the thresholds to probe-scale to show the
        # split mechanism ENGAGES on this exact join shape
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        p = probe_plan()
        print(f"PROBE join_skew scaled_threshold_plan: "
              f"skew_split={'skew=true' in p}", flush=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
