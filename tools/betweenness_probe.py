"""Sampled-betweenness rank-stability probe (r9 VERDICT directive #2
evidence).

On the sf0.001 customer–supplier trade graph (160 vertices — small
enough that EXACT betweenness, i.e. all-source Brandes, is computable
with the same engine code), measures how the top-k ranking of the
SAMPLED estimator (k smallest-custkey sources, the deterministic
selection g_betweenness_sampled derives) converges to the exact measure
as the source count scales — the evidence behind the Brandes–Pich
k = max(4, ⌊log₂ n⌋ // 4) derivation (_bc_num_sources).

Also prints the measured frontier-exhaustion depth per SF next to the
derived safety cap (_bc_depth_cap) — the cap never binds; it is the
runaway guard, and the oracle's static unroll is valid whenever it is
≥ the exhaustion depth.

Usage: PYTHONPATH=/root/repo python tools/betweenness_probe.py
Prints PROBE lines for SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = 20


def main() -> None:
    from pyspark.sql import functions as F

    from gravitydb_spark.graph_queries import _bc_depth_cap, _bc_num_sources
    from gravitydb_spark.operators.iterative import betweenness_scaled
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="betweenness_probe", shuffle_partitions=16)
    sf_dir = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    e = joined.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
    ).distinct()
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    n_verts, m_und = und.agg(
        F.countDistinct("a").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    cap = _bc_depth_cap(n_verts, m_und)
    print(
        f"PROBE betweenness sf0.001 n={n_verts} derived_k="
        f"{_bc_num_sources(n_verts)} depth_cap={cap}"
    )

    def top_ids(sources):
        bc = betweenness_scaled(und, sources, max_depth=cap + 2)
        return [
            r.id
            for r in bc.orderBy(F.desc("bc_scaled"), "id").limit(TOP).collect()
        ]

    exact = top_ids(und.select(F.col("a").alias("s")).distinct())
    ck = joined.select("o_custkey").distinct()
    for k in (4, 8, 16, 32):
        srcs = (
            ck.orderBy("o_custkey")
            .limit(k)
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("s")
            )
        )
        sampled = top_ids(srcs)
        overlap = len(set(exact) & set(sampled))
        print(
            f"PROBE betweenness sources=k{k} top{TOP}_overlap_vs_exact="
            f"{overlap}/{TOP} ({overlap / TOP:.2f})"
        )

    # --- sparse synthetic graph: where sampling actually discriminates ---
    # the trade graph is dense (d̄ ≈ 18) so k = 4 already nails the top-20;
    # a sparse hash-random graph (n = 400, d̄ ≈ 4) has real path diversity
    n = 400
    ids = spark.range(n)
    re = (
        ids.select(
            F.concat(F.lit("v"), F.pmod(F.xxhash64(F.col("id"), F.lit("a")), F.lit(n))).alias("a"),
            F.concat(F.lit("v"), F.pmod(F.xxhash64(F.col("id"), F.lit("b")), F.lit(n))).alias("b"),
        )
        .union(
            ids.select(
                F.concat(F.lit("v"), F.pmod(F.xxhash64(F.col("id"), F.lit("c")), F.lit(n))).alias("a"),
                F.concat(F.lit("v"), F.pmod(F.xxhash64(F.col("id"), F.lit("d")), F.lit(n))).alias("b"),
            )
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = re.unionByName(
        re.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    nv, mu = und.agg(
        F.countDistinct("a").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    cap = _bc_depth_cap(nv, mu)
    print(
        f"PROBE betweenness synth-sparse n={nv} m_und={mu} "
        f"derived_k={_bc_num_sources(nv)} depth_cap={cap}"
    )
    exact = top_ids(und.select(F.col("a").alias("s")).distinct())
    verts = und.select(F.col("a").alias("v")).distinct()
    for k in (4, 8, 16, 32, 64):
        srcs = (
            verts.orderBy(F.substring("v", 2, 10).cast("long"))
            .limit(k)
            .select(F.col("v").alias("s"))
        )
        sampled = top_ids(srcs)
        overlap = len(set(exact) & set(sampled))
        print(
            f"PROBE betweenness synth-sparse sources=k{k} "
            f"top{TOP}_overlap_vs_exact={overlap}/{TOP} ({overlap / TOP:.2f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
