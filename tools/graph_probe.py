"""Graph-side scale & skew probe (SCALE.md §4c).

Builds two synthetic stress corpora from sf0.1 in /tmp and measures the
graph operators on them vs the base:

- **rep10**: customers and suppliers replicated 10× (fresh keys, fresh
  payload names so content-addressed property dedup doesn't collapse
  them) — every nation's degree grows 10×, vertex count ~10×.
- **skew**: sf0.1 plus 30,000 extra customers ALL in nation 0 — one
  celebrity vertex with ~50× the median degree (the web-graph hub case).

Usage: PYTHONPATH=/root/repo python tools/graph_probe.py [base_sf_dir]

Prints one line per (dataset, operator) with wall seconds and result
rows; paste the table into SCALE.md §4c. The graph build (bulk ingest +
cache) is warmed OUTSIDE the timers so numbers isolate operator cost.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10
KEY_STRIDE = 10_000_000
CELEB_EXTRA = 30_000
CELEB_NATION = 0

OPS = [
    "g_two_hop",
    "g_motif_2hop",
    "g_degrees",
    "g_connected_components",
    "g_pagerank",
    "g_sssp_weighted",
    "g_kcore_onion",
    # round 10: LPA communities + random-walk corpus (both on the
    # customer–supplier trade graph, so rep10/skew stress them directly),
    # plus the two new sketches (rep10 gives 10x the member/probe keys)
    "g_label_propagation",
    "g_random_walks",
    # round 11: skip-gram training + serving over the walk corpus
    # (log-derived walk count — expect flat walls at 10x)
    "g_skipgram_embed",
    "g_skipgram_knn",
    "sketch_bloom_membership",
    "sketch_theta_intersect",
]


def build_rep10(spark, base: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ("nation", "region"):
        spark.read.parquet(f"{base}/{t}.parquet").write.parquet(f"{out}/{t}.parquet")
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    c = spark.read.parquet(f"{base}/customer.parquet")
    (
        c.crossJoin(reps)
        .select(
            (F.col("c_custkey") + F.col("rep") * KEY_STRIDE).alias("c_custkey"),
            F.concat_ws("_r", "c_name", F.col("rep").cast("string")).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        .coalesce(8)
        .write.parquet(f"{out}/customer.parquet")
    )
    s = spark.read.parquet(f"{base}/supplier.parquet")
    (
        s.crossJoin(reps)
        .select(
            (F.col("s_suppkey") + F.col("rep") * KEY_STRIDE).alias("s_suppkey"),
            F.concat_ws("_r", "s_name", F.col("rep").cast("string")).alias("s_name"),
            "s_nationkey",
            "s_acctbal",
        )
        .coalesce(4)
        .write.parquet(f"{out}/supplier.parquet")
    )
    # orders/lineitem replicated with strided keys → the customer–supplier
    # trade graph (g_kcore_onion) becomes 10 disjoint copies: identical
    # per-copy degree distribution, 10× the peel work
    o = spark.read.parquet(f"{base}/orders.parquet")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * KEY_STRIDE).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * KEY_STRIDE).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .coalesce(8)
        .write.parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    others = [c for c in li.columns if c not in ("l_orderkey", "l_suppkey")]
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * KEY_STRIDE).alias("l_orderkey"),
            (F.col("l_suppkey") + F.col("rep") * KEY_STRIDE).alias("l_suppkey"),
            *others,
        )
        .coalesce(16)
        .write.parquet(f"{out}/lineitem.parquet")
    )


def build_skew(spark, base: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ("nation", "region", "supplier"):
        spark.read.parquet(f"{base}/{t}.parquet").write.parquet(f"{out}/{t}.parquet")
    c = spark.read.parquet(f"{base}/customer.parquet")
    celebs = spark.range(CELEB_EXTRA).select(
        (F.col("id") + 5 * KEY_STRIDE).alias("c_custkey"),
        F.concat(F.lit("Celeb#"), F.col("id").cast("string")).alias("c_name"),
        F.lit(CELEB_NATION).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CELEBRITY").alias("c_mktsegment"),
    )
    c.unionByName(celebs).coalesce(8).write.parquet(f"{out}/customer.parquet")
    # orders unchanged; lineitem doubled with every duplicate pointing at
    # supplier 1 → one celebrity supplier adjacent to ~every customer
    # (hub-degree stress for the kcore peel's degree agg + semi-joins)
    spark.read.parquet(f"{base}/orders.parquet").write.parquet(
        f"{out}/orders.parquet"
    )
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    hub = li.withColumn("l_suppkey", F.lit(1).cast("long"))
    li.unionByName(hub).coalesce(16).write.parquet(f"{out}/lineitem.parquet")


def run(spark, sf_dir: str, label: str) -> None:
    from gravitydb_spark import graph_queries
    from gravitydb_spark.operators.iterative import triangle_counts
    from gravitydb_spark.registry import REGISTRY, queries

    queries()  # load ALL query modules (the sketch ops live in pipeline)

    g = graph_queries.tpch_graph(spark, sf_dir)
    g.vertices.count(), g.edges.count()  # warm the ingest+cache

    for name in OPS:
        t0 = time.monotonic()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        print(f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows", flush=True)

    # triangle_counts has no standalone gate query over the tpch graph
    # (the graph is a forest — 0 triangles); time the wedge machinery anyway
    t0 = time.monotonic()
    n = triangle_counts(g.edges).count()
    print(f"PROBE {label} triangle_counts: {time.monotonic() - t0:.1f}s {n} rows", flush=True)


def main() -> None:
    from gravitydb_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="graph_probe")
    rep10, skew = "/tmp/gprobe_rep10", "/tmp/gprobe_skew"
    build_rep10(spark, base, rep10)
    build_skew(spark, base, skew)
    for label, d in (("1x", base), (f"{REPLICAS}x", rep10), ("skew", skew)):
        run(spark, d, label)


if __name__ == "__main__":
    main()
