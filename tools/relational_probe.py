"""Relational-side scale probe (SCALE.md §4e): replicate the TPC-H facts
10× (orders + lineitem, fresh orderkeys; dimensions unchanged — facts grow,
dimensions don't) and measure the headline relational plans on base vs 10×.
Dimension tables are symlinked from the base sf dir, so the probe corpus is
a real sf_dir any registered query can run against.

Usage: PYTHONPATH=/root/repo python tools/relational_probe.py [base_sf_dir]

Prints one PROBE line per (dataset, query); paste into SCALE.md §4e.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10
KEY_STRIDE = 1_000_000_000

QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "q2_min_cost_supply",
    "data_quality_audit",
    "topk_parts_by_quantity",
]

DIMS = ["region", "nation", "customer", "supplier", "part",
        "documents", "embeddings", "events"]


def build_rep10_facts(spark, base: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    o = spark.read.parquet(f"{base}/orders.parquet")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * KEY_STRIDE).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .coalesce(16)
        .write.parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * KEY_STRIDE).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .coalesce(32)
        .write.parquet(f"{out}/lineitem.parquet")
    )
    for t in DIMS:
        os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")


def run(spark, sf_dir: str, label: str) -> None:
    from gravitydb_spark.registry import REGISTRY, queries

    queries()
    for name in QUERIES:
        t0 = time.monotonic()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        print(
            f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows",
            flush=True,
        )


# ---------------------------------------------------------------------------
# Round-5 extension (r4 VERDICT #4): 100× probe for the round-4 analytics
# family. These queries read dims (customer/supplier) and the events/
# documents tables too, so the corpus replicates ALL growing axes with
# per-replica key strides (graph edges, event streams and the doc corpus
# grow N×; nation/region/part stay fixed — catalogs don't grow with sales).
# ---------------------------------------------------------------------------

ANALYTICS_QUERIES = [
    "g_adamic_adar",
    "g_weighted_pagerank",
    "g_personalized_pagerank",
    "text_bm25_search",
    "basket_part_lift",
    "events_cohort_retention",
    "events_transition_matrix",
]

_CUST_STRIDE = 1_000_000
_SUPP_STRIDE = 1_000_000
_DOC_STRIDE = 100_000_000
_USER_STRIDE = 10_000_000
_EVENT_STRIDE = 1_000_000_000


def build_analytics_corpus(spark, base: str, out: str, replicas: int) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(replicas).withColumnRenamed("id", "rep")

    def rep_table(name, strides, coalesce_n):
        t = spark.read.parquet(f"{base}/{name}.parquet")
        cols = [
            (F.col(c) + F.col("rep") * strides[c]).alias(c)
            if c in strides
            else F.col(c)
            for c in t.columns
        ]
        (
            t.crossJoin(reps)
            .select(*cols)
            .coalesce(coalesce_n)
            .write.parquet(f"{out}/{name}.parquet")
        )

    rep_table("customer", {"c_custkey": _CUST_STRIDE}, 8)
    rep_table("supplier", {"s_suppkey": _SUPP_STRIDE}, 4)
    rep_table(
        "orders",
        {"o_orderkey": KEY_STRIDE, "o_custkey": _CUST_STRIDE},
        16,
    )
    rep_table(
        "lineitem",
        {"l_orderkey": KEY_STRIDE, "l_suppkey": _SUPP_STRIDE},
        32,
    )
    rep_table("documents", {"doc_id": _DOC_STRIDE}, 8)
    rep_table(
        "events",
        {"event_id": _EVENT_STRIDE, "user_id": _USER_STRIDE},
        16,
    )
    for t in ("region", "nation", "part", "embeddings"):
        os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")


def run_analytics(spark, sf_dir: str, label: str) -> None:
    from gravitydb_spark.registry import REGISTRY, queries

    queries()
    for name in ANALYTICS_QUERIES:
        t0 = time.monotonic()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        print(
            f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows",
            flush=True,
        )


EVENTS_SKEW_QUERIES = [
    "events_transition_matrix",
    "events_cohort_retention",
    "events_sessionize",
    "events_rfm_scores",
]


def build_events_10x(spark, base: str, out: str, celebrity: bool) -> None:
    """Two equal-volume 10× event corpora isolating DISTRIBUTION, not
    size: ``bal`` strides user_ids on every replica (~15k users, balanced
    per-user history); ``skew`` maps HALF the replicas to ONE celebrity
    user — a ~1M-row sort-window partition, the worst case for user-keyed
    ordered windows, which AQE cannot split (ordered state)."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(10).withColumnRenamed("id", "rep")
    ev = spark.read.parquet(f"{base}/events.parquet").crossJoin(reps)
    user = (
        F.when(F.col("rep") < 5, F.lit(0).cast("long")).otherwise(
            F.col("user_id") + F.col("rep") * _USER_STRIDE
        )
        if celebrity
        else F.col("user_id") + F.col("rep") * _USER_STRIDE
    )
    (
        ev.select(
            (F.col("event_id") + F.col("rep") * _EVENT_STRIDE).alias("event_id"),
            "ts",
            user.alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .coalesce(16)
        .write.parquet(f"{out}/events.parquet")
    )
    for t in DIMS + ["orders", "lineitem"]:
        if t != "events":
            os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")


def run_events_skew(spark, base: str) -> None:
    from gravitydb_spark.registry import REGISTRY, queries
    from gravitydb_spark.relational_queries import (
        events_sessionize,
        events_transition_matrix,
    )

    queries()
    # the bounded= variants (r5 directive #4): (user, day) sub-windows +
    # cross-bucket merge — the celebrity partition splits into ~#days
    # tasks; probed alongside their unbounded twins, plus a row proving
    # result equality on the skew corpus
    bounded = [
        ("events_sessionize[bounded]",
         lambda s, d: events_sessionize(s, d, bounded=True)),
        ("events_transition_matrix[bounded]",
         lambda s, d: events_transition_matrix(s, d, bounded=True)),
    ]
    bal, skew = "/tmp/eprobe_bal10", "/tmp/eprobe_skew10"
    build_events_10x(spark, base, bal, celebrity=False)
    build_events_10x(spark, base, skew, celebrity=True)
    # warm plans/caches on the base so neither labeled run pays init
    for name in EVENTS_SKEW_QUERIES:
        REGISTRY[name].fn(spark, base).count()
    for _, fn in bounded:
        fn(spark, base).count()
    for label, d in (("bal10", bal), ("skew10", skew)):
        for name in EVENTS_SKEW_QUERIES:
            t0 = time.monotonic()
            n = REGISTRY[name].fn(spark, d).count()
            print(
                f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows",
                flush=True,
            )
        for name, fn in bounded:
            t0 = time.monotonic()
            n = fn(spark, d).count()
            print(
                f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows",
                flush=True,
            )
    # equality on the skew corpus: bounded must be row-identical
    for uname, name, fn in (
        ("events_sessionize", "sessionize", bounded[0][1]),
        ("events_transition_matrix", "transition", bounded[1][1]),
    ):
        a = sorted(map(tuple, REGISTRY[uname].fn(spark, skew).collect()))
        b = sorted(map(tuple, fn(spark, skew).collect()))
        print(f"PROBE skew10 {name}-bounded-equal: {a == b}", flush=True)


def main() -> None:
    from gravitydb_spark.session import get_spark

    # abspath: the dimension symlinks resolve relative to the probe dir
    base = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    mode = sys.argv[2] if len(sys.argv) > 2 else "facts"
    spark = get_spark(app_name="relational_probe")
    if mode == "analytics":
        # r5: the analytics family at 1x / 10x / 100x full-corpus growth
        run_analytics(spark, base, "1x")
        for n in (10, 100):
            corpus = f"/tmp/aprobe_rep{n}"
            build_analytics_corpus(spark, base, corpus, n)
            run_analytics(spark, corpus, f"{n}x")
        return
    if mode == "events-skew":
        run_events_skew(spark, base)
        return
    rep10 = "/tmp/rprobe_rep10"
    build_rep10_facts(spark, base, rep10)
    run(spark, base, "1x")
    run(spark, rep10, f"{REPLICAS}x")


if __name__ == "__main__":
    main()
