"""Round-13 operators and guards.

Covers the r12 VERDICT directives as they land:
- #1: g_skipgram_full_eval's nonedge group is now a hash-sampled
  Θ(n_c·K) set (edges stay exhaustive). Pin that (a) the sampled
  nonedge mean agrees with the exhaustively-enumerated nonedge mean
  at sf0.001, and (b) the plan no longer contains a cartesian of
  entity-sized frames.
"""

import pyspark.sql.functions as F
import pytest

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY (lazy module loading)


def test_sgf_eval_sampled_nonedge_mean_matches_exhaustive(spark, sf_dir):
    """r12 VERDICT #1 'Done' condition: the registered query's sampled
    nonedge mean must agree with the exhaustive c×s nonedge mean (the
    r12 semantics, recomputed here in-test where a small crossJoin is
    fine). sf0.001 is the adversarial case for this check: the tiny
    trade graph is ~96% DENSE (1444 edges / 1500 feasible pairs), so
    only 56 true nonedges exist and the K=32 draw design recovers 48
    of them — the sampled mean can differ from the exhaustive one by
    O(100) µu purely from the 8 missing pairs. The meaningful
    tolerance is therefore RELATIVE TO THE SEPARATION the eval
    decides: the sampled mean must sit within 30% of the
    edge-vs-nonedge gap, and the edge-scores-higher verdict must be
    preserved under both means."""
    from gravitydb_spark import graph_queries as gq
    from gravitydb_spark.graph_queries import _SG_U

    rows = {
        r["grp"]: (r["n_pairs"], r["dot_sum_scaled"])
        for r in REGISTRY["g_skipgram_full_eval"].fn(spark, sf_dir).collect()
    }
    n_s, s_s = rows["nonedge"]
    sampled_mean = s_s / n_s
    edge_mean = rows["edge"][1] / rows["edge"][0]

    emb = gq._sgf_embeddings(spark, sf_dir)
    und = gq._trade_und(spark, sf_dir)
    vedges = (
        und.filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    voc = emb.select("v").distinct()
    allne = (
        voc.filter(F.col("v").startswith("c"))
        .select(F.col("v").alias("a"))
        .crossJoin(
            voc.filter(F.col("v").startswith("s")).select(
                F.col("v").alias("b")
            )
        )
        .join(vedges, ["a", "b"], "left_anti")
    )
    ea = emb.select(F.col("v").alias("a"), "d", F.col("val").alias("va"))
    eb = emb.select(F.col("v").alias("b"), "d", F.col("val").alias("vb"))
    ex = (
        allne.join(ea, "a")
        .join(eb, ["b", "d"])
        .groupBy("a", "b")
        .agg(F.expr(f"sum(va * vb) DIV {_SG_U}").cast("long").alias("dot"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dot").cast("long").alias("s"),
        )
        .collect()[0]
    )
    exhaustive_mean = ex["s"] / ex["n"]
    # the sample must be a subset of the exhaustive nonedge set, with
    # real coverage (at sf0.001: 48 of the 56 existing nonedges)
    assert n_s <= ex["n"]
    assert n_s >= 0.5 * ex["n"]
    # mean agreement, relative to the separation the eval decides
    sep = edge_mean - exhaustive_mean
    assert sep > 0  # exhaustive verdict: edges score higher
    assert abs(sampled_mean - exhaustive_mean) < 0.3 * sep
    assert edge_mean > sampled_mean  # sampled verdict preserved


def test_ivf_serving_recall_floor(spark, sf_dir):
    """r12 VERDICT #5: nothing failed if a derived-config change
    dropped serving recall — pin floors. g_skipgram_ivf_recall's
    hits/possible must stay ≥ 85% (measured 22/24 = 9167 bp at
    sf0.001, 24/24 at sf0.01, 22/24 at sf0.1); ann_recall_eval's IVF
    leg ≥ 7000 bp mean (measured 7800 at sf0.001 — the uniform-sphere
    corpus is IVF's hard case, docstring'd on the clustered sibling);
    ann_recall_eval_clustered's IVF leg ≥ 9000 bp mean (measured
    10000 — the corpus with real neighborhood structure, where a
    quantizer/nprobe regression actually shows). The red half of the
    contract: rebuilding the skip-gram serve with nprobe artificially
    shrunk to 1 (memo bypassed — registered queries keep the derived
    config) must visibly change the served set, proving the floor
    metric is sensitive to the probe width at all."""
    from gravitydb_spark import graph_queries as gq

    rows = {
        r["metric"]: r["value"]
        for r in REGISTRY["g_skipgram_ivf_recall"].fn(spark, sf_dir).collect()
    }
    assert rows["possible"] > 0
    assert rows["hits"] * 10000 >= 8500 * rows["possible"]

    ann = (
        REGISTRY["ann_recall_eval"]
        .fn(spark, sf_dir)
        .filter(F.col("method") == "ivf")
        .agg(F.avg("recall_bp").alias("r"))
        .collect()[0]["r"]
    )
    assert ann >= 7000
    annc = (
        REGISTRY["ann_recall_eval_clustered"]
        .fn(spark, sf_dir)
        .filter(F.col("method") == "ivf")
        .agg(F.avg("recall_bp").alias("r"))
        .collect()[0]["r"]
    )
    assert annc >= 9000

    # red demonstration: nprobe=1 must lose brute-force top-k hits
    shrunk = gq._sgf_ivf_build(spark, sf_dir, nprobe_override=1).select(
        F.col("src").alias("q_id"), "nbr"
    )
    full = gq._sgf_ivf_serve(spark, sf_dir).select(
        F.col("src").alias("q_id"), "nbr"
    )
    lost = full.join(shrunk, ["q_id", "nbr"], "left_anti").count()
    assert lost > 0  # shrinking the probe visibly changes the served set


def test_stream_knn_graph_upkeep_equals_batch(spark, sf_dir):
    """The maintained kNN graph must equal the batch build EXACTLY
    (row sets, not just counts): every vector lands in some batch,
    landing touches its cell, and the last batch touching a cell
    recomputes it over all members — the per-source max-bid epoch fold
    then exposes exactly the final recompute. This is the e2e witness
    behind the op's PLAN_EXEMPT oracle-e2e claim."""
    batch = {
        tuple(r)
        for r in REGISTRY["ann_knn_graph"].fn(spark, sf_dir).collect()
    }
    maintained = {
        tuple(r)
        for r in REGISTRY["stream_knn_graph_upkeep"].fn(spark, sf_dir).collect()
    }
    assert maintained == batch


def test_sgf_eval_plan_has_no_entity_cartesian(spark, sf_dir):
    """The r12 weak item's plan guard: the only nested-loop/cartesian
    join allowed in g_skipgram_full_eval's physical plan is the 1-row
    scalar crossJoin (broadcast). A CartesianProduct node means the
    entity×entity enumeration came back."""
    df = REGISTRY["g_skipgram_full_eval"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
