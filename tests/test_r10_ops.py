"""Round-10 operators: label-propagation communities, random-walk corpus
generation, Bloom membership sketch, theta-sketch set expressions.

Each has a full value-hash oracle (tools/oracle_check.py); these tests pin
the SEMANTIC invariants the hash match alone wouldn't explain:
- LPA: labels are vertex ids of the graph; communities partition the
  vertex set; csize is consistent with the partition.
- random walks: every consecutive (v_k, v_{k+1}) pair is a real edge of
  the symmetrized trade graph, and the walk count matches the derived
  config (_rw_num_walks of the measured vertex count).
- Bloom: ZERO false negatives (the filter's defining guarantee), the
  measured false-positive rate lands within a loose multiple of the
  2^-7 design budget, and m is the derived ceil(k·n/ln2).
- theta: intersection/union estimates within 3·rsd of exact (KMV_K from
  the shared rsd budget gives rsd ≈ 1/sqrt(62) ≈ 12.7%).
"""

import math

import pyspark.sql.functions as F

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY (lazy module loading)


def test_label_propagation_partitions_vertices(spark, sf_dir):
    df = REGISTRY["g_label_propagation"].fn(spark, sf_dir).localCheckpoint()
    rows = df.collect()
    ids = {r["id"] for r in rows}
    labels = {r["community"] for r in rows}
    # labels are vertex ids (initial labels propagate, never invent ids)
    assert labels <= ids
    # one row per vertex, csize consistent with the label partition
    assert len(rows) == len(ids)
    from collections import Counter

    sizes = Counter(r["community"] for r in rows)
    assert all(sizes[r["community"]] == r["csize"] for r in rows)
    # the trade graph is connected-ish: LPA must merge vertices into
    # strictly fewer communities than vertices (it did real work)
    assert len(sizes) < len(ids)


def test_random_walks_follow_edges_and_derived_count(spark, sf_dir):
    from gravitydb_spark.graph_queries import _WALK_LEN, _rw_num_walks
    from gravitydb_spark.registry import load

    df = REGISTRY["g_random_walks"].fn(spark, sf_dir).localCheckpoint()
    rows = df.collect()
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e = {
        (r["a"], r["b"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
        .collect()
    }
    und = e | {(b, a) for a, b in e}
    n_verts = len({a for a, _ in und})
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    assert len(walks) == _rw_num_walks(n_verts)
    for wid, steps in walks.items():
        # walks never dead-end on the symmetrized graph: full length
        assert sorted(steps) == list(range(_WALK_LEN + 1))
        assert steps[0] == f"c{wid}"
        for k in range(_WALK_LEN):
            assert (steps[k], steps[k + 1]) in und, (wid, k)


def test_bloom_no_false_negatives_and_derived_m(spark, sf_dir):
    from gravitydb_spark.pipeline_queries import _BLOOM_K

    df = REGISTRY["sketch_bloom_membership"].fn(spark, sf_dir)
    stats = {r["stat"]: r["v"] for r in df.collect()}
    assert stats["false_neg"] == 0
    assert stats["true_pos"] == stats["n_members"]
    n = stats["n_members"]
    assert stats["m_bits"] == max(64, (_BLOOM_K * n * 14427 + 9999) // 10000)
    assert stats["k_hashes"] == _BLOOM_K
    # fpp budget 2^-7 ≈ 78 bp; allow generous slack (small filters, the
    # double-hashing family is slightly worse than ideal)
    assert stats["fpp_bp"] <= 4 * 78


def test_theta_estimates_within_sketch_error(spark, sf_dir):
    from gravitydb_spark.pipeline_queries import KMV_K

    df = REGISTRY["sketch_theta_intersect"].fn(spark, sf_dir)
    stats = {r["stat"]: r["v"] for r in df.collect()}
    rsd = 1.0 / math.sqrt(KMV_K - 2)
    exact_u = (
        stats["n_a_exact"] + stats["n_b_exact"] - stats["inter_exact"]
    )
    assert abs(stats["union_est"] - exact_u) <= 3 * rsd * exact_u + 2
    # the intersection estimator's variance scales with union/intersection;
    # bound by the union-relative error (loose but meaningful)
    assert (
        abs(stats["inter_est"] - stats["inter_exact"])
        <= 3 * rsd * exact_u + 2
    )


def test_node2vec_walks_follow_edges_and_bias_differs(spark, sf_dir):
    from gravitydb_spark.graph_queries import _WALK_LEN, _rw_num_walks
    from gravitydb_spark.registry import load

    df = REGISTRY["g_node2vec_walks"].fn(spark, sf_dir).localCheckpoint()
    rows = df.collect()
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e = {
        (r["a"], r["b"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
        .collect()
    }
    und = e | {(b, a) for a, b in e}
    n_verts = len({a for a, _ in und})
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    assert len(walks) == _rw_num_walks(n_verts)
    for wid, steps in walks.items():
        assert sorted(steps) == list(range(_WALK_LEN + 1))
        assert steps[0] == f"c{wid}"
        for k in range(_WALK_LEN):
            assert (steps[k], steps[k + 1]) in und, (wid, k)
    # the p/q bias must actually change trajectories vs the uniform walk
    # (same LCG, same starts — only the selection rule differs)
    uni = {}
    for r in REGISTRY["g_random_walks"].fn(spark, sf_dir).collect():
        uni.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    diverged = sum(
        1 for wid in walks if walks[wid] != uni.get(wid, {})
    )
    assert diverged > 0


def test_harmonic_closeness_bounds(spark, sf_dir):
    """Every score is a sum over ≤ k sources of scale // d with d ≥ 1, so
    0 < hc ≤ k·scale; the sources themselves (distance-1 hubs' suppliers)
    must outrank the long tail — check the max score touches the ceiling
    region and every vertex with a score is reachable (count ≤ n)."""
    from gravitydb_spark.graph_queries import _HC_SCALE, _bc_num_sources

    df = REGISTRY["g_harmonic_closeness"].fn(spark, sf_dir)
    rows = df.collect()
    n = len(rows)
    assert n > 0
    import math

    k = _bc_num_sources(10**9)  # upper bound on k for any n
    vals = [r["hc_scaled"] for r in rows]
    assert all(0 < v <= k * _HC_SCALE for v in vals)
    # suppliers adjacent to a source get scale//1 from it: the top score
    # must be at least one full-scale contribution
    assert max(vals) >= _HC_SCALE


def test_lpa_modularity_invariants(spark, sf_dir):
    """Σ members = vertex count of the sparsified graph; Σ deg_sum = U
    (every und row counted once via its 'a' endpoint's community);
    in_edges ≤ deg_sum; every contribution within (-1, 1) in bp."""
    mod = REGISTRY["g_lpa_modularity"].fn(spark, sf_dir).collect()
    lpa = REGISTRY["g_label_propagation"].fn(spark, sf_dir).collect()
    assert sum(r["members"] for r in mod) == len(lpa)
    U = sum(r["deg_sum"] for r in mod)
    assert U > 0 and U % 2 == 0  # symmetrized edge rows
    for r in mod:
        assert 0 <= r["in_edges"] <= r["deg_sum"]
        assert -10000 <= r["q_bp"] <= 10000
