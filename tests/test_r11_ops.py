"""Round-11 operators: skip-gram (SGNS) embedding training over the
random-walk corpus, plus its objective eval.

Both have full value-hash oracles (tools/oracle_check.py — unrolled
epoch-chain CTEs); these tests pin the SEMANTIC invariants the hash
match alone wouldn't explain:
- the trained embeddings actually LEARNED: positive-pair dot products
  rise above the init level while negative-pair dots fall (the SGNS
  objective moved the right way) — the same measured-not-claimed
  discipline as the LPA modularity eval;
- the embedding table covers exactly vocab × D with bounded values
  (the per-vertex-normalized step keeps hub tokens from blowing past
  the init scale — the int64 headroom contract);
- training pairs are well-formed: endpoints are corpus tokens,
  positives and negatives are weight-balanced one-to-one.
"""

import pyspark.sql.functions as F

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY (lazy module loading)


def test_skipgram_eval_objective_moves_right_way(spark, sf_dir):
    rows = REGISTRY["g_skipgram_eval"].fn(spark, sf_dir).collect()
    d = {(r["phase"], r["y"]): r for r in rows}
    assert set(d) == {("init", 0), ("init", 1), ("trained", 0), ("trained", 1)}
    # positives and negatives are one-to-one weight-balanced
    assert d[("init", 1)]["pairs_w"] == d[("init", 0)]["pairs_w"]
    # training separates the classes: window-pair similarity rises,
    # noise-pair similarity falls
    assert (
        d[("trained", 1)]["dot_sum_scaled"] > d[("init", 1)]["dot_sum_scaled"]
    )
    assert (
        d[("trained", 0)]["dot_sum_scaled"] < d[("init", 0)]["dot_sum_scaled"]
    )
    # and the trained margin is positive (pos above neg)
    assert (
        d[("trained", 1)]["dot_sum_scaled"]
        > d[("trained", 0)]["dot_sum_scaled"]
    )


def test_skipgram_embeddings_cover_vocab_and_stay_bounded(spark, sf_dir):
    from gravitydb_spark.graph_queries import _SG_DIM, _SG_INIT_A

    emb = REGISTRY["g_skipgram_embed"].fn(spark, sf_dir).localCheckpoint()
    walks = REGISTRY["g_random_walks"].fn(spark, sf_dir)
    vocab = {r[0] for r in walks.select("v").distinct().collect()}
    rows = emb.collect()
    # exactly vocab × D coordinates
    assert len(rows) == len(vocab) * _SG_DIM
    assert {r["id"] for r in rows} == vocab
    assert {r["dim"] for r in rows} == set(range(_SG_DIM))
    # bounded: the degree-adaptive step caps growth at (1+1/LRDIV)^E
    # of the init amplitude — allow 2x headroom
    assert all(abs(r["emb_scaled"]) <= 2 * _SG_INIT_A for r in rows)
    # and training moved at least some coordinates off the init
    from gravitydb_spark.graph_queries import _sg_e0

    init = {
        (r["v"], r["d"]): r["val"]
        for r in _sg_e0(spark, sf_dir).collect()
    }
    moved = sum(
        1 for r in rows if init[(r["id"], r["dim"])] != r["emb_scaled"]
    )
    assert moved > len(rows) // 2


def test_skipgram_pairs_well_formed(spark, sf_dir):
    from gravitydb_spark.graph_queries import _sg_pairs

    prs = _sg_pairs(spark, sf_dir)
    walks = REGISTRY["g_random_walks"].fn(spark, sf_dir)
    vocab = {r[0] for r in walks.select("v").distinct().collect()}
    rows = prs.collect()
    # all endpoints are corpus tokens (negatives drawn from the corpus
    # unigram distribution stay inside the vocabulary by construction)
    assert {r["a"] for r in rows} <= vocab
    assert {r["b"] for r in rows} <= vocab
    # one negative per positive, same weight (pid packs the origin)
    pos = [r for r in rows if r["y"] == 1]
    neg = [r for r in rows if r["y"] == 0]
    assert len(pos) == len(neg)
    assert sum(r["w"] for r in pos) == sum(r["w"] for r in neg)
    # pids unique (the z-aggregation groups by pid)
    assert len({r["pid"] for r in rows}) == len(rows)


def test_epoch_shuffle_is_balanced_permutation(spark, sf_dir):
    """shuffle_epoch_shards semantics the hash match alone wouldn't
    explain: the output is a permutation (every doc exactly once),
    positions are dense 1..|shard| within each shard, shards are
    roughly balanced (hash-uniform), and changing the epoch constant
    produces a genuinely different permutation (the reshuffle
    property)."""
    from collections import Counter

    from gravitydb_spark import pipeline_queries as pq

    rows = REGISTRY["shuffle_epoch_shards"].fn(spark, sf_dir).collect()
    docs = {r["doc_id"] for r in rows}
    n = len(rows)
    assert len(docs) == n  # every doc exactly once
    per_shard = Counter(r["shard"] for r in rows)
    # dense positions within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for sh, poss in by_shard.items():
        assert sorted(poss) == list(range(1, per_shard[sh] + 1)), sh
    # hash-uniform balance: no shard more than 3x the fair share
    fair = n / len(per_shard)
    assert max(per_shard.values()) <= 3 * fair
    # a different epoch reshuffles: recompute with the epoch bumped and
    # require most (shard, pos) assignments to move
    old = pq._SHUF_EPOCH
    pq._SHUF_EPOCH = old + 1
    try:
        rows2 = pq.shuffle_epoch_shards(spark, sf_dir).collect()
    finally:
        pq._SHUF_EPOCH = old
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in rows2}
    assert len(a & b) < n // 4  # >75% of assignments moved
