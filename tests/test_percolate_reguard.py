"""Percolation guard-drift repair (r9 VERDICT directive #5).

Constructs a corpus where a guard term chosen at index-build time
drifts common afterward, and pins:

- the trigger FIRES only for the drifted query (rate-based comparison:
  corpus growth alone must not trigger);
- the re-guarded query gets a new, currently-rare guard, shrinking the
  candidate set back down;
- results stay exact (verification recomputes the conjunction) both
  with stale and repaired guards.
"""

from pyspark.sql import functions as F

from gravitydb_spark.pipeline_queries import (
    _percolate_guard_map,
    _percolate_verify,
    percolate_reguard_plan,
)


def _toks(docs):
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()


def _registry(spark):
    # q1: 'zebra' is rare at build -> its guard; 'alpha' is common
    # q2: both terms stay rare -> must NOT re-guard
    return spark.createDataFrame(
        [(1, "zebra", 2), (1, "alpha", 2), (2, "quokka", 2), (2, "beta", 2)],
        "query_id long, token string, n_terms int",
    )


def test_reguard_fires_only_for_drifted_query(spark):
    qt = _registry(spark)
    build_docs = spark.createDataFrame(
        [(0, "zebra alpha"), (1, "alpha filler"), (2, "quokka beta"), (3, "beta x")]
        + [(4 + i, f"pad{i} words") for i in range(4)],
        "doc_id long, text string",
    )
    guards0 = _percolate_guard_map(_toks(build_docs), qt)
    g0 = {r.query_id: (r.token, r.df) for r in guards0.collect()}
    assert g0[1][0] == "zebra" and g0[2][0] == "quokka"

    # drift: 16 new docs all containing 'zebra' (q1's guard goes common);
    # 'quokka' stays rare — q2 must keep its guard
    drift = spark.createDataFrame(
        [(100 + i, f"zebra junk{i}") for i in range(16)],
        "doc_id long, text string",
    )
    now_docs = build_docs.unionByName(drift)
    toks_now = _toks(now_docs)
    guards, n_drifted = percolate_reguard_plan(
        toks_now, now_docs.count(), qt, guards0, build_docs.count()
    )
    assert n_drifted == 1
    g1 = {r.query_id: r.token for r in guards.collect()}
    assert g1[1] == "alpha"  # re-guarded to the now-rarer term
    assert g1[2] == "quokka"  # untouched

    # candidate volume: stale guard floods, repaired guard does not
    def n_cand(gs):
        return (
            toks_now.join(F.broadcast(gs.select("token").distinct()), "token")
            .select("doc_id")
            .distinct()
            .count()
        )

    assert n_cand(guards0) >= 18  # zebra build+drift docs + quokka doc
    assert n_cand(guards) <= 4

    # exactness under BOTH guard maps
    expected = sorted(
        (r.query_id, r.doc_id)
        for r in _percolate_verify(
            toks_now, qt, guards0.select("query_id", "token")
        ).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id)
        for r in _percolate_verify(toks_now, qt, guards).collect()
    )
    assert got == expected == [(1, 0), (2, 2)]


def test_uniform_growth_does_not_trigger(spark):
    qt = _registry(spark)
    build_docs = spark.createDataFrame(
        [(0, "zebra alpha"), (1, "alpha y"), (2, "quokka beta"), (3, "beta z")],
        "doc_id long, text string",
    )
    guards0 = _percolate_guard_map(_toks(build_docs), qt)
    # double the corpus with the SAME rate profile: dfs double, rates flat
    grown = build_docs.unionByName(
        build_docs.select((F.col("doc_id") + 10).alias("doc_id"), "text")
    )
    _, n_drifted = percolate_reguard_plan(
        _toks(grown), grown.count(), qt, guards0, build_docs.count()
    )
    assert n_drifted == 0
