"""r13 optimization round: the broadcast-hint / lazy-cut changes must be
result-invariant. These tests pin that the NEW count-gated hint paths in
the iterative operators return exactly the rows the unhinted paths do
(the registered queries themselves stay value-pinned by their DuckDB
oracles — this covers the operator-library parameters tests can reach
directly)."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravitydb_spark.operators.iterative import betweenness_scaled, kcore_onion


def _rand_und(spark, seed, n_lo=12, n_hi=30):
    rng = random.Random(seed)
    n = rng.randint(n_lo, n_hi)
    ids = [f"v{i:02d}" for i in range(n)]
    m = rng.randint(n, n * 3)
    pairs = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(m)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    e = spark.createDataFrame(
        [(ids[a], ids[b]) for a, b in pairs], "a string, b string"
    )
    return n, ids, e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


@pytest.mark.parametrize("seed", [3, 11])
def test_betweenness_frontier_hint_is_result_invariant(spark, seed):
    """frontier_rows only changes join strategy (broadcast vs shuffle),
    never the dependency values — hinted and unhinted runs must agree
    row-for-row, and a bound above the broadcast budget must degrade to
    the unhinted plan with the same rows."""
    n, ids, und = _rand_und(spark, seed)
    sources = spark.createDataFrame([(ids[0],), (ids[1],)], "s string")
    base = {
        (r["id"]): r["bc_scaled"]
        for r in betweenness_scaled(und, sources, max_depth=6).collect()
    }
    hinted = {
        (r["id"]): r["bc_scaled"]
        for r in betweenness_scaled(
            und, sources, max_depth=6, frontier_rows=2 * n
        ).collect()
    }
    over_budget = {
        (r["id"]): r["bc_scaled"]
        for r in betweenness_scaled(
            und, sources, max_depth=6, frontier_rows=10**9
        ).collect()
    }
    assert hinted == base
    assert over_budget == base


@pytest.mark.parametrize("seed", [5])
def test_kcore_n_verts_hint_is_result_invariant(spark, seed):
    n, ids, und = _rand_und(spark, seed)
    base = {
        r["id"]: r["peel_round"] for r in kcore_onion(und, k=2).collect()
    }
    hinted = {
        r["id"]: r["peel_round"]
        for r in kcore_onion(und, k=2, n_verts=n).collect()
    }
    assert hinted == base
