"""Approximate swap-ins behind ``exact=`` flags (r4 VERDICT #7): the
oracle-exact defaults stay untouched; ``exact=False`` routes to the
100 TB approximation (HLL++, approx_percentile, count-min top-K) and
these tests bound each approximation's error against the exact path at
sf0.01."""

import pytest

from gravitydb_spark.pipeline_queries import (
    _CM_W,
    _HLL_RSD,
    QUANTILE_PCTS,
    VOCAB_TOPK,
    corpus_length_quantiles,
    corpus_vocab_topk,
    sketch_kmv_distinct,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimate_within_3_rsd_of_exact(spark):
    exact = {
        r["event_type"]: r["n_exact"]
        for r in sketch_kmv_distinct(spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: r["estimate"]
        for r in sketch_kmv_distinct(spark, SF_DIR, exact=False).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        rel = abs(approx[et] - n) / n
        assert rel <= 3 * _HLL_RSD, f"{et}: {approx[et]} vs exact {n} ({rel:.3%})"


def test_approx_percentile_close_to_exact(spark):
    def as_map(df):
        return {r["stat"]: (r["q_chars"], r["q_tokens"]) for r in df.collect()}

    exact = as_map(corpus_length_quantiles(spark, SF_DIR))
    approx = as_map(corpus_length_quantiles(spark, SF_DIR, exact=False))
    assert set(approx) == set(exact)
    # accuracy 10k on an sf0.01 corpus ⇒ rank error under n/10k < 1 row;
    # allow 2% relative slack for the off-by-one between percentile_disc
    # (ceil-rank) and the sketch's nearest-rank convention
    for stat, (ec, et) in exact.items():
        ac, at = approx[stat]
        assert abs(ac - ec) <= max(2, 0.02 * ec), f"{stat} chars {ac} vs {ec}"
        assert abs(at - et) <= max(2, 0.02 * et), f"{stat} tokens {at} vs {et}"


def test_countmin_topk_overestimates_and_overlaps(spark):
    exact_rows = corpus_vocab_topk(spark, SF_DIR).collect()
    approx_rows = corpus_vocab_topk(spark, SF_DIR, exact=False).collect()
    # sf0.01's vocab can be smaller than VOCAB_TOPK — both paths must
    # agree on the cut size either way
    assert len(approx_rows) == len(exact_rows) <= VOCAB_TOPK
    exact_n = {r["token"]: r["n"] for r in exact_rows}
    total_tokens = None  # CM error bound needs the stream mass
    from gravitydb_spark.pipeline_queries import _wordcount
    from pyspark.sql import functions as F

    total_tokens = _wordcount(spark, SF_DIR).agg(F.sum("n")).first()[0]
    eps_bound = 3 * total_tokens / _CM_W
    for r in approx_rows:
        if r["token"] in exact_n:
            # CM never under-estimates, and over-estimation is bounded
            assert r["n"] >= exact_n[r["token"]], r["token"]
            assert r["n"] - exact_n[r["token"]] <= eps_bound, r["token"]
    overlap = {r["token"] for r in approx_rows} & set(exact_n)
    assert len(overlap) >= 0.6 * len(exact_rows), f"only {len(overlap)} shared"


def test_gate_defaults_are_exact(spark):
    """The registered (spark, sf_dir) signature — what the driver's gate
    calls — must keep the exact semantics: flag defaults True."""
    import inspect

    for fn in (sketch_kmv_distinct, corpus_length_quantiles, corpus_vocab_topk):
        sig = inspect.signature(fn)
        assert sig.parameters["exact"].default is True, fn.__name__
