"""Invariant tests for the training-batch construction operators
(pack_sequences / mix_domains / text_cc_filters). Value-exactness against
DuckDB is covered by tools/oracle_check.py; these pin the semantic
invariants that an oracle diff would not explain well."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravitydb_spark.pipeline_queries import (
    SEQ_BUDGET,
    mix_domains,
    pack_sequences,
    text_cc_filters,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(spark):
    rows = pack_sequences(spark, SF_DIR).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.seq_offset < SEQ_BUDGET
        assert r.seq_id_end >= r.seq_id
        assert r.n_tokens >= 0
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        # contiguous packing: each doc starts exactly where the previous ended
        pos = 0
        for r in docs:
            assert r.seq_id == pos // SEQ_BUDGET
            assert r.seq_offset == pos % SEQ_BUDGET
            end = pos + max(r.n_tokens, 1) - 1
            assert r.seq_id_end == end // SEQ_BUDGET
            pos += r.n_tokens
        # shard-local sequence ids start at 0
        assert docs[0].seq_id == 0


def test_mix_domains_invariants(spark):
    rows = mix_domains(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total
        n = int(r.source[3:])
        assert r.weight_bp == 2000 + 1500 * (n % 4)
    # the mixture must actually differ across sources (weights 0.2..0.65)
    fracs = {r.weight_bp: r.n_kept / r.n_total for r in rows}
    assert len(fracs) == 4
    # kept fraction should roughly track the target weight (hash is uniform)
    for bp, frac in fracs.items():
        assert abs(frac - bp / 10000) < 0.2


def test_mix_domains_deterministic(spark):
    a = {(r.source, r.n_kept) for r in mix_domains(spark, SF_DIR).collect()}
    b = {(r.source, r.n_kept) for r in mix_domains(spark, SF_DIR).collect()}
    assert a == b


def test_cc_filters_mask_consistency(spark):
    df = text_cc_filters(spark, SF_DIR)
    bad = df.filter(
        ((F.col("fail_mask") == 0) & (F.col("keep") == 0))
        | ((F.col("fail_mask") != 0) & (F.col("keep") == 1))
        | (F.col("fail_mask") > 15)
        | (F.col("fail_mask") < 0)
    ).count()
    assert bad == 0
    # the synthetic corpus is mostly clean prose: most docs must survive
    total = df.count()
    kept = df.filter(F.col("keep") == 1).count()
    assert kept > total // 2
