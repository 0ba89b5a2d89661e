"""The driver's correctness gate records only the first 50 entries of
``queries()`` (CORRECTNESS_r01/r02 = exactly the head-50 of registration
order). These tests pin the consolidation contract from
gravitydb_spark/gate_queries.py:

- the head-50 is exactly GATE_ORDER (compound families + irreducible
  standalones), every entry with a DuckDB oracle;
- every registered fine-grained query is either in the head-50 itself or a
  member of a compound that is;
- a compound query is a pure tagged union: its per-tag row counts equal
  its members' row counts (checked on one cheap family).
"""

from __future__ import annotations

import pytest

from gravitydb_spark import gate_queries  # noqa: F401  (fills GATE_ORDER)
from gravitydb_spark.registry import GATE_ORDER, REGISTRY, oracle_sql, queries

SF_DIR = "/root/testdata/sf0.001"

# compound -> members, kept in sync with gate_queries.py (COVERAGE.md table)
COMPOUND_MEMBERS = {
    "g_probes": ["g_vq_specific", "g_vq_property", "g_eq_specific", "g_eq_property"],
    "g_property_queries": [
        "g_pq_fromto",
        "g_referencing_properties",
        "g_referenced_properties",
    ],
    "g_traverse": ["g_traverse_out", "g_traverse_in", "g_two_hop"],
    "g_set_ops": [
        "g_set_union",
        "g_set_intersect",
        "g_set_subtract",
        "g_set_disjunctive_union",
    ],
    "g_filters": ["g_filter_expr", "g_filter_path"],
    "g_extract_paths": ["g_extract_properties", "g_paths_1hop"],
    "g_hulls": ["g_outer_hull", "g_inner_hull"],
    "g_doctor_info": ["g_doctor", "g_db_info"],
    "agg_summary": ["agg_order_priority", "agg_rollup_region_nation", "agg_quantiles"],
    "topk_range_scan": ["topk_parts_by_quantity", "range_shipdate_scan"],
    "window_funcs": ["window_top_orders_per_customer", "window_running_revenue"],
    "text_counts": ["text_token_count", "text_bpe_token_count"],
    "text_quality_signals": ["text_quality_score", "text_repetition"],
    "text_langid_fingerprint": ["text_lang_id", "text_fingerprint"],
    "text_cleaning": [
        "text_pii_redact",
        "text_decontaminate",
        "dedup_segments",
        "dedup_substring_spans",
    ],
    "corpus_sketch_vocab": ["sketch_kmv_distinct", "corpus_vocab_topk"],
    "corpus_sampling": ["sample_documents_hash", "sample_stratified_by_source"],
    "dedup_minhash_family": [
        "dedup_minhash_lsh",
        "dedup_minhash_cluster",
        "dedup_pair_triangles",
        "dedup_jaccard_verify",
    ],
    "ann_topk_methods": ["ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk"],
    "embed_similarity_family": [
        "embedding_norm",
        "dedup_embedding_cosine",
        "embed_kmeans",
        "dedup_semantic",
        "embed_outliers",
    ],
    "multimodal_family": ["multimodal_binary_meta", "multimodal_frame_sample"],
    "stream_rollup_join": [
        "stream_hourly_rollup",
        "stream_view_click_join",
        "stream_incremental_dedup",
    ],
    "stream_stateful": ["stream_dedup_keys", "stream_sessionize"],
}


def test_head50_is_gate_order():
    names = list(queries())
    assert len(GATE_ORDER) == 50, f"GATE_ORDER has {len(GATE_ORDER)} slots, want 50"
    assert names[:50] == GATE_ORDER
    assert len(names) == len(set(names))


def test_every_gate_entry_has_oracle():
    oracles = oracle_sql()
    missing = [n for n in GATE_ORDER if not oracles.get(n)]
    assert not missing, f"gate entries without oracle: {missing}"


def test_every_query_visible_to_gate():
    """No registered query may be invisible: it's in the head-50 or a
    member of a compound that is."""
    covered = set(GATE_ORDER)
    for comp, members in COMPOUND_MEMBERS.items():
        assert comp in GATE_ORDER, f"compound {comp} fell out of the gate"
        covered.update(members)
    uncovered = [n for n in REGISTRY if n not in covered]
    assert not uncovered, f"queries invisible to the driver gate: {uncovered}"


def test_compound_members_registered():
    for comp, members in COMPOUND_MEMBERS.items():
        for m in members:
            assert m in REGISTRY, f"{comp} member {m} not registered"


@pytest.mark.parametrize("comp", ["g_set_ops", "window_funcs"])
def test_compound_is_tagged_union(spark, comp):
    """Per-tag row counts of a compound equal its members' row counts."""
    comp_counts = {
        r["op"]: r["n"]
        for r in REGISTRY[comp]
        .fn(spark, SF_DIR)
        .groupBy("op")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    members = COMPOUND_MEMBERS[comp]
    assert len(comp_counts) == len(members)
    member_counts = sorted(
        REGISTRY[m].fn(spark, SF_DIR).count() for m in members
    )
    assert sorted(comp_counts.values()) == member_counts
