"""stream_dedup_retractions semantics on a planted corpus: a forgotten
document's band keys stop vetoing future admissions, while keys shared
with surviving documents keep vetoing (the signed-multiset invariant)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT_A = "pack my box with five dozen liquor jugs tonight"
TEXT_B = "the quick brown fox jumps over the lazy dog"
TEXT_C = "sphinx of black quartz judge my vow swiftly now"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dedupret")
    rows = [
        # seed evens: doc 2 (kept, text A), doc 10 (forgotten: % 10 == 0,
        # text B)
        (2, TEXT_A),
        (10, TEXT_B),
        # odd arrivals: batch = (doc_id % 6) DIV 2
        (1, TEXT_C),  # batch 0 — unique text, admitted
        (3, TEXT_B),  # batch 1 — B still live (retraction is later): rejected
        (5, TEXT_B),  # batch 2 — B forgotten by then: ADMITTED
        (11, TEXT_A),  # batch 2 — A's owner survives: still rejected
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["planted"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_retraction_unvetoes_only_forgotten_keys(spark, planted_dir):
    from gravitydb_spark.pipeline_queries import stream_dedup_retractions

    got = {
        (r.doc_id, r.batch)
        for r in stream_dedup_retractions(spark, planted_dir).collect()
    }
    assert got == {(1, 0), (5, 2)}, got


def test_engine_matches_oracle_on_planted_corpus(spark, planted_dir):
    import duckdb

    from gravitydb_spark.registry import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{planted_dir}/documents.parquet'"
    )
    oracle = {
        (int(r[0]), int(r[1]))
        for r in con.execute(
            REGISTRY["stream_dedup_retractions"].oracle
        ).fetchall()
    }
    assert oracle == {(1, 0), (5, 2)}, oracle
