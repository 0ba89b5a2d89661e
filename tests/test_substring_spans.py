"""Crafted-corpus tests for dedup_substring_spans and
stream_incremental_dedup: exact expected values computed independently in
plain Python on documents with known duplication structure (the sf
corpora exercise scale; these pin the interval-union and band-key logic
on inputs where the right answer is checkable by hand)."""

from __future__ import annotations

import shutil

import pytest

from gravitydb_spark.pipeline_queries import (
    SPAN_W,
    dedup_substring_spans,
    stream_incremental_dedup,
)

W = SPAN_W  # 8


def _mk_docs(tmpdir, rows):
    """Write a SINGLE parquet file named documents.parquet (matching the
    testdata layout — the streaming reader's pathGlobFilter expects a
    file, not a parquet directory)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(tmpdir, ignore_errors=True)
    os.makedirs(tmpdir)
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": [t for _, t in rows],
            "lang": ["en"] * len(rows),
            "source": ["src0"] * len(rows),
            "n_chars": pa.array([len(t) for _, t in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/documents.parquet")
    return tmpdir


def _brute_spans(rows):
    """Reference implementation: positions of W-grams shared across docs,
    union-of-intervals coverage."""
    shingles: dict[int, list[tuple[int, str]]] = {}
    docs_of: dict[str, set[int]] = {}
    toks = {}
    for i, t in rows:
        ts = t.split()
        toks[i] = ts
        shingles[i] = [
            (p, " ".join(ts[p : p + W])) for p in range(len(ts) - W + 1)
        ]
        for _, s in shingles[i]:
            docs_of.setdefault(s, set()).add(i)
    out = {}
    for i, _ in rows:
        dup_pos = sorted(p for p, s in shingles[i] if len(docs_of[s]) > 1)
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + W))
        out[i] = (len(toks[i]), len(dup_pos), len(covered))
    return out


DOCS = [
    # doc 0 and 1 share an 11-token run -> 4 duplicated window positions
    # each, overlapping spans that must union, not sum
    (0, "a b c d e f g h i j k unique0 tail0 x0 y0 z0"),
    (1, "prefix1 p1 a b c d e f g h i j k suffix1 q1 r1"),
    # doc 2: no cross-doc duplicate 8-gram
    (2, "entirely different words with no overlap whatsoever here today"),
    # docs 3/4: identical text -> everything covered
    (3, "m n o p q r s t u v w"),
    (4, "m n o p q r s t u v w"),
]


def test_substring_spans_crafted(spark, tmp_path):
    d = _mk_docs(str(tmp_path / "spans"), DOCS)
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_positions, r.covered_tokens)
        for r in dedup_substring_spans(spark, d).collect()
    }
    expect = _brute_spans(DOCS)
    assert got == expect
    # sanity on the hand-checkable cases
    assert got[2][1] == 0 and got[2][2] == 0
    assert got[3][2] == 11  # identical docs: all 11 tokens covered
    # overlapping spans union: 4 dup positions cover 11 tokens, not 32
    assert got[0][1] == 4 and got[0][2] == 11


def test_incremental_dedup_crafted(spark, tmp_path):
    rows = [
        # even ids = corpus, odd ids = stream
        (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (2, "one two three four five six seven eight nine ten"),
        # near-identical to doc 0 -> every band should hit -> suppressed
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
        # novel text -> emitted
        (5, "totally fresh content that matches nothing in the corpus"),
        # too short for a 3-shingle -> excluded entirely (matches oracle)
        (7, "tiny doc"),
    ]
    d = _mk_docs(str(tmp_path / "incdedup"), rows)
    got = {r.doc_id for r in stream_incremental_dedup(spark, d).collect()}
    assert got == {5}
