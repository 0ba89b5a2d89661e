"""dedup_ngram_containment on a constructed corpus: the asymmetric
quote-inclusion pair (short doc fully embedded in a long one) that
symmetric Jaccard — and therefore MinHash-LSH — misses by construction.
The driver testdata's generator never embeds documents, so this shape is
pinned here with hand-computed scores, engine-independent."""

import pyarrow as pa
import pyarrow.parquet as pq

from gravitydb_spark.pipeline_queries import (
    dedup_ngram_containment,
    dedup_ngram_jaccard,
)


def _mk_docs(tmpdir, rows):
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
    return str(tmpdir)


def test_containment_catches_subset_pair(spark, tmp_path):
    # doc 0: 40 unique tokens -> 38 distinct 3-shingles; doc 1: its first
    # 12 tokens -> 10 shingles, ALL shared. containment = 10/10 = 1.0;
    # jaccard = 10/(38+10-10) = 0.2632 << 0.6. doc 2: unrelated noise.
    long_words = [f"alpha{i:03d}" for i in range(40)]
    rows = [
        (0, " ".join(long_words)),
        (1, " ".join(long_words[:12])),
        (2, " ".join(f"zeta{i:03d}" for i in range(20))),
    ]
    sf_dir = _mk_docs(tmp_path, rows)

    got = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in dedup_ngram_containment(spark, sf_dir).collect()
    }
    assert got == {(0, 1): (1.0, round(10 / 38, 4))}

    # the symmetric criterion misses the pair entirely
    jac_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert (0, 1) not in jac_pairs
