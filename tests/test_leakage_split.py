"""split_leakage_safe on a constructed corpus: two IDENTICAL documents
whose per-doc hash splits straddle the train/test boundary — the
leakage mode the plain split permits — must land in the SAME split
(the cluster representative's), with the prevented straddle counted in
``n_rehomed``."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from gravitydb_spark.pipeline_queries import (
    _H32_SPACE,
    _SPLIT_BP,
    split_leakage_safe,
)


def _own_split(doc_id: int) -> str:
    """Pure-Python replica of the engine's salted h32 split."""
    hv = int(hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:8], 16)
    t_train = _H32_SPACE * _SPLIT_BP["train"] // 10000
    t_val = _H32_SPACE * (_SPLIT_BP["train"] + _SPLIT_BP["val"]) // 10000
    return "train" if hv < t_train else ("val" if hv < t_val else "test")


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


def test_cluster_members_share_a_split(spark, tmp_path):
    # find a (low, high) id pair whose OWN splits differ — the straddle
    # the plain split would ship
    a = 0
    while _own_split(a) != "train":
        a += 1
    b = next(i for i in range(a + 1, 500) if _own_split(i) != "train")
    # unclustered noise doc whose own split is NOT train, so the cells
    # stay distinguishable
    nid = next(i for i in range(1000, 2000) if _own_split(i) != "train")
    dup_text = " ".join(f"word{i:03d}" for i in range(30))
    noise = " ".join(f"other{i:03d}" for i in range(25))
    sf_dir = _mk_docs(tmp_path, [(a, dup_text), (b, dup_text), (nid, noise)])

    rows = {
        (r["source"], r["split"]): (r["n"], r["n_rehomed"])
        for r in split_leakage_safe(spark, sf_dir).collect()
    }
    # both dup docs take the representative's (= min id a's) split:
    # 'train' gets the pair, with b's straddle counted as rehomed
    assert rows[("src0", "train")] == (2, 1)
    # the unrelated doc keeps its own assignment, not rehomed
    assert rows[("src0", _own_split(nid))] == (1, 0)
    assert sum(n for n, _ in rows.values()) == 3
    assert sum(m for _, m in rows.values()) == 1
