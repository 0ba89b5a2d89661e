"""MinHash/LSH banding pair-recall probe (r9 VERDICT directive #1 evidence).

Plants near-duplicate document pairs with CONTROLLED shingle-set Jaccard
(disjoint per-pair vocabularies, shared-prefix construction: a pair's two
docs share exactly the shingles inside the common token prefix, so the
planted J is exact and knowable), runs the REAL signature recipe
(component i = min over shingles of md5(i || ':' || shingle) — the same
expression _minhash_sigs codegens), and measures the fraction of planted
pairs that collide in >= 1 LSH band — the banding RECALL, the one dedup
error class downstream verification cannot repair (verify only removes
false positives).

Measured for the old fixed config (16 perms / 4 bands / 4 rows: the r9
VERDICT weak item, theoretical miss (1-J^4)^4 ~ 12% at J=0.8) vs the
derived config (_derive_lsh_config: 18/6/3, miss budget <= 2% at J=0.8),
next to the closed-form expectation 1-(1-J^r)^b, plus a junk-efficiency
row at J=0.25 (planted sub-threshold pairs that SHOULD not collide).

Usage: PYTHONPATH=/root/repo python tools/dedup_recall_probe.py
Prints PROBE lines for SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAIRS = 300  # planted pairs per Jaccard level
M_TOKENS = 62  # tokens per doc -> 60 shingles


def planted_corpus():
    """[(doc_id, text)], [(doc_a, doc_b, j_actual)] — per-pair disjoint
    vocab; pair docs share the first s tokens, so shingle intersection
    = s-2, |A| = |B| = M-2, J = (s-2) / (2(M-2) - (s-2))."""
    docs, pairs = [], []
    did = 0
    sh = M_TOKENS - 2
    for lvl, j in enumerate((0.25, 0.7, 0.8, 0.9)):
        # invert J for the shared-shingle count i = 2J*sh/(1+J)
        i = round(2 * j * sh / (1 + j))
        s = i + 2
        j_act = i / (2 * sh - i)
        for p in range(N_PAIRS):
            tag = f"l{lvl}p{p}"
            base = [f"{tag}t{k}" for k in range(M_TOKENS)]
            var = base[:s] + [f"{tag}x{k}" for k in range(M_TOKENS - s)]
            docs.append((did, " ".join(base)))
            docs.append((did + 1, " ".join(var)))
            pairs.append((did, did + 1, lvl, j_act))
            did += 2
    return docs, pairs


def main() -> None:
    from pyspark.sql import functions as F

    from gravitydb_spark.pipeline_queries import (
        LSH_BANDS,
        LSH_ROWS,
        N_MINHASH,
        _derive_lsh_config,
    )
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="dedup_recall_probe", shuffle_partitions=16)
    docs, pairs = planted_corpus()
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(
        pairs, "doc_a long, doc_b long, lvl int, j double"
    )

    # the real shingle relation: 3-gram over whitespace tokens
    sh = (
        ddf.select(
            "doc_id", F.split("text", " ").alias("t")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )

    configs = [("fixed-r8", 4, 4, 16), ("derived", LSH_ROWS, LSH_BANDS, N_MINHASH)]
    print(
        f"PROBE dedup_recall derived_config rows={LSH_ROWS} bands={LSH_BANDS}"
        f" n_perm={N_MINHASH} (from _derive_lsh_config:"
        f" {_derive_lsh_config()})"
    )
    for name, r, b, n in configs:
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(n)
        ]
        sigs = sh.groupBy("doc_id").agg(*aggs)
        bks = sigs.select(
            "doc_id",
            *[
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"h{band * r + k}") for k in range(r)]
                    )
                ).alias(f"bk{band}")
                for band in range(b)
            ],
        )
        a = bks.alias("a")
        bb = bks.alias("b")
        hit = F.lit(False)
        for band in range(b):
            hit = hit | (F.col(f"a.bk{band}") == F.col(f"b.bk{band}"))
        joined = (
            pdf.join(a, pdf.doc_a == F.col("a.doc_id"))
            .join(bb, pdf.doc_b == F.col("b.doc_id"))
            .groupBy("lvl", "j")
            .agg(
                F.count("*").alias("planted"),
                F.sum(hit.cast("long")).alias("caught"),
            )
            .orderBy("lvl")
            .collect()
        )
        for row in joined:
            exp = 1.0 - (1.0 - row.j**r) ** b
            kind = "junk" if row.j < 0.5 else "target"
            print(
                f"PROBE dedup_recall config={name} ({n}/{b}b/{r}r) {kind}"
                f" J={row.j:.3f} planted={row.planted} caught={row.caught}"
                f" recall={row.caught / row.planted:.3f} expected={exp:.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
