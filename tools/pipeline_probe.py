"""Pipeline-side scale probe for the round-4 operators (SCALE.md §4b/§4d).

Builds a 10×-replicated documents corpus and a 10× embeddings set in /tmp
(same constructions as the round-3 probe: near-identical replicas with
fresh doc_ids; embeddings with one sign-flipped component per replica)
and measures the new operators on base vs 10×:

  text_lm_score, text_tfidf_keywords, multimodal_audio_meta,
  multimodal_audio_energy, multimodal_phash_dedup,
  sketch_histogram_quantiles, embed_quantize_int8,
  embed_random_projection

Usage: PYTHONPATH=/root/repo python tools/pipeline_probe.py [base_sf_dir]

Prints one PROBE line per (dataset, operator); paste into SCALE.md §4b.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10
DOC_STRIDE = 10_000_000

TEXT_OPS = [
    "text_lm_score",
    "text_tfidf_keywords",
    "multimodal_audio_meta",
    "multimodal_audio_energy",
    # round-4 second block: decode+hash+bucket-join and the mergeable
    # histogram sketch, both documents-driven
    "multimodal_phash_dedup",
    "sketch_histogram_quantiles",
    # round 11: the sharded epoch shuffle rides the documents corpus
    "shuffle_epoch_shards",
]
EMB_OPS = ["embed_quantize_int8", "embed_random_projection"]
TS_OPS = [
    "events_resample_gapfill",
    "events_anomaly_zscore",
    "events_ewma_smooth",
    "events_range_window",
    "events_pivot_wide",
]


def build_rep10_docs(spark, base: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    d = spark.read.parquet(f"{base}/documents.parquet")
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * DOC_STRIDE).alias("doc_id"),
            # replica text differs by a tiny suffix → near- not exact-dup
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("rep"))).alias(
                "text"
            ),
            "lang",
            "source",
            (F.col("n_chars") + 5).alias("n_chars"),
        )
        .coalesce(16)
        .write.parquet(f"{out}/documents.parquet")
    )


def build_rep10_emb(spark, base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    e = spark.read.parquet(f"{base}/embeddings.parquet")
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * DOC_STRIDE).alias("vec_id"),
            # flip the sign of component (rep % 64) → near-duplicates
            F.expr(
                "transform(embedding, (x, i) -> "
                "CASE WHEN i = CAST(rep % 64 AS INT) THEN -x ELSE x END)"
            ).alias("embedding"),
            "label",
        )
        .coalesce(8)
        .write.parquet(f"{out}/embeddings.parquet")
    )


def build_rep10_events(spark, base: str, out: str) -> None:
    """10x the event fact: same 30-day window, 10x users — the growth
    axis a real event stream has (more entities, same time span). The
    hourly grid stays constant-size, so the time-series ops should be
    scan-bound. Reads via load_events (never raw — the ts encoding
    changes between rounds) and writes the normalized BIGINT-nanos ts,
    which normalize_events_ts passes through unchanged on re-read.
    user_id stride = DOC_STRIDE >> max(user_id), so replica ID ranges
    can never collide (a 1000 stride overlapped the 0..1499 range and
    silently produced 7x users, not 10x)."""
    from gravitydb_spark.relational_queries import load_events

    os.makedirs(out, exist_ok=True)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    e = load_events(spark, base)
    (
        e.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * DOC_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * DOC_STRIDE).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .coalesce(16)
        .write.parquet(f"{out}/events.parquet")
    )


def run(spark, sf_dir: str, label: str, ops) -> None:
    from gravitydb_spark.registry import REGISTRY, queries

    queries()  # trigger lazy registration of the query modules

    for name in ops:
        t0 = time.monotonic()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        print(
            f"PROBE {label} {name}: {time.monotonic() - t0:.1f}s {n} rows",
            flush=True,
        )


def main() -> None:
    from gravitydb_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="pipeline_probe")
    rep10 = "/tmp/pprobe_rep10"
    build_rep10_docs(spark, base, rep10)
    build_rep10_emb(spark, base, rep10)
    build_rep10_events(spark, base, rep10)
    run(spark, base, "1x", TEXT_OPS + EMB_OPS + TS_OPS)
    run(spark, rep10, f"{REPLICAS}x", TEXT_OPS + EMB_OPS + TS_OPS)


if __name__ == "__main__":
    main()
