"""Hot-hour skew probe for events_session_overlap (SCALE.md §4j).

The binned interval join's adversarial case is a BURST: K sessions from
K distinct users all inside ONE hour bin → ~K²/2 bin-join candidates in
a single bucket. Two regimes:

- dense burst (sessions span the whole hour): essentially every
  candidate pair truly overlaps — candidate work is output-proportional,
  the honest cost of the answer;
- sparse burst (2-minute sessions scattered through the hour): only
  ~1/15 of candidates overlap — the rest are the bin join's false-
  candidate overhead, bounded by (bin / session_len)× the output.

Builds /tmp corpora = base sf events + a synthetic burst, measures the
operator end-to-end (cold session cache, then warm), and prints PROBE
lines + candidate/output counts; paste into SCALE.md §4j.

Usage: PYTHONPATH=/root/repo python tools/interval_skew_probe.py [base_sf_dir] [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_burst(spark, base_dir, out_dir, k, dense):
    """base events + K one-session users inside hour bin [T, T+3600)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    ev = spark.read.parquet(f"{base_dir}/events.parquet")
    # burst users far above the base id space; event ids likewise
    t0 = "TIMESTAMP'2027-06-01 12:00:00'"  # an hour no base event touches
    if dense:
        # events every 1500s (< the 1800s gap) -> ONE ~50-min session
        offs = [0, 1500, 3000]
    else:
        # two events 120s apart, session start staggered per user so the
        # hour is tiled with short sessions (most pairs do NOT overlap)
        offs = None
    u = spark.range(k).select(
        (F.col("id") + 10_000_000).alias("uid"), F.col("id").alias("i")
    )
    if dense:
        rows = u.select(
            "uid",
            F.explode(F.array(*[F.lit(o) for o in offs])).alias("off"),
        )
    else:
        start = (F.col("i") * 3480 / k).cast("long")  # staggered starts
        rows = u.select(
            "uid", F.explode(F.array(start, start + 120)).alias("off")
        )
    burst = rows.select(
        (F.monotonically_increasing_id() + 900_000_000).alias("event_id"),
        F.expr(f"{t0} + make_interval(0, 0, 0, 0, 0, 0, off)").alias("ts"),
        F.col("uid").alias("user_id"),
        F.lit("burst").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    ev.unionByName(burst).coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents_tmp")
    )
    # single-file layout matching testdata (documents.parquet-style name)
    tmp = os.path.join(out_dir, "documents_tmp")
    dst = os.path.join(out_dir, "events.parquet")
    parts = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
    if len(parts) == 1:
        shutil.move(os.path.join(tmp, parts[0]), dst)
    else:
        os.makedirs(dst)
        for p in parts:
            shutil.move(os.path.join(tmp, p), os.path.join(dst, p))
    shutil.rmtree(tmp)
    return out_dir


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    from gravitydb_spark.session import get_spark
    from gravitydb_spark.registry import queries

    spark = get_spark(app_name="interval_skew_probe")
    fn = queries()["events_session_overlap"]

    for name, d in [
        ("base", base),
        ("dense_burst", build_burst(spark, base, "/tmp/iv_dense", k, True)),
        ("sparse_burst", build_burst(spark, base, "/tmp/iv_sparse", k, False)),
    ]:
        t0 = time.perf_counter()
        n = fn(spark, d).count()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, d).count()
        warm = time.perf_counter() - t0
        # burst-only output (pairs among burst users)
        nb = (
            fn(spark, d)
            .filter(F.col("user_a") >= 10_000_000)
            .agg(F.sum("n_overlaps"))
            .collect()[0][0]
        )
        print(
            f"PROBE events_session_overlap {name}: cold {cold:.2f}s warm "
            f"{warm:.2f}s, {n} user-pair rows, burst overlaps {nb}"
        )


if __name__ == "__main__":
    main()
