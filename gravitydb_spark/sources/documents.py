"""Document-corpus sources and sinks — the interchange formats a
training-data pipeline actually ingests (JSONL dumps, CSV exports) and
emits (partitioned parquet, JSONL shards), normalized to the canonical
``documents`` schema used by every pipeline operator
(pipeline_queries.py).

Scale posture:
- Readers take EXPLICIT schemas — never schema inference, which is a full
  extra pass over 100 TB before the first real job.
- JSONL is read line-delimited (``multiLine=False``), so files split at
  arbitrary byte offsets and a single 1 TB shard still parallelizes.
- The parquet sink partitions by a low-cardinality column (``source`` /
  ``lang``) for partition pruning, and repartitions by the partition
  columns first so each output partition is one task's worth of files,
  not ``tasks x partitions`` small files.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = [
    "DOCUMENTS_SCHEMA",
    "read_documents",
    "write_documents",
    "export_jsonl_shards",
    "verify_jsonl_shards",
]

# canonical corpus schema (matches /root/testdata/sf*/documents.parquet)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_FORMATS = ("parquet", "orc", "jsonl", "csv")


def _canonicalize(df: DataFrame) -> DataFrame:
    """Project/cast to the canonical column set; derive what's derivable
    (``n_chars`` from ``text``), null-fill optional metadata."""
    cols = set(df.columns)
    if "doc_id" not in cols or "text" not in cols:
        raise ValueError(
            f"documents need at least doc_id and text; got {sorted(cols)}"
        )
    out = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("string").alias("text"),
        (
            F.col("lang").cast("string") if "lang" in cols else F.lit(None).cast("string")
        ).alias("lang"),
        (
            F.col("source").cast("string")
            if "source" in cols
            else F.lit(None).cast("string")
        ).alias("source"),
        (
            F.col("n_chars").cast("long")
            if "n_chars" in cols
            else F.length("text").cast("long")
        ).alias("n_chars"),
    )
    return out


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Optional[T.StructType] = None,
    **options,
) -> DataFrame:
    """Read a document corpus into the canonical schema.

    ``fmt``: ``parquet`` | ``orc`` | ``jsonl`` | ``csv``. The explicit ``schema``
    (default: DOCUMENTS_SCHEMA) is passed to the reader so no inference
    pass runs; extra columns in the files are simply not read (column
    pruning), missing optional ones are null-filled/derived."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt == "parquet":
        df = spark.read.options(**options).parquet(path)
    elif fmt == "orc":
        df = spark.read.options(**options).orc(path)
    elif fmt == "jsonl":
        df = (
            spark.read.schema(schema or DOCUMENTS_SCHEMA)
            .options(multiLine=False, **options)
            .json(path)
        )
    else:
        df = (
            spark.read.schema(schema or DOCUMENTS_SCHEMA)
            .options(header=True, **options)
            .csv(path)
        )
    return _canonicalize(df)


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "error",
) -> None:
    """Write a canonical-schema corpus. Parquet sinks may partition by
    low-cardinality metadata columns (``source``, ``lang``) — readers then
    prune partitions on those predicates for free. The pre-write
    repartition on the partition columns keeps output at one file set per
    partition value instead of one per (task x value)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    out = _canonicalize(df)
    if partition_by:
        if fmt != "parquet":
            raise ValueError("partition_by is only supported for parquet sinks")
        (
            out.repartition(*[F.col(c) for c in partition_by])
            .write.mode(mode)
            .partitionBy(*partition_by)
            .parquet(path)
        )
    elif fmt == "parquet":
        out.write.mode(mode).parquet(path)
    elif fmt == "orc":
        out.write.mode(mode).orc(path)
    elif fmt == "jsonl":
        out.write.mode(mode).json(path)
    else:
        out.write.mode(mode).option("header", True).csv(path)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
) -> list:
    """Export a corpus as size-capped JSONL shards plus a content
    MANIFEST — the handoff format a training run consumes: every shard
    small enough to stream, and a manifest the consumer can verify
    before trusting the data.

    The manifest (written to ``<path>/_MANIFEST.json``) lists each shard
    with its row count and an ORDER-INVARIANT content checksum (sum of
    per-line 32-bit sha256-prefix integers, mod 2^61): recomputable by any
    reader in any framework, unaffected by line order within a shard, and
    any dropped/duplicated/altered line changes it. Both passes are
    distributed — rows never transit the driver; the driver only collects
    the shard-level manifest rows (bounded by shard count).

    Returns the manifest as a list of dicts.
    """
    import json as _json
    import os as _os

    out = _canonicalize(df)
    (
        out.write.mode("error")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )
    lines = df.sparkSession.read.text(path).select(
        F.input_file_name().alias("shard"),
        (
            F.conv(F.substring(F.sha2(F.col("value"), 256), 1, 15), 16, 10)
            .cast("long")
            % F.lit(2**32)  # 32-bit per line: sums stay in int64 up to 2^31 rows/shard
        ).alias("h"),
    )
    manifest = [
        {
            "shard": _os.path.basename(r["shard"]),
            "rows": r["rows"],
            "checksum": r["checksum"],
        }
        for r in lines.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("rows"),
            (F.sum("h") % F.lit(2**61)).cast("long").alias("checksum"),
        )
        .collect()
    ]
    manifest.sort(key=lambda m: m["shard"])
    with open(_os.path.join(path, "_MANIFEST.json"), "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


class ManifestMismatch(RuntimeError):
    """A JSONL shard's recomputed row count / checksum disagrees with
    ``_MANIFEST.json`` — the corpus was altered after export."""


def verify_jsonl_shards(spark: SparkSession, path: str) -> list:
    """Consumer-side verification of an :func:`export_jsonl_shards`
    corpus: recompute each shard's row count and order-invariant content
    checksum and compare with ``_MANIFEST.json``. Raises
    :class:`ManifestMismatch` naming every disagreeing shard (missing,
    extra, shorter, or byte-altered); returns the verified manifest.

    The recompute is one distributed pass (the same aggregation the
    exporter ran); the comparison is shard-count-sized on the driver."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_MANIFEST.json")) as fh:
        expected = {m["shard"]: m for m in _json.load(fh)}
    got = {
        _os.path.basename(r["shard"]): r
        for r in spark.read.text(path)
        .select(
            F.input_file_name().alias("shard"),
            (
                F.conv(F.substring(F.sha2(F.col("value"), 256), 1, 15), 16, 10)
                .cast("long")
                % F.lit(2**32)
            ).alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("rows"),
            (F.sum("h") % F.lit(2**61)).cast("long").alias("checksum"),
        )
        .collect()
    }
    problems = []
    for name, exp in expected.items():
        act = got.get(name)
        if act is None:
            problems.append(f"{name}: missing")
        elif act["rows"] != exp["rows"]:
            problems.append(f"{name}: rows {act['rows']} != {exp['rows']}")
        elif act["checksum"] != exp["checksum"]:
            problems.append(f"{name}: checksum mismatch")
    for name in got:
        if name not in expected:
            problems.append(f"{name}: not in manifest")
    if problems:
        raise ManifestMismatch("; ".join(sorted(problems)))
    return sorted(expected.values(), key=lambda m: m["shard"])
