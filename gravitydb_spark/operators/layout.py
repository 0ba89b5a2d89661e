"""Z-order (Morton) data layout for multi-column data skipping.

A 100 TB table is only fast to query if most files can be SKIPPED from
min/max footer stats. Sorting by one column makes that column's file
spans tight but leaves every other column's spans full-range; bit-
interleaving two (or more) normalized keys into one Morton z-value and
range-partitioning + sorting by it bounds EVERY interleaved dimension's
span per file — the standard lakehouse layout trick (Delta/Iceberg
OPTIMIZE ZORDER), expressed here as plain Spark SQL bit arithmetic plus
``repartitionByRange``.

The reference engine has no layout optimizer (its KV store orders by
property key only — docs/key_value_store.adoc); this module is part of
the mandated beyond-reference scale surface.

Everything is integer arithmetic (floor-division normalization, shift/
mask interleave), so a DuckDB oracle replays the z computation
bit-exactly (:func:`duck_zvalue` emits the same unrolled expression in
DuckDB syntax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["zvalue_sql", "duck_zvalue", "norm_sql", "write_zordered"]


def norm_sql(col: str, mn: int, mx: int, bits: int = 16) -> str:
    """Order-preserving map of ``col`` in [mn, mx] onto [0, 2^bits-1]
    via integer floor division — Spark SQL syntax (``div``)."""
    top = (1 << bits) - 1
    span = max(mx - mn, 1)
    return f"(CAST(({col} - {mn}) AS BIGINT) * {top}) div {span}"


def _interleave(x: str, y: str, bits: int, shl: str, shr: str) -> str:
    """Unrolled Morton interleave of two ``bits``-bit values; ``shl``/
    ``shr`` are format strings for the dialect's shift syntax."""
    terms = []
    for b in range(bits):
        terms.append(shl.format(v=f"({shr.format(v=x, n=b)} & 1)", n=2 * b))
        terms.append(shl.format(v=f"({shr.format(v=y, n=b)} & 1)", n=2 * b + 1))
    return "(" + " + ".join(terms) + ")"


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression interleaving two ``bits``-bit ints into a
    z-value (x gets the even bit positions, y the odd). Operands are
    cast to BIGINT so INT inputs cannot overflow the high shifts."""
    return _interleave(
        f"CAST({x} AS BIGINT)",
        f"CAST({y} AS BIGINT)",
        bits,
        shl="shiftleft({v}, {n})",
        shr="shiftright({v}, {n})",
    )


def duck_zvalue(x: str, y: str, bits: int = 16) -> str:
    """The same interleave in DuckDB syntax (``<<``/``>>``)."""
    return _interleave(
        f"CAST({x} AS BIGINT)",
        f"CAST({y} AS BIGINT)",
        bits,
        shl="({v} << {n})",
        shr="({v} >> {n})",
    )


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out in z-order over (xcol, ycol):
    normalize both keys by their min/max (one bounded 1-row collect),
    compute the Morton value, ``repartitionByRange`` into ``n_files``
    z-ranges and sort each file by z. Every file's footer then carries
    tight min/max for BOTH columns, so predicates on either (or both)
    dimensions skip most files — the multi-column generalization of a
    sorted layout. The z column itself is dropped on write."""
    b = df.agg(
        F.min(xcol).alias("xmn"),
        F.max(xcol).alias("xmx"),
        F.min(ycol).alias("ymn"),
        F.max(ycol).alias("ymx"),
    ).collect()[0]
    if any(v is None for v in (b.xmn, b.xmx, b.ymn, b.ymx)):
        raise ValueError(
            f"write_zordered: input has no rows with non-null ({xcol}, {ycol}) "
            "— z-order bounds are undefined on an empty dataset"
        )
    z = zvalue_sql(
        norm_sql(xcol, b.xmn, b.xmx, bits), norm_sql(ycol, b.ymn, b.ymx, bits), bits
    )
    (
        df.withColumn("__z", F.expr(z))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
