"""Storage-layout operators: Z-order (Morton) multi-column clustering.

At 100 TB, file-level min/max statistics prune scans only along the
sort key; queries filtering on a SECOND column read everything.  The
lakehouse fix (Delta `OPTIMIZE ZORDER BY`, Iceberg `rewrite_data_files`
with a z-order strategy) interleaves the bit representations of
several keys into one Morton code and range-partitions by it, so rows
close in EVERY key dimension land in the same files and both columns'
min/max ranges stay tight per file.

The interleave is pure integer arithmetic (shift/mask/or — whole-stage
codegen, SQL-replayable bit-for-bit), and an axis-aligned power-of-two
box in key space maps to ONE contiguous Morton range (the property the
locality test asserts).

Reference analog: Polar's graph store keys nodes by (label, id) and
scans per-label ranges (src/agents/graph storage); z-ordering is the
layout that keeps BOTH dimensions prunable in one physical order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 21) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative keys:
    bit i of ``a`` → bit 2i, bit i of ``b`` → bit 2i+1.  ``bits=21``
    keeps the result under 2^42 (safe BIGINT, and exact even through a
    DOUBLE round-trip).  Pure JVM expression — zero Python, codegen."""
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_sql(a: str, b: str, bits: int = 21) -> str:
    """The identical interleave as ANSI SQL text (DuckDB-runnable) —
    the cross-engine oracle for :func:`zorder_key`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int,
    bits: int = 21,
) -> DataFrame:
    """Range-partitions and sorts ``df`` by the Morton code of
    (col_a, col_b) — the write-side layout pass: each output file
    covers one contiguous z range, so min/max stats on BOTH columns
    stay tight and either predicate prunes files.  One range-exchange
    (sampled boundaries) + in-partition sort, the same cost shape as a
    plain sorted write."""
    z = zorder_key(F.col(col_a), F.col(col_b), bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
