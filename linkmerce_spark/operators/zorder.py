"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB a table is usually filtered on more than one column
(customer AND date; shop AND hour), but a sort can only give
locality on its leading column. Interleaving the bits of two bucket
coordinates into one Morton key gives *both* dimensions locality:
rows close in z are close in each coordinate, so per-file min/max
footer statistics become tight in every interleaved dimension and a
scan with either predicate prunes files. This is the layout step
behind Databricks Delta's OPTIMIZE ZORDER and Iceberg's z-ordered
sort orders — implemented here as pure integer codegen expressions
plus a range-partitioned sorted write.

Everything is deterministic integer math (shift/or/and), so the
DuckDB twin reproduces the key bit-for-bit; no UDF, no shuffle
beyond the single range partitioning of the write itself.

Reference behavioral parity: the reference's warehouse layer loads
by single-column date partitions only (dbt models' partition-by
clauses); multi-dimensional clustering is the scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "interleave_bits",
    "interleave_bits_sql",
    "zorder_layout",
]


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key of two non-negative bucket coordinates, ``bits``
    each: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at
    position 2i. Inputs outside [0, 2^bits) are masked to their low
    ``bits`` (callers should bucket first). Pure shift/and/or
    expression tree — whole-stage codegen, engine-portable."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = a.cast("bigint")
    b = b.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return z


def interleave_bits_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton key as an ANSI-SQL expression string (for
    oracle twins and pushdown into external engines)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-cluster ``df`` by the Morton key of two bucket coordinates:
    one range-partitioning shuffle on z, then an in-partition sort, so
    a subsequent parquet write produces files whose min/max footer
    stats are tight in BOTH dimensions. Returns the clustered frame
    (write it with your usual writer)."""
    z = interleave_bits(a, b, bits).alias("_z")
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
