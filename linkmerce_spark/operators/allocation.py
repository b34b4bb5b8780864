"""Allocation operators: split a group total across member rows.

Two patterns from the reference:

1. Proportional split with remainder-to-first-row — ad cost allocated
   over bundle products by cost weight; the first row (by a stable
   order) absorbs the rounding residue so per-group sums are exact
   (dbt_postgres/.../smartstore__sales_daily.sql:170-216,333-372).
2. Equal integer split via DIV/MOD — total // n to every row, +1 to the
   first ``total % n`` rows
   (dbt_postgres/.../searchad__insight_daily.sql:195-216).

Both are window passes over ONE hash-shuffle of the group key — no
self-join (the reference's SQL shape), no second shuffle.

Determinism at scale: the weight sum is aggregated in ``decimal``
(exact, order-independent — a double window-SUM varies with partial
order); the ratio is then computed in double over exact inputs (IEEE
ops are deterministic); rounded shares are decimal so the residual
subtraction is exact. Stable intra-group ordering (``order_by``) picks
the residue row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["allocate_proportional", "allocate_integer_even"]


def allocate_proportional(
    df: DataFrame,
    group: Sequence[str],
    weight: Column | str,
    total: Column | str,
    order_by: Sequence[Column | str],
    out: str = "allocated",
    scale: int = 0,
    weight_scale: int = 6,
) -> DataFrame:
    """Allocate ``total`` over rows proportional to ``weight``.

    ``total`` must be constant within a group. Each row gets
    ``round(total * weight / sum(weight), scale)``; the first row by
    ``order_by`` absorbs ``total - sum(rounded shares)`` so the group
    sum is exactly ``total``. Zero-weight groups allocate everything to
    the first row. NULL weights count as 0 — without that coercion a
    NULL-weight row's share (and, if it sorts first, the whole group's
    residue row) would be NULL and the conservation invariant would
    silently break.
    """
    weight = F.col(weight) if isinstance(weight, str) else weight
    total = F.col(total) if isinstance(total, str) else total

    wg = Window.partitionBy(*group)
    wo = Window.partitionBy(*group).orderBy(*order_by)

    w_exact = F.coalesce(weight, F.lit(0)).cast(f"decimal(18,{weight_scale})")
    wsum = F.sum(w_exact).over(wg)
    ratio = total.cast("double") * w_exact.cast("double") / wsum.cast("double")
    # Portable half-up rounding: floor(x*10^s + 0.5) is bit-identical
    # across engines (library round() functions differ on boundary reprs).
    factor = float(10**scale)
    rounded = F.floor(ratio * factor + 0.5) / factor
    share = (
        F.when(wsum == 0, F.lit(0).cast("double")).otherwise(rounded)
    ).cast(f"decimal(18,{scale})")
    df = df.withColumn("__share", share).withColumn("__rn", F.row_number().over(wo))
    resid = total.cast(f"decimal(18,{scale})") - F.sum("__share").over(wg)
    return (
        df.withColumn(
            out,
            F.when(F.col("__rn") == 1, F.col("__share") + resid).otherwise(F.col("__share")),
        )
        .drop("__share", "__rn")
    )


def allocate_integer_even(
    df: DataFrame,
    group: Sequence[str],
    total: Column | str,
    order_by: Sequence[Column | str],
    out: str = "allocated",
) -> DataFrame:
    """Equal integer split: every row gets ``total DIV n``; the first
    ``total MOD n`` rows (by ``order_by``) get one extra unit."""
    total = F.col(total) if isinstance(total, str) else total
    wg = Window.partitionBy(*group)
    wo = Window.partitionBy(*group).orderBy(*order_by)
    n = F.count(F.lit(1)).over(wg)
    rn = F.row_number().over(wo)
    base = F.floor(total / n).cast("bigint")
    extra = total.cast("bigint") - base * n
    return df.withColumn(out, base + F.when(rn <= extra, 1).otherwise(0))
