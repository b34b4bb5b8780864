"""Top-k per group (DISTINCT ON / QUALIFY row_number semantics).

The reference's top-1-per-group idiom is Postgres ``DISTINCT ON (k) ...
ORDER BY k, metric DESC`` (dbt_postgres/.../core__sales_daily.sql:167-181)
and DuckDB ``QUALIFY ROW_NUMBER() OVER (...) = 1``
(core/smartstore/api/order/models.sql:188).

One shuffle on the group key; ``row_number`` (not ``rank``) guarantees
exactly k rows per group, and a total ``order_by`` makes the winner
deterministic. For top-1 over very hot keys, AQE's skew handling splits
the partition; the window itself is streaming (no buffering beyond the
frame).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_per_group"]


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order_by: Sequence[Column | str],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the first ``k`` rows per group under ``order_by``.

    ``rank_col``: optionally keep the 1-based rank as a column.
    """
    w = Window.partitionBy(*group).orderBy(*order_by)
    name = rank_col or "__rn"
    out = df.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)
    if rank_col is None:
        out = out.drop(name)
    return out
