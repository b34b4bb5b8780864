"""UNPIVOT (wide -> long) via ``stack``.

The reference unpivots status-timestamp columns into an event log
(core/smartstore/api/order/models.sql:263-341: one row per non-null
status date) and the BigQuery dialect uses native UNPIVOT
(dbt_bigquery analytics__profit_mom variant).

``stack`` is a generator expression — no shuffle at all; rows expand
in place within each task. NULL measure values are dropped by default
(UNPIVOT ... EXCLUDE NULLS semantics, which is what the status-event
use case needs).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unpivot"]


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str] | Mapping[str, str],
    var_name: str = "name",
    value_name: str = "value",
    drop_nulls: bool = True,
) -> DataFrame:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) rows.

    ``value_cols`` may be a mapping {column: label} to emit a custom
    label (e.g. status-code) instead of the column name. Measure columns
    are cast to a common type by Spark's ``stack``; cast beforehand if
    they differ.
    """
    if isinstance(value_cols, Mapping):
        items = list(value_cols.items())
    else:
        items = [(c, c) for c in value_cols]
    n = len(items)
    args = ", ".join(f"'{label}', `{col}`" for col, label in items)
    stacked = df.select(
        *id_cols,
        F.expr(f"stack({n}, {args}) as (`{var_name}`, `{value_name}`)"),
    )
    if drop_nulls:
        stacked = stacked.filter(F.col(value_name).isNotNull())
    return stacked
