"""Range/interval joins and rolling-window aggregation.

Reference patterns:

- Effective-dated lookup: ``ON key = key AND ymd BETWEEN start_date AND
  end_date`` (dbt_postgres/.../searchad__insight_daily.sql:97-112).
- Rolling 30-day aggregate built as a date-spine range join
  (dbt_postgres/.../core__sold_qty_30d_daily.sql:112-115) and running
  cumsum built as a self-join
  (dbt_postgres/.../analytics__stock_report.sql:190-194).

Spark-first rewrites:

- ``effective_dated_join``: the equi-key part stays an equi-join (hash
  join, shuffle on key only) and the BETWEEN lands as a post-join
  filter; when the relation side is small (it is: effective-dated dim
  maps), broadcast it — zero shuffle of the fact side. A naive port
  would make this a BroadcastNestedLoop on the full predicate.
- ``rolling_range_agg``: ``Window.orderBy(days).rangeBetween(-k, -1)``
  over a per-key date spine — one shuffle, no O(n·m) join, strictly
  better than the reference's self-join at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["effective_dated_join", "rolling_range_agg"]


def effective_dated_join(
    fact: DataFrame,
    relation: DataFrame,
    keys: Sequence[str],
    point: Column | str,
    start_col: str = "start_date",
    end_col: str = "end_date",
    how: str = "left",
    broadcast_relation: bool = True,
) -> DataFrame:
    """Join ``fact`` to an effective-dated ``relation``.

    Matches relation rows whose [start_col, end_col] interval (inclusive)
    contains the fact's ``point`` date. The equi-keys drive the join
    strategy; the interval predicate is part of the join condition so
    non-matching intervals produce NULLs (not dropped rows) under
    ``how='left'``.
    """
    point = F.col(point) if isinstance(point, str) else point
    rel = broadcast(relation) if broadcast_relation else relation
    f, r = fact.alias("f"), rel.alias("r")
    cond = [f[k] == r[k] for k in keys]
    cond.append(point.between(r[start_col], r[end_col]))
    joined = f.join(r, cond, how)
    keep = [f[c] for c in fact.columns] + [
        r[c] for c in relation.columns if c not in set(keys) | {start_col, end_col}
    ]
    return joined.select(*keep)


def rolling_range_agg(
    df: DataFrame,
    keys: Sequence[str],
    date_col: str,
    aggs: dict[str, Column],
    days_back: int = 30,
    include_current: bool = False,
) -> DataFrame:
    """Per-key rolling aggregate over a trailing day window.

    For each row: aggregate over rows of the same key whose date falls
    in [date - days_back, date - 1] (or ... date] with
    ``include_current``). Implemented as a RANGE window over
    ``datediff`` days — single shuffle on ``keys``.

    ``aggs`` maps output column name -> aggregate Column (e.g.
    ``{"qty_30d": F.sum("qty")}``).
    """
    upper = 0 if include_current else -1
    days = F.datediff(F.col(date_col), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(days)
        .rangeBetween(-days_back, upper)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
