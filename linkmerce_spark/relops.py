"""Python-side relational helpers (SURVEY §2.9 parity).

Re-exposes the reference's convenience API over DataFrames:

- ``date_range_predicate`` / ``datetime_range_predicate``: collapse a
  date list into the minimal BETWEEN/IN/= predicate — the reference's
  partition-pruning WHERE synthesis (common/load.py:232-303). The
  point at scale: the collapsed literal predicate reaches the scan as
  PushedFilters / partition filters, so a 365-date backfill list
  prunes to one BETWEEN instead of a 365-way IN.
- ``iter_partitions``: per-partition-value DataFrame iterator — the
  DuckDBIterator pattern (common/load.py:714-790) used for
  per-partition sink loads (extensions/bigquery.py:558-596). The
  distinct-keys collect is driver-side by design (bounded by the
  number of partitions, not rows); each yielded frame filters by one
  key so the sink sees one partition at a time.
- ``groupby`` / ``unique``: thin wrappers mirroring
  common/load.py:638-653 and :704-711.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable, Iterator, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "date_range_predicate",
    "datetime_range_predicate",
    "iter_partitions",
    "groupby",
    "unique",
]


def _to_date(v: str | dt.date) -> dt.date:
    return dt.date.fromisoformat(v) if isinstance(v, str) else v


def _runs(dates: list[dt.date]) -> list[tuple[dt.date, dt.date]]:
    """Sorted distinct dates -> maximal consecutive runs [(lo, hi)]."""
    ds = sorted(set(dates))
    runs: list[tuple[dt.date, dt.date]] = []
    for d in ds:
        if runs and (d - runs[-1][1]).days == 1:
            runs[-1] = (runs[-1][0], d)
        else:
            runs.append((d, d))
    return runs


def date_range_predicate(col: Column | str, dates: Iterable[str | dt.date]) -> Column:
    """Minimal predicate for a set of dates: BETWEEN for runs, = for
    singletons, OR-combined; matches common/load.py:232-267 semantics.

    Returns ``lit(False)`` for an empty list (the reference's empty
    guard: no partitions selected means no scan).
    """
    c = F.col(col) if isinstance(col, str) else col
    runs = _runs([_to_date(d) for d in dates])
    if not runs:
        return F.lit(False)
    parts: list[Column] = []
    singles: list[dt.date] = []
    for lo, hi in runs:
        if lo == hi:
            singles.append(lo)
        else:
            parts.append(c.between(F.lit(lo.isoformat()).cast("date"), F.lit(hi.isoformat()).cast("date")))
    if len(singles) == 1:
        parts.append(c == F.lit(singles[0].isoformat()).cast("date"))
    elif singles:
        parts.append(c.isin([F.lit(s.isoformat()).cast("date") for s in singles]))
    pred = parts[0]
    for p in parts[1:]:
        pred = pred | p
    return pred


def datetime_range_predicate(
    col: Column | str, dates: Iterable[str | dt.date]
) -> Column:
    """Half-open timestamp variant: each run [lo, hi] becomes
    ``col >= lo AND col < hi + 1 day`` (common/load.py:269-303) — the
    correct shape for timestamp partition columns where BETWEEN on
    dates would clip intra-day rows."""
    c = F.col(col) if isinstance(col, str) else col
    runs = _runs([_to_date(d) for d in dates])
    if not runs:
        return F.lit(False)
    parts = [
        (c >= F.lit(lo.isoformat()).cast("timestamp"))
        & (c < F.lit((hi + dt.timedelta(days=1)).isoformat()).cast("timestamp"))
        for lo, hi in runs
    ]
    pred = parts[0]
    for p in parts[1:]:
        pred = pred | p
    return pred


def iter_partitions(
    df: DataFrame, keys: list[str], max_partitions: int = 10_000
) -> Iterator[tuple[tuple, DataFrame]]:
    """Yield (key_values, frame) per distinct key combination, ordered.

    Driver-side by design: collects only the DISTINCT key tuples
    (cardinality = partition count). Each yielded frame is the input
    filtered to one key — feed it to a per-partition sink load (S16).

    ``max_partitions`` bounds the driver-side collect: the intended
    keys are date/batch grains (hundreds of values). Aiming this at a
    high-cardinality column would collect the column to the driver and
    schedule one job per value — refuse loudly instead of OOMing a
    100 TB run. Raise the cap explicitly if a grain genuinely exceeds
    it.
    """
    rows = (
        df.select(*keys).distinct().orderBy(*keys).limit(max_partitions + 1).collect()
    )
    if len(rows) > max_partitions:
        raise ValueError(
            f"iter_partitions: more than {max_partitions} distinct "
            f"{tuple(keys)} combinations; this driver-side iterator is "
            "for coarse partition grains (dates, batches). Repartition "
            "by the key and use a distributed write instead, or pass a "
            "higher max_partitions explicitly."
        )
    for r in rows:
        vals = tuple(r[k] for k in keys)
        cond = F.lit(True)
        for k, v in zip(keys, vals):
            cond = cond & (F.col(k).eqNullSafe(F.lit(v)))
        yield vals, df.filter(cond)


_AGG_FNS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "mean": F.avg,
    "first": lambda c: F.first(c, ignorenulls=True),
    "any_value": lambda c: F.any_value(c, True),
    "collect_list": F.collect_list,
}


def groupby(
    df: DataFrame,
    by: list[str],
    aggs: Mapping[str, str],
    dropna: bool = True,
) -> DataFrame:
    """``groupby(df, by, {"col": "sum", ...})`` — mirrors the agg-dict
    API at common/load.py:638-653; output columns ``<fn>_<col>``."""
    if dropna:
        df = df.na.drop(subset=by)
    exprs = [_AGG_FNS[fn](c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    return df.groupBy(*by).agg(*exprs)


def unique(
    df: DataFrame,
    expr: Column | str,
    asc: bool = True,
    where: Column | None = None,
) -> DataFrame:
    """Ordered distinct values of one expression (common/load.py:704-711)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    out = df.filter(where) if where is not None else df
    out = out.select(c.alias("value")).distinct()
    return out.orderBy(F.col("value").asc() if asc else F.col("value").desc())
