"""Python UDTFs (Spark 4): table functions for driver-side utilities.

The reference exposes date-range expansion as a Python utility feeding
task fan-out (utils/date.py date_range/date_pairs). As a UDTF it
becomes a SQL-visible table function usable in LATERAL position — the
same TVF idea as the marts layer, but for row-generating helpers.
Expression-first still applies (`F.sequence` + `explode` is the hot-
path date spine); the UDTF form exists for SQL users and for
generators that are genuinely imperative.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["DateRange", "DatePairs", "register_udtfs"]


@udtf(returnType="ymd: date")
class DateRange:
    """One row per day in [start, end] (inclusive)."""

    def eval(self, start: str, end: str):
        import datetime as dt

        d = dt.date.fromisoformat(start)
        e = dt.date.fromisoformat(end)
        while d <= e:
            yield (d,)
            d += dt.timedelta(days=1)


@udtf(returnType="batch_start: date, batch_end: date")
class DatePairs:
    """[start, end] split into batch_days-sized [lo, hi] windows —
    the reference's date_pairs batching (utils/date.py), e.g. for
    N-day incremental loads."""

    def eval(self, start: str, end: str, batch_days: int):
        import datetime as dt

        lo = dt.date.fromisoformat(start)
        e = dt.date.fromisoformat(end)
        step = dt.timedelta(days=max(1, batch_days))
        while lo <= e:
            hi = min(lo + step - dt.timedelta(days=1), e)
            yield (lo, hi)
            lo = hi + dt.timedelta(days=1)


def register_udtfs(spark) -> None:
    """Register the table functions for SQL use (LATERAL position)."""
    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.udtf.register("date_range", DateRange)
    spark.udtf.register("date_pairs", DatePairs)

