"""Mergeable frequency sketches on portable hashes (count-min).

Companion to the deterministic HyperLogLog in ``queries.py``: the same
engine-portable md5 hashing, the same design goal — every register /
counter is an explicit column expression, so shards built on different
machines (or different SQL engines) merge EXACTLY. Spark's built-in
``count_min_sketch`` function exists but its binary layout is
implementation-internal; this one is a plain (row, col, count) table —
``SUM`` over shards is the merge operator, and any engine re-derives
identical counters from the same data.

Scale shape: building the counters is one map-side-combinable groupBy
over d x n hashed rows (d small, 3-5); the counter table is d*width
rows regardless of input size. Point queries join the probe set against
the counters and take MIN over the d rows — probe sets are small by
construction, so the join broadcasts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_hash", "cms_counters", "cms_point_estimates"]


def cms_hash(key: Column | str, row: int, width: int) -> Column:
    """Column index of ``key`` in counter row ``row``: md5 over the
    row-salted key, first 8 hex chars mod width (same construction both
    engines evaluate identically; mirrors sampling.hash_bucket)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), c.cast("string"))), 1, 8),
        16,
        10,
    )
    return F.pmod(h.cast("bigint"), F.lit(width)).cast("int")


def cms_counters(
    items: DataFrame,
    key: Column | str,
    depth: int = 4,
    width: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Build the (row, col, total) counter table.

    ``weight`` defaults to 1 per input row (frequency sketch); pass a
    column for weighted counts. Output has at most depth*width rows.
    """
    w = weight if weight is not None else F.lit(1)
    rows = [
        items.select(
            F.lit(r).alias("row"),
            cms_hash(key, r, width).alias("col"),
            w.cast("long").alias("__w"),
        )
        for r in range(depth)
    ]
    stacked = reduce(lambda a, b: a.unionByName(b), rows)
    return stacked.groupBy("row", "col").agg(F.sum("__w").alias("total"))


def cms_point_estimates(
    counters: DataFrame,
    probes: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """CMS point query for every probe row: min over the d counters.

    Returns ``probes`` + ``cms_estimate`` (an upper bound on the true
    count; over-estimation shrinks with width). The probe-side join is
    d rows per probe against the d*width counter table.
    """
    exploded = probes.select(
        F.col(key),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"), cms_hash(key, r, width).alias("col")
                )
                for r in range(depth)
            ])
        ).alias("__rc"),
    ).select(key, F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
    joined = exploded.join(counters, ["row", "col"], "left").na.fill(
        {"total": 0}
    )
    est = joined.groupBy(key).agg(F.min("total").alias("cms_estimate"))
    return probes.join(est, key, "left")
