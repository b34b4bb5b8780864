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

__all__ = [
    "cms_hash",
    "cms_counters",
    "cms_point_estimates",
    "histogram_bins",
    "histogram_quantiles",
    "exact_group_quantiles",
]


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


def histogram_bins(
    values: DataFrame, value: Column | str, bin_width: int
) -> DataFrame:
    """Equi-width histogram over integer values: (bin, n) rows.

    The third member of the mergeable-sketch family (HLL = distinct,
    CMS = frequency, this = distribution): bins merge across shards by
    plain SUM, counts are exact integers, and the groupBy partial-
    aggregates map-side. Bin ids are ``floor(v / bin_width)`` — exact
    integer division on both engines.
    """
    c = F.col(value) if isinstance(value, str) else value
    return (
        values.select(F.floor(c / F.lit(bin_width)).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    bins: DataFrame, quantiles: list[int], bin_width: int
) -> DataFrame:
    """Quantile estimates from a histogram: for each q (percent), the
    first bin whose cumulative count reaches q% of the total.

    One window pass over the (small) bin table; the estimate error is
    bounded by bin_width by construction. Output: (q, bin_lo, bin_hi,
    cum_n) — all exact integers, so two engines agree bit-for-bit.
    Rank uses ceil(q * total / 100) in pure integer math.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "bin",
        "n",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qdf = cum.sparkSession.createDataFrame([(q,) for q in quantiles], "q int")
    # target rank = ceil(q * total / 100), integer-exact
    joined = qdf.crossJoin(cum).filter(
        F.col("cum_n") * 100 >= F.col("q") * F.col("total")
    )
    first = Window.partitionBy("q").orderBy(F.col("bin").asc())
    return (
        joined.withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") == 1)
        .select(
            "q",
            (F.col("bin") * bin_width).cast("long").alias("bin_lo"),
            ((F.col("bin") + 1) * bin_width - 1).cast("long").alias("bin_hi"),
            F.col("cum_n").cast("long").alias("cum_n"),
        )
    )


def exact_group_quantiles(
    df: DataFrame,
    keys: str | list[str],
    value: Column | str,
    quantiles: list[int],
) -> DataFrame:
    """EXACT per-group discrete quantiles by rank selection.

    For each group and q (percent, 1..100) the output value is the
    element at 1-indexed rank ``ceil(q * n / 100)`` of the group's
    ascending value order — the classic lower discrete quantile. The
    exact counterpart to ``histogram_quantiles`` (bounded-error) when
    a full per-group sort is affordable.

    Engine-portable by construction: the rank target is pure integer
    math (``(q*n + 99) div 100``) and row_number ties among equal
    values all carry the same value, so the selected VALUE is
    deterministic on any engine, thread count, or partitioning even
    though the tie-row identity is not.

    Scale shape: ONE shuffle — the row_number and count windows share
    the same (keys) partitioning, the group-size derivation reuses the
    window's count (no second aggregate scan), and the quantile list
    joins as a broadcast literal. No driver collect; output is
    |groups| x |quantiles| rows.
    """
    from pyspark.sql import Window

    from linkmerce_spark.frames import values_df

    key_list = [keys] if isinstance(keys, str) else list(keys)
    c = F.col(value) if isinstance(value, str) else value
    wg = Window.partitionBy(*key_list)
    base = df.select(*key_list, c.alias("__v")).select(
        *key_list,
        "__v",
        F.row_number().over(wg.orderBy(F.col("__v").asc())).alias("__rn"),
        F.count(F.lit(1)).over(wg).alias("__n"),
    )
    qdf = values_df(
        df.sparkSession, [(int(q),) for q in quantiles], "q int"
    )
    # broadcast cross + filter, NOT a non-equi join: a |q|-row literal
    # multiplies each row by len(quantiles) inside the same stage (no
    # exchange, no BroadcastNestedLoop planning surprise) and the
    # filter keeps one row per (group, q).
    return (
        base.crossJoin(F.broadcast(qdf))
        .filter(F.expr("__rn = (q * __n + 99) div 100"))
        .select(*key_list, "q", F.col("__v").alias("qv"))
    )
