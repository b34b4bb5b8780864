"""As-of (nearest-key temporal) join.

The classic time-series lookup: for every left row, attach the single
right row with the greatest timestamp at-or-before the left timestamp
(direction='backward'; 'forward' is the mirror). Reference parity: the
effective-dated interval joins of dbt_postgres
(models/intermediate/ads/searchad__insight_daily.sql:97-112) are the
closed-interval special case of this operator; as-of is the open-ended
form a changelog (no end_date maintained) needs — e.g. "price in effect
at order time", "last click before purchase".

Spark-first design — NO join is ever planned, so there is no
BroadcastNestedLoop / O(n·m) range-join risk:

1. Tag both sides and union them (cheap, columnar, no shuffle yet).
2. One shuffle: ``Window.partitionBy(keys).orderBy(ts, side_tag)``.
3. ``last(right_payload, ignorenulls=True)`` over the running frame
   gives each left row its most recent right match in a single sorted
   pass (right rows sort BEFORE left rows at equal ts, so ties are
   inclusive — identical to DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
4. Keep left rows, unpack the payload struct.

Cost: exactly one exchange on the join keys — the same shuffle a plain
equi-join would pay — plus an in-partition sort. Scales with the data,
not with candidate pairs: a 100 TB fact side shuffles once, and a key's
whole history streams through one sorted partition (keys are assumed
user/entity-grained; a single global key would serialize — use the
effective-dated interval join for dimension-grained lookups instead).

Determinism: if the right side has duplicate (keys, ts) rows the match
would be order-dependent; callers must pre-dedupe (``tiebreak`` lets
the operator do it: highest tiebreak value wins deterministically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the nearest ``right`` row.

    direction='backward' matches the greatest ``right_ts`` <= ``left_ts``;
    'forward' matches the smallest ``right_ts`` >= ``left_ts`` (both
    inclusive). ``tolerance`` (a Column interval / numeric delta) nulls
    matches farther than the given distance, preserving the left row.
    ``tiebreak``: right column whose HIGHEST value wins among duplicate
    (keys, right_ts) rows, making the match deterministic.

    Right payload columns (everything but keys) are appended; name
    collisions with left columns get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(keys)
    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }

    # Tagged union: right rows carry their payload as one struct, left
    # rows carry NULL payload. At equal timestamps the right row must
    # sort first so the inclusive match is visible to the left row.
    ts_type = dict(left.dtypes)[left_ts]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tie"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))

    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__side").asc(),
        # among right rows at one ts, the winning tiebreak must sort
        # LAST so last() picks it.
        F.col("__tie").asc_nulls_first(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r.select(*l.columns))
    matched = u.select(
        *keys,
        "__ts",
        "__side",
        "__left",
        F.last("__payload", ignorenulls=True).over(w).alias("__match"),
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        dist = (
            F.col("__ts") - F.col("__match_ts")
            if asc
            else F.col("__match_ts") - F.col("__ts")
        )
        in_tol = F.col("__match_ts").isNotNull() & (dist <= tolerance)
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )

    out = matched.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__match.{c}").alias(out_names[c])
            for c in payload_cols
        ],
    )
    return out


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    bucket_width: int,
    direction: str = "backward",
    tolerance: Column | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Skew-hardened as-of join: partitions bounded by time bucket.

    ``asof_join`` partitions by key alone, so one hyperactive key
    serializes into a single sorted partition. This variant buckets
    time into ``bucket_width`` spans and partitions by (keys, bucket):

    1. Per (key, bucket) the LAST right row reduces to a bucket
       summary (row_number, map-side bounded).
    2. A running last() over the (small) summary frame yields each
       bucket's CARRY-IN — the match for left rows that precede every
       in-bucket right row. Carry-ins keep their true timestamps, so
       they sort naturally before in-bucket rows.
    3. The main union+window pass from ``asof_join`` then runs per
       (keys, bucket) — partition size is capped by the bucket width
       no matter how hot the key.

    Timestamps must be NUMERIC here (epoch seconds/micros, day
    numbers); 'forward' is handled by sign-flipping the working axis.
    Semantics are identical to ``asof_join`` (property-pinned in
    tests); cost is one extra small shuffle at bucket granularity.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(keys)
    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload_cols}
    sign = 1 if direction == "backward" else -1
    bw = int(bucket_width)

    r = right.select(
        *keys,
        (F.col(right_ts) * sign).cast("long").alias("__ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tie"),
    ).withColumn("__b", F.floor(F.col("__ts") / bw).cast("long"))
    l = left.select(
        *keys,
        (F.col(left_ts) * sign).cast("long").alias("__ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    ).withColumn("__b", F.floor(F.col("__ts") / bw).cast("long"))

    # 1. bucket summaries: the winning right row per (keys, bucket)
    w_in = Window.partitionBy(*keys, "__b").orderBy(
        F.col("__ts").desc(), F.col("__tie").desc_nulls_last()
    )
    summ = (
        r.withColumn("__rn", F.row_number().over(w_in))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__tie")
    )
    # 2. carry-in per bucket of the (left ∪ right) bucket universe
    universe = (
        l.select(*keys, "__b").unionByName(summ.select(*keys, "__b")).distinct()
    )
    summ_full = universe.join(summ, [*keys, "__b"], "left")
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ_full.select(
        *keys,
        "__b",
        F.last("__payload", ignorenulls=True).over(w_carry).alias("__payload"),
        F.last(
            F.when(F.col("__payload").isNotNull(), F.col("__ts")),
            ignorenulls=True,
        )
        .over(w_carry)
        .alias("__ts"),
    ).filter(F.col("__payload").isNotNull())

    # 3. per-(keys, bucket) union + running last — asof_join's core,
    # with the carry-in standing in for all earlier history
    r2 = r.select(*keys, "__b", "__ts", F.lit(0).alias("__side"), "__payload", "__tie")
    c2 = carry.select(
        *keys,
        "__b",
        "__ts",
        F.lit(0).alias("__side"),
        "__payload",
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
    )
    l2 = l.select(
        *keys, "__b", "__ts", F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        "__left",
    )
    null_left = F.lit(None).cast(l.schema["__left"].dataType).alias("__left")
    u = l2.unionByName(r2.select(*r2.columns, null_left)).unionByName(
        c2.select(*c2.columns, null_left)
    )
    w = (
        Window.partitionBy(*keys, "__b")
        .orderBy(
            F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "__ts",
        "__side",
        "__left",
        F.last("__payload", ignorenulls=True).over(w).alias("__match"),
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        in_tol = F.col("__match_ts").isNotNull() & (
            (F.col("__ts") - F.col("__match_ts")) <= tolerance
        )
        matched = matched.withColumn("__match", F.when(in_tol, F.col("__match")))
    return matched.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols],
    )
