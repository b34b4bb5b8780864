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

__all__ = ["asof_join"]


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
