"""Watermarked stream-stream interval join.

The one Structured Streaming family member the layer lacked: joining
two live streams with an event-time bound (view -> purchase within N
minutes, impression -> click attribution, order -> shipment SLA).
Spark buffers both sides in the state store and the TIME-BOUND JOIN
CONDITION plus the watermarks let it evict: a left row older than
``max_delay + watermark`` can never match a future right row, so
state is bounded regardless of stream length — the property that
makes the operator legal at 100 TB/day ingest.

Semantics are exactly the batch interval join (operators/rangejoin.py
covers the rolling/as-of variants): INNER join on the key with
``l.ts <= r.ts <= l.ts + max_delay``. The restart-equivalence test
(tests/test_streaming_joins.py) drives it across checkpointed
availableNow runs against the batch join on the union.

Reference behavioral parity: the reference handles cross-source
event matching as batch re-runs over widened date windows
(dbt_postgres/.../smartstore__sales_daily.sql:249-258 CJ invoice
±7-day lookback); the streaming form is the extension (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def _ntz_to_ltz(df: DataFrame, ts_col: str) -> DataFrame:
    # Same normalization as streaming/windows._watermarked: watermarks
    # require TIMESTAMP (LTZ); the UTC session pin makes the cast
    # value-preserving.
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """INNER stream-stream join: right events that follow a left event
    on the same ``key`` within ``max_delay``.

    Output: the left row's columns, the right side's non-key columns
    (its timestamp aliased ``matched_ts``), and the lag in seconds.
    Column names must not collide beyond ``key`` (alias upstream).
    Both watermarks plus the interval condition bound the state store;
    looser watermarks admit later data at the cost of state.
    """
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    l = _ntz_to_ltz(left, left_ts).alias("l")
    r = _ntz_to_ltz(right, right_ts).alias("r")
    l = l.withWatermark(left_ts, watermark)
    r = r.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner").select(
        *[F.col(f"l.{c}") for c in lcols],
        *[F.col(f"r.{c}") for c in rcols],
        F.col(f"r.{right_ts}").alias("matched_ts"),
        (
            F.unix_timestamp(F.col(f"r.{right_ts}"))
            - F.unix_timestamp(F.col(f"l.{left_ts}"))
        ).alias("lag_seconds"),
    )
