"""Structured Streaming windowed aggregation layer.

The reference is strictly batch (SURVEY.md §2.11): late data is handled
by re-running wider date windows. This module maps those semantics onto
Structured Streaming — watermarks bound state exactly like the
reference's lookback windows bound re-processing — and doubles as the
batch implementation: every function works identically on a static
DataFrame (Spark's unified API), which is how the correctness oracle
exercises them.

Scale notes: windowed aggregation state is partitioned by (key, window)
in the state store; the watermark bounds state size. ``availableNow``
trigger reproduces the reference's incremental daily batch exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "read_events_stream"]


def read_events_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """The events parquet directory as a stream (one-file-per-trigger
    is left to the caller's trigger choice; availableNow drains it)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _watermarked(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Apply a watermark, normalizing TIMESTAMP_NTZ event time first.

    ``withWatermark`` requires TIMESTAMP (LTZ); pandas-written
    TIMESTAMP(NANOS) parquet arrives as NTZ on this Spark build
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). The session TZ is
    pinned to UTC (session.py), so the cast is value-preserving — same
    wall-clock instants, now watermark-eligible. Batch windowed aggs
    tolerate NTZ and skip this path entirely.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def _agg(df: DataFrame, window_col: Column, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    return (
        df.groupBy(window_col, *keys)
        .agg(*[a.alias(n) for n, a in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate; works on static and streaming frames."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    if watermark and df.isStreaming:
        df = _watermarked(df, ts_col, watermark)
    return _agg(df, F.window(ts_col, duration), keys, aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregate (window ``duration`` every ``slide``)."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    if watermark and df.isStreaming:
        df = _watermarked(df, ts_col, watermark)
    return _agg(df, F.window(ts_col, duration, slide), keys, aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregate (gap-based; merges on overlap)."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    if watermark and df.isStreaming:
        df = _watermarked(df, ts_col, watermark)
    return _agg(df, F.session_window(ts_col, gap), keys, aggs)
