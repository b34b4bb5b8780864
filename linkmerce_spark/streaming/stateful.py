"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming surface (SURVEY §2.11) — its event-time
state lives in ordinary tables keyed (order_id, status) with re-runs
for late data. These operators carry that semantics into Structured
Streaming as the beyond-parity extension:

- ``first_seen_dedup``: exactly-once-per-key emission — the streaming
  twin of the batch ``insert_ignore`` (ON CONFLICT DO NOTHING). State
  is one marker per key; a processing-time timeout bounds the store
  exactly like the reference's lookback window bounds re-processing.
- ``running_counts``: per-key cumulative counters emitted every
  micro-batch — the streaming twin of the incremental fact rollup.

Scale notes: state is hash-partitioned by key across executors; the
timeout (TTL) is the state-size lever. Output/state schemas are
explicit StructTypes — required by the Arrow codec and stable for
checkpoint compatibility.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["first_seen_dedup", "running_counts", "last_click_attribution"]


def first_seen_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the FIRST event per key, across micro-batches.

    Batch-internal ties resolve by minimum event time. ``ttl_ms`` sets
    a processing-time timeout after which the key's marker is dropped
    (a later event would then be treated as first again) — the bounded
    late-data window, reference-style.
    """
    out_schema = StructType(
        [
            StructField("key", StringType(), True),
            StructField("first_ts", TimestampType(), True),
            StructField("n_in_batch", LongType(), True),
        ]
    )
    state_schema = StructType([StructField("seen", LongType(), True)])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        total = 0
        first_ts = None
        for pdf in pdfs:
            total += len(pdf)
            batch_min = pdf[ts_col].min()
            if first_ts is None or batch_min < first_ts:
                first_ts = batch_min
        if state.hasTimedOut:
            state.remove()
            return
        if not state.exists and total > 0:
            state.update((1,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {"key": [str(key[0])], "first_ts": [first_ts], "n_in_batch": [total]}
            )
        elif state.exists and ttl_ms is not None:
            # GroupState clears the timeout on every invocation: re-arm
            # it on the seen-key path too, otherwise a key with ongoing
            # traffic would never expire and state grows unbounded.
            state.setTimeoutDuration(ttl_ms)
        # key already seen: emit nothing, keep state

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(events.sparkSession)
    timeout = "ProcessingTimeTimeout" if ttl_ms is not None else "NoTimeout"
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout)
    )


def running_counts(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Cumulative event count per key, emitted on every batch the key
    appears in (update-style counters with explicit state)."""
    out_schema = StructType(
        [
            StructField("key", StringType(), True),
            StructField("total", LongType(), True),
        ]
    )
    state_schema = StructType([StructField("total", LongType(), True)])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in pdfs)
        prev = state.get[0] if state.exists else 0
        total = prev + n
        state.update((total,))
        yield pd.DataFrame({"key": [str(key[0])], "total": [total]})

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(events.sparkSession)
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", "NoTimeout")
    )


def last_click_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    click_type: str = "click",
    purchase_type: str = "purchase",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Streaming last-click attribution: the online form of the batch
    as-of join (operators/asofjoin + the asof_click_attribution query).

    Keyed state holds each user's most recent click (id + epoch-us);
    every purchase emits one attribution row — the state's click if it
    is within ``tolerance_us``, else NULLs. Within a micro-batch rows
    process in event-time order; across batches the checkpointed state
    carries the last click forward, so a click in one batch attributes
    a purchase in a later one. Late cross-batch CLICKS (arriving after
    a purchase already processed) cannot retro-attribute — streaming
    semantics; the batch as-of join is the exact backfill path
    (equivalence pinned in tests for in-order feeds).
    """
    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("purchase_id", LongType(), True),
            StructField("purchase_us", LongType(), True),
            StructField("click_id", LongType(), True),
            StructField("click_us", LongType(), True),
            StructField("gap_us", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_click_us", LongType(), True),
            StructField("last_click_id", LongType(), True),
        ]
    )

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        last_us, last_id = (state.get if state.exists else (None, None))
        out: dict[str, list] = {f.name: [] for f in out_schema.fields}
        # A large group arrives as MULTIPLE Arrow chunks with no global
        # order — sorting each chunk independently would process a late
        # chunk's early click after an early chunk's later purchase.
        # Buffer the whole group (bounded by the micro-batch's rows for
        # this key) and sort ONCE.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        else:
            merged = None
        for pdf in ([merged] if merged is not None else []):
            pdf = pdf.sort_values(ts_col, kind="stable")
            for row in pdf.itertuples(index=False):
                us = int(getattr(row, ts_col).value // 1000)
                etype = getattr(row, type_col)
                eid = int(getattr(row, id_col))
                if etype == click_type:
                    last_us, last_id = us, eid
                elif etype == purchase_type:
                    hit = last_us is not None and (
                        tolerance_us is None or us - last_us <= tolerance_us
                    )
                    out["user_id"].append(int(key[0]))
                    out["purchase_id"].append(eid)
                    out["purchase_us"].append(us)
                    out["click_id"].append(last_id if hit else None)
                    out["click_us"].append(last_us if hit else None)
                    out["gap_us"].append(us - last_us if hit else None)
        if last_us is not None:
            state.update((last_us, last_id))
        if out["user_id"]:
            yield pd.DataFrame(out)

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(events.sparkSession)
    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
