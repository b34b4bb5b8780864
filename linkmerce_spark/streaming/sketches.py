"""Streaming mergeable sketches: per-group HLL distinct over a stream.

The batch catalog carries a deterministic HyperLogLog whose registers
are explicit md5-based column expressions (queries.q_hll_distinct_sketch
— buckets via md5[1:8], rho via exact leading-zero thresholds on
md5[9:16]). Because ``max`` over registers is associative and
commutative, the SAME sketch extends to Structured Streaming with
bounded per-key state: the register vector lives in GroupState and
each micro-batch folds its keys in with element-wise max — the
mergeable-sketch property is exactly what makes streaming state legal
here (state size is m longs per group, independent of stream length).

``streaming_hll_distinct`` uses bit-identical hash/rho math to the
batch operator (asserted by the equivalence test), so a streaming
estimate can be checkpointed, resumed, or merged with batch shards
without drift.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["streaming_hll_distinct", "hll_update", "streaming_kmv_sketch", "kmv_update"]

_TWO32 = 1 << 32


def _bucket_rho(value: Any, m: int) -> tuple[int, int]:
    """Bit-identical to the batch expressions: md5 hex chars 1-8 ->
    bucket (mod m), chars 9-16 as a 32-bit value -> rho = 1 + leading
    zeros, clamped at 32 exactly like queries._hll_rho (the register
    contribution 2^(32-rho) must stay a positive integer)."""
    h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    bucket = int(h[:8], 16) % m
    v = int(h[8:16], 16)
    rho = 32 if v == 0 else 33 - v.bit_length()
    return bucket, rho


def _canonical(value: Any) -> str | None:
    """Render a pandas cell the way the batch side's
    ``md5(cast(col as string))`` does: NULL/NaN hashes to nothing
    (excluded, like SQL md5(NULL)), and integral floats — the dtype
    Arrow->pandas coerces nullable int64 columns to — render without
    the trailing '.0' that would silently break bit-equivalence."""
    if value is None:
        return None
    if isinstance(value, float):
        if value != value:  # NaN (pandas' NULL for coerced numerics)
            return None
        if value.is_integer():
            return str(int(value))
    return str(value)


def hll_update(regs: list[int], values: Any, m: int) -> list[int]:
    """Fold values into a register vector (element-wise max); NULL/NaN
    values are excluded, matching the batch side's md5(NULL) = NULL."""
    for value in values:
        rendered = _canonical(value)
        if rendered is None:
            continue
        bucket, rho = _bucket_rho(rendered, m)
        if rho > regs[bucket]:
            regs[bucket] = rho
    return regs


def streaming_hll_distinct(
    events: DataFrame,
    group_col: str,
    key_col: str,
    m: int = 64,
) -> DataFrame:
    """Per-group streaming distinct-count sketch (update semantics).

    Emits one row per group per micro-batch that touched it:
    (group, m, nonzero_buckets, sum_scaled, n_updates) — the same
    exact-integer register rollup the batch operator outputs, so the
    raw estimate is the same client-side formula (alpha*m^2 /
    (sum_scaled / 2^32)).
    """
    import pandas as pd

    from linkmerce_spark.shipping import ensure_shipped

    out_schema = StructType(
        [
            StructField("group", StringType(), True),
            StructField("m", LongType(), True),
            StructField("nonzero_buckets", LongType(), True),
            StructField("sum_scaled", LongType(), True),
            StructField("n_updates", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("regs", ArrayType(LongType()), True),
            StructField("n", LongType(), True),
        ]
    )

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            regs, n = list(stored[0]), int(stored[1])
        else:
            regs, n = [0] * m, 0
        for pdf in pdfs:
            n += len(pdf)
            hll_update(regs, pdf[key_col].tolist(), m)
        state.update((regs, n))
        nonzero = sum(1 for r in regs if r > 0)
        sum_scaled = sum(1 << (32 - r) for r in regs if r > 0) + (m - nonzero) * _TWO32
        yield pd.DataFrame(
            {
                "group": [str(key[0])],
                "m": [m],
                "nonzero_buckets": [nonzero],
                "sum_scaled": [sum_scaled],
                "n_updates": [n],
            }
        )

    ensure_shipped(events.sparkSession)
    return (
        events.groupBy(group_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", "NoTimeout")
    )


# ---------------------------------------------------------------------------
# Streaming KMV: per-group k-minimum-values sketch with bounded state
# ---------------------------------------------------------------------------


def kmv_update(sketch: list[int], values: Any, k: int, salt: str = "kmv") -> list[int]:
    """Fold values into a KMV sketch (sorted list of the k smallest
    32-bit hashes): hash, merge, truncate — the associative merge that
    makes the sketch legal as streaming state. Hash construction is
    bit-identical to the batch ``operators.sketches.kmv_hash``
    (md5 of salt||str(value), first 8 hex chars), via the same
    ``_canonical`` rendering as the streaming HLL."""
    pool = set(sketch)
    for value in values:
        rendered = _canonical(value)
        if rendered is None:
            continue
        pool.add(int(hashlib.md5((salt + rendered).encode("utf-8")).hexdigest()[:8], 16))
    return sorted(pool)[:k]


def streaming_kmv_sketch(
    events: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group streaming KMV distinct sketch (update semantics).

    State is the k smallest hashes seen so far — k longs per group,
    independent of stream length (the same bounded-state argument as
    the streaming HLL, but for the sketch that can also INTERSECT:
    checkpointed streaming sketches merge with batch shards or each
    other via ``operators.sketches``' re-rank-keep-k).

    Emits one row per touched group per micro-batch:
    (group, sketch_size, max_h, n_updates) — ``sketch_size`` and
    ``max_h`` (= h_k once full) are exactly what the batch
    ``kmv_estimates`` reads, so the client-side estimate is the same
    ``(k-1) * 2^32 / h_k`` formula, drift-free across batch/stream.
    """
    import pandas as pd

    from linkmerce_spark.shipping import ensure_shipped

    out_schema = StructType(
        [
            StructField("group", StringType(), True),
            StructField("sketch_size", LongType(), True),
            StructField("max_h", LongType(), True),
            StructField("n_updates", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("hs", ArrayType(LongType()), True),
            StructField("n", LongType(), True),
        ]
    )

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            hs, n = list(stored[0]), int(stored[1])
        else:
            hs, n = [], 0
        for pdf in pdfs:
            n += len(pdf)
            hs = kmv_update(hs, pdf[key_col].tolist(), k, salt)
        state.update((hs, n))
        yield pd.DataFrame(
            {
                "group": [str(key[0])],
                "sketch_size": [len(hs)],
                "max_h": [max(hs) if hs else 0],
                "n_updates": [n],
            }
        )

    ensure_shipped(events.sparkSession)
    return (
        events.groupBy(group_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", "NoTimeout")
    )
