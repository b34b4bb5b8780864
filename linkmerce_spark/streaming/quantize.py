"""Streaming SQ8 quantizer-drift monitor.

A trained scalar quantizer (``operators/quantize.sq8_train``: one
(mn, mx) per dimension) silently degrades when the live distribution
walks out of the trained range — every out-of-range value saturates
to code 0 or 255 and its reconstruction error is no longer bounded by
half a step. The production-shaped guard is a STREAMING monitor over
the ingest: per-dimension running min/max plus cumulative counts of
values strictly outside the trained range, held in GroupState (three
numbers + two counters per dimension — state size is the vector
dimensionality, independent of stream length, the same bounded-state
argument as the streaming sketches).

min/max folding is associative and commutative, and doubles widen
from float32 exactly, so the running extrema are bit-identical to a
batch ``sq8_train`` over the union of all micro-batches — the
equivalence the tests pin, with checkpoint-resume on top.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["streaming_sq8_drift", "sq8_drift_update"]


def sq8_drift_update(
    st: tuple, xs: Any, trained_mn: float | None, trained_mx: float | None
) -> tuple:
    """Fold a batch of values into (mn, mx, n, below, above) drift
    state. NULL/NaN values are excluded (they carry no range signal);
    'outside' is STRICT inequality vs the trained range — a value
    exactly at the edge encodes losslessly to code 0/255."""
    mn, mx, n, below, above = st
    for x in xs:
        if x is None:
            continue
        x = float(x)
        if math.isnan(x):
            continue
        n += 1
        if mn is None or x < mn:
            mn = x
        if mx is None or x > mx:
            mx = x
        if trained_mn is not None and x < trained_mn:
            below += 1
        if trained_mx is not None and x > trained_mx:
            above += 1
    return mn, mx, n, below, above


def streaming_sq8_drift(
    vecs: DataFrame,
    trained: Mapping[int, tuple[float, float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension streaming drift report (update semantics).

    ``vecs``: a streaming DataFrame with an array<float> column.
    ``trained``: {dim: (mn, mx)} from a batch ``sq8_train`` —
    broadcast into the state function via closure (dimensionality-
    sized, the same economics as a broadcast dim table).

    Emits one row per dimension per micro-batch that touched it:

    - ``dim``, ``n_values``: cumulative values seen;
    - ``mn_micro`` / ``mx_micro``: RUNNING extrema in the same half-up
      microunits as the batch audit (bit-identical fold);
    - ``n_below`` / ``n_above``: cumulative values strictly outside
      the trained range (each one saturates its int8 code);
    - ``untrained``: the dimension has NO trained bounds at all — a
      new dimension appearing in the stream is the most drastic drift
      there is (the quantizer cannot encode it), so it must flag, not
      silently count everything as in-range;
    - ``drifted``: the retrain signal — the running range has left
      the trained range, or the dimension is untrained."""
    import pandas as pd

    from linkmerce_spark.shipping import ensure_shipped

    out_schema = StructType(
        [
            StructField("dim", LongType(), True),
            StructField("n_values", LongType(), True),
            StructField("mn_micro", LongType(), True),
            StructField("mx_micro", LongType(), True),
            StructField("n_below", LongType(), True),
            StructField("n_above", LongType(), True),
            StructField("untrained", BooleanType(), True),
            StructField("drifted", BooleanType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("mn", DoubleType(), True),
            StructField("mx", DoubleType(), True),
            StructField("n", LongType(), True),
            StructField("below", LongType(), True),
            StructField("above", LongType(), True),
        ]
    )
    ranges = {int(d): (float(mn), float(mx)) for d, (mn, mx) in trained.items()}

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        dim = int(key[0])
        if state.exists:
            stored = state.get
            st = (stored[0], stored[1], int(stored[2]), int(stored[3]), int(stored[4]))
        else:
            st = (None, None, 0, 0, 0)
        untrained = dim not in ranges
        t_mn, t_mx = ranges.get(dim, (None, None))
        for pdf in pdfs:
            st = sq8_drift_update(st, pdf["x"].tolist(), t_mn, t_mx)
        state.update(st)
        mn, mx, n, below, above = st
        yield pd.DataFrame(
            {
                "dim": [dim],
                "n_values": [n],
                "mn_micro": [None if mn is None else math.floor(mn * 1e6 + 0.5)],
                "mx_micro": [None if mx is None else math.floor(mx * 1e6 + 0.5)],
                "n_below": [below],
                "n_above": [above],
                "untrained": [untrained],
                "drifted": [untrained or below > 0 or above > 0],
            }
        )

    ensure_shipped(vecs.sparkSession)
    exploded = vecs.select(F.posexplode(vec_col).alias("dim", "__xf")).select(
        "dim", F.col("__xf").cast("double").alias("x")
    )
    return exploded.groupBy("dim").applyInPandasWithState(
        fn, out_schema, state_schema, "update", "NoTimeout"
    )
