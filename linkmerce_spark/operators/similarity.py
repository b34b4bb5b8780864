"""Vectorized similarity kernels: exact-parity quantized cosine.

Scoring 10^5..10^9 candidate pairs with per-element SQL expressions is
the slow path twice over: higher-order array functions evaluate
interpreted, and an unrolled 64-term codegen expression gets duplicated
at every plan site a filter pushdown copies it to. The scale answer is
an Arrow-batched Pandas UDF: whole batches of pairs hit numpy as one
(n, dim) matrix op.

Float matrix math is NOT engine-portable (summation order differs), so
the kernel quantizes components to int64 first — floor(x*quant + 0.5)
— making the dot product and squared norms exact integer arithmetic:
bit-identical in numpy, Spark, and a DuckDB oracle, independent of
summation order. The division and sqrt that follow are single IEEE
double ops on exact inputs, deterministic everywhere.

At cluster scale, pair generation stays a join (bucketed by LSH cell,
IVF label, or broadcast query set — see queries.py); this kernel is
the per-pair scorer. For dense all-pairs blocks, the same math lifts
to cogrouped applyInPandas with one BLAS-style matmul per block pair.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "quantized_cosine",
    "QUANT_DEFAULT",
    "ivf_centroids",
    "ivf_assign",
    "ivf_train",
]

QUANT_DEFAULT = 1000


def _make_kernel(quant: int):
    @pandas_udf("double")
    def _qcos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        A = np.array([np.asarray(x, dtype="float64") for x in a])
        B = np.array([np.asarray(x, dtype="float64") for x in b])
        Aq = np.floor(A * quant + 0.5).astype("int64")
        Bq = np.floor(B * quant + 0.5).astype("int64")
        dot = (Aq * Bq).sum(axis=1).astype("float64")
        na = np.sqrt((Aq * Aq).sum(axis=1).astype("float64"))
        nb = np.sqrt((Bq * Bq).sum(axis=1).astype("float64"))
        denom = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dot / denom
        cos[denom == 0.0] = np.nan
        return pd.Series(cos)

    return _qcos


def quantized_cosine(
    a: Column | str, b: Column | str, quant: int = QUANT_DEFAULT
) -> Column:
    """Cosine of two array<float> columns on quant-ized components.

    NULL (not NaN) when either vector quantizes to zero. The value is
    deterministic across engines; round with floor(x*10^s + 0.5) for
    threshold comparisons against a SQL oracle.
    """
    from linkmerce_spark.shipping import ensure_shipped

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        ensure_shipped(active)
    c = _make_kernel(quant)(
        F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    )
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


def ivf_centroids(dim: int, k: int, quant: int = QUANT_DEFAULT) -> list[list[int]]:
    """Deterministic integer centroids in [-quant, quant], shared with
    the SQL oracle (same closed-form constants)."""
    return [
        [((j * 131 + i * 2654435761 + 13) % (2 * quant + 1)) - quant for i in range(dim)]
        for j in range(k)
    ]


def ivf_assign(
    df,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    quant: int = QUANT_DEFAULT,
    centroids: list[list[int]] | None = None,
):
    """Add ``cell`` (nearest centroid, 1-based) and ``dist2`` (its
    squared L2 distance) — the IVF coarse quantizer.

    ``centroids`` defaults to the closed-form constants (stable unit
    tests); pass ``ivf_train(...)`` output for data-adaptive cells.
    All arithmetic is int64 on quantized components: the assignment is
    exact and engine-portable (ties break to the lowest cell index via
    first-position-of-min, same rule as SQL list_position). The cell is
    the shuffle key for probe-time candidate generation; at index-build
    scale this is a pure per-row map — no shuffle at all.
    """
    cents = centroids if centroids is not None else ivf_centroids(dim, k, quant)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
    )
    df = df.withColumn("__q", q)
    dists = []
    for plane in cents:
        consts = F.array(*[F.lit(int(c)).cast("bigint") for c in plane])
        d = F.aggregate(
            F.zip_with(F.col("__q"), consts, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        dists.append(d)
    darr = F.array(*dists)
    return (
        df.withColumn("__d", darr)
        .withColumn("dist2", F.array_min("__d"))
        .withColumn("cell", F.array_position("__d", F.col("dist2")).cast("int"))
        .drop("__q", "__d")
    )


def ivf_train(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    quant: int = QUANT_DEFAULT,
    oversample: int = 2,
) -> list[list[int]]:
    """Deterministic k-means||-style centroid training, exact-integer.

    The classic k-means|| recipe — oversample candidate seeds, weight
    each candidate by how many points it attracts, reduce to k, then
    Lloyd-refine — with every random draw replaced by a deterministic
    rule so a SQL oracle reproduces it bit-for-bit:

    1. candidates = the ``k*oversample`` sample vectors with the
       smallest ids, quantized to int64 (candidate index = id order);
    2. weights   = per-candidate member counts over the FULL data
       (nearest candidate, exact int L2, first-min tie rule);
    3. reduce    = top-k candidates by (weight DESC, candidate ASC);
    4. refine    = one Lloyd step: members' element-wise floor-mean
       ((s - ((s%c)+c)%c)/c — floor semantics under both engines' %),
       empty cells keep their seed vector.

    Only k-sized aggregates ever reach the driver (three collects of
    ≤ k*oversample rows) — the scans stay distributed, so the same
    procedure runs against a 100 TB table; at that scale you would
    train on a sampled sub-frame (``df.sample``) and the procedure is
    unchanged. Returns k integer centroid vectors for ``ivf_assign``
    (and for rendering the twin SQL's VALUES — though the oracle can
    also re-derive them from scratch, which is what oracles.py does).
    """
    m = k * oversample
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
    )
    # Three passes read the quantized vectors (seed pick, weighting,
    # Lloyd stats) — persist once so the parquet scan + quantize run a
    # single time per training. Training is one job on a cluster; the
    # cache is released before returning.
    qdf = df.select(F.col(id_col).alias("__id"), q.alias("__q")).persist()

    cands = [
        [int(v) for v in r["__q"]]
        for r in qdf.orderBy("__id").limit(m).collect()
    ]

    def _nearest(frame, cents):
        dists = []
        for plane in cents:
            consts = F.array(*[F.lit(int(c)).cast("bigint") for c in plane])
            dists.append(
                F.aggregate(
                    F.zip_with(F.col("__q"), consts, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
            )
        darr = F.array(*dists)
        return frame.withColumn(
            "cell", F.array_position(darr, F.array_min(darr)).cast("int")
        )

    wts = {
        r["cell"]: r["cnt"]
        for r in _nearest(qdf, cands)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    order = sorted(range(1, m + 1), key=lambda c: (-wts.get(c, 0), c))[:k]
    seeds = [cands[c - 1] for c in order]

    stats = (
        _nearest(qdf, seeds)
        .select("cell", F.posexplode("__q").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    qdf.unpersist()
    by_cell: dict[int, dict[int, int]] = {}
    for r in stats:
        # Python // is floor division — identical to the SQL
        # (s - ((s % c) + c) % c) / c form for negative sums.
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["s"] // r["c"]
    return [
        [by_cell[j + 1][i] for i in range(dim)] if (j + 1) in by_cell else seeds[j]
        for j in range(k)
    ]
