"""Scalar quantization (SQ8) for embedding columns.

The storage-path operator a 100 TB embedding corpus actually needs:
float32 vectors are 4 bytes/dim; per-dimension affine int8 codes are
1 byte/dim at a reconstruction error bounded by half a quantization
step. This module implements the classic train/encode/audit shape
(FAISS ScalarQuantizer QT_8bit semantics — public knowledge) as pure
DataFrame expressions:

- **train**: per-dimension ``min``/``max`` over the corpus — a
  64-row aggregate with map-side partials (never a window over the
  exploded fact: 64 reducers would be the classic skew trap at scale);
- **encode**: ``q = floor((x - mn) * 255 / (mx - mn) + 0.5)`` with the
  trained stats broadcast back — codes 0..255;
- **audit**: reconstruction ``x_hat = mn + q * (mx - mn) / 255`` and
  integer-exact error statistics per dimension.

Engine-exactness: every float is an exact IEEE double (float32
widens exactly), min/max involve no summation, and encode/reconstruct
are fixed expression trees evaluated identically by Spark and DuckDB —
so errors quantized to integer nanounits sum order-independently and
the twin matches bit-for-bit. At 100 TB the plan is two shuffles
(the 64-row stat agg + the 64-row audit agg); the explode stays
in-plan and pipelines with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["sq8_train", "sq8_audit", "sq8_reconstruct", "bq_signatures"]

_LEVELS = 255.0  # codes 0..255 -> 256 levels, scale = (mx-mn)/255


def bq_signatures(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Binary quantization: 1 bit per dimension, the 32x-smaller ANN
    pre-filter code (sign-bit BQ over centered embeddings — public
    practice: Hamming pre-rank, exact rerank of survivors).

    Bit ``d`` is set iff ``x_d > 0.0`` — a threshold involving no
    corpus statistics, so the code is engine- and shard-independent.
    The signature is packed into TWO bigints of 32 bits each
    (``sig_lo`` dims 0-31, ``sig_hi`` dims 32-63): DuckDB's checked
    arithmetic rejects ``1::BIGINT << 63``. The code covers the FIRST
    64 dimensions — dims >= 65 are intentionally not represented (two
    32-bit halves hold 64 bits; both the Spark and the SQL twin bound
    their index sequences identically, so there is no engine
    divergence, just a documented cap). NULL and empty vectors take
    the total signature ``(0L, 0L)`` rather than NULL, keeping
    downstream Hamming arithmetic non-null on every row. Zero-shuffle:
    one projection of ``zip_with``/``aggregate`` expressions,
    pipelines with the scan. Hamming distance between rows is
    ``bit_count(lo^lo') + bit_count(hi^hi')``."""
    v = vec_col
    lo = (
        f"IF({v} IS NOT NULL AND size({v}) > 0, "
        f"aggregate(zip_with(slice({v}, 1, 32), "
        f"sequence(0, least(size({v}), 32) - 1), "
        f"(x, i) -> IF(CAST(x AS DOUBLE) > 0.0D, shiftleft(1L, i), 0L)), "
        f"0L, (a, b) -> a | b), 0L)"
    )
    hi = (
        f"IF({v} IS NOT NULL AND size({v}) > 32, "
        f"aggregate(zip_with(slice({v}, 33, 32), "
        f"sequence(0, least(size({v}), 64) - 33), "
        f"(x, i) -> IF(CAST(x AS DOUBLE) > 0.0D, shiftleft(1L, i), 0L)), "
        f"0L, (a, b) -> a | b), 0L)"
    )
    return emb.select(
        F.col(id_col),
        F.expr(lo).alias("sig_lo"),
        F.expr(hi).alias("sig_hi"),
    )


def sq8_train(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension quantizer stats: ``(dim, mn, mx)`` — dim 0-based.

    One shuffle, output rows = vector dimensionality. NULL vectors
    contribute nothing (posexplode emits no rows for them)."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "__xf"))
        .select("dim", F.col("__xf").cast("double").alias("x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def sq8_reconstruct(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """The DECODE path of the storage tier: train -> encode -> rebuild
    each vector from its int8 codes. Returns ``(id, rv array<double>)``
    where ``rv[d] = mn_d + q_d * (mx_d - mn_d) / 255`` — what a reader
    of the quantized corpus actually sees.

    Same engine-exactness argument as :func:`sq8_audit`: every term is
    a fixed IEEE expression tree on exact doubles, so the reconstructed
    values are bit-identical across engines and the round-trip capstone
    can be oracle-twinned. Plan shape: one 64-row stat agg broadcast
    back onto the exploded fact, then ONE shuffle to reassemble arrays
    (groupBy id, array_sort by dim — dims are unique per vector, so the
    sort is a total order and the rebuild deterministic). At 100 TB the
    encode/decode pipelines with the scan; only the reassembly
    shuffles, on the uniform vector id."""
    x = (
        emb.select(id_col, F.posexplode(vec_col).alias("dim", "__xf"))
        .select(id_col, "dim", F.col("__xf").cast("double").alias("x"))
    )
    stats = (
        x.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    j = x.join(broadcast(stats), "dim")
    mn, mx, xv = F.col("mn"), F.col("mx"), F.col("x")
    code = F.when(
        mx > mn,
        F.floor((xv - mn) * F.lit(_LEVELS) / (mx - mn) + F.lit(0.5)),
    ).otherwise(F.lit(0).cast("bigint"))
    xhat = mn + (code.cast("double") * (mx - mn)) / F.lit(_LEVELS)
    return (
        j.select(id_col, "dim", xhat.alias("xhat"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "xhat"))),
                lambda s: s["xhat"],
            ).alias("rv")
        )
    )


def sq8_audit(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Quantize -> reconstruct -> per-dimension integer-exact audit.

    Output (one row per dimension, 0-based ``dim``):

    - ``n_values``: corpus values in the dimension;
    - ``mn_micro`` / ``mx_micro``: trained range, half-up microunits;
    - ``sum_code`` / ``max_code``: the int8 code mass (distribution
      drift between shards shows up here before it hurts recall);
    - ``sum_err_nano`` / ``max_err_nano``: reconstruction |x_hat - x|
      in half-up nanounits — ``max_err_nano`` is provably bounded by
      ``(mx - mn) / 255 / 2`` scaled, the SQ8 contract.

    Constant dimensions (mx == mn) take code 0 and zero error."""
    x = (
        emb.select(F.posexplode(vec_col).alias("dim", "__xf"))
        .select("dim", F.col("__xf").cast("double").alias("x"))
    )
    stats = (
        x.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    j = x.join(broadcast(stats), "dim")
    mn, mx, xv = F.col("mn"), F.col("mx"), F.col("x")
    # fixed expression trees, mirrored verbatim in the SQL twin: each
    # IEEE op on exact doubles is engine-identical
    code = F.when(
        mx > mn,
        F.floor((xv - mn) * F.lit(_LEVELS) / (mx - mn) + F.lit(0.5)),
    ).otherwise(F.lit(0).cast("bigint"))
    q = j.select(
        "dim",
        "x",
        "mn",
        "mx",
        code.alias("q"),
    )
    xhat = mn + (F.col("q").cast("double") * (mx - mn)) / F.lit(_LEVELS)
    r = q.select(
        "dim",
        "q",
        "mn",
        "mx",
        F.abs(xhat - F.col("x")).alias("err"),
    )
    half_up = lambda c, s: F.floor(c * F.lit(s) + F.lit(0.5)).cast("bigint")  # noqa: E731
    return (
        r.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            half_up(F.min("mn"), 1e6).alias("mn_micro"),
            half_up(F.max("mx"), 1e6).alias("mx_micro"),
            F.sum("q").cast("bigint").alias("sum_code"),
            F.max("q").cast("bigint").alias("max_code"),
            F.sum(half_up(F.col("err"), 1e9)).cast("bigint").alias("sum_err_nano"),
            F.max(half_up(F.col("err"), 1e9)).cast("bigint").alias("max_err_nano"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n_values",
            "mn_micro",
            "mx_micro",
            "sum_code",
            "max_code",
            "sum_err_nano",
            "max_err_nano",
        )
    )
