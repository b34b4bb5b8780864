"""Bloom-filter semi-join pre-filter (runtime-filter pattern).

The 100 TB join problem: the fact side shuffles in full even when the
dim side's key set would discard most of it. Spark's own runtime
filters apply only when the optimizer chooses to inject them; this
operator makes the pattern explicit and portable:

1. Build a bloom bitset over the small side's keys — word-indexed
   64-bit masks via ``bit_or`` aggregation (map-side combinable).
2. Collapse the bitset to ONE row holding a word->mask map and
   broadcast it (<= num_bits/8 bytes — e.g. 128 KB for 2^20 bits).
3. Filter the big side with pure column expressions: k salted-md5
   probes, all bits must be set. No shuffle of the big side, no
   driver-side collect anywhere.

False positives pass the filter (rate ~ (1 - e^(-kn/m))^k); the
downstream exact join removes them, so the operator is semantically
TRANSPARENT — the catalog query's oracle is the plain join, which is
exactly the property that makes it safe to drop into any pipeline.

Hashing is the same portable salted-md5 the sketch family uses, so an
engine on the other side of a federation boundary can prebuild the
same bitset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["bloom_bitset", "bloom_semi_filter"]


def _bit_pos(key: Column | str, i: int, num_bits: int) -> Column:
    """Bloom bit position of ``key`` for probe ``i``: salted md5, first
    15 hex chars (60 bits) mod num_bits."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bf{i}|"), c.cast("string"))), 1, 15),
        16,
        10,
    )
    return F.pmod(h.cast("bigint"), F.lit(num_bits))


def bloom_bitset(
    keys: DataFrame, key: str, num_bits: int = 1 << 20, num_hashes: int = 3
) -> DataFrame:
    """One-row DataFrame with ``__bloom``: a word-index -> 64-bit-mask
    map over the key set. ``bit_or`` partial-aggregates map-side, so
    the build is one small shuffle regardless of key volume."""
    positions = keys.select(
        F.explode(
            F.array(*[_bit_pos(key, i, num_bits) for i in range(num_hashes)])
        ).alias("__pos")
    )
    words = positions.select(
        (F.col("__pos") / 64).cast("long").alias("__word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
            "__mask"
        ),
    ).groupBy("__word").agg(F.expr("bit_or(__mask)").alias("__bits"))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__word"), F.col("__bits")))
        ).alias("__bloom")
    )


def bloom_semi_filter(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` probably appears in ``keys``.

    Guaranteed superset of the true semi-join (no false negatives);
    follow with the exact join. The big side is filtered in its scan
    stage — zero additional shuffles on it.
    """
    bits = bloom_bitset(keys, keys_key or big_key, num_bits, num_hashes)
    out = big.crossJoin(broadcast(bits))
    pos_cols = [f"__bfp{i}" for i in range(num_hashes)]
    for i, pc in enumerate(pos_cols):
        out = out.withColumn(pc, _bit_pos(big_key, i, num_bits))
    cond = F.lit(True)
    for pc in pos_cols:
        word = (F.col(pc) / 64).cast("long")
        # bit test via mask: bits & (1 << (pos % 64)) != 0 — shift by a
        # column goes through the SQL expression form.
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pc} % 64 AS INT))")
        cond = cond & (
            F.coalesce(
                F.element_at(F.col("__bloom"), word), F.lit(0).cast("bigint")
            ).bitwiseAND(mask)
            != 0
        )
    return out.filter(cond).drop("__bloom", *pos_cols)
