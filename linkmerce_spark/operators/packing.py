"""Sequence-packing plan: assign documents to fixed-token-budget packs.

Training pipelines concatenate documents into fixed-length examples
("sequence packing"). The planning step — which document lands in
which pack, at what token offset — is a pure windowed computation:
order documents deterministically, running-sum their token counts, and
bin by the token position where each document STARTS
(``pack_id = tokens_before DIV budget``).

This is the streaming-friendly position-binning form: a document whose
tokens straddle a boundary belongs to the pack where it starts (the
materializer then truncates or wraps — a policy choice outside the
plan). Greedy reset-at-overflow packing is inherently sequential; the
positional form is one window over (shard, order) — engine-exact,
SQL-expressible, and embarrassingly parallel across shards, which is
exactly what a 100 TB tokenize-and-pack job needs (shard = the unit of
output file, e.g. a hash bucket of doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Add ``tokens_before``, ``pack_id``, ``pack_offset`` per document.

    ``tokens_before`` is the running token total over earlier documents
    in the (shard, order) sequence; ``pack_id`` bins it by ``budget``;
    ``pack_offset`` is the in-pack start position. One shuffle (the
    shard window); with a shard column the window partitions, so no
    single-reducer global cumsum at scale.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = [shard_col] if shard_col else [F.lit(0)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("tokens_before", before)
        .withColumn("pack_id", F.expr(f"tokens_before DIV {budget}").cast("bigint"))
        .withColumn("pack_offset", F.pmod("tokens_before", F.lit(budget)).cast("bigint"))
    )
