"""Benchmark decontamination: n-gram collision scan (training-data op).

Before training, a corpus must be scrubbed of documents that overlap
held-out evaluation sets — the standard mechanism is exact word-n-gram
collision (the "13-gram decontamination" of GPT-3/PaLM lineage; the n
is a parameter because short-document corpora need shorter grams).

Shape, 100 TB-first:

- the BENCHMARK side reduces to a distinct set of n-gram hashes — tiny
  relative to any corpus (eval sets are thousands of documents), so it
  BROADCASTS; the corpus side never shuffles on content.
- the corpus side explodes each document's distinct n-grams once,
  hash-joins against the broadcast set, and aggregates collision
  counts per document — one map-side-combined groupBy on doc_id.
- hashes are the first 16 md5 hex chars as int64 — exact, portable,
  and identically derivable by a SQL oracle (no Python in the path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from linkmerce_spark.functions.text import shingles_from_tokens, word_tokens

__all__ = ["ngram_hashes", "decontaminate"]


def _gram_hash(g: Column) -> Column:
    # 60-bit md5 prefix as the join key (15 hex chars: fits signed
    # int64 on BOTH engines with no overflow semantics in play);
    # collision probability over any realistic benchmark set is
    # negligible, and both engines derive the identical integer.
    return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")


def ngram_hashes(
    df: DataFrame, text_col: str = "text", n: int = 6
) -> DataFrame:
    """Distinct n-gram hashes of a benchmark corpus (the broadcast side)."""
    toked = df.select(word_tokens(text_col).alias("__t"))
    grams = toked.select(
        F.explode(F.array_distinct(shingles_from_tokens(F.col("__t"), n))).alias("__g")
    )
    return grams.select(_gram_hash(F.col("__g")).alias("gram_hash")).distinct()


def decontaminate(
    docs: DataFrame,
    benchmark_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
) -> DataFrame:
    """Per-document benchmark collision counts + the contamination flag.

    Returns (id, collision_count, contaminated); zero-collision
    documents keep count 0 via the left join, so the output is a full
    corpus annotation (filter ``~contaminated`` to scrub).
    """

    from linkmerce_spark.frames import widen_scan

    docs = widen_scan(docs)  # gram explode far exceeds the scan bytes
    toked = docs.select(F.col(id_col), word_tokens(text_col).alias("__t"))
    grams = toked.select(
        id_col,
        F.explode(F.array_distinct(shingles_from_tokens(F.col("__t"), n))).alias("__g"),
    ).select(id_col, _gram_hash(F.col("__g")).alias("gram_hash"))
    hits = (
        grams.join(broadcast(benchmark_hashes), "gram_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("collision_count"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("collision_count", F.lit(0)).cast("bigint").alias(
                "collision_count"
            ),
            (F.coalesce("collision_count", F.lit(0)) > 0).alias("contaminated"),
        )
    )
