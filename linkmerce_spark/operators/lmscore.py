"""Unigram language-model quality scoring (CCNet-style filter).

CCNet / the Gopher-MassiveText pipeline rank web documents by a
language-model perplexity over their tokens and keep the
well-modelled head. A full KenLM is out of scope for an engine, but
the distributed shape — corpus token statistics joined back per
document — is the operator, and a unigram model over the corpus
itself is its standard self-supervised instantiation: a document of
frequent, ordinary tokens scores high; a document of corpus-rare
junk scores low.

To keep the DuckDB twin hash-exact the log-likelihood uses an
integer-exact surrogate: ``ilog2(tf) = length(bin(tf)) - 1`` (floor
log2 via the binary-string length — both engines compute it in pure
integer/string ops, no transcendental ever enters the loop; see
queries.py determinism rules). The per-document score is the mean
ilog2 of its tokens' corpus term frequencies, in exact basis points.

Shape: one shuffle keyed on the token (uniform, high-cardinality)
for the corpus TF table, one hash-join back (the TF table stays
distributed — at 100 TB the vocabulary is still tiny relative to the
corpus but may exceed broadcast limits, so the join is planned
normally and AQE may choose broadcast), one ``doc_id``-keyed rollup.
Map-side partial aggregation applies to both aggs; the driver sees
nothing.

Reference behavioral parity: the reference has no corpus-quality
layer (its documents never reach model training); this extends the
engine's text-analysis family (functions/text.py) with the standard
large-scale curation step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "ilog2",
    "unigram_lm_score",
]


def ilog2(col: Column) -> Column:
    """Integer floor(log2(x)) for x >= 1, via binary-string length —
    exact in pure integer/string ops on every engine."""
    return (F.length(F.bin(col)) - 1).cast("bigint")


def unigram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document mean corpus-frequency log-likelihood surrogate.

    Output: ``id_col, n_tokens, sum_ilog2, lm_score_bp`` with
    ``lm_score_bp = floor(10000 * sum_ilog2 / n_tokens)`` (0 for
    empty documents). ``sum_ilog2`` sums ``floor(log2(corpus_tf))``
    over the document's token occurrences.
    """

    from linkmerce_spark.frames import widen_scan

    df = widen_scan(df)  # token/gram explode far exceeds the scan bytes
    words = F.split(F.col(text_col), " ")
    tokens = df.select(
        F.col(id_col), F.explode(words).alias("_tok")
    ).where(F.col("_tok") != "")
    tf = tokens.groupBy("_tok").agg(F.count(F.lit(1)).alias("_tf"))
    scored = (
        tokens.join(tf, "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(ilog2(F.col("_tf"))).cast("bigint").alias("sum_ilog2"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("sum_ilog2"), F.lit(0)).cast("bigint").alias("sum_ilog2"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(10000 * F.col("sum_ilog2") / F.col("n_tokens")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("lm_score_bp"),
    )
