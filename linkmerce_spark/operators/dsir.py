"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the hashed-n-gram instantiation.

The standard pretraining-data selection step: given a small TARGET
corpus with the distribution you want (Wikipedia-quality text) and a
huge RAW pool, fit bag-of-hashed-n-gram unigram models ``p`` (target)
and ``q`` (raw), score every raw document by its importance
log-ratio ``sum_b c_x[b] * (log p[b] - log q[b])`` over its hashed
feature counts ``c_x``, and keep the best-scoring examples.

Engine mapping
--------------
- Features: unigrams + word bigrams, hashed into ``buckets`` cells
  with the same portable md5 bucket primitive as the sampling family
  (``operators/sampling.hash_bucket``) — one explode, no UDF.
- The two models are ``buckets``-sized aggregates (map-side partial
  combine; the result is dim-sized however large the corpus is) and
  join back as a BROADCAST log-ratio table.
- Per-document scoring is one ``id``-keyed rollup; selection is a
  distributed top-k (``orderBy().limit()`` -> TakeOrderedAndProject,
  no global sort).

Exactness: the log-ratio uses the engine-portable integer surrogate
``ilog2(c+1)`` (binary-string length — operators/lmscore.py), i.e.
floor(log2) with add-one smoothing. The model-normalization terms
``log(N_p + B)`` / ``log(N_q + B)`` are the same for every bucket, so
they shift every document's mean score by the same constant and are
rank-irrelevant; omitting them keeps the whole chain transcendental-
free and bit-identical to the SQL twin. Scores are exact basis points
``floor(10000 * sum_ratio / n_grams)``.

Scale notes
-----------
The candidate pool is tokenized twice (once for the raw model, once
for per-document scores) rather than persisted: the exploded gram
frame is ~10x the corpus and caching it would trade cheap recompute
for expensive storage — at 100 TB the two passes are two scans with
full column pruning (id + text only), each feeding a tiny aggregate.
No driver-side data: both models live in ``buckets``-row DataFrames.

Reference behavioral parity: the reference has no data-selection
layer; this extends the curation family (mixture sampling, priority
sampling, quality scores) with the importance-resampling step between
quality filtering and mixture weighting in a pretraining pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkmerce_spark.functions.text import shingles_from_tokens, word_tokens
from linkmerce_spark.operators.lmscore import ilog2
from linkmerce_spark.operators.sampling import hash_bucket

__all__ = ["dsir_scores", "hashed_gram_buckets"]


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """One row per unigram/bigram OCCURRENCE: ``(id_col, bucket)``.

    The hashed-feature representation both models and the per-document
    scorer share. Unigrams and word bigrams, lower-cased, split on
    non-alphanumerics (the corpus tokenizer convention), hashed with
    the portable md5 bucket."""

    from linkmerce_spark.frames import widen_scan

    df = widen_scan(df)  # token/gram explode far exceeds the scan bytes
    toks = df.select(F.col(id_col), word_tokens(text_col).alias("__toks"))
    # explode_outer: a gram-less document survives as one NULL-bucket
    # row, so the per-document scorer needs no join back to the input
    # (count("bucket") skips the NULL).
    grams = toks.select(
        F.col(id_col),
        F.explode_outer(
            F.concat(
                F.col("__toks"),  # word_tokens already drops empties
                shingles_from_tokens(F.col("__toks"), 2),
            )
        ).alias("_gram"),
    )
    return grams.select(
        F.col(id_col),
        F.when(
            F.col("_gram").isNotNull(),
            hash_bucket(F.col("_gram"), buckets, salt),
        ).alias("bucket"),
    )


def dsir_scores(
    candidates: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """Importance score per candidate document against the target
    distribution.

    Output: ``id_col, n_grams, sum_ratio, dsir_score_bp`` where
    ``sum_ratio = sum over gram occurrences of
    ilog2(c_target[bucket]+1) - ilog2(c_raw[bucket]+1)`` and
    ``dsir_score_bp = floor(10000 * sum_ratio / n_grams)``.
    Documents with no grams score 0. Both model tables are built from
    the inputs themselves (q from the candidate pool, p from the
    target corpus), so the operator is self-contained."""
    tgt_grams = hashed_gram_buckets(target, text_col, id_col, buckets, salt)
    cand_grams = hashed_gram_buckets(candidates, text_col, id_col, buckets, salt)

    # Model ratio table WITHOUT a join: union the two bucket counts and
    # fold in one bucket-keyed aggregate (a full-outer join of two
    # dim-sized aggregates would plan a SortMergeJoin for nothing).
    # Buckets seen in only one corpus still carry signal — the add-one
    # smoothing keeps both logs defined.
    counts = tgt_grams.where(F.col("bucket").isNotNull()).select(
        "bucket", F.lit(1).alias("_p"), F.lit(0).alias("_q")
    ).unionAll(
        cand_grams.where(F.col("bucket").isNotNull()).select(
            "bucket", F.lit(0).alias("_p"), F.lit(1).alias("_q")
        )
    )
    ratio = counts.groupBy("bucket").agg(
        (ilog2(F.sum("_p") + 1) - ilog2(F.sum("_q") + 1)).alias("_ratio")
    )
    # explode_outer kept gram-less docs as NULL-bucket rows: the LEFT
    # broadcast join passes them through and count("bucket") skips
    # them, so no join back to the input is needed.
    return (
        cand_grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").cast("bigint").alias("n_grams"),
            F.coalesce(F.sum("_ratio"), F.lit(0)).cast("bigint").alias("sum_ratio"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "sum_ratio",
            F.when(
                F.col("n_grams") > 0,
                F.floor(10000 * F.col("sum_ratio") / F.col("n_grams")),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dsir_score_bp"),
        )
    )
