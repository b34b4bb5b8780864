"""Exact-substring duplicate-span coverage (training-data curation).

The ExactSubstr diagnostic from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022), re-expressed at word
n-gram grain so it distributes: a word position is *covered* when at
least one corpus-duplicated n-gram overlaps it, and a document's
dup-span fraction is the share of its word positions that are
covered. Corpora with high coverage are dominated by verbatim reuse
(mirrors, licenses, templated spam) and should be pruned before
training.

The suffix-array formulation of the paper is inherently sequential;
this n-gram formulation keeps the exact "duplicated span" semantics
(a span is flagged iff its n-gram occurs elsewhere in the corpus)
while shuffling only on the gram hash:

1. explode each document into (position, gram-hash) pairs — scan-stage
   work, no shuffle of its own;
2. corpus occurrence counts per gram — ONE shuffle keyed on the hash
   (uniform by construction), map-side partial agg;
3. hash-join the counts back and expand each duplicated gram into the
   n word positions it covers — the expansion factor is bounded by
   ``n`` and only applies to duplicated grams;
4. per-document distinct covered positions — a second shuffle keyed on
   ``doc_id``.

Nothing reaches the driver; both shuffles are on high-cardinality
uniform keys, so the shape holds at 100 TB. Score arithmetic is
integer-exact basis points (queries.py determinism rules).

Reference behavioral parity: the reference stops at whole-document
dedup (src/linkmerce/common/transform.py drop_duplicates overloads);
span-grain coverage is the standard corpus-curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dup_span_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-span coverage.

    An n-gram is *duplicated* when its corpus occurrence count reaches
    ``min_count`` (2 = "appears anywhere else, including again in the
    same document" — the ExactSubstr convention). Output columns:
    ``id_col, n_words, covered_words, dup_span_bp`` where
    ``dup_span_bp = floor(10000 * covered / n_words)`` (0 for empty
    docs). Documents shorter than ``n`` words have no grams and score
    0 over their full word count.
    """
    if n <= 0 or min_count <= 1:
        raise ValueError("n must be positive and min_count >= 2")
    words = F.split(F.col(text_col), " ")
    n_grams = F.size(words) - n + 1
    starts = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = df.select(
        F.col(id_col),
        F.size(words).alias("_nw"),
        F.explode_outer(starts).alias("_pos"),
        words.alias("_w"),
    ).select(
        F.col(id_col),
        F.col("_nw"),
        F.col("_pos"),
        F.when(
            F.col("_pos").isNotNull(),
            F.xxhash64(F.array_join(F.slice(F.col("_w"), F.col("_pos"), n), " ")),
        ).alias("_gram"),
    )
    occurrences = (
        grams.where(F.col("_gram").isNotNull())
        .groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .where(F.col("_occ") >= min_count)
    )
    # duplicated gram at word position p covers positions p .. p+n-1
    covered = (
        grams.join(occurrences, "_gram")  # inner: only duplicated grams expand
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("_pos"), F.col("_pos") + n - 1)).alias("_cov"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("_cov").alias("covered_words"))
    )
    base = df.select(F.col(id_col), F.size(words).cast("bigint").alias("n_words"))
    return base.join(covered, id_col, "left").select(
        F.col(id_col),
        "n_words",
        F.coalesce(F.col("covered_words"), F.lit(0)).cast("bigint").alias(
            "covered_words"
        ),
        F.when(
            F.col("n_words") > 0,
            F.floor(10000 * F.coalesce(F.col("covered_words"), F.lit(0)) / F.col("n_words")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("dup_span_bp"),
    )
