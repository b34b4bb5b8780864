"""Composed curation gate: one keep/drop verdict per document.

A corpus pipeline does not apply quality signals one at a time — it
runs an ordered rule cascade and records WHICH rule dropped each
document (the drop-reason histogram is the pipeline's primary
monitoring artifact). This operator composes the repo's curation
signals into that cascade:

1. length bounds (``too_short`` / ``too_long``),
2. vocabulary repetition — distinct-word share (``repetitive``),
3. duplicate-span coverage from ``operators/dupspans.py``
   (``dup_heavy``),
4. mean word length bounds (``weird_words``).

First failing rule names the reason; a document passing all rules is
``keep = 1, reason = 'ok'``. All signals are integer-exact basis
points / centi-units (queries.py determinism rules). The dup-span
sub-pipeline contributes the only shuffles; the other signals are
scan-stage expressions.

Reference behavioral parity: the reference filters rows with ad-hoc
WHERE clauses per model (e.g. core/sabangnet models.sql); the
ordered reasoned cascade is the corpus-curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkmerce_spark.operators.dupspans import dup_span_coverage

__all__ = [
    "curation_gate",
]


def curation_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 5000,
    min_distinct_bp: int = 2000,
    max_dup_span_bp: int = 5000,
    wlen_centi_bounds: tuple[int, int] = (200, 1200),
    span_n: int = 8,
) -> DataFrame:
    """Per-document verdict: signal columns + ``reason`` + ``keep``.

    Output: ``id_col, n_words, distinct_share_bp, dup_span_bp,
    mean_wlen_centi, reason, keep``.
    """
    words = F.split(F.col(text_col), " ")
    sig = docs.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_words"),
        F.when(
            F.size(words) > 0,
            F.floor(10000 * F.size(F.array_distinct(words)) / F.size(words)),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("distinct_share_bp"),
        F.when(
            F.size(words) > 0,
            F.floor(
                100
                * F.length(F.regexp_replace(F.col(text_col), " ", ""))
                / F.size(words)
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("mean_wlen_centi"),
    )
    spans = dup_span_coverage(docs, text_col, id_col, n=span_n, min_count=2).select(
        F.col(id_col), "dup_span_bp"
    )
    g = sig.join(spans, id_col)
    lo, hi = wlen_centi_bounds
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_words") > max_words, F.lit("too_long"))
        .when(F.col("distinct_share_bp") < min_distinct_bp, F.lit("repetitive"))
        .when(F.col("dup_span_bp") >= max_dup_span_bp, F.lit("dup_heavy"))
        .when(
            (F.col("mean_wlen_centi") < lo) | (F.col("mean_wlen_centi") > hi),
            F.lit("weird_words"),
        )
        .otherwise(F.lit("ok"))
    )
    return g.select(
        F.col(id_col),
        "n_words",
        "distinct_share_bp",
        "dup_span_bp",
        "mean_wlen_centi",
        reason.alias("reason"),
        F.when(reason == "ok", 1).otherwise(0).cast("bigint").alias("keep"),
    )
