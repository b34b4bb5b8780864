"""Corpus line-level dedup with text REWRITE (training-data curation).

The CCNet / RefinedWeb paragraph-dedup step: segments that repeat
across the corpus (boilerplate, navigation chrome, license blocks)
are removed from every document except one canonical occurrence, and
the cleaned text is re-assembled in original order. This is the
*rewrite* counterpart of ``operators/dupspans.py`` (which only scores
coverage) — the op a production pipeline actually runs before
training.

Because the synthetic corpus has no newline structure, a "line" is a
deterministic fixed-width word segment (``seg_words`` words); on real
data the same operator applies with a newline/sentence splitter
producing the segment column. Semantics:

- a segment is *duplicated* when its exact text occurs ``min_count``
  or more times corpus-wide;
- every occurrence of a duplicated segment is dropped EXCEPT the
  canonical one — the occurrence with the smallest ``(doc_id, seg)``
  (first-writer-wins, fully deterministic);
- each document's surviving segments are re-joined in segment order.

Scale shape: one shuffle keyed on the segment text (the window that
ranks occurrences), one shuffle on ``doc_id`` (the re-assembly).
Segment text is a high-cardinality key; a mega-duplicated boilerplate
segment concentrates its occurrences on one reducer, which is exactly
the AQE skew-join/window case — the per-key state is a count and a
running rank, so even million-row keys stream. Nothing reaches the
driver.

Reference behavioral parity: the reference dedups whole rows only
(src/linkmerce/common/transform.py drop_duplicates overloads);
segment-grain rewrite is the standard corpus-curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "line_dedup_rewrite",
]


def line_dedup_rewrite(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seg_words: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """Remove corpus-duplicated segments, keep canonical occurrences,
    re-assemble the text.

    Output columns: ``id_col, n_segments, n_dropped, text_clean``.
    Documents whose every segment is dropped come back with
    ``text_clean = ''``; empty documents pass through unchanged with
    zero segments.
    """
    if seg_words <= 0 or min_count <= 1:
        raise ValueError("seg_words must be positive and min_count >= 2")

    from linkmerce_spark.frames import widen_scan

    df = widen_scan(df)  # token/gram explode far exceeds the scan bytes
    words = F.split(F.col(text_col), " ")
    # number of segments = ceil(n_words / seg_words), integer-exact
    n_seg = (F.size(words) + seg_words - 1).cast("bigint") / F.lit(seg_words)
    n_seg = F.floor(n_seg).cast("int")
    # sequence(0, -1) would generate a DESCENDING [0, -1] in Spark —
    # guard empty docs to an empty array and explode_outer keeps them.
    segs = F.when(n_seg >= 1, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    seg_rows = df.select(
        F.col(id_col),
        F.explode_outer(segs).alias("_seg"),
        words.alias("_w"),
    ).select(
        F.col(id_col),
        F.col("_seg"),
        F.when(
            F.col("_seg").isNotNull(),
            F.array_join(F.slice(F.col("_w"), F.col("_seg") * seg_words + 1, seg_words), " "),
        ).alias("_seg_text"),
    )
    # ONE shuffle on the segment text: occurrence count + canonical rank.
    w = Window.partitionBy("_seg_text").orderBy(id_col, "_seg")
    wc = Window.partitionBy("_seg_text")
    ranked = seg_rows.where(F.col("_seg").isNotNull()).select(
        F.col(id_col),
        "_seg",
        "_seg_text",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_occ"),
    )
    kept_flag = (F.col("_occ") < min_count) | (F.col("_rn") == 1)
    # Re-assembly: collect kept segments, sort by ordinal, join. The
    # struct sort key is (_seg, text) with _seg unique per doc, so the
    # rebuilt order is exact; collect_list drops the NULLs that
    # F.when() emits for dropped segments.
    rebuilt = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(kept_flag, 0).otherwise(1)).cast("bigint").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            kept_flag,
                            F.struct(F.col("_seg"), F.col("_seg_text").alias("_t")),
                        )
                    )
                ),
                lambda x: x["_t"],
            ),
            " ",
        ).alias("text_clean"),
    )
    base = df.select(F.col(id_col))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )
