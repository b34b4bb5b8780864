"""Inverted-index build: term -> bounded posting list over a corpus.

The search-index counterpart of the TF-IDF extraction the catalog
already carries (queries doc_tfidf_terms): tokenize + position-explode
every document, group by term, and emit document frequency, total
occurrence count, and a deterministic, width-bounded posting string.

Scale shape: the postings are capped BEFORE aggregation — a
``row_number`` window per term keeps only the first ``max_postings``
in (doc, pos) order, so the subsequent ``collect_list`` buffer holds
at most ``max_postings`` elements per term no matter how pathological
a stop-term is (counts still aggregate over the full data with
map-side partials). The window and the final groupBy share the
term-hash partitioning, so the cap costs a sort but no extra
exchange.

Postings are zero-padded ``doc:pos`` strings so lexicographic order ==
numeric order; the twin SQL reproduces the exact same strings with
printf, keeping the result hashable across engines (no nested struct
columns, which pandas-level canonicalizers compare unreliably). The
padding supports non-negative doc ids < 10^12 and positions < 10^6 —
enforced widths, not assumptions; wider corpora raise the widths in
one place (and their oracle twin with them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "inverted_index",
]

# non-negative doc_id < 10^12, position < 10^6 — see module docstring
_POSTING_FMT = "%012d:%06d"


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_postings: int = 20,
) -> DataFrame:
    """Build the index: term, doc_freq, n_postings, postings (first
    ``max_postings`` in (doc, pos) order as zero-padded doc:pos
    tokens)."""
    if max_postings <= 0:
        raise ValueError("max_postings must be positive")

    from linkmerce_spark.frames import widen_scan

    df = widen_scan(df)  # token/gram explode far exceeds the scan bytes
    words = F.split(F.col(text_col), " ")
    in_bounds = (
        (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(10**12))
        & (F.col("_pos") < F.lit(10**6))
    )
    posting = F.when(
        in_bounds, F.format_string(_POSTING_FMT, F.col(id_col), F.col("_pos"))
    ).otherwise(
        # executed-time enforcement of the documented widths — an
        # out-of-range id would silently break lexicographic ordering
        F.raise_error(
            F.concat(
                F.lit("inverted_index: doc id/pos out of posting bounds: "),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("_pos").cast("string"),
            )
        )
    )
    posted = df.select(
        F.col(id_col), F.posexplode(words).alias("_pos", "term")
    ).select("term", F.col(id_col), posting.alias("_p"))
    # cap per-term postings BEFORE collect_list so aggregation state is
    # bounded by max_postings even for stop-terms
    ranked = posted.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("term").orderBy("_p"))
    )
    return ranked.groupBy("term").agg(
        F.count_distinct(id_col).cast("bigint").alias("doc_freq"),
        F.count(F.lit(1)).cast("bigint").alias("n_postings"),
        F.array_join(
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= max_postings, F.col("_p")))
            ),
            " ",
        ).alias("postings"),
    )
