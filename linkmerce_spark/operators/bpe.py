"""Distributed BPE merge statistics (tokenizer vocabulary induction).

The first step of byte-pair-encoding training (Sennrich et al. 2016):
count adjacent symbol pairs across the corpus, weighted by word
frequency — the pair with the highest count becomes the first merge
rule. At corpus scale this is the canonical "train the tokenizer on
100 TB" job, and it distributes perfectly:

1. token counts — one shuffle on the token (word-frequency table);
2. the pair expansion runs on the DISTINCT word list (vocabulary-
   sized, millions of rows regardless of corpus size), not on the
   corpus: each distinct word explodes into its ``len-1`` adjacent
   character pairs carrying the word's corpus count as weight;
3. pair totals — one shuffle on the pair (at most |alphabet|² keys,
   map-side partial agg does almost all the work).

Iterating merges re-runs steps 2-3 on the re-segmented vocabulary —
each round touches only the vocabulary table, never the corpus again,
which is why BPE training is cheap even at 100 TB (the corpus is
scanned exactly once, for the frequency table).

Reference behavioral parity: the reference has no tokenizer layer;
this extends the text-analysis family (functions/text.py) with the
vocabulary-induction op an LLM-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    top_n: int = 50,
) -> DataFrame:
    """Corpus-frequency-weighted adjacent character-pair counts.

    Words are whitespace tokens; a word of length L contributes its
    L-1 adjacent character pairs, each weighted by the word's corpus
    occurrence count. Output: the ``top_n`` pairs as
    ``pair, pair_count`` ranked by ``(pair_count DESC, pair ASC)`` —
    the deterministic total order makes the LIMIT engine-portable.
    """
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("wc"))
    pairs = vocab.where(F.length("tok") >= 2).select(
        F.col("wc"),
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        F.col("tok"),
    ).select(F.col("tok").substr(F.col("i"), F.lit(2)).alias("pair"), "wc")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(top_n)
    )
