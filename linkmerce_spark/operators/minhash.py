"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Training-data pipeline operators (BASELINE.json north star), built as
pure column expressions so the hash pipeline runs inside whole-stage
codegen — no Python in the hot path — and every hash is md5-based,
which makes the operators engine-portable (the DuckDB oracle computes
bit-identical signatures).

Scale design
------------
- Signatures/fingerprints are embarrassingly parallel map work.
- LSH candidate generation shuffles once on ``(band_id, band_key)`` —
  a hash-uniform key. Pathological buckets (boilerplate text shared by
  millions of docs) are the classic skew case: ``max_bucket`` caps the
  join fan-out per bucket; at cluster scale pair it with AQE skew-join.
- The verify step (exact Jaccard) runs only on LSH candidates —
  O(candidates), not O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkmerce_spark.functions.text import word_shingles, word_tokens

__all__ = [
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "simhash32",
    "jaccard_pairs",
]


def _shingle_col(text_col: str, shingle_words: int) -> Column:
    return F.array_distinct(word_shingles(text_col, shingle_words))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Add ``shingles`` (distinct word n-grams) and ``sig`` (k MinHash
    values, each = min over shingles of ``md5('<i>:' || shingle)``).

    Docs with no shingles (too short) are dropped — they cannot
    participate in Jaccard similarity.
    """
    out = df.withColumn("shingles", _shingle_col(text_col, shingle_words)).filter(
        F.size("shingles") > 0
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform("shingles", lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
            )
            for i in range(k)
        ]
    )
    return out.withColumn("sig", sig)


def lsh_candidate_pairs(
    signed: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b).

    One shuffle on the band key. ``max_bucket`` drops buckets larger
    than the cap before the self-join — the skew guard for boilerplate
    clusters (a 1M-doc bucket would otherwise emit 5*10^11 pairs).
    """
    band_entries = []
    for j in range(bands):
        band_entries.append(
            F.struct(
                F.lit(j).alias("band_id"),
                F.md5(F.array_join(F.slice("sig", j * rows_per_band + 1, rows_per_band), "|")).alias(
                    "band_key"
                ),
            )
        )
    banded = signed.select(
        F.col(id_col), F.explode(F.array(*band_entries)).alias("b")
    ).select(id_col, "b.band_id", "b.band_key")
    if max_bucket is not None:
        counts = banded.groupBy("band_id", "band_key").count()
        banded = banded.join(
            counts.filter(F.col("count") <= max_bucket).drop("count"),
            ["band_id", "band_key"],
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_words: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    min_jaccard: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: sign -> band -> candidate
    pairs -> exact-Jaccard verify. Returns (id_a, id_b, jaccard).

    Jaccard is computed only on LSH candidates, against the true
    distinct-shingle sets (intersect / (|a|+|b|-intersect)).
    """
    signed = minhash_signature(df, text_col, id_col, k, shingle_words)
    pairs = lsh_candidate_pairs(signed, id_col, bands, rows_per_band, max_bucket)
    sh = signed.select(F.col(id_col), "shingles")
    verified = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if min_jaccard > 0:
        verified = verified.filter(F.col("jaccard") >= min_jaccard)
    return verified


def simhash32(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """32-bit SimHash as a bit-string column.

    Bit i is the sign of sum over tokens of (+1/-1) for bit i of the
    token's md5 — bit i read portably as "is hex nibble i >= 8". Token
    md5s are computed once per token, then folded per bit position.
    """
    high = ("8", "9", "a", "b", "c", "d", "e", "f")
    df = df.withColumn("__tok_md5", F.transform(word_tokens(text_col), lambda t: F.md5(t)))
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(32)),
        lambda i: F.when(
            F.aggregate(
                "__tok_md5",
                F.lit(0),
                lambda acc, h: acc
                + F.when(h.substr(i, F.lit(1)).isin(*high), 1).otherwise(-1),
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return df.withColumn(out, F.array_join(bits, "")).drop("__tok_md5")


def jaccard_pairs(
    probes: DataFrame,
    candidates: DataFrame,
    join_on: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 2,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Blocked n-gram Jaccard: probes x candidates within a blocking key.

    ``join_on`` is the blocking key (e.g. source bucket) — the scale
    lever that keeps this from being O(n^2).
    """
    p = probes.select(
        *join_on,
        F.col(id_col).alias("id_a"),
        _shingle_col(text_col, shingle_words).alias("sh_a"),
    )
    c = candidates.select(
        *join_on,
        F.col(id_col).alias("id_b"),
        _shingle_col(text_col, shingle_words).alias("sh_b"),
    )
    out = (
        p.join(c, join_on)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
        .select(*join_on, "id_a", "id_b", "jaccard")
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
