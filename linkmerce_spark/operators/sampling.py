"""Deterministic sampling / dataset splitting for training pipelines.

Random sampling is the wrong tool for corpus work at scale: it is not
reproducible across runs/engines, and re-running a pipeline must not
reshuffle which documents landed in the eval set. The standard answer
is HASH-BASED assignment — a pure function of a stable key:

- identical across runs, engines, partitionings, and cluster sizes;
- stable under appends (new rows get assigned, old rows never move);
- per-key, so correlated rows (same doc id) stay in one split.

``hash_bucket`` maps a key to [0, buckets); ``stable_sample`` keeps a
deterministic p-fraction; ``hash_split`` assigns named splits by
cumulative ranges (train/val/test). All md5-based and reproducible in
any SQL engine (same expressions as the DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "stable_sample", "hash_split", "stratified_topn"]

_BUCKETS = 10_000  # split-resolution: 0.01% granularity


def hash_bucket(key: Column | str, buckets: int = _BUCKETS, salt: str = "") -> Column:
    """Uniform bucket in [0, buckets) from md5 of the (salted) key.

    ``salt`` decorrelates independent sampling decisions over the same
    key (e.g. a 10% debug sample independent of the train/test split).
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(buckets)).cast("int")


def stable_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash."""
    return df.filter(hash_bucket(key, _BUCKETS, salt) < int(round(fraction * _BUCKETS)))


def hash_split(
    df: DataFrame,
    key: Column | str,
    splits: Mapping[str, float],
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Add ``out``: the split name assigned by cumulative hash ranges.

    ``splits`` maps name -> fraction (must sum to <= 1; remainder rows
    get NULL — useful for sub-sampled corpora). Insertion order defines
    the ranges, so configs are stable under extension.
    """
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(key, _BUCKETS, salt)
    expr: Column = F.lit(None).cast("string")
    hi = 0
    cases: list[tuple[int, str]] = []
    for name, frac in splits.items():
        hi += int(round(frac * _BUCKETS))
        cases.append((hi, name))
    for bound, name in reversed(cases):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    # reversed + otherwise-chaining makes the FIRST matching (smallest)
    # bound win, i.e. ranges [0,b1), [b1,b2), ...
    return df.withColumn(out, expr)


def stratified_topn(
    df: DataFrame,
    strata: Column | str,
    key: Column | str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum quota sample (corpus curation staple:
    "at most N documents per language/domain/source").

    Rank within each stratum by the md5 of the (salted) key — a
    reproducible pseudo-random order that any SQL engine re-derives —
    and keep the first ``n_per_stratum``. One shuffle (the stratum
    window); strata with fewer than N rows pass through whole. The key
    itself is the deterministic tiebreak after the hash, so equal-hash
    collisions cannot make the sample engine-dependent.
    """
    s = F.col(strata) if isinstance(strata, str) else strata
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), k.cast("string")))
    w = Window.partitionBy(s).orderBy(h.asc(), k.cast("string").asc())
    return (
        df.withColumn("__sr", F.row_number().over(w))
        .filter(F.col("__sr") <= n_per_stratum)
        .drop("__sr")
    )
