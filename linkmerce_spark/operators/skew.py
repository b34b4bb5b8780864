"""Skew mitigation: salted joins and bucketed co-located joins.

At 100 TB the classic failure is one hot key (the reference has exactly
this shape: the `product_id='200000'` fallback bucket every unmatched
row collapses into, dbt_postgres/.../core__sales_daily.sql:197). AQE's
skew-join splitting handles sort-merge cases; ``salted_join`` is the
explicit, planner-independent version for aggregations and joins where
one side can be replicated:

- big side: deterministic salt in [0, n) derived by hashing a
  high-cardinality discriminator column (never ``rand()`` — retries
  and stage re-runs must produce identical rows).
- small side: replicated n times (one row per salt value).
- join on (key, salt): the hot key's rows now spread over n tasks.

``salted_group_count`` shows the same trick for hot-key aggregation:
partial-aggregate on (key, salt), then final-aggregate on key — two
small shuffles instead of one task receiving the whole hot key.

Bucketed co-located joins live in sources/writers.write_bucketed:
pre-shuffling both fact tables into the same bucket layout makes
repeated fact-fact joins exchange-free (SURVEY §4 join strategy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_group_count"]


def _salt_col(discriminator: Column | str, n: int) -> Column:
    c = F.col(discriminator) if isinstance(discriminator, str) else discriminator
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_by: Column | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    ``salt_by`` must be a column of ``big`` with enough cardinality
    inside the hot key to spread it (a row id, line number, raw
    payload). Result equals ``big.join(small, keys, how)`` exactly —
    verified by tests/test_skew.py — but the hot key fans out over
    ``n_salts`` tasks.

    Only big-side-preserving joins are supported: the small side is
    replicated once per salt, so right/full/right_semi joins would emit
    up to ``n_salts`` null-padded duplicates for small-side keys with no
    matching big-side salt. Those hows raise ValueError.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would duplicate unmatched small-side keys. "
            f"Use one of {sorted(allowed)}."
        )
    b = big.withColumn("__salt", _salt_col(salt_by, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_group_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_by: Column | str,
    n_salts: int = 8,
) -> DataFrame:
    """COUNT(*) per key via two-stage salted aggregation.

    Stage 1 groups on (key, salt) — the hot key's rows split across
    ``n_salts`` reducers; stage 2 sums the partials per key. The same
    shape extends to any decomposable aggregate (sum/min/max).
    """
    partial = (
        df.withColumn("__salt", _salt_col(salt_by, n_salts))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").cast("long").alias("n"))
