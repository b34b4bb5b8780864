"""MERGE/upsert as a full-outer-join rewrite with the reference's
column-strategy vocabulary.

The reference composes MERGE statements from a 6-verb per-column rule
set — ``replace / ignore / greatest / least / source_first /
target_first`` plus row-level ``:replace_all:`` / ``:do_nothing:`` /
``:insert_all:`` (extensions/postgres.py:554-597,
extensions/bigquery.py:441-487; upsert example
core/smartstore/api/order/models.sql:189-200:
``SET c = COALESCE(EXCLUDED.c, c), first = LEAST(...), last =
GREATEST(...)``).

Without a transactional table format, MERGE over files = full-outer
join target vs source on the key and per-column resolution. That is
exactly one shuffle of each side on the merge key — the same physical
cost a Delta MERGE pays — and it is deterministic because the source is
key-deduped first.

Scale notes: both sides shuffle on the key; AQE handles skew. When the
source is a small incremental batch and the target is partition-pruned,
Spark broadcasts the source side automatically (or hint via
``broadcast(source)`` at the call site).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkmerce_spark.operators.dedup import dedupe_keep_first

__all__ = ["merge_frames", "MATCHED_VERBS"]

MATCHED_VERBS = ("replace", "ignore", "greatest", "least", "source_first", "target_first")


def _resolve(verb: str, tgt: Column, src: Column) -> Column:
    if verb == "replace":
        return src
    if verb == "ignore":
        return tgt
    if verb == "greatest":
        # SQL GREATEST ignores NULLs (null-tolerant max of the pair).
        return F.greatest(tgt, src)
    if verb == "least":
        return F.least(tgt, src)
    if verb == "source_first":
        return F.coalesce(src, tgt)
    if verb == "target_first":
        return F.coalesce(tgt, src)
    raise ValueError(f"unknown merge verb {verb!r}; expected one of {MATCHED_VERBS}")


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    matched: Mapping[str, str] | str = "source_first",
    not_matched: str = "insert_all",
    source_order: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    Parameters
    ----------
    matched:
        Per-column verb map (missing columns default to ``ignore``), or
        a single verb applied to every non-key column, or the row-level
        strategies ``"replace_all"`` / ``"do_nothing"``.
    not_matched:
        ``"insert_all"`` (insert new keys) or ``"do_nothing"``.
    source_order:
        Deterministic keep-first order for deduping the source batch on
        the merge key before joining (PK semantics).
    """
    src = dedupe_keep_first(source, keys, source_order)
    data_cols = [c for c in target.columns if c not in keys]

    # Row membership flags as guaranteed-non-null markers (eqNullSafe
    # keeps NULL join keys mergeable, so key-null tests can't be used).
    t = target.withColumn("__t", F.lit(1)).alias("t")
    s = src.withColumn("__s", F.lit(1)).alias("s")
    joined = t.join(s, [t[k].eqNullSafe(s[k]) for k in keys], "full_outer")
    has_t = F.col("t.__t").isNotNull()
    has_s = F.col("s.__s").isNotNull()

    out_cols: list[Column] = []
    for k in keys:
        out_cols.append(F.coalesce(t[k], s[k]).alias(k))

    if matched == "replace_all":
        verb_of = {c: "replace" for c in data_cols}
    elif matched == "do_nothing":
        verb_of = {c: "ignore" for c in data_cols}
    elif isinstance(matched, str):
        verb_of = {c: matched for c in data_cols}
    else:
        verb_of = {c: matched.get(c, "ignore") for c in data_cols}

    insert_new = not_matched == "insert_all"

    for c in data_cols:
        tgt_c, src_c = t[c], s[c] if c in src.columns else F.lit(None)
        both = _resolve(verb_of[c], tgt_c, src_c)
        expr = (
            F.when(has_t & has_s, both)
            .when(has_t & ~has_s, tgt_c)
            .when(~has_t & has_s, src_c if insert_new else F.lit(None))
        )
        out_cols.append(expr.alias(c))

    if not insert_new:
        # Drop the source-only rows entirely (not_matched = do_nothing).
        joined = joined.filter(has_t)
    return joined.select(*out_cols).drop("__t", "__s")
