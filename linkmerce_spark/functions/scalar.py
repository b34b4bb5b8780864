"""Scalar parity layer: the reference's DuckDB-isms as Spark columns.

Mapping table (reference site -> here):

- ``safe_int/safe_float`` comma-stripping casts
  (reference: src/linkmerce/utils/cast.py:9-26)       -> ``safe_int``/``safe_float``
- ``TRY_STRPTIME(s, fmt)`` null-on-parse-failure
  (core/smartstore/api/order/models.sql:78)           -> ``try_strptime``
- ``PREFIX(s, p)`` / ``starts_with``
  (core/searchad/center/exposure/models.sql:22)       -> ``str_prefix``
- ``split_part(s, sep, n)``
  (dbt_postgres/.../smartstore__sales_daily.sql:147)  -> ``split_part`` (Spark builtin passthrough)
- CASE-WHEN enum encoding, 306 uses
  (core/smartstore/api/order/models.sql:91-117)       -> ``enum_code`` map-literal lookup
- ``DIV``/``MOD`` integer split
  (dbt_postgres/.../searchad__insight_daily.sql:201)  -> ``int_div`` / ``F.pmod``
- ``generate_series(date, date, interval)`` date spine
  (dbt_postgres/.../core__sold_qty_30d_daily.sql:17)  -> ``date_spine``

All pure Column expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "safe_int",
    "safe_float",
    "try_strptime",
    "str_prefix",
    "split_part",
    "enum_code",
    "money",
    "int_div",
    "date_spine",
    "md5_hash32",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_int(c: Column | str) -> Column:
    """Comma-stripped null-on-failure integer cast ('1,234' -> 1234)."""
    return F.regexp_replace(_col(c).cast("string"), ",", "").try_cast("bigint")


def safe_float(c: Column | str) -> Column:
    """Comma-stripped null-on-failure float cast ('1,234.5' -> 1234.5)."""
    return F.regexp_replace(_col(c).cast("string"), ",", "").try_cast("double")


def try_strptime(c: Column | str, fmt: str) -> Column:
    """Parse a timestamp, NULL on failure (TRY_STRPTIME semantics).

    ``fmt`` uses Spark datetime patterns (e.g. ``yyyy-MM-dd HH:mm:ss``),
    not C strftime — call sites own the translation.
    """
    return F.try_to_timestamp(_col(c), F.lit(fmt))


def str_prefix(c: Column | str, prefix: str) -> Column:
    """PREFIX/starts_with predicate."""
    return _col(c).startswith(prefix)


def split_part(c: Column | str, sep: str, n: int) -> Column:
    """1-indexed split_part with Postgres semantics: the separator is a
    LITERAL (``F.split`` would treat it as a Java regex — ``'.'`` split
    on every character) and out-of-range parts return ``''``, not NULL.
    Delegates to Spark's native ``split_part``, which implements exactly
    that contract."""
    return F.split_part(_col(c), F.lit(sep), F.lit(n))


def enum_code(
    c: Column | str,
    mapping: Mapping[str, int],
    default: int | None = None,
) -> Column:
    """String -> small-int enum encode as a map-literal lookup.

    One ``element_at(map(...))`` expression instead of a 12-arm CASE
    chain: constant-folded by Catalyst, and the mapping is data not code.
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    looked = F.element_at(F.create_map(*pairs), _col(c))
    if default is not None:
        looked = F.coalesce(looked, F.lit(default))
    return looked.cast("int")


def money(c: Column | str, scale: int = 2) -> Column:
    """Cast a monetary double to exact decimal for deterministic sums.

    Floating-point SUM is order-dependent; at 100 TB the partial-sum
    order is nondeterministic run to run. Aggregating in decimal makes
    the result exact and reproducible (and oracle-comparable).
    """
    return _col(c).cast(f"decimal(18,{scale})")


def int_div(a: Column | str, b: Column | str | int) -> Column:
    """Integer division (DuckDB ``//`` / ``DIV``)."""
    bb = F.lit(b) if isinstance(b, int) else _col(b)
    return F.floor(_col(a) / bb).cast("bigint")


def date_spine(
    spark: SparkSession,
    start: str | Column,
    end: str | Column,
    col_name: str = "ymd",
) -> DataFrame:
    """Continuous daily date spine [start, end] as a 1-column DataFrame.

    ``sequence() + explode`` — generated on the executors, no driver
    loop; equivalent of ``generate_series(date, date, interval '1 day')``.
    """
    s = F.lit(start).cast("date") if isinstance(start, str) else start
    e = F.lit(end).cast("date") if isinstance(end, str) else end
    return spark.range(1).select(
        F.explode(F.sequence(s, e, F.expr("interval 1 day"))).alias(col_name)
    )


def md5_hash32(col):
    """Portable 32-bit hash: md5 hex prefix -> BIGINT — bit-identical in
    Spark and DuckDB (``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``).
    The single definition behind MinHash signatures and winnowing
    fingerprints; salted variants (count-min rows, sampling buckets)
    compose it with a prefix.
    """
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
