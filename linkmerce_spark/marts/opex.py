"""Daily OPEX amortization.

Parity target (semantics, not code): ``core__opex_daily``
(dbt_postgres/models/marts/misc/core__opex_daily.sql:14-41): each
expense row spans [COALESCE(start,end), end]; the amount divides
evenly across the days (integer DIV) with the remainder (MOD) folded
into the FIRST day — the reference's date-offset-0 rule.

Scale notes: pure map + bounded sequence explode (span days); no
shuffle at all — the partitioned write groups by ymd downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["opex_daily"]


def opex_daily(opex: DataFrame) -> DataFrame:
    src = opex.select(
        "expense_id",
        "expense_name",
        "dept_id",
        "brand_id",
        "amount",
        F.coalesce("start_date", "end_date").alias("start_date"),
        "end_date",
        (
            F.datediff("end_date", F.coalesce("start_date", "end_date")) + 1
        ).alias("date_count"),
    )
    ex = src.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.col("date_count") - 1)
        ).alias("date_offset"),
    )
    amount = F.expr("amount DIV date_count") + F.when(
        F.col("date_offset") == 0, F.col("amount") % F.col("date_count")
    ).otherwise(F.lit(0))
    return ex.select(
        "expense_id",
        "expense_name",
        "dept_id",
        "brand_id",
        amount.alias("amount"),
        F.date_add(F.col("start_date"), F.col("date_offset")).alias("ymd"),
    )
