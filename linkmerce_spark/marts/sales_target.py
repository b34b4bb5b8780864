"""Brand x shop sales-vs-target pivot around a month boundary.

Parity target (semantics, not code): ``analytics__sales_target``
(dbt_postgres/models/marts/sales/analytics__sales_target.sql:10-100):
- the pivot date splits a two-month profit_base window into previous /
  current month groups (group_id CASE on date_trunc month);
- products map to brand ids through core product x brand masters, with
  the '200000' catch-all;
- brand x shop conditional sums over non-zero payments;
- FULL OUTER merge with the target table (NULLIF(amount, 0)), brand /
  shop label enrichment, and the window's observed MIN/MAX dates
  cross-joined from a one-row aggregate.

The reference pivots on CURRENT_TIMESTAMP AT TIME ZONE 'Asia/Seoul';
here the pivot date is an explicit parameter (determinism — and the
Airflow-style caller passes "yesterday" anyway).

Scale notes
-----------
- The fact is reduced to (brand, shop) grain before the FULL OUTER
  merge; targets/brands/shops are dims (broadcast). The pivot-period
  aggregate is one row — cross-joined broadcast, not a global window.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["sales_target"]


def sales_target(
    base: Callable[[str, str], DataFrame],
    product_master: DataFrame,
    brand_master: DataFrame,
    target_sales: DataFrame,
    shop: DataFrame,
    pivot_date: str,
) -> DataFrame:
    """analytics__sales_target.sql:10-100 with an explicit pivot date.

    ``base``: the profit_base TVF; ``product_master`` needs
    (product_id, brand_name); ``brand_master`` (brand_id, brand_name,
    team_name); ``target_sales`` (brand_id, shop_id, monthly_amount);
    ``shop`` (shop_id, shop_group, shop_alias).
    """
    pd = _dt.date.fromisoformat(pivot_date)
    som = pd.replace(day=1)
    prev_start = (som - _dt.timedelta(days=1)).replace(day=1)
    eom = (som + _dt.timedelta(days=32)).replace(day=1) - _dt.timedelta(days=1)

    rel = broadcast(
        product_master.alias("product")
        .join(
            broadcast(brand_master.alias("brand")),
            F.col("product.brand_name") == F.col("brand.brand_name"),
            "left",
        )
        .select(
            F.col("product.product_id").alias("__r_pid"),
            F.col("brand.brand_id").alias("__r_bid"),
        )
    )
    fact = base(prev_start.isoformat(), pivot_date).filter(
        F.col("order_status") == 0
    )
    pivot_base = fact.join(
        rel, fact["product_id"] == F.col("__r_pid"), "left"
    ).select(
        F.coalesce(F.col("__r_bid"), F.lit("200000")).alias("brand_id"),
        "shop_id",
        F.when(
            F.trunc("order_date", "month") == F.lit(som.isoformat()).cast("date"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("group_id"),
        "payment_amount",
        "order_date",
    )
    g = F.col("group_id")
    period = broadcast(
        pivot_base.agg(
            F.min(F.when(g == 0, F.col("order_date"))).alias("previous_start_date"),
            F.max(F.when(g == 0, F.col("order_date"))).alias("previous_end_date"),
            F.min(F.when(g == 1, F.col("order_date"))).alias("current_start_date"),
            F.max(F.when(g == 1, F.col("order_date"))).alias("current_end_date"),
        )
    )
    brand_sales = (
        pivot_base.filter(F.col("payment_amount") != 0)
        .groupBy("brand_id", "shop_id")
        .agg(
            F.sum(F.when(g == 0, F.col("payment_amount")).otherwise(0)).alias(
                "previous_sales"
            ),
            F.sum(F.when(g == 1, F.col("payment_amount")).otherwise(0)).alias(
                "current_sales"
            ),
        )
    )
    f = brand_sales.alias("fact")
    t = target_sales.alias("tgt")
    out = (
        f.join(
            t,
            (F.col("fact.brand_id") == F.col("tgt.brand_id"))
            & (F.col("fact.shop_id") == F.col("tgt.shop_id")),
            "full_outer",
        )
        .join(
            broadcast(brand_master.alias("brand")),
            F.coalesce("fact.brand_id", "tgt.brand_id")
            == F.col("brand.brand_id"),
            "left",
        )
        .join(
            broadcast(shop.alias("shop")),
            F.coalesce("fact.shop_id", "tgt.shop_id") == F.col("shop.shop_id"),
            "left",
        )
        .crossJoin(period)
    )
    return out.select(
        F.coalesce("fact.brand_id", "tgt.brand_id").alias("brand_id"),
        "brand.brand_name",
        F.coalesce("fact.shop_id", "tgt.shop_id").alias("shop_id"),
        "shop.shop_group",
        F.col("shop.shop_alias").alias("shop_name"),
        "brand.team_name",
        F.coalesce("fact.previous_sales", F.lit(0)).alias("previous_sales"),
        F.coalesce("fact.current_sales", F.lit(0)).alias("current_sales"),
        F.nullif(F.col("tgt.monthly_amount"), F.lit(0)).alias("target_sales"),
        "previous_start_date",
        "previous_end_date",
        "current_start_date",
        "current_end_date",
        F.lit(eom.isoformat()).cast("date").alias("current_eomonth"),
    )
