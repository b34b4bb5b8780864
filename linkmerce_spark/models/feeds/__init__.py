"""feeds — the reference's small ops-feed datasets (Dable ads, CJ
eFLEXs stock, Ecount ERP), Spark-first.

Parity sites (semantics, not code):

- ``core/dable/api/report/models.sql`` DailyReport (:20-40): ONE raw
  report fans into the daily fact (impressions > 0 filter,
  COALESCE(campaign_id, '-'), yyyymmdd parse) and the campaign dim
  (non-null ids, PK-deduped).
- ``core/cj/eflexs/stock/models.sql`` Stock (:24-45): warehouse rename
  projection, TRY_CASTs, integer yyyymmdd inbound date, and the
  second-truncated load timestamp — parameterized here as ``as_of``
  (the engine convention: wall-clock is an input, not a side effect).
- ``core/ecount/.../models.sql`` Inventory + Product: rename
  projections; Product's COALESCE(NULLIF(CONT2, '0'), NULLIF(CONT3,
  '0')) expiration pick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkmerce_spark.operators.dedup import dedupe_keep_first

__all__ = [
    "dable_daily_report",
    "cj_stock",
    "ecount_inventory",
    "ecount_product",
]


def _as_of(as_of: str) -> Column:
    # CAST(DATE_TRUNC('second', CURRENT_TIMESTAMP) AS TIMESTAMP): the
    # caller passes the second-resolution load time explicitly so runs
    # are reproducible and both engines agree. TIMESTAMP_NTZ: a load
    # stamp is wall-clock metadata — a session-TZ'd literal would parse
    # to a different instant (and render a different wall time) under a
    # non-UTC driver session, which the round-5 TZ sweep caught.
    return F.lit(as_of).cast("timestamp_ntz")


def dable_daily_report(rows: DataFrame) -> tuple[DataFrame, DataFrame]:
    """DailyReport 2-way fan (dable models.sql:20-40): (report,
    campaign dim)."""
    report = rows.filter(F.col("impressions") > 0).select(
        F.coalesce(F.col("campaign_id"), F.lit("-")).alias("campaign_id"),
        F.col("exposes").cast("int").alias("expose_count"),
        F.col("impressions").cast("int").alias("impression_count"),
        F.col("clicks").cast("int").alias("click_count"),
        F.col("cost_spent").cast("int").alias("ad_cost"),
        F.col("convertion_cnt").cast("int").alias("conv_count"),
        F.to_date(F.col("ymd"), "yyyyMMdd").alias("ymd"),
    )
    campaigns = dedupe_keep_first(
        rows.filter(F.col("campaign_id").isNotNull()).select(
            "campaign_id", "campaign_name"
        ),
        ["campaign_id"],
        [F.col("campaign_name").asc_nulls_last()],
    )
    return report, campaigns


def cj_stock(rows: DataFrame, as_of: str) -> DataFrame:
    """Stock bulk_insert (cj models.sql:24-45)."""
    return rows.select(
        F.col("itemCd").alias("item_code"),
        F.col("itemVarcode").alias("barcode"),
        F.col("strrId").cast("bigint").alias("customer_id"),
        F.col("itemNm").alias("item_name"),
        F.col("whCd").alias("warehouse_code"),
        F.col("whNm").alias("warehouse_name"),
        F.col("zoneCd").alias("zone_code"),
        F.col("wcellNm").alias("location_name"),
        F.col("lotNo").try_cast("bigint").alias("lot_no"),
        F.col("invnQty").cast("int").alias("total_quantity"),
        F.col("avlbQty").cast("int").alias("usable_quantity"),
        F.col("hldQty").cast("int").alias("hold_quantity"),
        F.col("prcsQty").cast("int").alias("process_quantity"),
        F.col("remainInvnDays").try_cast("int").alias("remain_days"),
        F.col("validDatetime").try_cast("date").alias("validate_date"),
        F.to_date(F.col("inbDate").cast("bigint").cast("string"), "yyyyMMdd").alias(
            "inbound_date"
        ),
        _as_of(as_of).alias("updated_at"),
    )


def ecount_inventory(rows: DataFrame, as_of: str) -> DataFrame:
    """Inventory bulk_insert (ecount models.sql)."""
    return rows.select(
        F.col("PROD_CD").alias("product_code"),
        F.col("BAL_QTY").cast("int").alias("quantity"),
        _as_of(as_of).alias("updated_at"),
    )


def ecount_product(rows: DataFrame, as_of: str) -> DataFrame:
    """Product bulk_insert (ecount models.sql): the NULLIF('0')
    expiration-date pick across two freeform columns."""
    return rows.select(
        F.col("PROD_CD").alias("product_code"),
        F.col("CONT4").alias("option_id"),
        F.col("PROD_DES").alias("product_name"),
        F.col("CONT6").alias("product_keyword"),
        F.col("CONT1").alias("brand_name"),
        F.col("REMARKS_WIN").alias("remarks"),
        F.col("SIZE_DES").try_cast("int").alias("unit_quantity"),
        F.col("UNIT").alias("unit_name"),
        F.col("IN_PRICE").try_cast("int").alias("org_price"),
        F.coalesce(
            F.nullif(F.col("CONT2"), F.lit("0")), F.nullif(F.col("CONT3"), F.lit("0"))
        ).alias("expiration_date"),
        _as_of(as_of).alias("updated_at"),
    )
