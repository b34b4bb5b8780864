"""coupang wing product — seller/rocket catalog datasets, Spark-first.

Parity sites (semantics, not code) in
``core/coupang/wing/product/models.sql``:

- ProductOption bulk_insert (:29-57): VALID/INVALID status enum,
  placeholder columns, TRY_CAST timestamps.
- ProductDetail three load shapes (:74-136): the plain insert, the
  vendor partial-column upsert (ON CONFLICT ... SET = EXCLUDED — the
  row-level ``replace`` verbs), and the RFM EXISTS-gated upsert
  (only update options already present — a LEFT SEMI gate + merge).
- ProductDownload (:156-176): Korean spreadsheet headers + TRY_CASTs.
- RocketInventory / RocketOption (:198-272): deeply nested DTO struct
  paths (3-level storageFee path), the 5-level display-category
  COALESCE waterfall, the struct-IS-NOT-NULL status tri-logic
  (hidden -> 2, else onSale ? 0 : 1, DTO missing -> NULL), and the
  parameterized load timestamp.

Scale notes: narrow struct projections; the RFM gate is a broadcast
LEFT SEMI against the target key set; upserts reuse merge_frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from linkmerce_spark.operators.merge import merge_frames

__all__ = [
    "parse_product_options",
    "parse_product_details",
    "upsert_detail_vendor",
    "upsert_detail_rfm",
    "parse_product_download",
    "rocket_inventory",
    "rocket_options",
]


def parse_product_options(rows: DataFrame, is_deleted: bool) -> DataFrame:
    """ProductOption bulk_insert (models.sql:29-57)."""
    return rows.select(
        F.col("vendorInventoryId").cast("bigint").alias("vendor_inventory_id"),
        F.col("vendorInventoryItemId").cast("bigint").alias(
            "vendor_inventory_item_id"
        ),
        F.lit(None).cast("bigint").alias("product_id"),
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.lit(None).cast("bigint").alias("item_id"),
        F.col("barcode"),
        F.col("vendorId").alias("vendor_id"),
        F.col("productName").alias("product_name"),
        F.col("itemName").alias("option_name"),
        F.col("displayCategoryCode").cast("int").alias("display_category_id"),
        F.col("categoryId").cast("int").alias("category_id"),
        F.col("categoryName").alias("category_name"),
        F.col("brand").alias("brand_name"),
        F.col("manufacture").alias("maker_name"),
        F.when(F.col("valid") == "VALID", 0)
        .when(F.col("valid") == "INVALID", 1)
        .cast("tinyint")
        .alias("product_status"),
        F.lit(is_deleted).alias("is_deleted"),
        F.lit(None).cast("int").alias("price"),
        F.col("salePrice").cast("int").alias("sales_price"),
        F.col("deliveryCharge").cast("int").alias("delivery_fee"),
        F.col("viUnitSoldAgg").cast("int").alias("order_quantity"),
        F.col("stockQuantity").cast("int").alias("stock_quantity"),
        F.col("createdOn").try_cast("timestamp").alias("register_dt"),
        F.col("modifiedOn").try_cast("timestamp").alias("modify_dt"),
    )


_DETAIL_COLS = [
    "vendor_inventory_id", "vendor_inventory_item_id", "product_id",
    "option_id", "item_id", "barcode", "option_name", "price",
    "sales_price", "stock_quantity",
]


def parse_product_details(rows: DataFrame) -> DataFrame:
    """ProductDetail bulk_insert (models.sql:74-88)."""
    return rows.select(
        F.col("vendorInventoryId").cast("bigint").alias("vendor_inventory_id"),
        F.col("vendorInventoryItemId").cast("bigint").alias(
            "vendor_inventory_item_id"
        ),
        F.col("productId").cast("bigint").alias("product_id"),
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.col("itemId").cast("bigint").alias("item_id"),
        F.col("barcode"),
        F.col("itemName").alias("option_name"),
        F.col("originalPrice").cast("int").alias("price"),
        F.col("salePrice").cast("int").alias("sales_price"),
        F.col("stockQuantity").cast("int").alias("stock_quantity"),
    )


def upsert_detail_vendor(target: DataFrame, rows: DataFrame) -> DataFrame:
    """ProductDetail bulk_insert_vendor (models.sql:90-110): a partial-
    column batch keyed on vendor_inventory_item_id; present columns
    replace, absent ones keep the target value (missing-column verbs
    default to ignore in merge_frames)."""
    staged = rows.select(
        F.col("vendorInventoryItemId").cast("bigint").alias(
            "vendor_inventory_item_id"
        ),
        F.col("productId").cast("bigint").alias("product_id"),
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.col("itemId").cast("bigint").alias("item_id"),
        F.col("originalPrice").cast("int").alias("price"),
    )
    return merge_frames(
        target,
        staged,
        ["vendor_inventory_item_id"],
        matched={c: "replace" for c in ["product_id", "option_id", "item_id", "price"]},
    )


def upsert_detail_rfm(target: DataFrame, rows: DataFrame) -> DataFrame:
    """ProductDetail bulk_insert_rfm (models.sql:112-136): only options
    already present in the target are updated (the WHERE EXISTS gate —
    a LEFT SEMI join here); key is option_id, updated columns replace."""
    staged = rows.select(
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.col("vendorInventoryItemId").cast("bigint").alias(
            "vendor_inventory_item_id"
        ),
        F.col("itemId").cast("bigint").alias("item_id"),
        F.col("barcode"),
        F.col("originalPrice").cast("int").alias("price"),
    )
    gated = staged.join(
        broadcast(target.select("option_id").distinct()), "option_id", "left_semi"
    )
    return merge_frames(
        target,
        gated,
        ["option_id"],
        matched={
            c: "replace"
            for c in ["vendor_inventory_item_id", "item_id", "barcode", "price"]
        },
        not_matched="do_nothing",
    )


def parse_product_download(rows: DataFrame, vendor_id: str, is_deleted: bool) -> DataFrame:
    """ProductDownload bulk_insert (models.sql:156-176)."""
    return rows.select(
        F.col("등록상품ID").cast("bigint").alias("vendor_inventory_id"),
        F.col("Product ID").cast("bigint").alias("product_id"),
        F.col("옵션 ID").cast("bigint").alias("option_id"),
        F.col("바코드").alias("barcode"),
        F.lit(vendor_id).alias("vendor_id"),
        F.col("쿠팡 노출 상품명").alias("vendor_inventory_name"),
        F.col("업체 등록 상품명").alias("product_name"),
        F.col("등록 옵션명").alias("option_name"),
        F.when(F.col("판매상태") == "판매중", 0)
        .when(F.col("판매상태") == "판매중지", 1)
        .cast("tinyint")
        .alias("product_status"),
        F.lit(is_deleted).alias("is_deleted"),
        F.col("할인율기준가").try_cast("int").alias("price"),
        F.col("판매가격").try_cast("int").alias("sales_price"),
        F.col("판매수량").try_cast("int").alias("order_quantity"),
        F.col("잔여수량(재고)").try_cast("int").alias("stock_quantity"),
    )


def rocket_inventory(rows: DataFrame, vendor_id: str, as_of: str) -> DataFrame:
    """RocketInventory bulk_insert (models.sql:198-216): 3-level nested
    DTO paths and the parameterized load timestamp."""
    return rows.select(
        F.col("listingDetails.vendorInventoryId")
        .cast("bigint")
        .alias("vendor_inventory_id"),
        F.col("creturnConfigViewDto.vendorInventoryItemId")
        .cast("bigint")
        .alias("vendor_inventory_item_id"),
        F.col("listingDetails.productId").cast("bigint").alias("product_id"),
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.col("creturnConfigViewDto.externalSkuId").cast("bigint").alias("sku_id"),
        F.coalesce(F.col("creturnConfigViewDto.vendorId"), F.lit(vendor_id)).alias(
            "vendor_id"
        ),
        F.col("inventoryDetails.orderableQuantity")
        .cast("int")
        .alias("stock_quantity"),
        F.col(
            "inventoryDetails.inProgressInboundStatistics.inProgressInboundQuantity"
        )
        .cast("int")
        .alias("inprogress_quantity"),
        F.col("gmvForLast7Days").cast("int").alias("sales_amount_7d"),
        F.col("gmvForLast30Days").cast("int").alias("sales_amount_30d"),
        F.col("unitsSoldForLast7Days").cast("int").alias("unit_sold_7d"),
        F.col("unitsSoldForLast30Days").cast("int").alias("unit_sold_30d"),
        F.col("inventoryDetails.daysOfCover").cast("int").alias("days_of_cover"),
        F.col("inventoryDetails.storageFee.monthlyStorageFeeAmount.amount")
        .try_cast("int")
        .alias("fee_amount"),
        F.lit(as_of).cast("timestamp").alias("updated_at"),
    )


def rocket_options(rows: DataFrame, vendor_id: str) -> DataFrame:
    """RocketOption bulk_insert (models.sql:243-272): the 5-level
    display-category COALESCE waterfall and the hidden/onSale/missing
    status tri-logic (struct IS NOT NULL drives the NULL branch)."""
    dto = F.col("creturnConfigViewDto")
    return rows.select(
        F.col("listingDetails.vendorInventoryId")
        .cast("bigint")
        .alias("vendor_inventory_id"),
        F.col("creturnConfigViewDto.vendorInventoryItemId")
        .cast("bigint")
        .alias("vendor_inventory_item_id"),
        F.col("listingDetails.productId").cast("bigint").alias("product_id"),
        F.col("vendorItemId").cast("bigint").alias("option_id"),
        F.col("creturnConfigViewDto.itemId").cast("bigint").alias("item_id"),
        F.lit(None).cast("string").alias("barcode"),
        F.coalesce(F.col("creturnConfigViewDto.vendorId"), F.lit(vendor_id)).alias(
            "vendor_id"
        ),
        F.coalesce(
            F.col("creturnConfigViewDto.productName"),
            F.col("listingDetails.vendorInventoryName"),
        ).alias("product_name"),
        F.col("creturnConfigViewDto.itemName").alias("option_name"),
        F.coalesce(
            *[
                F.col(f"creturnConfigViewDto.displayCategoryCodeLevel{i}")
                for i in (5, 4, 3, 2, 1)
            ]
        )
        .cast("int")
        .alias("display_category_id"),
        F.col("creturnConfigViewDto.creturnCategoryLevelThresholdDto.categoryId")
        .cast("int")
        .alias("category_id"),
        F.col("creturnConfigViewDto.creturnCategoryLevelThresholdDto.kanNameEn")
        .alias("category_name"),
        F.when(F.col("inventoryDetails.isHiddenByVendor"), F.lit(2))
        .when(
            dto.isNotNull(),
            F.when(F.col("creturnConfigViewDto.onSale"), 0).otherwise(1),
        )
        .otherwise(F.lit(None))
        .cast("tinyint")
        .alias("product_status"),
        F.lit(None).cast("int").alias("price"),
        F.col("pricing.salesPrice.amount").try_cast("int").alias("sales_price"),
        F.col("unitsSoldForLast30Days").cast("int").alias("order_quantity"),
        F.col("inventoryDetails.orderableQuantity")
        .cast("int")
        .alias("stock_quantity"),
        F.col("listingDetails.productRegistrationDate")
        .try_cast("timestamp")
        .alias("register_dt"),
    )
