"""Unit tests for the coupang wing product module (models/coupang/
wing). Oracle parity for the RocketOption parse runs in
tools/check_oracle.py; these pin the two ProductDetail upsert shapes
and the download/option parses.
"""

from __future__ import annotations

from linkmerce_spark.models.coupang.wing import (
    parse_product_details,
    parse_product_options,
    upsert_detail_rfm,
    upsert_detail_vendor,
)

DETAIL_SCHEMA = (
    "vendorInventoryId string, vendorInventoryItemId string, productId string, "
    "vendorItemId string, itemId string, barcode string, itemName string, "
    "originalPrice int, salePrice int, stockQuantity int"
)


def _details(spark, rows):
    return parse_product_details(spark.createDataFrame(rows, DETAIL_SCHEMA))


def test_vendor_upsert_partial_columns(spark):
    target = _details(
        spark, [("1", "11", "101", "1001", "5", "bc", "opt", 900, 800, 3)]
    )
    vendor_rows = spark.createDataFrame(
        [("11", "999", "1001", "7", 1200), ("12", "998", "1002", "8", 500)],
        "vendorInventoryItemId string, productId string, vendorItemId string, "
        "itemId string, originalPrice int",
    )
    out = {
        r["vendor_inventory_item_id"]: r
        for r in upsert_detail_vendor(target, vendor_rows).collect()
    }
    assert out[11]["product_id"] == 999 and out[11]["price"] == 1200  # replaced
    assert out[11]["barcode"] == "bc" and out[11]["sales_price"] == 800  # kept
    assert out[12]["option_id"] == 1002  # new key inserted
    assert out[12]["barcode"] is None


def test_rfm_upsert_exists_gate(spark):
    target = _details(
        spark, [("1", "11", "101", "1001", "5", "bc", "opt", 900, 800, 3)]
    )
    rfm_rows = spark.createDataFrame(
        [("1001", "77", "9", "newbc", 1500),  # existing option -> updated
         ("2002", "88", "9", "x", 10)],  # absent option -> dropped by gate
        "vendorItemId string, vendorInventoryItemId string, itemId string, "
        "barcode string, originalPrice int",
    )
    out = upsert_detail_rfm(target, rfm_rows).collect()
    assert len(out) == 1
    (r,) = out
    assert r["option_id"] == 1001
    assert r["vendor_inventory_item_id"] == 77 and r["barcode"] == "newbc"
    assert r["price"] == 1500 and r["option_name"] == "opt"  # untouched column


def test_product_option_status_enum(spark):
    rows = spark.createDataFrame(
        [("1", "11", "1001", None, "v", "p", "o", "10", "20", "c", "b", "m",
          "VALID", 100, 0, 5, 9, "2024-05-01 10:00:00", "bad"),
         ("2", "12", "1002", None, "v", "p", "o", "10", "20", "c", "b", "m",
          "WEIRD", 100, 0, 5, 9, None, None)],
        "vendorInventoryId string, vendorInventoryItemId string, "
        "vendorItemId string, barcode string, vendorId string, "
        "productName string, itemName string, displayCategoryCode string, "
        "categoryId string, categoryName string, brand string, "
        "manufacture string, valid string, salePrice int, deliveryCharge int, "
        "viUnitSoldAgg int, stockQuantity int, createdOn string, modifiedOn string",
    )
    out = {r["option_id"]: r for r in parse_product_options(rows, False).collect()}
    assert out[1001]["product_status"] == 0
    assert out[1001]["modify_dt"] is None  # TRY_CAST failure
    assert out[1002]["product_status"] is None
    assert all(r["is_deleted"] is False for r in out.values())
