"""Unit tests for the smartstore extras module (hcenter catalog,
pageview, bizdata, settlement). Oracle parity for the category split
and pageview classification runs in tools/check_oracle.py.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from linkmerce_spark.models.smartstore.extras import (
    brand_price,
    marketing_channel,
    pageview_by_device,
    parse_settlements,
)


def _pv_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "device string, url string, pc long, uc long, tos long, ymd string"
    )
    return df.select(
        F.struct(F.col("device").alias("device"), F.col("url").alias("url")).alias(
            "measuredThrough"
        ),
        F.struct(
            F.col("pc").alias("pageClick"),
            F.col("uc").alias("userClick"),
            F.col("tos").alias("timeOnSite"),
        ).alias("visit"),
        "ymd",
    )


def test_pageview_device_enum_and_filter(spark):
    rows = _pv_rows(
        spark,
        [("Pc", None, 1, 1, 10, "2024-05-01"),
         ("All", None, 2, 2, 20, "2024-05-01"),
         ("Tablet", None, 3, 3, 30, "2024-05-01")],  # dropped by IN filter
    )
    out = pageview_by_device(rows, 9).collect()
    assert sorted(r["device_type"] for r in out) == [0, 2]


def test_settlement_enum_hugeint_and_guard(spark):
    rows = spark.createDataFrame(
        [("99999999999999999999", "5", "7", "PROD_ORDER",
          "QUICK_SETTLE_CANCEL", 100, 3, 0, 0, 1, 97, "2024-05-02", "2024-05-09"),
         ("2", "5", "x", "DELIVERY", "???", 1, 0, 0, 0, 0, 1, "junk", None)],
        "productOrderId string, orderId string, productId string, "
        "productOrderType string, settleType string, paySettleAmount int, "
        "totalPayCommissionAmount int, freeInstallmentCommissionAmount int, "
        "sellingInterlockCommissionAmount int, benefitSettleAmount int, "
        "settleExpectAmount int, payDate string, settleCompleteDate string",
    )
    out = parse_settlements(rows, 42).collect()
    assert len(out) == 1  # bad payDate row dropped
    (r,) = out
    assert r["product_order_id"] == Decimal("99999999999999999999")  # > int64
    assert r["settle_type"] == 4
    assert r["payment_date"] == dt.date(2024, 5, 2)
    assert r["settlement_date"] == dt.date(2024, 5, 9)


def test_marketing_channel_dash_defaults(spark):
    rows = spark.createDataFrame(
        [(None, "naver", None, "d", None, "5", "x", "7", "1", "1000")],
        "deviceCategory string, ntSource string, ntMedium string, "
        "ntDetail string, ntKeyword string, numUsers string, "
        "numInteractions string, pv string, numPurchases string, payAmount string",
    )
    (r,) = marketing_channel(rows, 7, "2024-06-01").collect()
    assert r["device_category"] == "-" and r["nt_medium"] == "-"
    assert r["nt_source"] == "naver" and r["nt_keyword"] == "-"
    assert r["num_interactions"] is None  # TRY_CAST junk
    assert r["payment_amount"] == 1000 and r["ymd"] == dt.date(2024, 6, 1)


def test_brand_price_fan(spark):
    rows = spark.createDataFrame(
        [("123", "44", "7>8>9>10", "p1", 5000, "2024-01-05"),
         ("xx", "44", "7>8", "bad-id", 100, "2024-01-05")],  # unparseable id drops
        "mallProductId string, categoryId string, fullCategoryId string, "
        "name string, lowestPrice int, registerDate string",
    )
    price, product = brand_price(rows, 9, "2026-08-13 10:00:00", "2026-08-13")
    assert price.count() == 1 and product.count() == 1
    (p,) = product.collect()
    assert p["category_id3"] == 9  # 3rd '>' level
    assert p["first_payment_date"] == dt.date(2024, 1, 5)
    assert p["last_payment_date"] == dt.date(2026, 8, 13)
    (c,) = price.collect()
    assert c["sales_price"] == 5000 and c["created_at"] == dt.datetime(2026, 8, 13, 10)
