"""Unit tests for core__sales_daily (marts/core_sales): top-shop
tiebreaks, the NULLIF placeholder guard, the ad-cost fallback chain,
and harmonized NULL-fill. Full-chain oracle parity runs in
tools/check_oracle.py (core_sales_daily).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.frames import values_df
from linkmerce_spark.marts.core_sales import (
    assign_ad_shop,
    assign_ad_shop_tagged,
    brand_shop_daily,
    harmonize,
    sales_daily_rollup,
    top_shop_daily,
)

_D = dt.date(2024, 5, 1)


def _sales(spark):
    return spark.createDataFrame(
        [
            # P1: shopB outsells shopA
            ("P1", "shopA", 100, _D),
            ("P1", "shopB", 300, _D),
            # P2: tie -> ASC picks shopA, DESC picks shopC
            ("P2", "shopA", 200, _D),
            ("P2", "shopC", 200, _D),
            # placeholder product: excluded from the brand variant
            ("200000", "shopA", 999, _D),
        ],
        "product_id string, shop_id string, payment_amount long, order_date date",
    )


def test_top_shop_tiebreaks(spark):
    sales = _sales(spark)
    asc = {r["product_id"]: r["shop_id"] for r in top_shop_daily(sales).collect()}
    assert asc["P1"] == "shopB"
    assert asc["P2"] == "shopA"
    desc = {
        r["product_id"]: r["shop_id"]
        for r in top_shop_daily(sales, shop_asc=False).collect()
    }
    assert desc["P2"] == "shopC"


def test_brand_shop_nullif_guard(spark):
    pm = values_df(
        spark,
        [("P1", "BrandX"), ("P2", "BrandX"), ("200000", "BrandZ")],
        "product_id string, brand_name string",
    )
    out = brand_shop_daily(_sales(spark), pm)
    rows = {r["brand_name"]: r["shop_id"] for r in out.collect()}
    # placeholder rows never join (NULLIF guard), even though the master
    # carries a '200000' entry; BrandX sums P1+P2 per shop.
    assert "BrandZ" not in rows
    # shopA: 100+200=300, shopB: 300, shopC: 200 -> tie shopA/shopB, ASC
    assert rows["BrandX"] == "shopA"


def test_assign_ad_shop_fallback_chain(spark):
    pm = values_df(spark, [("P1", "BrandX"), ("P9", "BrandX")],
                   "product_id string, brand_name string")
    prd = spark.createDataFrame([(_D, "P1", "shopB")],
                                "order_date date, product_id string, shop_id string")
    brd = spark.createDataFrame([(_D, "BrandX", "shopC")],
                                "order_date date, brand_name string, shop_id string")
    ads = spark.createDataFrame(
        [
            ("P1", "shop0055", 10, _D),   # product-day hit -> shopB
            ("P9", "shop0055", 20, _D),   # brand fallback -> shopC
            ("P7", "shop0055", 30, _D),   # no master row -> default
        ],
        "product_id string, shop_id string, ad_cost long, order_date date",
    )
    out = {r["product_id"]: r["shop_id"]
           for r in assign_ad_shop(ads, pm, prd, brd).collect()}
    assert out == {"P1": "shopB", "P9": "shopC", "P7": "shop0055"}


def test_assign_ad_shop_tagged_matches_per_channel(spark):
    """The one-pass tagged assign must equal calling assign_ad_shop per
    channel with that channel's maps and unioning — including the
    unmapped channel (NULL tag) passing through on its own shop."""
    pm = values_df(spark, [("P1", "BrandX"), ("P9", "BrandX")],
                   "product_id string, brand_name string")
    prd0 = spark.createDataFrame([(_D, "P1", "shopB")],
                                 "order_date date, product_id string, shop_id string")
    brd0 = spark.createDataFrame([(_D, "BrandX", "shopC")],
                                 "order_date date, brand_name string, shop_id string")
    # channel 1 maps the SAME keys to different shops — a cross-channel
    # leak would be visible immediately
    prd1 = spark.createDataFrame([(_D, "P1", "shopQ")],
                                 "order_date date, product_id string, shop_id string")
    brd1 = spark.createDataFrame([(_D, "BrandX", "shopR")],
                                 "order_date date, brand_name string, shop_id string")
    ads0 = spark.createDataFrame(
        [("P1", "shop0055", 10, _D), ("P9", "shop0055", 20, _D),
         ("P7", "shop0055", 30, _D)],
        "product_id string, shop_id string, ad_cost long, order_date date",
    )
    ads1 = spark.createDataFrame(
        [("P1", "shop9001", 11, _D), ("P9", "shop9001", 21, _D)],
        "product_id string, shop_id string, ad_cost long, order_date date",
    )
    ads_un = spark.createDataFrame(
        [("P1", "adop0001", 7, _D)],
        "product_id string, shop_id string, ad_cost long, order_date date",
    )
    expected = (
        assign_ad_shop(ads0, pm, prd0, brd0)
        .unionByName(assign_ad_shop(ads1, pm, prd1, brd1))
        .unionByName(ads_un)
    )
    tagged = (
        ads0.withColumn("__src", F.lit(0))
        .unionByName(ads1.withColumn("__src", F.lit(1)))
        .unionByName(ads_un.withColumn("__src", F.lit(None).cast("int")))
    )
    prd_all = prd0.withColumn("__src", F.lit(0)).unionByName(
        prd1.withColumn("__src", F.lit(1))
    )
    brd_all = brd0.withColumn("__src", F.lit(0)).unionByName(
        brd1.withColumn("__src", F.lit(1))
    )
    out = assign_ad_shop_tagged(tagged, pm, prd_all, brd_all)
    assert out.columns == expected.columns
    key = lambda r: (r["product_id"], r["shop_id"], r["ad_cost"])  # noqa: E731
    assert sorted(map(key, out.collect())) == sorted(map(key, expected.collect()))


def test_harmonize_and_rollup(spark):
    sales = spark.createDataFrame(
        [("P1", "shopA", 0, 2, 100, 90, 60, 10, _D)],
        "product_id string, shop_id string, order_status int, "
        "sku_quantity long, payment_amount long, supply_amount long, "
        "supply_cost long, delivery_fee long, order_date date",
    )
    ads = spark.createDataFrame(
        [("P1", "shopA", 7, _D)],
        "product_id string, shop_id string, ad_cost long, order_date date",
    )
    out = sales_daily_rollup([harmonize(sales), harmonize(ads, order_status=8)])
    rows = {r["order_status"]: r for r in out.collect()}
    assert rows[0]["payment_amount"] == 100 and rows[0]["ad_cost"] is None
    assert rows[8]["ad_cost"] == 7 and rows[8]["payment_amount"] is None
