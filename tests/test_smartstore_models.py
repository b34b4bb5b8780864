"""Unit tests for the smartstore product/hcenter dataset module
(models/smartstore). Oracle parity for option assembly and the sales
rollup runs in tools/check_oracle.py; these pin the parse enums, the
ISO timestamp substring, nested-struct paths, and the product-master
upsert verbs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.models.smartstore import (
    aggregated_sales,
    assemble_options,
    parse_products,
    store_sales,
    upsert_sales_products,
)

PRODUCT_SCHEMA = (
    "channelProductNo string, originProductNo string, modelId string, "
    "name string, sellerManagementCode string, modelName string, "
    "brandName string, categoryId string, statusType string, "
    "channelProductDisplayStatusType string, sellerTags string, "
    "salePrice int, discountedPrice int, deliveryAttributeType string, "
    "deliveryFee int, regDate string, modifiedDate string"
)


def test_parse_products_enum_and_timestamps(spark):
    rows = spark.createDataFrame(
        [
            ("10", "11", "x", "p", "mc", "m", "b", "77", "SALE", "ON", "t",
             1000, 900, "DAWN_ARRIVAL", 0, "2024-05-01T10:20:30.999+09:00", None),
            ("20", "21", "5", "p", None, None, None, "nope", "WAIT", "WAIT", None,
             500, 500, "TELEPORT", 100, None, "2024-01-02T03:04:05"),
        ],
        PRODUCT_SCHEMA,
    )
    out = {r["product_id"]: r for r in parse_products(rows, 42).collect()}
    assert out[10]["delivery_type"] == 5
    assert out[10]["catalog_id"] is None  # TRY_CAST failure
    assert out[10]["register_dt"] == dt.datetime(2024, 5, 1, 10, 20, 30)
    assert out[20]["delivery_type"] is None  # unmapped enum
    assert out[20]["category_id"] is None
    assert out[20]["modify_dt"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert all(r["channel_seq"] == 42 for r in out.values())


def _opt_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, id string, usable boolean, groupName string, name string, "
        "price string, stockQuantity string, optionGroupName1 string, "
        "optionName1 string, optionGroupName2 string, optionName2 string, "
        "optionGroupName3 string, optionName3 string, sellerManagerCode string",
    )


def test_assemble_options_alignment_and_register_order(spark):
    simple = _opt_rows(
        spark,
        [(2, "100", True, "g", "n", "bad", "5", None, None, None, None, None, None, None),
         (1, "101", False, "g", "n2", "300", "x", None, None, None, None, None, None, None)],
    )
    comb = _opt_rows(
        spark,
        [(9, "200", True, None, None, "700", "9", "og1", "on1", "og2", "on2",
          "og3", "on3", "mc1")],
    )
    out = assemble_options(simple, comb, None, product_id=7, channel_seq=3)
    rows = {r["option_id"]: r for r in out.collect()}
    assert len(rows) == 3 and out.columns[-1] == "register_order"
    # simple: COALESCE(bad, 0); register order follows seq, per variant
    assert rows[100]["option_price"] == 0 and rows[100]["register_order"] == 2
    assert rows[101]["register_order"] == 1 and rows[101]["stock_quantity"] is None
    assert rows[100]["product_type"] == 0 and rows[100]["option_group2"] is None
    assert rows[200]["product_type"] == 1 and rows[200]["option_group3"] == "og3"
    assert rows[200]["register_order"] == 1  # numbering restarts per variant
    assert all(r["product_id"] == 7 and r["channel_seq"] == 3 for r in rows.values())


def _nested(spark, rows):
    df = spark.createDataFrame(
        rows, "pid string, pname string, cid string, click long, pc long, pa long"
    )
    return df.select(
        F.struct(
            F.col("pid").alias("identifier"),
            F.col("pname").alias("name"),
            F.struct(
                F.col("cid").alias("identifier"),
                F.concat(F.lit("c"), F.col("cid")).alias("name"),
                F.concat(F.lit("a>"), F.col("cid")).alias("fullName"),
            ).alias("category"),
        ).alias("product"),
        F.struct(F.col("click").alias("click")).alias("visit"),
        F.struct(
            F.col("pc").alias("paymentCount"), F.col("pa").alias("paymentAmount")
        ).alias("sales"),
    )


def test_aggregated_sales_distinct_then_rollup(spark):
    rows = _nested(
        spark,
        [("1", "p1", "4", 10, 1, 100),
         ("1", "p1", "4", 10, 1, 100),  # exact dup -> DISTINCT collapses
         ("1", "p1", "4", 20, 2, 200),
         ("2", "p2", "x", 5, 1, 50)],
    )
    sales, product = aggregated_sales(rows, 9, "2024-05-01", "2024-05-31")
    s = {r["product_id"]: r for r in sales.collect()}
    assert s[1]["click_count"] == 30 and s[1]["payment_amount"] == 300
    assert s[2]["category_id3"] is None  # TRY_CAST failure propagates
    p = {r["product_id"]: r for r in product.collect()}
    assert p[1]["first_payment_date"] == dt.date(2024, 5, 1)
    assert p[1]["product_name"] == "p1" and p[1]["sales_price"] is None


def test_upsert_sales_products_verbs(spark):
    _, old = aggregated_sales(
        _nested(spark, [("1", "p-old", "4", 1, 1, 1)]), 9, "2024-04-01", "2024-04-30"
    )
    _, new = aggregated_sales(
        _nested(spark, [("1", None, "7", 1, 1, 1), ("2", "p2", "5", 1, 1, 1)]),
        9, "2024-05-01", "2024-05-31",
    )
    out = {r["product_id"]: r for r in upsert_sales_products(old, new).collect()}
    assert out[1]["product_name"] == "p-old"  # source NULL -> target kept
    assert out[1]["category_id3"] == 7  # source wins
    assert out[1]["first_payment_date"] == dt.date(2024, 4, 1)  # LEAST
    assert out[1]["last_payment_date"] == dt.date(2024, 5, 31)  # GREATEST
    assert out[2]["product_name"] == "p2"  # inserted


def test_store_sales_struct_paths(spark):
    rows = spark.createDataFrame([(7, 700, 30)], "pc long, pa long, ra long").select(
        F.struct(
            F.col("pc").alias("paymentCount"),
            F.col("pa").alias("paymentAmount"),
            F.col("ra").alias("refundAmount"),
        ).alias("sales")
    )
    (r,) = store_sales(rows, 5, "2024-06-30").collect()
    assert r["payment_count"] == 7 and r["payment_amount"] == 700
    assert r["mall_seq"] == 5 and r["payment_date"] == dt.date(2024, 6, 30)
