"""Unit tests for the sabangnet account/product extras and the naver
main-search module. Oracle parity for the option-download guard and
cafe-article parse runs in tools/check_oracle.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.models.naversearch.main import (
    normalize_dot_date,
    shopping_page_units,
)
from linkmerce_spark.models.sabangnet.extras import (
    account_placeholders,
    parse_add_products,
    parse_products,
)


def test_image_file_basename(spark):
    rows = spark.createDataFrame(
        [("P1", "/img/2024/05/photo.jpg"), ("P2", "solo.png"), ("P3", None)],
        "prdNo string, prdImgFilePathNm string",
    ).select(
        "prdNo", "prdImgFilePathNm",
        *[
            F.lit(None).cast("string").alias(c)
            for c in [
                "modlNm", "onsfPrdCd", "prdNm", "prdAbbrRmrk", "brndNm",
                "mkcpNm", "lgstscSvcAcntIdK", "prdSplyStsCd", "prdcYy",
                "fstRegsDt", "fnlChgDt",
            ]
        ],
        F.lit(0).alias("sepr"),
        F.lit(0).alias("splyCprc"),
    )
    out = {r["product_id"]: r for r in parse_products(rows).collect()}
    assert out["P1"]["image_file"] == "photo.jpg"  # last '/' segment
    assert out["P2"]["image_file"] == "solo.png"
    assert out["P3"]["image_file"] is None


def test_account_placeholders_typed_nulls(spark):
    rows = spark.createDataFrame([("7", "shopA")], "acntRegsSrno string, shmaId string")
    (r,) = account_placeholders(rows).collect()
    assert r["account_no"] == 7 and r["shop_id"] == "shopA"
    assert r["shop_name"] is None and r["shop_seq"] is None


def test_add_products_meta_constants(spark):
    rows = spark.createDataFrame(
        [("G1", 3, "123456", "0001", "옵션A", 1000)],
        "addPrdGrpId string, addPrdSkuCnfgSrno int, prdNo string, "
        "skuNo string, addPrdSkuCnfgNm string, sepr int",
    )
    meta = {
        "addPrdGrpNm": "추가구성",
        "shmaId": "shopZ",
        "fstRegsDt": "2024-05-01T10:00:00.123+09:00",
        "fnlChgDt": None,
    }
    (r,) = parse_add_products(rows, meta).collect()
    assert r["option_id"] == "123456-0001"
    assert r["group_name"] == "추가구성" and r["shop_id"] == "shopZ"
    assert r["register_dt"] == dt.datetime(2024, 5, 1, 10, 0, 0)
    assert r["modify_dt"] is None


def test_normalize_dot_date_passthrough(spark):
    df = spark.createDataFrame(
        [("2024.05.01.",), ("3시간 전",), (None,)], "d string"
    ).select(normalize_dot_date("d").alias("out"))
    assert [r["out"] for r in df.collect()] == ["2024-05-01", "3시간 전", None]


def test_shopping_page_units_conditional_count(spark):
    rows = spark.createDataFrame(
        [("AD_CARD",), ("SHOP_CARD",), ("SHOP_CARD",), ("AD_CARD",), ("ETC",)],
        "cardType string",
    )
    (r,) = shopping_page_units(rows, "키워드", "2026-08-13 12:00:00").collect()
    assert r["page_unit_ad"] == 2 and r["page_unit_shop"] == 3
    assert r["keyword"] == "키워드"
    assert r["updated_at"] == dt.datetime(2026, 8, 13, 12)
