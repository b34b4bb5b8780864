"""naversearch dataset module: display-rank numbering, tag stripping,
RFC/compact date parsing, product upsert COALESCE semantics."""

from __future__ import annotations

import datetime

from linkmerce_spark.models.naversearch import (
    parse_blog,
    parse_news,
    shop_product,
    shop_rank,
    upsert_products,
)


def test_blog_parse_ranks_and_strips(spark):
    raw = spark.createDataFrame(
        [
            (0, "<b>first</b>", "u1", "d<span>esc</span>", "blog a", "ba", "20240115"),
            (1, "second", "u2", "plain", "blog b", "bb", "bad-date"),
        ],
        "seq int, title string, link string, description string, "
        "bloggername string, bloggerlink string, postdate string",
    )
    out = {r["display_rank"]: r for r in parse_blog(raw, "kw", start=31).collect()}
    assert set(out) == {31, 32}
    assert out[31]["title"] == "first" and out[31]["description"] == "desc"
    assert out[31]["post_date"] == datetime.date(2024, 1, 15)
    assert out[32]["post_date"] is None  # TRY semantics
    assert all(r["keyword"] == "kw" for r in out.values())


def test_news_rfc_pubdate_parse(spark):
    raw = spark.createDataFrame(
        [(0, "t", "o", "d", "Mon, 15 Jan 1996 10:30:00 +0000")],
        "seq int, title string, originallink string, description string, pubdate string",
    )
    (row,) = parse_news(raw, "n", 1).collect()
    assert row["publish_dt"] == datetime.datetime(1996, 1, 15, 10, 30)


def test_shop_rank_product_type_and_id(spark):
    raw = spark.createDataFrame(
        [
            (0, "100", "https://s.example.com/x/products/55", "0"),
            (1, "101", "https://s.example.com/catalog/66", "3"),
            (2, "102", "https://s.example.com/item?id=7", "junk"),
        ],
        "seq int, productId string, link string, productType string",
    )
    rows = {r["nv_mid"]: r for r in shop_rank(raw, "k", 1).collect()}
    assert rows[100]["product_id"] == 55 and rows[100]["product_type"] == 2  # (0+2)%3
    assert rows[101]["product_id"] is None and rows[101]["product_type"] == 2  # (3+2)%3
    assert rows[102]["product_type"] is None  # junk -> TRY_CAST NULL


_RAW_SCHEMA = (
    "productId string, link string, title string, category1 string, "
    "category2 string, category3 string, category4 string, mallName string, "
    "brand string, lprice string"
)


def test_upsert_products_coalesce_keeps_old_on_gaps(spark):
    b1_raw = spark.createDataFrame(
        [
            ("1", "https://s.example.com/catalog/1", "old name", "c1", "c2", None, None,
             "mall-x", "brand-x", "1000"),
            ("2", "https://s.example.com/a/products/2", "only in b1", "c1", None, None,
             None, "mall-y", "", "2000"),
        ],
        _RAW_SCHEMA,
    )
    b2_raw = spark.createDataFrame(
        [
            # gap batch: placeholder mall + empty brand -> NULLs
            ("1", "https://s.example.com/b/products/11", "new name", "n1", None, None,
             None, "네이버", "", "9999"),
            ("3", "https://s.example.com/c/products/3", "new product", "n1", None, None,
             None, "mall-z", "bz", "3000"),
        ],
        _RAW_SCHEMA,
    )
    b1 = shop_product(b1_raw, "2024-01-01 00:00:00")
    b2 = shop_product(b2_raw, "2024-02-01 00:00:00")
    out = {r["nv_mid"]: r for r in upsert_products(b1, b2).collect()}
    assert set(out) == {1, 2, 3}
    updated = out[1]
    assert updated["product_name"] == "new name"  # source wins where present
    assert updated["product_id"] == 11
    assert updated["mall_name"] == "mall-x" and updated["brand_name"] == "brand-x"
    assert updated["sales_price"] == 1000  # price not in the SET list
    assert updated["product_type"] == 0  # ignore verb keeps target's catalog flag
    assert str(updated["updated_at"]) == "2024-02-01 00:00:00"  # replace verb
    assert str(out[2]["updated_at"]) == "2024-01-01 00:00:00"
    assert out[3]["product_name"] == "new product"  # fresh insert
