"""searchad dataset module: URL extraction, staged master assembly,
stat/conv rollups, FULL OUTER report merge."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from linkmerce_spark.models.searchad import (
    advanced_report,
    extract_product_id,
    master_ads,
    parse_campaign,
    rollup_ad_conv,
    rollup_ad_stat,
)


def test_extract_product_id(spark):
    rows = [
        ("https://smartstore.naver.com/mystore/products/12345", 12345),
        ("https://brand.naver.com/b/products/777", 777),
        ("https://example.com/products/999", None),  # wrong host
        ("https://smartstore.naver.com/mystore/items/5", None),  # wrong path
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r[0] for r in df.select(extract_product_id("url")).collect()]
    assert got == [want for _, want in rows]


def test_parse_campaign_flags_and_pk_dedup(spark):
    ts = datetime.datetime(2024, 1, 1)
    raw = spark.createDataFrame(
        [
            ("c1", "first", 1, 10, 0, ts, None, 0),
            ("c1", "dupe-later-seq", 1, 10, 1, ts, ts, 1),
            ("c2", "deleted", 2, 10, 1, ts, ts, 2),
        ],
        "campaign_id string, campaign_name string, campaign_type int, "
        "customer_id long, on_off int, reg_tm timestamp, del_tm timestamp, seq int",
    )
    out = {r["campaign_id"]: r for r in parse_campaign(raw).collect()}
    assert len(out) == 2
    assert out["c1"]["campaign_name"] == "first"  # lowest seq wins
    assert out["c1"]["is_enabled"] is True and out["c1"]["is_deleted"] is False
    assert out["c2"]["is_enabled"] is False and out["c2"]["is_deleted"] is True


def _staged(spark, rows, extra_schema):
    base = (
        "ad_id string, adgroup_id string, customer_id long, on_off int, "
        "del_tm timestamp"
    )
    return spark.createDataFrame(rows, f"{base}, {extra_schema}")


def test_master_ads_stage_conflict_first_stage_wins(spark):
    link = _staged(
        spark,
        [("ad-1", "g1", 2, 0, None, "link title", "https://brand.naver.com/x/products/42", None)],
        "subject string, landing_url_pc string, landing_url_mobile string",
    )
    brand = _staged(
        spark,
        [
            ("ad-1", "g1", 2, 1, None, "brand dupe", "https://shop.example.com/9"),
            ("ad-2", "g1", 2, 0, None, "brand only", "https://brand.naver.com/y/products/7"),
            ("ad-3", "g1", 9, 0, None, "other customer", "https://shop.example.com/8"),
        ],
        "title string, link_url string",
    )
    out = {r["ad_id"]: r for r in master_ads(2, link_ad=link, brand_ad=brand).collect()}
    assert set(out) == {"ad-1", "ad-2"}  # ad-3 scoped out by customer
    assert out["ad-1"]["ad_type"] == 1 and out["ad-1"]["title"] == "link title"
    assert out["ad-1"]["product_id"] == 42
    assert out["ad-2"]["ad_type"] == 9 and out["ad-2"]["product_id"] == 7


def test_report_rollups_and_full_outer_merge(spark):
    d = datetime.date(2024, 3, 1)
    stat_raw = spark.createDataFrame(
        [
            ("a1", 2, None, "P", d, 10, 1, 100, 3),
            ("a1", 2, None, "P", d, 20, 0, 50, 2),  # same PK -> summed
            ("a2", 2, 7, "M", d, 5, 1, 10, 1),  # stat-only key
        ],
        "ad_id string, customer_id long, media_code long, pc_mobile_type string, "
        "date date, impression long, click long, cost long, ad_rank long",
    )
    conv_raw = spark.createDataFrame(
        [
            ("a1", 2, None, "P", d, 1, 2, 500),  # direct (method=1)
            ("a1", 2, None, "P", d, 2, 1, 300),  # indirect
            ("a9", 2, 0, "O", d, 1, 1, 99),  # conv-only key
        ],
        "ad_id string, customer_id long, media_code long, pc_mobile_type string, "
        "date date, conv_method int, conv_count long, conv_amount long",
    )
    rep = advanced_report(
        rollup_ad_stat(stat_raw), rollup_ad_conv(conv_raw), customer_id=2
    )
    rows = {(r["ad_id"], r["media_code"], r["pc_mobile_type"]): r for r in rep.collect()}
    matched = rows[("a1", 0, 0)]  # media NULL -> 0, 'P' -> 0
    assert matched["impression_count"] == 30 and matched["click_count"] == 1
    assert matched["conv_count"] == 3 and matched["direct_conv_count"] == 2
    assert matched["conv_amount"] == 800 and matched["direct_conv_amount"] == 500
    stat_only = rows[("a2", 7, 1)]
    assert stat_only["conv_count"] == 0 and stat_only["impression_count"] == 5
    conv_only = rows[("a9", 0, 2)]
    assert conv_only["impression_count"] == 0 and conv_only["conv_amount"] == 99
    assert conv_only["ymd"] == d  # COALESCE'd key from the conv side
