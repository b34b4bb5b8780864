"""Ads insight mart: pivot-split effective dating and integer allocation."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from linkmerce_spark.marts.ads import ranged_bundle_relation


def test_ranged_bundle_relation_pivot_split(spark):
    rel = spark.createDataFrame(
        [
            ("a", 2, "1,2", "P"),  # no pivot -> single open-ended row
            ("b", 2, "9", "P"),  # pivot only -> expansion after split
            ("c", 2, "9,3", "P"),  # mixed -> pivot dropped after split
            ("d", 2, "9,9", "P"),  # only pivots (dupes) -> NULL bundle
        ],
        "ad_id string, ad_level int, bundle_product_ids string, platform_name string",
    )
    out = ranged_bundle_relation(
        rel, pivot_product="9", expansion="7,8",
        pre_end="2024-06-09", post_start="2024-06-10",
    )
    rows = sorted(
        ((r["ad_id"], r["start_date"], r["end_date"], r["bundle_product_ids"])
         for r in out.collect()),
    )
    d = datetime.date
    assert rows == [
        ("a", d(2000, 1, 1), d(2999, 12, 31), "1,2"),
        ("b", d(2000, 1, 1), d(2024, 6, 9), "9"),
        ("b", d(2024, 6, 10), d(2999, 12, 31), "7,8"),
        ("c", d(2000, 1, 1), d(2024, 6, 9), "9,3"),
        ("c", d(2024, 6, 10), d(2999, 12, 31), "3"),
        ("d", d(2000, 1, 1), d(2024, 6, 9), "9,9"),
        ("d", d(2024, 6, 10), d(2999, 12, 31), None),
    ]


def test_insight_allocation_remainder_to_first(spark):
    """10 impressions over a 3-product bundle -> 4/3/3 (first element
    takes DIV remainder), matching the reference's DIV/MOD shape."""
    from linkmerce_spark.marts.ads import insight_daily

    d = "2024-01-20"
    report = spark.createDataFrame(
        [("ad-1", 0, 0, 0, 10, 4, 100, 0, 0, 0, 0, 0, d)],
        "ad_id string, customer_id long, media_code long, pc_mobile_type int, "
        "impression_count long, click_count long, ad_cost long, ad_rank_sum long, "
        "conv_count long, direct_conv_count long, conv_amount long, "
        "direct_conv_amount long, ymd string",
    ).withColumn("ymd", F.col("ymd").cast("date"))
    ad_dim = spark.createDataFrame(
        [("ad-1", "g1", 5)], "ad_id string, adgroup_id string, product_id long"
    )
    adgroup_dim = spark.createDataFrame(
        [("g1", "c1")], "adgroup_id string, campaign_id string"
    )
    rel = spark.createDataFrame(
        [("ad-1", 2, "10,11,12", "P", "2000-01-01", "2999-12-31")],
        "ad_id string, ad_level int, bundle_product_ids string, "
        "platform_name string, s string, e string",
    ).select(
        "ad_id", "ad_level", "bundle_product_ids", "platform_name",
        F.col("s").cast("date").alias("start_date"),
        F.col("e").cast("date").alias("end_date"),
    )
    empty_prod = spark.createDataFrame(
        [], "product_id long, bundle_product_ids string, start_date date, end_date date"
    )
    empty_acc = spark.createDataFrame([], "customer_id long, bundle_brand_ids string")
    empty_renewal = spark.createDataFrame(
        [], "product_id_new string, product_id_old string, renewal_date date"
    )
    out = insight_daily(
        report, ad_dim, adgroup_dim, rel, empty_prod, empty_acc, empty_renewal,
        cost_uplift_before="2024-01-16",
    )
    got = {r["product_id"]: r for r in out.collect()}
    assert [got[p]["impression_count"] for p in ("10", "11", "12")] == [4, 3, 3]
    assert [got[p]["click_count"] for p in ("10", "11", "12")] == [2, 1, 1]
    # ymd >= uplift pivot -> cost NOT uplifted; 100 over 3 -> 34/33/33
    assert [got[p]["ad_cost"] for p in ("10", "11", "12")] == [34, 33, 33]
