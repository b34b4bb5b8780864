"""Unit tests for the google ads dataset module (models/google).

Oracle parity for insight/asset-view parses runs in
tools/check_oracle.py; these pin the micros rounding, the vocab
dimension/enum position contract, and the campaign timestamp parse.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.models.google import (
    BIDDING_STRATEGY_VOCAB,
    DEVICE_VOCAB,
    FIELD_TYPE_VOCAB,
    parse_campaigns,
    parse_insights,
    vocab_dim,
)


def _campaign_rows(spark, rows):
    df = spark.createDataFrame(
        rows,
        "cid string, cname string, ctype string, cstatus string, bidding string, "
        "start string, budget string, imps string, clicks string, cost string",
    )
    return df.select(
        F.struct(
            F.col("cid").alias("id"),
            F.col("cname").alias("name"),
            F.col("ctype").alias("advertisingChannelType"),
            F.col("cstatus").alias("status"),
            F.col("bidding").alias("biddingStrategyType"),
            F.col("start").alias("startDateTime"),
        ).alias("campaign"),
        F.struct(F.col("budget").alias("amountMicros")).alias("campaignBudget"),
        F.struct(
            F.col("imps").alias("impressions"),
            F.col("clicks").alias("clicks"),
            F.col("cost").alias("costMicros"),
        ).alias("metrics"),
    )


def test_campaign_micros_rounding_and_timestamp(spark):
    rows = _campaign_rows(
        spark,
        [
            ("1", "c", "SEARCH", "ENABLED", "TARGET_ROAS",
             "2024-05-01 10:00:00", "1500000", "10", "2", "2500000"),
            ("2", "c", "VIDEO", "PAUSED", "MANUAL_CPC",
             "bad", "x", None, "5", "499999"),
        ],
    )
    out = {r["campaign_id"]: r for r in parse_campaigns(rows, 9).collect()}
    assert out["1"]["campaign_budget"] == 2  # 1.5M micros -> half-up 2
    assert out["1"]["ad_cost_30d"] == 3  # 2.5M -> 3 (half-up)
    assert out["1"]["created_at"] == dt.datetime(2024, 5, 1, 10, 0, 0)
    assert out["2"]["campaign_budget"] == 0  # junk -> COALESCE 0
    assert out["2"]["impression_count_30d"] == 0
    assert out["2"]["ad_cost_30d"] == 0  # 499999 -> 0 (below half)
    assert out["2"]["created_at"] is None


def test_vocab_dim_positions_match_enum(spark):
    dim = vocab_dim(spark, BIDDING_STRATEGY_VOCAB)
    rows = {r["code"]: r["seq"] for r in dim.collect()}
    assert rows["COMMISSION"] == 0 and rows["UNSPECIFIED"] == 22
    assert len(rows) == len(BIDDING_STRATEGY_VOCAB)
    # the reference's fixed codes (models.sql:234-247, :393-432)
    assert dict((c, i) for i, (c, _) in enumerate(DEVICE_VOCAB))["MOBILE"] == 1
    assert (
        dict((c, i) for i, (c, _) in enumerate(FIELD_TYPE_VOCAB))["YOUTUBE_VIDEO"]
        == 35
    )


def test_insight_device_enum_and_date(spark):
    df = spark.createDataFrame(
        [("1", "2", "3", "TABLET", "2024-05-02", "7", "1", "0"),
         ("1", "2", "4", "SPACESHIP", "2024-05-02", "7", "1", "0")],
        "c string, g string, a string, dev string, d string, "
        "i string, k string, m string",
    ).select(
        F.struct(F.col("c").alias("id")).alias("campaign"),
        F.struct(F.col("g").alias("id")).alias("adGroup"),
        F.struct(F.struct(F.col("a").alias("id")).alias("ad")).alias("adGroupAd"),
        F.struct(F.col("dev").alias("device"), F.col("d").alias("date")).alias(
            "segments"
        ),
        F.struct(
            F.col("i").alias("impressions"),
            F.col("k").alias("clicks"),
            F.col("m").alias("costMicros"),
        ).alias("metrics"),
    )
    out = {r["ad_id"]: r for r in parse_insights(df, 1).collect()}
    assert out["3"]["device_type"] == 2
    assert out["4"]["device_type"] is None  # out of vocabulary
    assert out["3"]["ymd"] == dt.date(2024, 5, 2)
