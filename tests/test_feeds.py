"""Unit tests for the meta 4-way insights fan and the small ops-feed
modules (models/meta, models/feeds). Oracle parity for the fact slices
runs in tools/check_oracle.py; these pin the dim dedups, the ISO
timestamp parse, and the ecount expiration pick.
"""

from __future__ import annotations

import datetime as dt

from linkmerce_spark.models.feeds import (
    dable_daily_report,
    ecount_product,
)
from linkmerce_spark.models.meta import parse_adsets, split_insights

INSIGHT_SCHEMA = (
    "campaign_id string, campaign_name string, adset_id string, "
    "adset_name string, ad_id string, ad_name string, impressions int, "
    "reach int, clicks int, inline_link_clicks int, spend int, "
    "date_start string"
)


def test_split_insights_dims_dedup_and_fact(spark):
    rows = spark.createDataFrame(
        [
            ("c1", "cn1", "s1", "sn1", "a1", "an1", 10, 8, 2, 1, 100, "2024-05-01"),
            ("c1", "cn1", "s1", "sn1", "a1", "an1", 20, 9, 3, 2, 200, "2024-05-02"),
            ("c1", "cn1", "s2", "sn2", "a2", "an2", 5, 4, 1, 0, 50, "2024-05-01"),
        ],
        INSIGHT_SCHEMA,
    )
    campaigns, adsets, ads, insights = split_insights(rows, "act_9")
    assert campaigns.count() == 1  # PK-deduped
    assert adsets.count() == 2 and ads.count() == 2
    assert insights.count() == 3  # fact keeps every report row
    (c,) = campaigns.collect()
    assert c["objective"] is None and c["account_id"] == "act_9"
    f = insights.filter("impression_count = 20").first()
    assert f["ymd"] == dt.date(2024, 5, 2) and f["ad_cost"] == 200


def test_parse_adsets_iso_timestamp(spark):
    rows = spark.createDataFrame(
        [("s1", "n", "c1", "ACTIVE", 5000, "2024-05-01T09:30:00+0900")],
        "id string, name string, campaign_id string, effective_status string, "
        "daily_budget int, created_time string",
    )
    (r,) = parse_adsets(rows, "act").collect()
    assert r["created_at"] == dt.datetime(2024, 5, 1, 9, 30)
    assert r["daily_budget"] == 5000


def test_dable_campaign_dim_skips_null_ids(spark):
    rows = spark.createDataFrame(
        [(None, "x", 1, 10, 1, 1, 0, "20240501"),
         ("d1", "camp", 1, 0, 1, 1, 0, "20240501"),  # imp 0 -> fact drop
         ("d1", "camp", 1, 5, 1, 1, 0, "20240502")],
        "campaign_id string, campaign_name string, exposes int, "
        "impressions int, clicks int, cost_spent int, convertion_cnt int, "
        "ymd string",
    )
    report, campaigns = dable_daily_report(rows)
    assert campaigns.count() == 1  # NULL id excluded, PK-deduped
    out = report.collect()
    assert len(out) == 2  # the impressions=0 row dropped
    assert {r["campaign_id"] for r in out} == {"-", "d1"}


def test_ecount_product_expiration_pick(spark):
    rows = spark.createDataFrame(
        [("P1", "o", "n", "k", "b", "r", "3", "EA", "100", "0", "202506"),
         ("P2", "o", "n", "k", "b", "r", "x", "EA", None, "202412", "0"),
         ("P3", "o", "n", "k", "b", "r", "1", "EA", "5", "0", "0")],
        "PROD_CD string, CONT4 string, PROD_DES string, CONT6 string, "
        "CONT1 string, REMARKS_WIN string, SIZE_DES string, UNIT string, "
        "IN_PRICE string, CONT2 string, CONT3 string",
    )
    out = {r["product_code"]: r for r in ecount_product(rows, "2026-01-01 00:00:00").collect()}
    assert out["P1"]["expiration_date"] == "202506"  # CONT2='0' -> CONT3
    assert out["P2"]["expiration_date"] == "202412"  # CONT2 wins
    assert out["P3"]["expiration_date"] is None  # both placeholder '0'
    assert out["P2"]["unit_quantity"] is None and out["P3"]["org_price"] == 5
    assert out["P1"]["updated_at"] == dt.datetime(2026, 1, 1)
