"""Unit tests for the full profit dim stack (marts/profit).

Oracle parity is covered by profit_base_gates / profit_mom_dims in
tools/check_oracle.py; these tests pin the individual semantics:
status gating, the adop9000 payment exclusion, extra-profit padding,
the 19-metric unpivot fan-out, and the COALESCE fallback labels.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.marts.profit import (
    METRIC_MAPPING,
    profit_base,
    profit_mom_dims,
)

FACT_SCHEMA = (
    "product_id string, shop_id string, order_status int, sku_quantity long, "
    "payment_amount long, supply_amount long, supply_cost long, "
    "delivery_fee long, ad_cost long, extra_cost long, order_date date"
)
EXTRA_SCHEMA = "product_id string, shop_id string, profit long, ymd date"
D = dt.date(2024, 5, 10)


def _base(spark, rows, extra_rows=()):
    fact = spark.createDataFrame(rows, FACT_SCHEMA)
    extra = spark.createDataFrame(list(extra_rows), EXTRA_SCHEMA)
    return profit_base(fact, extra, "2024-05-01", "2024-05-31")


def test_status_gates(spark):
    rows = [
        ("p1", "s1", 0, 2, 100, 90, 60, 10, 5, 3, D),  # everything counts
        ("p1", "s1", 2, 2, 100, 90, 60, 10, 5, 3, D),  # cost+fee only
        ("p1", "s1", 3, 2, 100, 90, 60, 10, 5, 3, D),  # ad/extra only
    ]
    out = {r["order_status"]: r for r in _base(spark, rows).collect()}
    assert (out[0]["sku_quantity"], out[0]["payment_amount"]) == (2, 100)
    assert out[0]["margin_amount"] == 90 - 60 - 10
    assert out[0]["profit"] == 90 - 60 - 10 - 5 - 3
    assert (out[2]["sku_quantity"], out[2]["payment_amount"]) == (0, 0)
    assert (out[2]["supply_cost"], out[2]["delivery_fee"]) == (60, 10)
    assert out[2]["margin_amount"] == 0 - 60 - 10
    assert (out[3]["supply_cost"], out[3]["delivery_fee"]) == (0, 0)
    assert out[3]["profit"] == -5 - 3


def test_adop9000_payment_excluded(spark):
    rows = [("p1", "adop9000", 0, 1, 500, 90, 60, 0, 0, 0, D)]
    (r,) = _base(spark, rows).collect()
    assert r["payment_amount"] == 0
    assert r["supply_amount"] == 90  # only payment is excluded


def test_extra_profit_rows_zero_padded(spark):
    out = _base(
        spark,
        [("p1", "s1", 0, 1, 100, 90, 60, 10, 5, 3, D)],
        [("p9", "adop0003", 777, D), ("p9", "adop0003", 1, dt.date(2024, 6, 1))],
    ).collect()
    extras = [r for r in out if r["product_id"] == "p9"]
    assert len(extras) == 1  # June row filtered by the window
    (e,) = extras
    assert e["profit"] == 777 and e["order_status"] == 0
    assert all(
        e[c] == 0
        for c in ["sku_quantity", "payment_amount", "supply_amount", "ad_cost"]
    )


def _mom(spark, fact_rows, extra_rows=()):
    fact = spark.createDataFrame(fact_rows, FACT_SCHEMA)
    extra = spark.createDataFrame(list(extra_rows), EXTRA_SCHEMA)
    pm = spark.createDataFrame(
        [("p1", "IT-1", 1, "t", "b", "c1", "c2", "c3", "c4", "col", "nm", "ea", 3)],
        "product_id string, item_id string, item_seq int, team_name string, "
        "brand_name string, category_name1 string, category_name2 string, "
        "category_name3 string, category_name4 string, color string, "
        "product_name string, unit_name string, unit_scale int",
    )
    shop = spark.createDataFrame(
        [("s1", "g", "alias")], "shop_id string, shop_group string, shop_alias string"
    )
    return profit_mom_dims(
        lambda s, e: profit_base(fact, extra, s, e),
        pm,
        shop,
        "2024-05-01",
        "2024-05-20",
        1,
    )


def test_unpivot_fanout_and_unit_scale(spark):
    out = _mom(spark, [("p1", "s1", 0, 2, 100, 90, 60, 10, 5, 3, D)]).collect()
    assert len(out) == len(METRIC_MAPPING)  # one group x 19 metrics
    by_metric = {r["metric_name_en"]: r for r in out}
    assert by_metric["unit_quantity"]["metric_value"] == 2 * 3  # sku x unit_scale
    assert by_metric["roi__bottom"]["metric_value"] == 5 + 3
    assert by_metric["profit"]["metric_name_ko"] == "01. 이익"
    assert by_metric["ad_cost__searchad"]["metric_name_ko"] == "08-1. 광고비-검색광고"


def test_fallback_labels_for_unmatched_dims(spark):
    # p2 not in product master, s2 not in shop dim, status 7 unmapped
    out = _mom(spark, [("p2", "s2", 7, 1, 100, 90, 60, 10, 5, 3, D)]).collect()
    r = out[0]
    assert r["item_id"] == "NA-AAAAAA-00" and r["item_seq"] == 99999999
    assert r["product_name"] == "매칭 불가 상품" and r["category_unit_name"] == "-"
    assert r["shop_group"] == "-" and r["shop_name"] == "-"
    assert r["order_status"] == "알 수 없음"


def test_lookback_month_buckets(spark):
    apr = dt.date(2024, 4, 3)
    out = _mom(
        spark,
        [
            ("p1", "s1", 0, 1, 100, 90, 60, 10, 5, 3, D),
            ("p1", "s1", 0, 1, 200, 90, 60, 10, 5, 3, apr),
        ],
    )
    yms = sorted(r[0] for r in out.select("order_ym").distinct().collect())
    assert yms == [dt.date(2024, 4, 1), dt.date(2024, 5, 1)]
    pay = {
        r["order_ym"]: r["metric_value"]
        for r in out.filter(F.col("metric_name_en") == "payment_amount").collect()
    }
    assert pay[dt.date(2024, 4, 1)] == 200 and pay[dt.date(2024, 5, 1)] == 100
    # window MIN/MAX per order_ym -> range string names the month bounds
    row = out.filter(F.col("order_ym") == "2024-04-01").first()
    assert row["order_start_date"] == apr and row["order_end_date"] == apr
