"""Unit tests for the order-count stack (marts/orders). Oracle parity
for the full chain runs in tools/check_oracle.py; these pin the status
precedence remap, the 9-prefix promotions, the NULL-bundle bypass, the
harmonization gate, and the MoM window/label frame.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.frames import values_df
from linkmerce_spark.marts.orders import (
    coupang_rfm_order_count,
    order_count_mom,
    order_count_union,
    sabangnet_order_count_assemble,
    smartstore_order_count,
)

_TS = dt.datetime(2024, 5, 1, 10, 0, 0)
_D = dt.date(2024, 5, 1)


def _smt_inputs(spark):
    detail = spark.createDataFrame(
        [
            # order 1: core status overrides smartstore
            (1, 11, "optA", 0, 0, 2, _TS),
            # order 2: smartstore status 7 -> 1
            (2, 21, "optB", 1, 7, 1, _TS),
            # order 3: no status rows -> 0; bundle has a 9-prefixed item
            (3, 31, "optC", 9, 0, None, _TS),
            # order 4: smartstore status 6 -> 3; channel-brand fallback
            (4, 41, "optZ", 2, 0, 4, _TS),
        ],
        "order_id long, product_order_id long, option_id string, "
        "channel_seq int, delivery_type int, order_quantity int, "
        "payment_dt timestamp",
    )
    rel = values_df(
        spark,
        [("optA", "100:2"), ("optB", "200"), ("optC", "901,300")],
        "option_id string, bundle_product_ids string",
    )
    channel = values_df(spark, [(2, "777")], "channel_seq int, brand_id string")
    status_smt = spark.createDataFrame(
        [(11, 5), (21, 7), (41, 6)], "product_order_id long, order_status int"
    )
    status_cor = spark.createDataFrame([(1, 2)], "order_id long, order_status int")
    return detail, rel, channel, status_smt, status_cor


def test_smartstore_status_precedence_and_promotion(spark):
    out = smartstore_order_count(*_smt_inputs(spark))
    rows = {
        (r["order_id"], r["product_id"]): r for r in out.collect()
    }
    # core status 2 wins over the smartstore 5 -> 2 remap
    assert rows[(1, "100")]["order_status"] == 2
    # smartstore 7 remaps to 1
    assert rows[(2, "200")]["order_status"] == 1
    # no status rows -> 0, and the 9-prefixed bundle item promotes to 3
    assert rows[(3, "901")]["order_status"] == 3
    assert rows[(3, "300")]["order_status"] == 0
    # NULL quantity coalesces to 0
    assert rows[(3, "300")]["order_quantity"] == 0
    # smartstore 6 remaps to 3; unmatched option falls to channel brand
    assert rows[(4, "777")]["order_status"] == 3


def test_coupang_least_cap_and_promotion(spark):
    sales = spark.createDataFrame(
        [
            # one group: MAX(settlement)=6 -> LEAST 3; SUM(qty)=3
            (10, "o1", "v1", 6, 1, _D),
            (10, "o1", "v1", 2, 2, _D),
            # status-0 group with a 9-prefixed bundle -> 6
            (20, "o2", "v1", 0, 1, _D),
            # zero net quantity group is dropped
            (30, "o3", "v1", 1, 1, _D),
            (30, "o3", "v1", 1, -1, _D),
        ],
        "order_id long, option_id string, vendor_id string, "
        "settlement_type int, order_quantity int, sales_date date",
    )
    rel = values_df(
        spark,
        [("o1", "100"), ("o2", "905:3,40")],
        "option_id string, bundle_product_ids string",
    )
    vendor = values_df(spark, [("v1", "888")], "vendor_id string, bundle_brand_ids string")
    out = coupang_rfm_order_count(sales, rel, vendor)
    rows = {(r["order_id"], r["product_id"]): r for r in out.collect()}
    assert rows[(10, "100")]["order_status"] == 3
    assert rows[(10, "100")]["order_quantity"] == 3
    assert rows[(20, "905")]["order_status"] == 6
    assert rows[(20, "40")]["order_status"] == 0
    assert (30, "100") not in rows and not any(k[0] == 30 for k in rows)


def test_sabangnet_bypass_and_union_gate(spark):
    base = spark.createDataFrame(
        [
            ("a", "a-1", "shop0075", "500", None, 0, 2, _D),
            ("b", "b-1", "shop0075", "500", "501-A,502-B", 0, 1, _D),
            ("c", "c-1", "shop0075", "500", None, 1, 5, _D),  # status gate
            ("d", "d-1", "shop0075", "500", None, 0, 0, _D),  # qty gate
        ],
        "order_id string, product_order_id string, shop_id string, "
        "product_id string, bundle_option_ids string, order_status int, "
        "order_quantity int, order_date date",
    )
    sbn = sabangnet_order_count_assemble(base)
    got = {(r["order_id"], r["product_id"]): r["order_quantity"] for r in sbn.collect()}
    assert got[("a", "500")] == 2  # bypass row untouched
    assert got[("b", "501")] == 1 and got[("b", "502")] == 1  # exploded

    smt = spark.createDataFrame(
        [(1, 11, "p", 0, 0, 3, _D), (2, 21, "p", 7, 0, 1, _D)],
        "order_id long, product_order_id long, product_id string, "
        "delivery_type int, order_status int, order_quantity long, "
        "order_date date",
    )
    cpg = spark.createDataFrame(
        [(9, "q", 0, 4, _D)],
        "order_id long, product_id string, order_status int, "
        "order_quantity long, order_date date",
    )
    u = order_count_union(sbn, smt, cpg)
    rows = {(r["order_id"], r["shop_id"]): r for r in u.collect()}
    # gates: status!=0 and qty=0 rows dropped
    assert ("c", "shop0075") not in rows and ("d", "shop0075") not in rows
    # delivery_type 7 splits the smartstore shop
    assert rows[("1", "shop0055")]["product_order_id"] == "11"
    assert ("2", "shop9000") in rows
    # coupang constant shop with typed-NULL product_order_id
    assert rows[("9", "shop9001")]["product_order_id"] is None


def test_order_count_mom_windows_and_label(spark):
    def fact_fn(start: str, end: str):
        data = [
            ("1", dt.date(2024, 5, 10)),
            ("2", dt.date(2024, 5, 20)),
            ("3", dt.date(2024, 4, 3)),
            ("4", dt.date(2024, 4, 28)),
            ("5", dt.date(2024, 3, 15)),
        ]
        df = spark.createDataFrame(data, "order_id string, order_date date")
        return df.filter(
            (F.col("order_date") >= F.lit(start).cast("date"))
            & (F.col("order_date") <= F.lit(end).cast("date"))
        )

    out = order_count_mom(fact_fn, "2024-05-01", "2024-05-31", 2)
    rows = {r["order_id"]: r for r in out.collect()}
    # ds frame: one constant month group, global min/max
    assert rows["1"]["order_ym"] == dt.date(2024, 5, 1)
    assert rows["1"]["order_start_date"] == dt.date(2024, 5, 10)
    assert rows["1"]["order_end_date"] == dt.date(2024, 5, 20)
    # lookback: per-month windows (April and March separately)
    assert rows["3"]["order_ym"] == dt.date(2024, 4, 1)
    assert rows["3"]["order_start_date"] == dt.date(2024, 4, 3)
    assert rows["3"]["order_end_date"] == dt.date(2024, 4, 28)
    assert rows["5"]["order_start_date"] == dt.date(2024, 3, 15)
    # single-day month: the label's range part collapses
    label5 = rows["5"]["order_date_range"]
    assert label5.startswith("[ 24년 03월 ]\n")
    assert "~" not in label5
    label3 = rows["3"]["order_date_range"]
    assert "~ " in label3 and label3.endswith("(일)")
