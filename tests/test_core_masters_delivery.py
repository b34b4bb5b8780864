"""Unit tests for the core item masters and the CJ delivery TVF pair."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.frames import values_df

ITEM_SCHEMA = (
    "product_id string, item_id string, item_seq int, team_name string, "
    "brand_name string, category_name1 string, category_name2 string, "
    "category_name3 string, category_name4 string, color string, "
    "product_name string, unit_name string, unit_scale int"
)


def _item(spark, rows):
    full = [
        r + ("c1", "c2", "c3", "c4", "red", "name", "ea", 1) for r in rows
    ]
    return values_df(spark, full, ITEM_SCHEMA)


def test_product_master_picks_lowest_seq_nulls_last(spark):
    from linkmerce_spark.marts.core_masters import product_master

    item = _item(
        spark,
        [
            ("101", "IT-2", 20, "t1", "b1"),
            ("101", "IT-1", 5, "t2", "b2"),
            ("102", "IT-3", None, "t1", "b1"),
            ("102", "IT-4", 40, "t1", "b1"),
            (None, "IT-5", 1, "t1", "b1"),
        ],
    )
    out = {r["product_id"]: r for r in product_master(item).collect()}
    assert set(out) == {"101", "102"}
    assert out["101"]["item_id"] == "IT-1"  # lowest seq wins
    assert out["102"]["item_id"] == "IT-4"  # NULL seq sorts last
    assert all(r["rn"] == 1 for r in out.values())


def test_brand_master_filters_and_dedups(spark):
    from linkmerce_spark.marts.core_masters import brand_master

    item = _item(
        spark,
        [
            ("201", "IT-1", 10, "tZ", "brandA"),
            ("201", "IT-2", 5, "tZ", "brandA"),   # same product, lower seq
            ("202", "IT-3", 7, "tA", "brandA"),   # same brand as 201 -> rn2 loses
            ("203", "IT-4", 1, "tA", "brandB"),
            ("204", "IT-5", 2, "tA", "브랜드 없음"),  # placeholder excluded
            ("105", "IT-6", 3, "tA", "brandC"),   # not '2'-prefixed
        ],
    )
    rows = {r["brand_id"]: r for r in brand_master(item).collect()}
    assert set(rows) == {"201", "203"}
    assert rows["201"]["item_id"] == "IT-2"
    # brand_seq ordering: team DESC NULLS LAST -> tZ rows first
    assert rows["201"]["brand_seq"] < rows["203"]["brand_seq"]


def test_cj_invoice_order_excludes_none_and_merges_feeds(spark):
    from linkmerce_spark.marts.delivery import cj_invoice, cj_invoice_order

    d = dt.date(2024, 5, 10)
    lois = values_df(
        spark,
        [("AB-12", None, 100, d), ("AB-12", "O1", 50, d), ("ZZ-9", "O2", 70, d)],
        "invoice_no string, order_id string, delivery_fee long, register_date date",
    )
    eflexs = values_df(
        spark,
        [("AB12", "O1", 30, 10, d), ("YY7", "O3", 20, 5, d)],
        "invoice_no string, order_id string, delivery_fee long, box_cost long, "
        "order_date date",
    )
    inv = {r["invoice_no"]: r for r in
           cj_invoice(lois, eflexs, "2024-05-01", "2024-05-31").collect()}
    # stripped 'AB-12' merges with eflexs 'AB12'
    assert inv["AB12"]["delivery_fee"] == 180 and inv["AB12"]["box_cost"] == 10
    ords = {r["order_id"]: r for r in
            cj_invoice_order(lois, eflexs, "2024-05-01", "2024-05-31").collect()}
    assert set(ords) == {"O1", "O2", "O3"}  # 'none' placeholder dropped
    assert ords["O1"]["delivery_fee"] == 80


def test_cj_lookback_widens_window(spark):
    from linkmerce_spark.marts.delivery import cj_invoice

    lois = values_df(
        spark,
        [("A-1", "O1", 100, dt.date(2024, 5, 3))],
        "invoice_no string, order_id string, delivery_fee long, register_date date",
    )
    eflexs = values_df(
        spark,
        [],
        "invoice_no string, order_id string, delivery_fee long, box_cost long, "
        "order_date date",
    )
    strict = cj_invoice(lois, eflexs, "2024-05-05", "2024-05-31").count()
    widened = cj_invoice(lois, eflexs, "2024-05-05", "2024-05-31", 7).count()
    assert (strict, widened) == (0, 1)
