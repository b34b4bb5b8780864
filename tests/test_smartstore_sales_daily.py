"""Invariants of the end-to-end smartstore__sales_daily chain."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _chain(spark):
    from linkmerce_spark.queries import QUERIES

    return QUERIES["smartstore_sales_daily"](spark, SF_DIR)


def test_rollup_grain_is_unique(spark):
    df = _chain(spark)
    total = df.count()
    grain = df.select(
        "order_date", "product_id", "delivery_type", "order_status"
    ).distinct().count()
    assert total == grain and total > 0


def test_split_preserves_order_payment_totals(spark):
    """The cost-weight split must conserve each product order's payment
    and supply totals exactly (smartstore__sales_daily.sql step 3-3:
    'adjust rounding remainders to preserve the original totals')."""
    from linkmerce_spark.frames import values_df
    from linkmerce_spark.marts.smartstore import split_by_cost_weight

    rows = [
        # one bundle of 3 with skewed costs, one singleton, one
        # zero-cost group (weights NULL -> remainder row takes all)
        ("o1", "a", 3, 1001, 907),
        ("o1", "b", 1, 1001, 907),
        ("o1", "c", 0, 1001, 907),
        ("o2", "d", 5, 555, 333),
        ("o3", "e", 0, 777, 111),
        ("o3", "f", 0, 777, 111),
    ]
    df = values_df(
        spark,
        rows,
        "product_order_id string, product_id string, cost_amount long, "
        "payment_amount long, supply_amount long",
    )
    out = split_by_cost_weight(
        df, ["product_order_id"], ["payment_amount", "supply_amount"]
    )
    got = {
        r["product_order_id"]: (r["payment_amount"], r["supply_amount"])
        for r in out.groupBy("product_order_id")
        .agg(F.sum("payment_amount").alias("payment_amount"),
             F.sum("supply_amount").alias("supply_amount"))
        .collect()
    }
    # multi-row groups conserve the single-order amount; singletons pass
    # through untouched.
    assert got["o1"] == (1001, 907)
    assert got["o2"] == (555, 333)
    assert got["o3"] == (777, 111)


def test_status_priority_core_overrides_smartstore(spark):
    """Core status wins; smartstore remaps 7->1, 5->2, {6,8}->3."""
    df = _chain(spark)
    assert df.filter(~F.col("order_status").isin(0, 1, 2, 3, 6)).count() == 0
