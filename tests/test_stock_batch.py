"""Stock batch family invariants.

The reference's core__stock_qty_batch joins the FULL ecount_product
table when re-keying the ecount feed (core__stock_qty_batch.sql:44-55),
which silently presumes product_code uniqueness — duplicates would fan
out and double-count quantities. marts/stock.py matches the reference
exactly (no defensive dedup), so the fixture catalog must actually hold
that invariant; this test pins it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_ecount_product_code_unique(spark):
    from linkmerce_spark.queries import _stock_ecount_product

    cat = _stock_ecount_product(spark, SF_DIR)
    total = cat.count()
    distinct = cat.select("product_code").distinct().count()
    assert total == distinct and total > 0


def test_qty_batch_channel_slices_sum(spark):
    """Per-channel conditional sums partition the total exactly."""
    from linkmerce_spark.queries import QUERIES

    df = QUERIES["stock_qty_batch"](spark, SF_DIR)
    bad = df.filter(
        F.coalesce("ecount__stock_qty", F.lit(0))
        + F.coalesce("cj_eflexs__stock_qty", F.lit(0))
        + F.coalesce("coupang_rfm__stock_qty", F.lit(0))
        != F.col("stock_qty")
    ).count()
    assert bad == 0
