"""Physical-plan shape tests: performance as a correctness dimension.

At 100 TB a lost filter-pushdown or an un-broadcast dim join is a
bug; these tests pin the plan shapes the engine promises (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkmerce_spark.frames import load_star
from linkmerce_spark.plans.explain import (
    count_shuffles,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)
from linkmerce_spark.queries import q_star_join_revenue

SF_DIR = "/root/testdata/sf0.001"


def test_filter_and_projection_pushed_to_parquet_scan(spark):
    li = load_star(spark, SF_DIR, ["lineitem"])["lineitem"]
    df = li.filter(F.col("l_orderkey") == 7).select("l_orderkey", "l_quantity")
    plan = physical_plan(df, "formatted")
    pushed = pushed_filters(df)
    assert any("l_orderkey" in p for p in pushed), pushed
    # Column pruning: the scan must read only the 2 projected columns.
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_quantity" in read_schema and "l_extendedprice" not in read_schema


def test_star_join_broadcasts_dims(spark):
    df = q_star_join_revenue(spark, SF_DIR)
    assert has_broadcast_join(df)


def test_window_dedup_is_single_shuffle(spark):
    from linkmerce_spark.operators.dedup import dedupe_keep_first

    orders = load_star(spark, SF_DIR, ["orders"])["orders"]
    out = dedupe_keep_first(orders, ["o_custkey"], [F.col("o_orderdate").desc()])
    assert count_shuffles(out) == 1
