"""CJ delivery-cost TVF pair: invoice-level and order-level rollups.

Parity targets (semantics, not code):
- ``cj_invoice``       ~ cj__invoice (dbt_postgres/models/intermediate/
  delivery/cj__invoice.sql:16-55): loisparcel feed normalized
  (invoice '-' stripped, NULL order -> 'none', zero box) UNION ALL the
  eflexs feed, both date-bounded and pre-aggregated per
  (invoice, order), then rolled up per invoice.
- ``cj_invoice_order`` ~ cj__invoice_order (cj__invoice_order.sql:
  16-59): same two feeds rolled up per order, the 'none' placeholder
  rows excluded.

Callers widen the window by ±7 days (smartstore__sales_daily.sql:
249-258) because CJ registers invoices days after the order date —
``lookback_days`` encodes that idiom so each mart states its own
late-data tolerance.

Scale notes
-----------
- Both feeds reduce to (invoice, order) grain map-side before any wide
  exchange; the final rollup reuses the same key prefix, so AQE plans
  one shuffle per feed and a cheap re-partition for the union rollup.
- Date predicates are literal (partition-prunable at the scan).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cj_invoice", "cj_invoice_order"]


def _feeds(
    loisparcel: DataFrame,
    eflexs: DataFrame,
    start_date: str,
    end_date: str,
    lookback_days: int,
) -> DataFrame:
    lo = (
        _dt.date.fromisoformat(start_date) - _dt.timedelta(days=lookback_days)
    ).isoformat()
    hi = (
        _dt.date.fromisoformat(end_date) + _dt.timedelta(days=lookback_days)
    ).isoformat()
    lp = (
        loisparcel.filter(
            F.col("register_date").between(
                F.lit(lo).cast("date"), F.lit(hi).cast("date")
            )
        )
        .groupBy(
            F.regexp_replace(F.col("invoice_no"), "-", "").alias("invoice_no"),
            F.coalesce(F.col("order_id"), F.lit("none")).alias("order_id"),
        )
        .agg(
            F.sum("delivery_fee").alias("delivery_fee"),
            F.lit(0).cast("long").alias("box_cost"),
        )
    )
    ef = (
        eflexs.filter(
            F.col("order_date").between(
                F.lit(lo).cast("date"), F.lit(hi).cast("date")
            )
        )
        .groupBy("invoice_no", "order_id")
        .agg(
            F.sum("delivery_fee").alias("delivery_fee"),
            F.sum("box_cost").cast("long").alias("box_cost"),
        )
    )
    return lp.unionByName(ef)


def cj_invoice(
    loisparcel: DataFrame,
    eflexs: DataFrame,
    start_date: str,
    end_date: str,
    lookback_days: int = 0,
) -> DataFrame:
    """Per-invoice CJ delivery fee + box cost (cj__invoice.sql:16-55)."""
    return (
        _feeds(loisparcel, eflexs, start_date, end_date, lookback_days)
        .groupBy("invoice_no")
        .agg(
            F.sum("delivery_fee").alias("delivery_fee"),
            F.sum("box_cost").alias("box_cost"),
        )
    )


def cj_invoice_order(
    loisparcel: DataFrame,
    eflexs: DataFrame,
    start_date: str,
    end_date: str,
    lookback_days: int = 0,
) -> DataFrame:
    """Per-order CJ delivery fee + box cost, 'none' placeholders
    excluded (cj__invoice_order.sql:16-59)."""
    return (
        _feeds(loisparcel, eflexs, start_date, end_date, lookback_days)
        .filter(F.col("order_id") != "none")
        .groupBy("order_id")
        .agg(
            F.sum("delivery_fee").alias("delivery_fee"),
            F.sum("box_cost").alias("box_cost"),
        )
    )
