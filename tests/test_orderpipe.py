"""orderpipe dataset module: parse -> dedup insert -> upsert -> events.

Golden-style fixtures mirroring the reference's transform-test harness
(src/tests/conftest.py:297-368): a raw JSON batch goes through the full
lifecycle and each stage's table contents are asserted.
"""

from __future__ import annotations

import datetime as dt

import pytest

from linkmerce_spark.models.orderpipe import (
    append_orders,
    parse_orders,
    status_events,
    upsert_orders,
)


def _raw(order_id, channel, status, amount, ordered, payed=None, delivered=None):
    return {
        "content": {
            "order": {
                "orderId": order_id,
                "orderStatus": status,
                "totalPaymentAmount": amount,
                "orderDate": ordered,
                "payedDate": payed,
            },
            "channel": {"channelSeq": channel},
            "delivery": {"deliveredDate": delivered},
        }
    }


@pytest.fixture()
def batch1(spark):
    raw = [
        _raw(1001, 1, "PAYED", "1,500", "2026-01-01 10:00:00", payed="2026-01-01 10:05:00"),
        _raw(1002, 1, "PAYMENT_WAITING", "900", "2026-01-01 11:00:00"),
        # duplicate PK in one batch: first occurrence must win
        _raw(1001, 1, "CANCELED", "999", "2026-01-01 12:00:00"),
        # unknown status + junk amount -> default code, null amount
        _raw(1003, 2, "MYSTERY", "n/a", "2026-01-01 13:00:00"),
    ]
    return parse_orders(spark, raw)


def test_parse_types_enums_and_seq(batch1):
    rows = {r["seq"]: r for r in batch1.collect()}  # PK dups intact here
    r = rows[0]
    assert r["status_code"] == 1 and r["amount"] == 1500  # comma stripped
    rows = {(r["order_id"], r["channel_seq"]): r for r in batch1.collect() if r["seq"] != 2}
    assert r["ordered_at"] == dt.datetime(2026, 1, 1, 10, 0)
    assert rows[(1003, 2)]["status_code"] == -1  # unknown enum default
    assert rows[(1003, 2)]["amount"] is None  # TRY_CAST null-on-fail
    assert rows[(1002, 1)]["payed_at"] is None


def test_append_is_insert_ignore(spark, batch1):
    target = batch1.limit(0)
    t1 = append_orders(target, batch1)
    assert t1.count() == 3  # batch-internal dup dropped (keep-first seq)
    got = {r["order_id"]: r for r in t1.collect()}
    assert got[1001]["status_code"] == 1  # seq 0 won over seq 2 (CANCELED)
    # re-appending the same batch is a no-op (existing PKs win)
    t2 = append_orders(t1, parse_orders(spark, [
        _raw(1001, 1, "DELIVERED", "1", "2026-01-02 00:00:00"),
        _raw(2000, 3, "PAYED", "42", "2026-01-02 01:00:00"),
    ]))
    got2 = {r["order_id"]: r for r in t2.collect()}
    assert t2.count() == 4 and got2[1001]["status_code"] == 1
    assert got2[2000]["amount"] == 42


def test_upsert_column_rules(spark, batch1):
    target = append_orders(batch1.limit(0), batch1)
    update = parse_orders(spark, [
        # later status + delivered ts; payed arrives EARLIER than stored
        _raw(1001, 1, "DELIVERED", None, "2026-01-01 10:00:00",
             payed="2026-01-01 09:59:00", delivered="2026-01-03 08:00:00"),
    ])
    merged = upsert_orders(target, update)
    r = {x["order_id"]: x for x in merged.collect()}[1001]
    assert r["status_code"] == 3          # source_first: newest non-null wins
    assert r["amount"] == 1500            # source null -> target kept
    assert r["payed_at"] == dt.datetime(2026, 1, 1, 9, 59)   # least
    assert r["delivered_at"] == dt.datetime(2026, 1, 3, 8, 0)  # greatest
    assert merged.count() == 3


def test_status_events_unpivot(spark, batch1):
    target = append_orders(batch1.limit(0), batch1)
    ev = status_events(target)
    got = {(r["order_id"], r["status_code"]): r["event_time"] for r in ev.collect()}
    assert got[(1001, 1)] == dt.datetime(2026, 1, 1, 10, 5)
    assert len(got) == 1  # nulls dropped: no delivered/payed elsewhere
