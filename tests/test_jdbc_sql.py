"""JDBC sink SQL composition (no live database needed)."""

from __future__ import annotations

import pytest

from linkmerce_spark.sources.jdbc import (
    compose_merge_sql,
    compose_overwrite_where_sql,
)

COLS = ["k1", "k2", "amount", "first_seen", "last_seen", "note"]


def test_merge_per_column_verbs():
    sql = compose_merge_sql(
        "wh.orders",
        "wh.orders_stage",
        keys=["k1", "k2"],
        columns=COLS,
        matched={
            "amount": "source_first",
            "first_seen": "least",
            "last_seen": "greatest",
            "note": "replace",
        },
    )
    assert "MERGE INTO wh.orders AS t" in sql
    assert "ON t.k1 = s.k1 AND t.k2 = s.k2" in sql
    assert "amount = COALESCE(s.amount, t.amount)" in sql
    assert "first_seen = LEAST(t.first_seen, s.first_seen)" in sql
    assert "last_seen = GREATEST(t.last_seen, s.last_seen)" in sql
    assert "note = s.note" in sql
    assert "WHEN NOT MATCHED THEN INSERT (k1, k2, amount" in sql


def test_merge_row_level_strategies():
    sql = compose_merge_sql("t", "s", ["k1"], COLS, matched="do_nothing")
    assert "WHEN MATCHED" not in sql  # all columns ignored
    sql2 = compose_merge_sql("t", "s", ["k1"], COLS, matched="replace_all",
                             not_matched="do_nothing")
    assert "amount = s.amount" in sql2 and "WHEN NOT MATCHED" not in sql2
    # unmapped columns default to ignore
    sql3 = compose_merge_sql("t", "s", ["k1"], COLS, matched={"amount": "replace"})
    assert "note" not in sql3.split("USING")[1].split("WHEN NOT MATCHED")[0].replace(
        "ON t.k1 = s.k1", ""
    ) or "note = " not in sql3


def test_merge_rejects_unknown_verbs():
    with pytest.raises(ValueError):
        compose_merge_sql("t", "s", ["k1"], COLS, matched={"amount": "sum"})
    with pytest.raises(ValueError):
        compose_merge_sql("t", "s", ["k1"], COLS, not_matched="upsert")


def test_overwrite_where_is_transactional():
    script = compose_overwrite_where_sql(
        "wh.sales", "wh.sales_stage", ["ymd", "amount"], "ymd BETWEEN '2026-01-01' AND '2026-01-07'"
    )
    assert script[0] == "BEGIN" and script[-1] == "COMMIT"
    assert script[1].startswith("DELETE FROM wh.sales WHERE ymd BETWEEN")
    assert script[2] == "INSERT INTO wh.sales (ymd, amount) SELECT ymd, amount FROM wh.sales_stage"
