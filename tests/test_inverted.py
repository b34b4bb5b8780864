"""Inverted-index operator (operators/inverted.py)."""

from __future__ import annotations

import pytest

from linkmerce_spark.operators.inverted import inverted_index


def test_postings_order_and_counts(spark):
    df = spark.createDataFrame(
        [(2, "b a b"), (1, "a b a")], "doc_id long, text string"
    )
    out = {r.term: r for r in inverted_index(df, "text", "doc_id").collect()}
    assert out["a"].doc_freq == 2 and out["a"].n_postings == 3
    # (doc, pos) order: doc 1 positions 0,2 then doc 2 position 1
    assert out["a"].postings == "000000000001:000000 000000000001:000002 000000000002:000001"
    assert out["b"].postings == "000000000001:000001 000000000002:000000 000000000002:000002"


def test_posting_cap_bounds_stop_terms(spark):
    df = spark.createDataFrame(
        [(i, "the " * 10) for i in range(5)], "doc_id long, text string"
    )
    out = inverted_index(df, "text", "doc_id", max_postings=3).collect()
    the = next(r for r in out if r.term == "the")
    assert the.n_postings == 50          # true occurrence count preserved
    assert len(the.postings.split(" ")) == 3   # posting list capped


def test_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        inverted_index(df, "text", "doc_id", max_postings=0)
