"""Round-6 third-review-batch regression pins (sources + functions +
frames edge cases)."""

from __future__ import annotations

import datetime as dt
import json

import pytest


# ------------------------------------------------------------- gsheets
def test_py_to_sheet_pads_missing_columns():
    from linkmerce_spark.sources.gsheets import py_to_sheet

    rows = py_to_sheet(
        [{"a": 1, "b": 2, "c": 3}, {"a": 9, "c": 7}],
        expected_headers=["a", "b", "c"],
    )
    # record 2 is missing 'b': the value 7 must stay under 'c', never
    # shift left into 'b'
    assert rows == [[1, 2, 3], [9, None, 7]]


def test_sheet_to_py_date_like_free_text_stays_string():
    from linkmerce_spark.sources.gsheets import sheet_to_py

    recs = sheet_to_py(
        [{"x": "2024-01-02 123456", "y": "2024-01-32", "z": "2024-01-02"}]
    )
    assert recs[0]["x"] == "2024-01-02 123456"  # free text, not a crash
    assert recs[0]["y"] == "2024-01-32"          # invalid date stays string
    assert recs[0]["z"] == dt.date(2024, 1, 2)   # real dates still parse


# ---------------------------------------------------------- htmlsource
def test_select_survives_void_elements():
    from linkmerce_spark.sources.htmlsource import html_select_text

    html = '<div class="x">a<br>b</div><div class="x">c<img src="u">d</div>'
    assert html_select_text(html, cls="x") == ["ab", "cd"]


# ------------------------------------------------------------- graphql
def test_nested_fragments_are_defined():
    from linkmerce_spark.functions.graphql import Fragment, Operation, Selection

    inner = Fragment("Inner", "Thing", ["id"])
    outer = Fragment("Outer", "Box", {"thing": [inner]})
    op = Operation("query", "Q", {}, Selection("boxes", fields=[outer]))
    q = op.query()
    assert "fragment Outer on Box" in q
    assert "fragment Inner on Thing" in q   # was referenced but undefined


# -------------------------------------------------------------- frames
def test_values_df_nonfinite_floats(spark):
    import math

    from linkmerce_spark.frames import values_df

    df = values_df(
        spark,
        [("a", float("nan")), ("b", float("inf")), ("c", float("-inf")), ("d", 1.5)],
        "k string, v double",
    )
    got = {r.k: r.v for r in df.collect()}
    assert math.isnan(got["a"])
    assert got["b"] == float("inf") and got["c"] == float("-inf")
    assert got["d"] == 1.5


# -------------------------------------------------------------- scalar
def test_split_part_literal_separator_and_empty_out_of_range(spark):
    from pyspark.sql import functions as F

    from linkmerce_spark.functions.scalar import split_part

    df = spark.createDataFrame([("a.b.c",)], "s string")
    row = df.select(
        split_part(F.col("s"), ".", 1).alias("p1"),
        split_part(F.col("s"), ".", 9).alias("p9"),
        split_part(F.col("s"), "|", 1).alias("bar"),
    ).first()
    assert row.p1 == "a"       # '.' is a literal, not a regex
    assert row.p9 == ""        # Postgres semantics: out of range -> ''
    assert row.bar == "a.b.c"  # '|' literal: no split


# ------------------------------------------------------------- writers
def test_write_append_schema_drift_raises_not_duplicates(spark, tmp_path):
    from pyspark.sql.utils import AnalysisException

    from linkmerce_spark.sources.writers import write_append

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "other long, v string").write.parquet(path)
    df = spark.createDataFrame([(1, "y")], "k long, v string")
    # the existing table has no key column 'k' — that is schema drift,
    # not a missing target, and must NOT silently append duplicates
    with pytest.raises(AnalysisException):
        write_append(df, path, keys=["k"])


# ------------------------------------------------ coupang ads timeouts
def test_ads_retry_catches_requests_style_timeout():
    from linkmerce_spark.sources.endpoints_sellers import CoupangAdsApi
    from linkmerce_spark.sources.http import Response

    class ReadTimeout(Exception):  # requests.exceptions.ReadTimeout shape
        pass

    calls = {"n": 0}

    def transport(req):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ReadTimeout("read timed out")
        return Response(status=200, content=json.dumps({"pageInfo": {"totalCount": 1}}).encode())

    sleeps = []
    api = CoupangAdsApi(transport, cookies={}, sleeper=sleeps.append)
    out = list(api.fetch_campaigns())
    assert len(out) == 1 and sleeps == [1, 2]

    class Boom(Exception):
        pass

    def bad_transport(req):
        raise Boom("not a timeout")

    api2 = CoupangAdsApi(bad_transport, cookies={}, sleeper=lambda s: None)
    with pytest.raises(Boom):  # non-timeouts propagate immediately
        api2.request_json_with_retry(api2.CAMPAIGNS_PATH, {})
