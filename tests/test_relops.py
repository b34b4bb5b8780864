"""relops: predicate synthesis, partition iterator, agg conveniences."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.relops import (
    date_range_predicate,
    datetime_range_predicate,
    groupby,
    iter_partitions,
    unique,
)


def _days(spark, days):
    return spark.createDataFrame(
        [(i, dt.date(1996, 3, 1) + dt.timedelta(days=i)) for i in range(days)],
        "id long, d date",
    )


def test_date_predicate_collapses_runs_and_singletons(spark):
    df = _days(spark, 40)
    # run 03-05..03-08, singletons 03-15 and 03-20
    dates = ["1996-03-06", "1996-03-05", "1996-03-07", "1996-03-08", "1996-03-15", "1996-03-20"]
    got = sorted(r["d"].isoformat() for r in df.filter(date_range_predicate("d", dates)).collect())
    assert got == sorted(set(dates))
    # predicate text collapses the run into one >=/<= pair + one IN
    s = str(date_range_predicate("d", dates))
    assert s.count(">=") == 1 and s.count("<=") == 1 and s.count("in(") == 1


def test_date_predicate_empty_is_false(spark):
    df = _days(spark, 3)
    assert df.filter(date_range_predicate("d", [])).count() == 0


def test_datetime_predicate_half_open(spark):
    df = spark.createDataFrame(
        [
            (1, dt.datetime(1996, 3, 5, 0, 0)),
            (2, dt.datetime(1996, 3, 5, 23, 59, 59)),
            (3, dt.datetime(1996, 3, 6, 0, 0)),
        ],
        "id long, ts timestamp",
    )
    keep = df.filter(datetime_range_predicate("ts", ["1996-03-05"]))
    assert sorted(r["id"] for r in keep.collect()) == [1, 2]  # 03-06 00:00 excluded


def test_iter_partitions_covers_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, k string"
    )
    parts = list(iter_partitions(df, ["k"]))
    keys = [k for k, _ in parts]
    assert keys == [(None,), ("a",), ("b",)]
    assert sum(f.count() for _, f in parts) == 4  # null partition included


def test_groupby_and_unique(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 3), ("y", 5), (None, 7)], "k string, v long"
    )
    g = {r["k"]: (r["sum_v"], r["count_v"]) for r in groupby(df, ["k"], {"v": "sum"}).withColumn(
        "count_v", F.lit(None)
    ).collect()}
    assert g["x"][0] == 4 and g["y"][0] == 5 and None not in g  # dropna on keys
    u = [r["value"] for r in unique(df, "k").collect()]
    assert u == ["x", "y"] or u == [None, "x", "y"]  # null ordering engine-defined


def test_iter_partitions_caps_cardinality(spark):
    import pytest as _pytest

    df = spark.range(100).select((F.col("id") % 50).alias("k"), "id")
    with _pytest.raises(ValueError, match="more than 10 distinct"):
        list(iter_partitions(df, ["k"], max_partitions=10))
    # at exactly the cap it still yields everything
    assert len(list(iter_partitions(df, ["k"], max_partitions=50))) == 50
