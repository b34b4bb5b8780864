"""DuckDB interchange connector (sources/duckdb_io.py)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from linkmerce_spark.sources.duckdb_io import (
    read_duckdb,
    read_duckdb_partitioned,
    write_duckdb,
)


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "wh.duckdb")
    with duckdb.connect(path) as con:
        con.execute(
            "CREATE TABLE sales AS "
            "SELECT i AS id, i % 7 AS grp, i * 10 AS amount "
            "FROM range(0, 1000) t(i)"
        )
        con.execute("CREATE TABLE empty_t (id BIGINT, v VARCHAR)")
    return path


def test_read_table_and_query(spark, db):
    df = read_duckdb(spark, db, "sales")
    assert df.count() == 1000
    assert df.columns == ["id", "grp", "amount"]
    q = read_duckdb(spark, db, "SELECT grp, count(*) AS n FROM sales GROUP BY 1")
    assert q.count() == 7


def test_partitioned_read_matches_plain(spark, db):
    part = read_duckdb_partitioned(spark, db, "sales", "id", num_partitions=4)
    # distributed slices reassemble the exact table
    assert part.count() == 1000
    got = part.agg(F.sum("amount").alias("s"), F.count_distinct("id").alias("d")).first()
    assert (got.s, got.d) == (10 * 999 * 1000 // 2, 1000)
    # boundary rows appear exactly once (BETWEEN strides are half-open)
    assert part.groupBy("id").count().filter("count > 1").count() == 0


def test_partitioned_read_routes_null_keys_to_first_slice(spark, db):
    """NULL partition keys fail every range predicate; the JDBC
    contract sends them to slice 0 — no silent row loss."""
    with duckdb.connect(db) as con:
        con.execute(
            "CREATE TABLE with_nulls AS "
            "SELECT CASE WHEN i % 10 = 0 THEN NULL ELSE i END AS id, i AS v "
            "FROM range(0, 100) t(i)"
        )
    part = read_duckdb_partitioned(spark, db, "with_nulls", "id", num_partitions=4)
    assert part.count() == 100
    assert part.filter(F.col("id").isNull()).count() == 10
    # and no duplication either
    assert part.groupBy("v").count().filter("count > 1").count() == 0


def test_partitioned_read_single_partition_and_empty(spark, db):
    one = read_duckdb_partitioned(spark, db, "sales", "id", num_partitions=1)
    assert one.count() == 1000
    empty = read_duckdb_partitioned(spark, db, "empty_t", "id")
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]


def test_write_replace_append_ignore(spark, db, tmp_path):
    out = str(tmp_path / "out.duckdb")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    )
    assert write_duckdb(df, out, "t", mode="replace") == 100
    with duckdb.connect(out) as con:
        assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 100
    assert write_duckdb(df, out, "t", mode="append") == 100
    with duckdb.connect(out) as con:
        assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 200
    assert write_duckdb(df, out, "t", mode="ignore") == 0
    with duckdb.connect(out) as con:
        assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 200
    with pytest.raises(ValueError):
        write_duckdb(df, out, "t", mode="merge")


def test_roundtrip_spark_to_duckdb_to_spark(spark, db, tmp_path):
    out = str(tmp_path / "rt.duckdb")
    src = read_duckdb(spark, db, "sales").filter(F.col("grp") == 3)
    n = write_duckdb(src, out, "grp3")
    back = read_duckdb(spark, out, "grp3")
    assert back.count() == n == src.count()
    assert back.agg(F.sum("amount")).first()[0] == src.agg(F.sum("amount")).first()[0]
