"""Warehouse table API: exports, create/copy/insert, dual load."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkmerce_spark.sources.warehouse import (
    copy_table,
    create_table,
    dual_load,
    export_csv,
    export_json,
    export_parquet_bytes,
    export_rows,
    insert_into,
)

ROWS = [
    {"k": 1, "v": "a", "seq": 0},
    {"k": 2, "v": "b", "seq": 1},
]


def test_exports_roundtrip(spark):
    df = spark.createDataFrame(ROWS)
    assert export_rows(df.orderBy("k"))[0]["v"] == "a"
    assert any('"v":"b"' in s or '"v": "b"' in s for s in export_json(df))
    csv = export_csv(df.orderBy("k"))
    assert csv[0] == ("k", "seq", "v") or csv[0] == ("k", "v", "seq")
    blob = export_parquet_bytes(df)
    assert blob[:4] == b"PAR1" and blob[-4:] == b"PAR1"
    import io

    import pyarrow.parquet as pq

    assert pq.read_table(io.BytesIO(blob)).num_rows == 2


def test_create_copy_insert(spark):
    create_table(spark, "wh_src", ROWS)
    assert spark.table("wh_src").count() == 2
    # ignore mode: second create keeps contents
    create_table(spark, "wh_src", [{"k": 9, "v": "z", "seq": 0}], option="ignore")
    assert spark.table("wh_src").count() == 2
    with pytest.raises(ValueError):
        create_table(spark, "wh_src", ROWS, option="error")

    copy_table(spark, "wh_src", "wh_copy", columns=["k", "v"], limit=1)
    assert spark.table("wh_copy").columns == ["k", "v"]
    assert spark.table("wh_copy").count() == 1

    # insert with PK ignore: dup k=2 dropped, new k=3 kept
    insert_into(
        spark,
        "wh_src",
        [{"k": 2, "v": "DUP", "seq": 0}, {"k": 3, "v": "c", "seq": 1}],
        keys=["k"],
        order_by=[F.col("seq").asc()],
    )
    got = {r["k"]: r["v"] for r in spark.table("wh_src").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_dual_load_strict_gate(spark):
    df = spark.createDataFrame(ROWS)
    calls = []

    def ok(name):
        return lambda d: calls.append(name)

    def boom(d):
        raise RuntimeError("constraint violation")

    res = dual_load(df, ok("pg"), {"bq": ok("bq"), "sheets": boom})
    assert res == {"strict": True, "bq": True, "sheets": False}
    assert calls == ["pg", "bq"]

    # strict failure stops everything
    calls.clear()
    with pytest.raises(RuntimeError):
        dual_load(df, boom, {"bq": ok("bq")})
    assert calls == []

    # empty input short-circuits
    empty = df.limit(0)
    assert dual_load(empty, ok("pg"), {"bq": ok("bq")}) == {"strict": False, "bq": False}
    assert calls == []
