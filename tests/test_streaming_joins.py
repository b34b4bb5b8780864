"""Stream-stream interval join: batch equivalence across a
checkpointed restart, and the inner-join time-bound semantics."""

from __future__ import annotations

import shutil
from datetime import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 10, minute, 0)


VIEWS = [
    (1, 100, _ts(0)),
    (2, 100, _ts(40)),
    (3, 200, _ts(5)),
    (4, 300, _ts(10)),
]
BUYS = [
    (11, 100, _ts(20)),   # matches view 1 (lag 20m)
    (12, 100, _ts(55)),   # matches view 2 (15m); view 1 is > 30m away
    (13, 200, _ts(4)),    # BEFORE view 3 -> no match
    (14, 400, _ts(12)),   # key never viewed -> no match
]


def _batch_expected(spark):
    v = spark.createDataFrame(VIEWS, "view_id long, user_id long, vts timestamp")
    b = spark.createDataFrame(BUYS, "buy_id long, user_id long, bts timestamp")
    j = v.alias("v").join(
        b.alias("b"),
        (F.col("v.user_id") == F.col("b.user_id"))
        & (F.col("b.bts") >= F.col("v.vts"))
        & (F.col("b.bts") <= F.col("v.vts") + F.expr("INTERVAL 30 minutes")),
    )
    return {
        (r["view_id"], r["buy_id"])
        for r in j.select("view_id", "buy_id").collect()
    }


def test_interval_join_matches_batch_across_restart(spark, workdir):
    from linkmerce_spark.streaming.joins import stream_interval_join

    vsrc, bsrc = f"{workdir}/views", f"{workdir}/buys"
    out, ckpt = f"{workdir}/out", f"{workdir}/ckpt"

    def write(path, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    def run():
        vs = spark.readStream.schema(
            "view_id long, user_id long, vts timestamp"
        ).parquet(vsrc)
        bs = spark.readStream.schema(
            "buy_id long, user_id long, bts timestamp"
        ).parquet(bsrc)
        joined = stream_interval_join(
            vs,
            bs,
            key="user_id",
            left_ts="vts",
            right_ts="bts",
            max_delay="30 minutes",
            watermark="2 hours",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    vschema = "view_id long, user_id long, vts timestamp"
    bschema = "buy_id long, user_id long, bts timestamp"
    # arrival wave 1: first half of each side; wave 2 after a restart
    write(vsrc, VIEWS[:2], vschema)
    write(bsrc, BUYS[:1], bschema)
    run()
    write(vsrc, VIEWS[2:], vschema)
    write(bsrc, BUYS[1:], bschema)
    run()  # restart from the checkpoint; buffered left rows must match

    got_rows = spark.read.parquet(out).collect()
    got = {(r["view_id"], r["buy_id"]) for r in got_rows}
    want = _batch_expected(spark)
    assert got == want == {(1, 11), (2, 12)}
    lag = {r["view_id"]: r["lag_seconds"] for r in got_rows}
    assert lag == {1: 1200, 2: 900}

    # idempotent drain: nothing new -> nothing added
    run()
    assert spark.read.parquet(out).count() == len(want)
