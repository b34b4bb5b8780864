"""Stateful streaming: first-seen dedup and running counts across
micro-batches and across restarts (checkpointed state).

Sinks that support checkpoint recovery are used on purpose: parquet
(append) for the dedup stream, foreachBatch for update-mode counters —
the memory sink cannot resume from a checkpoint.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pytest


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_first_seen_dedup_across_runs(spark, workdir):
    from linkmerce_spark.streaming.stateful import first_seen_dedup

    src, ckpt, out = f"{workdir}/events", f"{workdir}/ckpt", f"{workdir}/out"
    t0 = dt.datetime(2026, 1, 1, 0, 0)
    _write_batch(spark, src, [("u1", t0), ("u1", t0 + dt.timedelta(minutes=5)), ("u2", t0)])
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            first_seen_dedup(stream, "user_id", "ts")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u1"]["first_ts"] == t0 and got["u1"]["n_in_batch"] == 2

    # second run: u1 again (suppressed by checkpointed state) + new u3
    _write_batch(spark, src, [("u1", t0 + dt.timedelta(hours=1)), ("u3", t0)])
    run()
    got2 = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got2) == {"u1", "u2", "u3"}  # u1 NOT re-emitted
    assert got2["u1"]["n_in_batch"] == 2  # still the first-run row


def test_running_counts_accumulate(spark, workdir):
    from linkmerce_spark.streaming.stateful import running_counts

    src, ckpt = f"{workdir}/ev2", f"{workdir}/ck2"
    t0 = dt.datetime(2026, 1, 1)
    _write_batch(spark, src, [("a", t0), ("a", t0), ("b", t0)])
    schema = spark.read.parquet(src).schema
    emitted: list[dict] = []

    def run():
        def sink(batch_df, _bid):
            emitted.extend(r.asDict() for r in batch_df.collect())

        q = (
            running_counts(spark.readStream.schema(schema).parquet(src), "user_id")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {r["key"]: r["total"] for r in emitted}
    assert got == {"a": 2, "b": 1}

    emitted.clear()
    _write_batch(spark, src, [("a", t0), ("c", t0)])
    run()
    got2 = {r["key"]: r["total"] for r in emitted}
    assert got2 == {"a": 3, "c": 1}  # state accumulated across restarts
