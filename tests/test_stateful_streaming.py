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


def test_last_click_attribution_matches_batch_asof(spark, workdir):
    """Streaming attribution == batch asof_join for an in-order feed,
    including cross-micro-batch state carry (click in run 1 attributes
    a purchase arriving in run 2)."""
    from pyspark.sql import functions as F

    from linkmerce_spark.operators.asofjoin import asof_join
    from linkmerce_spark.streaming.stateful import last_click_attribution

    t0 = dt.datetime(2026, 1, 1, 0, 0)

    def ev(uid, mins, etype, eid):
        return (uid, t0 + dt.timedelta(minutes=mins), etype, eid)

    batch1 = [
        ev(1, 0, "click", 10),
        ev(1, 5, "purchase", 11),   # -> click 10
        ev(1, 7, "click", 12),
        ev(2, 1, "purchase", 20),   # -> no click
        ev(3, 2, "click", 30),
    ]
    batch2 = [
        ev(1, 9, "purchase", 13),   # -> click 12 (same-run state)
        ev(3, 500, "purchase", 31), # -> click 30 via CHECKPOINTED state, but > 60min tol -> null
        ev(2, 8, "click", 21),
        ev(2, 10, "purchase", 22),  # -> click 21
    ]
    src, ckpt, out = f"{workdir}/ev", f"{workdir}/ck", f"{workdir}/at"
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    tol_us = 60 * 60 * 1_000_000  # 60 min

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            last_click_attribution(stream, tolerance_us=tol_us)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(batch1)
    run(batch2)
    got = {
        (r.user_id, r.purchase_id): (r.click_id, r.gap_us)
        for r in spark.read.parquet(out).collect()
    }

    # batch reference: asof_join over the full in-order event set
    all_events = spark.createDataFrame(batch1 + batch2, schema)
    purchases = all_events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = all_events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    ref = asof_join(
        purchases, clicks, keys=["user_id"], left_ts="ts", right_ts="cts",
        tolerance=F.expr("INTERVAL 60 MINUTES"),
    )
    want = {}
    for r in ref.collect():
        gap = None
        if r.click_id is not None:
            gap = int((r.ts - r.cts).total_seconds() * 1_000_000)
        want[(r.user_id, r.purchase_id)] = (r.click_id, gap)
    assert got == want
    assert got[(1, 13)][0] == 12  # same-run later click wins
    assert got[(3, 31)][0] is None  # carried click outside tolerance
    assert got[(2, 22)][0] == 21


def test_attribution_correct_across_arrow_chunk_splits(spark, workdir):
    """A group larger than the Arrow batch size arrives as MULTIPLE
    pandas chunks with no global order guarantee — the kernel must
    buffer and sort the whole group once, or clicks in a later chunk
    would process after purchases from an earlier chunk."""
    import datetime as dt

    from linkmerce_spark.streaming.stateful import last_click_attribution

    t0 = dt.datetime(2026, 1, 1, 0, 0)
    rows = []
    # 60 alternating click/purchase events for ONE user; with
    # maxRecordsPerBatch=7 the group spans ~9 chunks
    for i in range(30):
        rows.append((1, t0 + dt.timedelta(minutes=2 * i), "click", 100 + i))
        rows.append((1, t0 + dt.timedelta(minutes=2 * i + 1), "purchase", 200 + i))
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    src, ckpt, out = f"{workdir}/ev", f"{workdir}/ck", f"{workdir}/at"
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            last_click_attribution(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r.purchase_id: r.click_id for r in spark.read.parquet(out).collect()}
    # every purchase 200+i must attribute to its immediately preceding
    # click 100+i — any chunk-order processing scrambles this mapping
    assert got == {200 + i: 100 + i for i in range(30)}
