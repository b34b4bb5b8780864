"""Structured Streaming layer: availableNow over the events fixture.

The reference is incremental batch (SURVEY §2.11); the streaming layer
must produce the same answers as its batch twin — asserted here by
draining the stream with availableNow and diffing against the batch
aggregation of the same files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkmerce_spark.frames import load_star
from linkmerce_spark.streaming.windows import read_events_stream, tumbling_agg

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    batch_events = load_star(spark, SF_DIR, ["events"])["events"]
    # Stage the (nanos-normalized) events as a stream source dir.
    src = str(tmp_path / "events_src")
    batch_events.write.parquet(src)

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    agg = tumbling_agg(
        stream,
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs={"n": F.count(F.lit(1))},
        watermark="2 hours",
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in tumbling_agg(
            spark.read.parquet(src), "ts", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
        ).collect()
    }
    # availableNow + watermark may hold back the final (open) window;
    # everything emitted must match batch exactly, and nearly all
    # windows must have been emitted.
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - len({k[1] for k in expected})
