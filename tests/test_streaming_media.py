"""Streaming media ingest: the round-7c decode tier composed with the
availableNow incremental runner.

Proves the multimodal kernels are streaming-legal (mapInPandas inside
foreachBatch), that re-runs drain ONLY new files (checkpointed
exactly-once), and that a late restatement of a partition's media
overwrites exactly that partition — the same contract the relational
marts get from run_incremental_batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SRC_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("ds", StringType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def _media_rows(spark, ids, ds):
    from linkmerce_spark.operators.multimodal import synthesize_media

    base = spark.createDataFrame(
        [
            (
                i,
                "image" if i % 2 == 0 else ("audio" if i % 4 == 1 else "video"),
            )
            for i in ids
        ],
        "media_id long, kind string",
    )
    made = {r["media_id"]: r for r in synthesize_media(base).collect()}
    return [
        (i, made[i]["kind"], ds, bytes(made[i]["content"])) for i in ids
    ]


def _batch_answer(spark, rows):
    from linkmerce_spark.operators.multimodal import extract_media_stats

    df = spark.createDataFrame(rows, SRC_SCHEMA)
    stats = extract_media_stats(df.select("media_id", "kind", "content"))
    return {
        tuple(r)
        for r in stats.join(df.select("media_id", "ds"), "media_id")
        .select("media_id", "ds", "format", "mean_r", "rms")
        .collect()
    }


def test_streaming_media_ingest_drains_restarts_and_restates(spark, tmp_path):
    from linkmerce_spark.operators.multimodal import extract_media_stats
    from linkmerce_spark.streaming.incremental import run_incremental_batch

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    def transform(batch):
        stats = extract_media_stats(batch.select("media_id", "kind", "content"))
        return stats.join(batch.select("media_id", "ds"), "media_id")

    def run():
        run_incremental_batch(
            spark, src, SRC_SCHEMA, transform, tgt, "ds", ckpt
        )

    def target_rows():
        # partition-value inference types ds as DATE on read-back
        return {
            tuple(r)
            for r in spark.read.parquet(tgt)
            .select(
                "media_id",
                F.col("ds").cast("string").alias("ds"),
                "format",
                "mean_r",
                "rms",
            )
            .collect()
        }

    # day 1 arrives
    day1 = _media_rows(spark, range(0, 10), "2024-01-01")
    spark.createDataFrame(day1, SRC_SCHEMA).write.mode("append").parquet(src)
    run()
    assert target_rows() == _batch_answer(spark, day1)

    # day 2 arrives; the restarted stream drains ONLY the new file
    day2 = _media_rows(spark, range(10, 20), "2024-01-02")
    spark.createDataFrame(day2, SRC_SCHEMA).write.mode("append").parquet(src)
    run()
    assert target_rows() == _batch_answer(spark, day1 + day2)

    # late restatement: a fuller day-2 file re-lands; the run overwrites
    # exactly the ds=2024-01-02 partition with the restated rows
    day2_restated = _media_rows(spark, range(10, 25), "2024-01-02")
    spark.createDataFrame(day2_restated, SRC_SCHEMA).write.mode("append").parquet(
        src
    )
    run()
    assert target_rows() == _batch_answer(spark, day1 + day2_restated)
    # day-1 partition untouched through both subsequent runs
    d1 = {t for t in target_rows() if t[1] == "2024-01-01"}
    assert d1 == _batch_answer(spark, day1)
