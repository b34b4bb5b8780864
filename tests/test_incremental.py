"""availableNow incremental-batch runner: the reference's re-run
semantics (process only new files; idempotent partition overwrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("ymd", StringType()),
        StructField("k", IntegerType()),
        StructField("v", IntegerType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _read_target(spark, tgt):
    # partition-column inference types 'ymd' as DATE on read-back
    return spark.read.parquet(tgt).withColumn("ymd", F.col("ymd").cast("string"))


def _run(spark, src, tgt, ckpt):
    from linkmerce_spark.streaming.incremental import run_incremental_batch

    run_incremental_batch(
        spark,
        src,
        SCHEMA,
        lambda df: df.groupBy("ymd", "k").agg(F.sum("v").alias("v")),
        tgt,
        "ymd",
        ckpt,
    )


def test_available_now_processes_only_new_files(tmp_path, spark):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [("2024-01-01", 1, 10), ("2024-01-02", 1, 5)])
    _run(spark, src, tgt, ckpt)
    first = {
        (r["ymd"], r["k"]): r["v"] for r in _read_target(spark, tgt).collect()
    }
    assert first == {("2024-01-01", 1): 10, ("2024-01-02", 1): 5}

    # Late data for 01-02 arrives: ONLY the new file is processed and
    # ONLY the 01-02 partition is overwritten (dynamic mode) — the
    # 01-01 partition keeps its previous contents.
    _write_batch(spark, src, [("2024-01-02", 1, 7), ("2024-01-02", 2, 3)])
    _run(spark, src, tgt, ckpt)
    second = {
        (r["ymd"], r["k"]): r["v"] for r in _read_target(spark, tgt).collect()
    }
    assert second == {
        ("2024-01-01", 1): 10,
        ("2024-01-02", 1): 7,
        ("2024-01-02", 2): 3,
    }

    # Re-run with no new files: a no-op (exactly-once per file).
    _run(spark, src, tgt, ckpt)
    assert {
        (r["ymd"], r["k"]): r["v"] for r in _read_target(spark, tgt).collect()
    } == second


def test_partition_validation_rejects_nulls(tmp_path, spark):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(None, 1, 10)])
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((ValueError, StreamingQueryException)):
        _run(spark, src, tgt, ckpt)
