"""Streaming HLL sketch (streaming/sketches.py): cross-batch register
accumulation, checkpoint resume, and bit-equivalence with the batch
HLL expressions on the same data."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "grp string, k long").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, ckpt, out, schema):
    from linkmerce_spark.streaming.sketches import streaming_hll_distinct

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_hll_distinct(stream, "grp", "k", m=64)
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_registers(spark, rows, m=64):
    """The batch operator's register rollup (same expressions as
    queries.q_hll_distinct_sketch) on the full data."""
    from linkmerce_spark.queries import _hll_rho

    df = spark.createDataFrame(rows, "grp string, k long")
    h = F.md5(F.col("k").cast("string"))
    bucket = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(m))
    rho = _hll_rho(F.substring(h, 9, 8))
    regs = (
        df.select("grp", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    return {
        r.grp: (r.nonzero, r.scaled + (m - r.nonzero) * 4294967296)
        for r in regs.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("nonzero"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - max_rho)")).alias("scaled"),
        )
        .collect()
    }


def test_streaming_registers_match_batch_and_resume(spark, workdir):
    src, ckpt, out = f"{workdir}/ev", f"{workdir}/ck", f"{workdir}/out"
    batch1 = [("a", i) for i in range(0, 300)] + [("b", i) for i in range(0, 50)]
    batch2 = [("a", i) for i in range(200, 500)] + [("c", i) for i in range(0, 10)]

    _write(spark, src, batch1)
    schema = spark.read.parquet(src).schema
    _run(spark, src, ckpt, out, schema)
    _write(spark, src, batch2)
    _run(spark, src, ckpt, out, schema)  # resumes from checkpointed state

    # last emitted row per group = final accumulated sketch
    from pyspark.sql.window import Window

    rows = spark.read.parquet(out)
    final = {
        r.group: r
        for r in rows.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("group").orderBy(F.col("n_updates").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert final["a"].n_updates == 600  # 300 + 300 rows (overlap re-counted as updates)
    want = _batch_registers(spark, batch1 + batch2)
    for g in ("a", "b", "c"):
        assert (final[g].nonzero_buckets, final[g].sum_scaled) == want[g], g


def test_hll_update_canonicalization_and_rho_bound():
    """Kernel-level pins: rho never exceeds 32 (the shift stays legal),
    NULL/NaN are excluded like SQL md5(NULL), and integral floats (the
    Arrow->pandas coercion of nullable int64) hash like their ints."""
    from linkmerce_spark.streaming.sketches import _bucket_rho, hll_update

    m = 64
    assert all(1 <= _bucket_rho(v, m)[1] <= 32 for v in range(10_000))
    ints = hll_update([0] * m, [1, 2, 3], m)
    floats = hll_update([0] * m, [1.0, 2.0, float("nan"), None, 3.0], m)
    assert ints == floats  # coerced column == clean column; NULLs ignored
    assert hll_update([0] * m, [None, float("nan")], m) == [0] * m


def test_estimate_quality(spark, workdir):
    """Raw HLL estimate from the emitted integers lands within 25% of
    the true distinct count at n >> m."""
    src, ckpt, out = f"{workdir}/ev", f"{workdir}/ck", f"{workdir}/out"
    _write(spark, src, [("g", i) for i in range(2000)])
    schema = spark.read.parquet(src).schema
    _run(spark, src, ckpt, out, schema)
    r = spark.read.parquet(out).orderBy(F.col("n_updates").desc()).first()
    m = r.m
    alpha = 0.709  # alpha_64
    estimate = alpha * m * m / (r.sum_scaled / 4294967296)
    assert abs(estimate - 2000) / 2000 < 0.25


# ----------------------------------------------------------------- KMV
def _run_kmv(spark, src, ckpt, out, schema, k=16):
    from linkmerce_spark.streaming.sketches import streaming_kmv_sketch

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_kmv_sketch(stream, "grp", "k", k=k)
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_kmv_matches_batch_and_resumes(spark, workdir):
    from linkmerce_spark.operators.sketches import kmv_sketch

    src, ckpt, out = (
        f"{workdir}/ksrc",
        f"{workdir}/kckpt",
        f"{workdir}/kout",
    )
    schema = "grp string, k long"
    batch1 = [("a", i) for i in range(40)] + [("b", i) for i in range(5)]
    batch2 = [("a", i) for i in range(20, 70)]  # overlaps batch1: dedup across batches

    _write(spark, src, batch1)
    _run_kmv(spark, src, ckpt, out, schema, k=16)
    _write(spark, src, batch2)
    _run_kmv(spark, src, ckpt, out, schema, k=16)  # resume from checkpoint

    import pyspark.sql.functions as SF

    latest = (
        spark.read.parquet(out)
        .orderBy(SF.col("n_updates").desc())
        .dropDuplicates(["group"])
        .collect()
    )
    got = {r.group: (r.sketch_size, r.max_h, r.n_updates) for r in latest}

    # the batch operator on ALL the data is the ground truth
    all_rows = spark.createDataFrame(batch1 + batch2, schema)
    bsk = kmv_sketch(all_rows, "grp", "k", k=16)
    expect = {
        r.g: (r.cnt, r.mx)
        for r in bsk.groupBy("g").agg(
            SF.count(SF.lit(1)).alias("cnt"), SF.max("h").alias("mx")
        ).collect()
    }
    assert got["a"][:2] == expect["a"] and got["a"][2] == 40 + 50
    assert got["b"][:2] == expect["b"] and got["b"][2] == 5
    # group a saw 70 distinct > k: the sketch is full
    assert got["a"][0] == 16
    # group b is in the exact regime (5 < k)
    assert got["b"][0] == 5


def test_kmv_collision_batch_stream_agree(spark):
    # Keys 24068 and 29776 collide on the 32-bit md5('kmv'||key) prefix
    # (h = 1392763070). The sketch is a set of HASHES: batch kmv_sketch,
    # streaming kmv_update, and the DuckDB oracle must all keep ONE
    # entry for the colliding pair so sketch_size/h_k agree.
    import hashlib

    from linkmerce_spark.operators.sketches import kmv_sketch
    from linkmerce_spark.streaming.sketches import kmv_update

    a, b = 24068, 29776
    ha = int(hashlib.md5(f"kmv{a}".encode()).hexdigest()[:8], 16)
    hb = int(hashlib.md5(f"kmv{b}".encode()).hexdigest()[:8], 16)
    assert ha == hb  # the premise of the test

    keys = [a, b, 1, 2, 3]
    df = spark.createDataFrame([("g", k) for k in keys], "g string, k long")
    batch = sorted(r.h for r in kmv_sketch(df, "g", "k", k=128).collect())
    stream = kmv_update([], keys, k=128)
    assert batch == stream  # one entry for the collision on both paths
    assert len(batch) == 4  # 5 distinct keys, 4 distinct hashes
