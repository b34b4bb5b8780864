"""Streaming SQ8 drift monitor (streaming/quantize.py): cross-batch
min/max accumulation bit-identical to batch sq8_train on the union,
drift counting vs a trained range, and checkpoint resume."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("append").parquet(path)


def _run(spark, src, ckpt, out, schema, trained):
    from linkmerce_spark.streaming.quantize import streaming_sq8_drift

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_sq8_drift(stream, trained)
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow drains are finite; assert the drain actually
    # finished rather than proceeding on partial output after a slow
    # 120 s timeout and failing with a confusing downstream assertion
    assert q.awaitTermination(120), "availableNow drain did not finish in 120s"


def _mk_vecs(seed, n, dims=6, lo=-1.0, hi=1.0):
    import random

    rng = random.Random(seed)
    return [
        (seed * 1000 + i, [rng.uniform(lo, hi) for _ in range(dims)])
        for i in range(n)
    ]


def test_streaming_drift_matches_batch_and_resumes(spark, workdir):
    from linkmerce_spark.operators.quantize import sq8_train

    src, ckpt, out = f"{workdir}/v", f"{workdir}/ck", f"{workdir}/out"
    # trained range pinned to exactly [-1, 1] by sentinel vectors, so
    # batch1's uniform(-1, 1) draws are provably in range (float32
    # rounding can only land ON the edge, and edges are not drift)
    base = _mk_vecs(1, 120) + [(900, [-1.0] * 6), (901, [1.0] * 6)]
    train_df = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    trained = {
        r["dim"]: (r["mn"], r["mx"]) for r in sq8_train(train_df).collect()
    }

    batch1 = _mk_vecs(2, 40)  # in range
    batch2 = _mk_vecs(3, 30, lo=-1.5, hi=1.5)  # drifts outside
    _write(spark, src, batch1)
    schema = spark.read.parquet(src).schema
    _run(spark, src, ckpt, out, schema, trained)
    mid = {r["dim"]: r.asDict() for r in spark.read.parquet(out).collect()}

    _write(spark, src, batch2)
    _run(spark, src, ckpt, out, schema, trained)  # resumes from checkpoint

    # last emitted row per dim = final accumulated state
    from pyspark.sql.window import Window

    raw = spark.read.parquet(out)
    w = Window.partitionBy("dim").orderBy(F.col("n_values").desc())
    final = {
        r["dim"]: r.asDict()
        for r in raw.withColumn("__r", F.row_number().over(w))
        .filter("__r = 1")
        .drop("__r")
        .collect()
    }

    # batch truth over the union of both micro-batches
    union_df = spark.createDataFrame(
        batch1 + batch2, "vec_id long, embedding array<float>"
    )
    truth = {r["dim"]: r.asDict() for r in sq8_train(union_df).collect()}
    exploded = union_df.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    for d, row in truth.items():
        assert final[d]["mn_micro"] == math.floor(row["mn"] * 1e6 + 0.5), d
        assert final[d]["mx_micro"] == math.floor(row["mx"] * 1e6 + 0.5), d
        assert final[d]["n_values"] == 70, d
        t_mn, t_mx = trained[d]
        oob = exploded.filter(
            (F.col("dim") == d) & ((F.col("x") < t_mn) | (F.col("x") > t_mx))
        ).count()
        assert final[d]["n_below"] + final[d]["n_above"] == oob, d
        assert final[d]["drifted"] == (oob > 0), d
        # the in-range first drain must NOT have flagged drift
        assert mid[d]["drifted"] is False, d
        assert mid[d]["n_values"] == 40, d

    # re-drain with no new files: exactly-once, nothing changes
    n_rows = raw.count()
    _run(spark, src, ckpt, out, schema, trained)
    assert spark.read.parquet(out).count() == n_rows


def test_untrained_dimension_flags_drift(spark, workdir):
    """A dimension absent from the trained mapping is the most drastic
    drift there is (the quantizer cannot encode it) — it must flag
    untrained/drifted instead of silently counting everything in-range."""
    src, ckpt, out = f"{workdir}/v", f"{workdir}/ck", f"{workdir}/out"
    _write(spark, src, _mk_vecs(5, 20))  # 6-dim vectors
    schema = spark.read.parquet(src).schema
    trained = {d: (-1.0, 1.0) for d in range(5)}  # dim 5 untrained
    _run(spark, src, ckpt, out, schema, trained)
    rows = {r["dim"]: r.asDict() for r in spark.read.parquet(out).collect()}
    assert rows[5]["untrained"] is True and rows[5]["drifted"] is True
    for d in range(5):
        assert rows[d]["untrained"] is False
        assert rows[d]["drifted"] is False, d  # uniform(-1,1) stays in range
        assert rows[d]["n_below"] == 0 and rows[d]["n_above"] == 0


def test_drift_update_edges():
    """NaN/None excluded; edge-equal values are NOT drift (strict
    inequality — an edge value encodes losslessly)."""
    from linkmerce_spark.streaming.quantize import sq8_drift_update

    st = (None, None, 0, 0, 0)
    st = sq8_drift_update(st, [0.5, None, float("nan"), -0.5], -0.5, 0.5)
    assert st == (-0.5, 0.5, 2, 0, 0)
    st = sq8_drift_update(st, [-0.50001, 0.6], -0.5, 0.5)
    assert st[2] == 4 and st[3] == 1 and st[4] == 1
    assert st[0] == -0.50001 and st[1] == 0.6
