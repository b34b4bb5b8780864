"""Streaming binary-quantized ANN index: continuous signature ingest.

The serving tier round 9's batch capstone (``embedding_sq8_roundtrip``)
proves needs one more piece to run continuously: vectors arriving on a
stream must land in the signature index without a retrain or a rebuild.
Sign-bit BQ makes that trivially safe — the bit for dimension ``d`` is
``x_d > 0``, a threshold involving NO corpus statistics — so the
streaming encode is a STATELESS projection (``operators/quantize.
bq_signatures`` applied to the streaming frame verbatim), bit-identical
to the batch encode of the union of all micro-batches by construction.
Contrast SQ8, whose trained (mn, mx) DO drift and get a stateful
monitor (``streaming/quantize.py``); the 1-bit pre-filter tier is the
part of the serving shape that never needs it.

Plan shape at 100 TB: the encode pipelines with the stream source
(zero-shuffle, whole-stage codegen), the index append is the sink's
sequential write, and serving reads 16 bytes/row of codes — the same
economics as the batch pre-filter pass.

Reference behavioral parity: the reference has no streaming or vector
surface (SURVEY §2.11 — beyond-parity extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from linkmerce_spark.operators.quantize import bq_signatures
from linkmerce_spark.operators.topk import top_k_per_group

__all__ = ["streaming_bq_ingest", "bq_index_topk"]


def streaming_bq_ingest(
    vecs: DataFrame,
    index_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger: dict | None = None,
):
    """Continuously encode a vector stream into a parquet signature
    index: ``(vec_id, sig_lo, sig_hi)`` appended per micro-batch.

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — defaults to
    ``{"availableNow": True}`` (drain-and-stop, the incremental-runner
    shape); pass e.g. ``{"processingTime": "10 seconds"}`` for truly
    continuous ingest. This helper pins append mode + checkpoint so a
    restart never re-encodes a committed batch: exactly-once into the
    index."""
    sig = bq_signatures(vecs, vec_col=vec_col, id_col=id_col)
    return (
        sig.writeStream.format("parquet")
        .option("path", index_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )


def bq_index_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve Hamming top-k from the ingested signature index.

    ``queries``: a (small) batch frame of raw vectors — encoded with
    the same stateless expressions and BROADCAST against the index
    scan; ranking is ``bit_count(xor)`` integer codegen with id
    tiebreak, exactly the batch capstone's pre-filter stage."""
    qsig = bq_signatures(queries, vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("sig_lo").alias("qlo"),
        F.col("sig_hi").alias("qhi"),
    )
    index = spark.read.parquet(index_path).select(
        F.col(id_col).alias("neighbor_id"), "sig_lo", "sig_hi"
    )
    hamming = (
        F.bit_count(F.col("qlo").bitwiseXOR(F.col("sig_lo")))
        + F.bit_count(F.col("qhi").bitwiseXOR(F.col("sig_hi")))
    ).cast("int")
    pairs = index.join(
        broadcast(qsig), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", hamming.alias("hamming"))
    return top_k_per_group(
        pairs,
        ["query_id"],
        [F.col("hamming").asc_nulls_last(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
