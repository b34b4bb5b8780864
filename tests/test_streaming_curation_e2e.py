"""Streaming curation end-to-end: ingest -> incremental near-dup index
-> curation gate as ONE restartable pipeline, compared to the batch
answer (round-8 verdict item: the media availableNow ingest and the
incremental dedup were pinned separately; this composes them).

Three document "days" land as parquet files; each availableNow drain
(a fresh checkpointed run — the restart contract) checks the new
batch against the index of PREVIOUSLY ACCEPTED documents
(operators/incdedup band-key join), gates it through the curation
rules (operators/curation), and appends the accepted rows — which
become the index the next day joins against. The final target must
equal a plain-DataFrame sequential execution of the same logic, and a
drain with no new files must change nothing (exactly-once).

The default test runs on the driver-provided sf0.01 fixture; the sf1
variant (50k docs) runs when the builder-generated ``testdata_sf1``
fixture exists (tools/make_sf1.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SRC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("ds", StringType(), False),
    ]
)

OUT_COLS = ["doc_id", "ds", "n_index_matches", "is_dup", "keep", "accepted"]


def _curate_batch(spark, index_rows, batch):
    """The per-batch pipeline body, shared verbatim by the streaming
    transform and the batch-mode reference loop: near-dup check against
    the accepted index, curation gate, accept = keep AND NOT dup."""
    from linkmerce_spark.operators.curation import curation_gate
    from linkmerce_spark.operators.incdedup import incremental_near_dups

    dups = incremental_near_dups(index_rows, batch, "text", "doc_id")
    gate = curation_gate(batch).select("doc_id", "keep")
    return (
        batch.select("doc_id", "text", "ds")
        .join(dups, "doc_id")
        .join(gate, "doc_id")
        .select(
            "doc_id",
            "text",
            "ds",
            "n_index_matches",
            "is_dup",
            (F.col("keep") == 1).alias("keep"),
            ((F.col("keep") == 1) & (F.col("is_dup") == 0)).alias("accepted"),
        )
    )


def _empty_index(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string"
    )


def _run_pipeline(spark, tmp_path, days):
    """Drive the streaming pipeline one availableNow drain per day;
    each drain is a NEW run against the same checkpoint (the restart
    path), reading the accepted index from the target written by the
    prior drains."""
    from linkmerce_spark.streaming.incremental import run_incremental_batch

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    def transform(batch):
        try:
            # Eagerly materialize the index read: the sink overwrites
            # (dynamic) the same target path this plan reads, so the
            # lineage must be cut before the write executes.
            index_rows = (
                spark.read.parquet(tgt)
                .filter(F.col("accepted"))
                .select("doc_id", "text")
                .localCheckpoint(eager=True)
            )
        except Exception:  # first drain: no target yet
            index_rows = _empty_index(spark)
        return _curate_batch(spark, index_rows, batch)

    def run():
        run_incremental_batch(spark, src, SRC_SCHEMA, transform, tgt, "ds", ckpt)

    for day_rows in days:
        spark.createDataFrame(day_rows, SRC_SCHEMA).write.mode("append").parquet(src)
        run()
    # exactly-once: a drain with no new files must not change the target
    before = _collect_target(spark, tgt)
    run()
    assert _collect_target(spark, tgt) == before
    return before


def _collect_target(spark, tgt):
    return {
        tuple(r)
        for r in spark.read.parquet(tgt)
        .select(
            "doc_id",
            F.col("ds").cast("string").alias("ds"),
            "n_index_matches",
            "is_dup",
            "keep",
            "accepted",
        )
        .collect()
    }


def _batch_answer(spark, days):
    """Plain-DataFrame sequential execution of the same per-batch body."""
    accepted = _empty_index(spark)
    out = set()
    for day_rows in days:
        batch = spark.createDataFrame(day_rows, SRC_SCHEMA)
        res = _curate_batch(spark, accepted, batch).localCheckpoint(eager=True)
        out |= {tuple(r) for r in res.select(*OUT_COLS).collect()}
        accepted = accepted.unionByName(
            res.filter(F.col("accepted")).select("doc_id", "text")
        ).localCheckpoint(eager=True)
    return out


def _days_from_fixture(spark, sf_dir, limit=None):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    if limit is not None:
        docs = docs.filter(F.col("doc_id") < limit)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    days = []
    for i in range(3):
        ds = f"2024-02-0{i + 1}"
        days.append([(d, t, ds) for d, t in rows if d % 3 == i])
    return days


def test_streaming_curation_pipeline_matches_batch(spark, tmp_path):
    days = _days_from_fixture(spark, "/root/testdata/sf0.01")
    got = _run_pipeline(spark, tmp_path, days)
    exp = _batch_answer(spark, days)
    assert got == exp
    # the pipeline actually exercised its stages: some docs were
    # dup-flagged against the index, some failed the gate, most landed
    by_flag = {}
    for r in got:
        by_flag[(r[3], r[4])] = by_flag.get((r[3], r[4]), 0) + 1
    assert sum(by_flag.values()) == sum(len(d) for d in days)
    assert any(is_dup == 1 for (is_dup, _k) in by_flag)  # index hits exist
    assert any(not k for (_d, k) in by_flag)  # gate rejects exist


@pytest.mark.skipif(
    not os.path.isdir("/root/repo/testdata_sf1")
    or os.environ.get("SPARK_GRAFT_HEAVY") != "1",
    reason="sf1 scale variant: needs the generated testdata_sf1 fixture "
    "AND SPARK_GRAFT_HEAVY=1 (50k docs through three drains — minutes, "
    "run deliberately, not in the default suite)",
)
def test_streaming_curation_pipeline_matches_batch_sf1(spark, tmp_path):
    days = _days_from_fixture(spark, "/root/repo/testdata_sf1")
    got = _run_pipeline(spark, tmp_path, days)
    exp = _batch_answer(spark, days)
    assert got == exp
    assert sum(1 for r in got if r[5]) > 0
