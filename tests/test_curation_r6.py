"""Round-6 curation/layout operators: dup-span coverage, unigram-LM
scoring, z-order clustering (operators/dupspans.py, lmscore.py,
zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkmerce_spark.operators.dupspans import dup_span_coverage
from linkmerce_spark.operators.lmscore import ilog2, unigram_lm_score
from linkmerce_spark.operators.zorder import (
    interleave_bits,
    interleave_bits_sql,
    zorder_layout,
)


# ------------------------------------------------------------- dup spans
@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "a b c d"  # a duplicated 4-gram across docs 1 and 2
    rows = [
        (1, shared + " x y z"),          # 7 words, dup gram covers 1..4
        (2, "p q " + shared),            # 6 words, dup gram covers 3..6
        (3, "u v w only once here"),     # no duplicated gram
        (4, "t t t t t t t t"),          # self-repeated gram (count>=2 within doc)
        (5, "short"),                    # shorter than n -> no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_span_coverage_exact(span_docs):
    out = {
        r.doc_id: r
        for r in dup_span_coverage(span_docs, "text", "doc_id", n=4).collect()
    }
    # doc 1: gram "a b c d" at pos 1 also occurs in doc 2 -> covers 4/7
    assert (out[1].covered_words, out[1].n_words) == (4, 7)
    assert out[1].dup_span_bp == 10000 * 4 // 7
    # doc 2: same gram at pos 3 -> covers positions 3..6 = 4/6
    assert (out[2].covered_words, out[2].n_words) == (4, 6)
    # doc 3: nothing duplicated
    assert (out[3].covered_words, out[3].dup_span_bp) == (0, 0)
    # doc 4: "t t t t" occurs 5 times within one doc -> whole doc covered
    assert (out[4].covered_words, out[4].dup_span_bp) == (8, 10000)
    # doc 5: shorter than n -> 0 coverage over its full word count
    assert (out[5].n_words, out[5].covered_words, out[5].dup_span_bp) == (1, 0, 0)


def test_dup_span_rejects_bad_params(span_docs):
    with pytest.raises(ValueError):
        dup_span_coverage(span_docs, "text", "doc_id", n=0)
    with pytest.raises(ValueError):
        dup_span_coverage(span_docs, "text", "doc_id", min_count=1)


# ------------------------------------------------------------ unigram LM
def test_unigram_lm_exact(spark):
    # corpus TFs: "the" x4 (ilog2=2), "rare" x1 (ilog2=0), "pair" x2 (ilog2=1)
    docs = spark.createDataFrame(
        [
            (1, "the the pair"),
            (2, "the the rare"),
            (3, "pair"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_lm_score(docs, "text", "doc_id").collect()}
    # doc 1: the(2)+the(2)+pair(1) = 5 over 3 tokens
    assert (out[1].n_tokens, out[1].sum_ilog2) == (3, 5)
    assert out[1].lm_score_bp == 10000 * 5 // 3
    # doc 2: 2+2+0 = 4
    assert (out[2].n_tokens, out[2].sum_ilog2, out[2].lm_score_bp) == (3, 4, 13333)
    # doc 3: single "pair" -> 1
    assert (out[3].n_tokens, out[3].sum_ilog2, out[3].lm_score_bp) == (1, 1, 10000)


def test_ilog2_matches_python(spark):
    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, (1 << 40) - 1, 1 << 40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.y for r in df.select("x", ilog2(F.col("x")).alias("y")).collect()}
    for v in vals:
        assert got[v] == v.bit_length() - 1


# --------------------------------------------------------------- z-order
def test_interleave_bits_exact(spark):
    def morton(a: int, b: int, bits: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    cases = [(0, 0), (1, 0), (0, 1), (5, 3), (255, 0), (0, 255), (170, 85), (999, 123)]
    df = spark.createDataFrame(cases, "a long, b long")
    out = df.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b"), bits=10).alias("z")
    ).collect()
    for r in out:
        assert r.z == morton(r.a, r.b, 10), (r.a, r.b)


def test_interleave_sql_twin_matches(spark):
    # the SQL-string form evaluates to the identical key on Spark SQL
    df = spark.createDataFrame([(170, 85), (7, 9)], "a long, b long")
    df.createOrReplaceTempView("zt")
    sql = interleave_bits_sql("a", "b", 8)
    got = spark.sql(f"SELECT a, b, {sql} AS z FROM zt")
    exp = df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 8).alias("z"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_interleave_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        interleave_bits(F.lit(1), F.lit(1), bits=0)
    with pytest.raises(ValueError):
        interleave_bits_sql("a", "b", bits=40)


def test_zorder_layout_clusters_both_dims(spark, tmp_path):
    # 32x32 grid, one row per cell, written z-ordered into 8 partitions:
    # every partition's extent must be narrow in BOTH dims (a plain
    # sort by `a` would give full-range extents in `b`).
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_layout(df, F.col("a"), F.col("b"), bits=5, num_partitions=8)
    assert "_z" not in out.columns
    exts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("ea"),
            (F.max("b") - F.min("b")).alias("eb"),
        )
        .collect()
    )
    assert len(exts) == 8
    # a z-ordered 1024-cell grid split into 8 runs keeps each run inside
    # a fraction of the full 0..31 range on both axes
    assert all(r.ea <= 16 and r.eb <= 16 for r in exts), exts
    # and nothing was lost
    assert out.count() == 1024
