"""Round-6 batch 2: line-dedup rewrite, incremental near-dup,
BPE pair statistics, compaction planning (operators/linededup.py,
incdedup.py, bpe.py, compaction.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkmerce_spark.operators.bpe import bpe_pair_counts
from linkmerce_spark.operators.compaction import plan_compaction
from linkmerce_spark.operators.incdedup import band_keys, incremental_near_dups
from linkmerce_spark.operators.linededup import line_dedup_rewrite
from linkmerce_spark.operators.minhash import minhash_signature


# ------------------------------------------------------ line dedup rewrite
def test_line_dedup_removes_non_canonical(spark):
    boiler = "x1 x2 x3"  # one full 3-word segment, repeated across docs
    docs = spark.createDataFrame(
        [
            (1, boiler + " a b c"),        # segs: boiler (canonical), "a b c"
            (2, boiler + " d e f"),        # segs: boiler (dropped), "d e f"
            (3, "u v w p q"),              # segs: "u v w", "p q" (tail < W)
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in line_dedup_rewrite(docs, "text", "doc_id", seg_words=3).collect()
    }
    assert (out[1].n_segments, out[1].n_dropped) == (2, 0)
    assert out[1].text_clean == boiler + " a b c"
    # doc 2 loses the duplicated boiler segment but keeps its own tail
    assert (out[2].n_segments, out[2].n_dropped) == (2, 1)
    assert out[2].text_clean == "d e f"
    # doc 3 untouched; short tail segment survives as its own text
    assert (out[3].n_dropped, out[3].text_clean) == (0, "u v w p q")


def test_line_dedup_all_dropped_and_intra_doc(spark):
    # the same segment repeated WITHIN one doc: first occurrence kept
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b z z")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in line_dedup_rewrite(docs, "text", "doc_id", seg_words=2).collect()
    }
    # "a b" occurs at (1,0), (1,1), (2,0): canonical is (1,0)
    assert out[1].text_clean == "a b"
    assert out[1].n_dropped == 1
    assert out[2].text_clean == "z z"


def test_line_dedup_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        line_dedup_rewrite(docs, "text", "doc_id", seg_words=0)
    with pytest.raises(ValueError):
        line_dedup_rewrite(docs, "text", "doc_id", min_count=1)


# ------------------------------------------------------- incremental dedup
@pytest.fixture(scope="module")
def inc_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    idx = spark.createDataFrame(
        [(100, base), (101, "completely different indexed content here okay")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (200, base),                                  # exact dup of 100
            (201, "novel text that matches nothing in the index at all"),
            (202, "zz"),                                  # too short to shingle
        ],
        "doc_id long, text string",
    )
    return idx, batch


def test_incremental_flags_dup_and_passes_novel(inc_corpus):
    idx, batch = inc_corpus
    out = {r.doc_id: r for r in incremental_near_dups(idx, batch).collect()}
    assert set(out) == {200, 201, 202}
    assert out[200].is_dup == 1 and out[200].n_index_matches >= 1
    assert out[201].is_dup == 0 and out[201].n_index_matches == 0
    # shingle-less doc reports cleanly instead of vanishing
    assert out[202].is_dup == 0


def test_band_keys_match_index_and_batch_sides(spark):
    # the SAME text signed on both sides must produce identical band keys
    df = spark.createDataFrame(
        [(1, "one two three four five six seven")], "doc_id long, text string"
    )
    signed = minhash_signature(df, "text", "doc_id").select("doc_id", "sig")
    a = {(r.band_id, r.band_key) for r in band_keys(signed).collect()}
    b = {(r.band_id, r.band_key) for r in band_keys(signed).collect()}
    assert a == b and len(a) == 4


def test_band_keys_rejects_overlong_bands(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven")], "doc_id long, text string"
    )
    signed = minhash_signature(df, "text", "doc_id").select("doc_id", "sig")
    with pytest.raises(ValueError):
        band_keys(signed, bands=5, rows_per_band=4)


def test_band_keys_runtime_guard_without_metadata(spark):
    # Signatures rehydrated from storage lose the 'k' column metadata;
    # an oversized band config must still fail loudly (at execution),
    # never degrade into short/empty slices with degenerate band keys.
    from pyspark.sql import functions as F
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [(1, "one two three four five six seven")], "doc_id long, text string"
    )
    signed = minhash_signature(df, "text", "doc_id").select("doc_id", "sig")
    # strip metadata the way a parquet round-trip through a foreign
    # writer would: rebuild the column from its own values
    stripped = signed.select("doc_id", F.array([F.col("sig")[i] for i in range(16)]).alias("sig"))
    assert stripped.schema["sig"].metadata.get("k") is None
    # valid config still works and matches the metadata'd path
    a = {(r.band_id, r.band_key) for r in band_keys(signed).collect()}
    b = {(r.band_id, r.band_key) for r in band_keys(stripped).collect()}
    assert a == b
    # oversized config fails at runtime instead of silently degrading
    with pytest.raises(Exception) as ei:
        band_keys(stripped, bands=5, rows_per_band=4).collect()
    assert "signature length" in str(ei.value) or "assert" in str(ei.value).lower()


# -------------------------------------------------------------- BPE pairs
def test_bpe_pair_counts_exact(spark):
    # "ab" x3 (from 'abc' twice? no: corpus = 'abc abc xy') ->
    # vocab: abc(wc=2) -> pairs ab, bc each weight 2; xy(wc=1) -> xy 1
    docs = spark.createDataFrame([(1, "abc abc xy")], "doc_id long, text string")
    out = bpe_pair_counts(docs, "text", top_n=10).collect()
    got = {r.pair: r.pair_count for r in out}
    assert got == {"ab": 2, "bc": 2, "xy": 1}
    # deterministic rank: count DESC then pair ASC
    assert [r.pair for r in out] == ["ab", "bc", "xy"]


def test_bpe_top_n_truncates_deterministically(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd")], "doc_id long, text string"
    )
    out = bpe_pair_counts(docs, "text", top_n=2).collect()
    assert [r.pair for r in out] == ["aa", "bb"]
    with pytest.raises(ValueError):
        bpe_pair_counts(docs, "text", top_n=0)


# ------------------------------------------------------- compaction plan
def test_plan_compaction_file_math(spark):
    # partition p1: 10 rows x 100B = 1000B -> 4 files @ 300B target
    # partition p2: 1 row x 50B -> floor to 1 file
    rows = [("p1", 100)] * 10 + [("p2", 50)]
    df = spark.createDataFrame(rows, "pk string, b long")
    out = {
        r.part_key: r
        for r in plan_compaction(df, "pk", F.col("b"), target_bytes=300).collect()
    }
    assert (out["p1"].n_rows, out["p1"].est_bytes) == (10, 1000)
    assert out["p1"].n_files == 4          # ceil(1000/300)
    assert out["p1"].rows_per_file == 3    # ceil(10/4)
    assert (out["p2"].n_files, out["p2"].rows_per_file) == (1, 1)


def test_plan_compaction_rejects_bad_target(spark):
    df = spark.createDataFrame([("p", 1)], "pk string, b long")
    with pytest.raises(ValueError):
        plan_compaction(df, "pk", F.col("b"), target_bytes=0)


# -------------------------------------------------------- curation gate
def test_curation_gate_rule_cascade(spark):
    from linkmerce_spark.operators.curation import curation_gate

    long_ok = " ".join(f"w{i}" for i in range(20))           # 20 distinct words
    repet = " ".join(["x"] * 30)                             # 30 words, 1 distinct
    # 12 DISTINCT 15-char words: passes the repetition rule, fails
    # the mean-word-length bound
    weird = " ".join(f"abcdefghijklm{i:02d}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, long_ok),
            (2, "tiny doc"),                                 # too_short (2 words)
            (3, repet),                                      # repetitive
            (4, weird),                                      # weird_words (len 15)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation_gate(docs).collect()}
    assert (out[1].reason, out[1].keep) == ("ok", 1)
    assert (out[2].reason, out[2].keep) == ("too_short", 0)
    # doc 3 is both repetitive AND dup-heavy ("x"*30 self-repeats its
    # 8-grams): the cascade must name the EARLIER rule
    assert (out[3].reason, out[3].keep) == ("repetitive", 0)
    assert out[3].distinct_share_bp == 10000 // 30
    assert (out[4].reason, out[4].keep) == ("weird_words", 0)
    assert out[4].mean_wlen_centi == 1500


def test_curation_gate_dup_heavy_and_bounds(spark):
    from linkmerce_spark.operators.curation import curation_gate

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, shared + " uniq one two"), (2, shared + " other tail words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation_gate(docs, max_dup_span_bp=5000).collect()}
    # the shared 12-word prefix dominates both 15-word docs: 12/15 = 80%
    assert out[1].reason == "dup_heavy" and out[2].reason == "dup_heavy"
    # raising the cap lets them through
    out2 = {r.doc_id: r for r in curation_gate(docs, max_dup_span_bp=9000).collect()}
    assert out2[1].reason == "ok" and out2[2].reason == "ok"


# ------------------------------------------------- domain mixture weights
def test_domain_mixture_weights_math(spark, tmp_path):
    import pyspark.sql.functions as F
    from linkmerce_spark.queries import q_domain_mixture_weights

    # 2 domains: a has 30 tokens, b has 10 -> total 40, uniform target 20
    rows = [(i, "w " * 9 + "w", "a") for i in range(3)] + [(100, "t " * 9 + "t", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)
    out = {r.source: r for r in q_domain_mixture_weights(spark, str(tmp_path)).collect()}
    assert (out["a"].tokens, out["b"].tokens) == (30, 10)
    assert out["a"].share_bp == 7500 and out["b"].share_bp == 2500
    # weight = 10000 * total / (n_domains * tokens)
    assert out["a"].weight_bp == 10000 * 40 // (2 * 30)
    assert out["b"].weight_bp == 10000 * 40 // (2 * 10)


def test_apply_compaction_writes_planned_file_counts(spark, tmp_path):
    import os
    from linkmerce_spark.operators.compaction import apply_compaction, plan_compaction

    # p1: 4000 bytes -> 4 files @ 1000B; p2: 900 bytes -> 1 file
    rows = [("p1", i, 40) for i in range(100)] + [("p2", i, 30) for i in range(30)]
    df = spark.createDataFrame(rows, "pk string, k long, b long")
    plan = plan_compaction(df, "pk", F.col("b"), target_bytes=1000)
    out = str(tmp_path / "compacted")
    apply_compaction(df, plan, "pk", out, bucket_cols=["k"])
    for part, want in (("p1", 4), ("p2", 1)):
        d = os.path.join(out, f"part_key={part}")
        got = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
        assert got == want, (part, got, want)
    # and nothing was lost
    assert spark.read.parquet(out).count() == 130


def test_murmur3_int_matches_spark_hash(spark):
    from linkmerce_spark.operators.compaction import _murmur3_int

    vals = list(range(0, 64)) + [-1, -7, 2**31 - 1, -(2**31), 123456789]
    rows = spark.createDataFrame([(v,) for v in vals], "v int").select(
        "v", F.hash("v").alias("h")
    ).collect()
    for r in rows:
        assert _murmur3_int(r.v) == r.h, r.v


def test_with_empty_fallback_both_branches(spark):
    from linkmerce_spark.marts.stock import with_empty_fallback

    p = spark.createDataFrame([(1, "a")], "k long, v string")
    fb = spark.createDataFrame([(9, "z")], "k long, v string")
    got = with_empty_fallback(p, fb).collect()
    assert [tuple(r) for r in got] == [(1, "a")]

    empty = p.filter("k < 0")
    got2 = with_empty_fallback(empty, fb).collect()
    assert [tuple(r) for r in got2] == [(9, "z")]


def test_apply_compaction_unplanned_partition_fails_loudly(spark, tmp_path):
    import pytest

    from linkmerce_spark.operators.compaction import apply_compaction, plan_compaction

    df = spark.createDataFrame(
        [("p1", 1, 10), ("p2", 2, 10)], "pk string, k long, b long"
    )
    plan = plan_compaction(df.filter("pk = 'p1'"), "pk", F.col("b"), target_bytes=100)
    with pytest.raises(Exception, match="partition missing from plan"):
        apply_compaction(df, plan, "pk", str(tmp_path / "o"), bucket_cols=["k"])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # cell
            st.lists(
                st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=4, max_size=4
            ),
        ),
        min_size=0,
        max_size=12,
    )
)
def test_cell_pair_cosines_property_vs_join_form(spark, rows):
    from pyspark.sql import functions as F

    from linkmerce_spark.operators.similarity import (
        cell_pair_cosines,
        quantized_cosine,
    )

    data = [(i, c, [float(x) for x in v]) for i, (c, v) in enumerate(rows)]
    cells = spark.createDataFrame(
        data, "vec_id long, cell int, embedding array<double>"
    ) if data else spark.createDataFrame([], "vec_id long, cell int, embedding array<double>")
    got = sorted(
        tuple(r)
        for r in cell_pair_cosines(cells, min_cosine=-2.0).collect()
    )
    a = cells.select("cell", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = cells.select("cell", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = quantized_cosine("va", "vb")
    want = sorted(
        tuple(r)
        for r in a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.floor(cos * 1000000.0 + 0.5) / 1000000.0)
        .filter(F.col("cosine") >= -2.0)
        .select("cell", "id_a", "id_b", "cosine")
        .collect()
    )
    assert got == want


# --- ExactSubstr rewrite (round 7c) ----------------------------------------


def _py_exact_substr_rewrite(docs: dict, n: int = 8) -> dict:
    """Reference reimplementation over {doc_id: text}."""
    toks = {d: t.split(" ") for d, t in docs.items()}
    occ: dict = {}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(1, len(ws) - n + 2):
            occ.setdefault(" ".join(ws[p - 1 : p - 1 + n]), []).append((d, p))
    removed: dict = {d: set() for d in toks}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        canon = min(places)
        for d, p in places:
            if (d, p) != canon:
                removed[d].update(range(p, p + n))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws, 1) if i not in removed[d]]
        out[d] = (len(ws), len(kept), " ".join(kept))
    return out


def test_exact_substr_rewrite_semantics(spark):
    from linkmerce_spark.operators.dupspans import dup_span_rewrite

    a = "w0 w1 w2 w3 w4 w5 w6 w7 tail0 tail1"   # canonical source
    b = "x0 x1 w0 w1 w2 w3 w4 w5 w6 w7 y0"      # later copy -> span removed
    c = "w0 w1 w2 w3 w4 w5 w6 w7"               # exactly the dup span
    d = "short doc"                              # < n words: untouched
    rows = [(1, a), (2, b), (3, c), (4, d)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["kept_words"], r["clean_text"])
        for r in dup_span_rewrite(df, "text", "doc_id").collect()
    }
    assert got == _py_exact_substr_rewrite(dict(rows))
    assert got[1] == (10, 10, a)                 # canonical survives verbatim
    assert got[2] == (11, 3, "x0 x1 y0")         # copied span excised
    assert got[3] == (8, 0, "")                  # pure-dup doc collapses
    assert got[4] == (2, 2, d)                   # too short to gram


def test_exact_substr_rewrite_rejects_non_integral_id(spark):
    # The canonical key packs (doc_id, pos) into one BIGINT, which
    # requires an integral id in [0, 2^31); string ids must be remapped
    # to a surrogate first — the operator raises early instead of
    # producing a silent overflow or an analysis error mid-plan.
    import pytest as _pytest

    from linkmerce_spark.operators.dupspans import dup_span_rewrite

    df = spark.createDataFrame(
        [("d1", "a b c d e f g h")], "doc_id string, text string"
    )
    with _pytest.raises(TypeError, match="integral id"):
        dup_span_rewrite(df, "text", "doc_id")


def test_exact_substr_rewrite_matches_reference_on_random_corpus(spark):
    import random

    from linkmerce_spark.operators.dupspans import dup_span_rewrite

    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(12)]
    docs = {
        i: " ".join(rng.choices(vocab, k=rng.randrange(8, 40)))
        for i in range(30)
    }
    # inject verbatim reuse: doc 100 copies doc 0's head into its middle
    head = " ".join(docs[0].split(" ")[:10])
    docs[100] = "pre " + head + " post post2"
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["kept_words"], r["clean_text"])
        for r in dup_span_rewrite(df, "text", "doc_id").collect()
    }
    assert got == _py_exact_substr_rewrite(docs)
