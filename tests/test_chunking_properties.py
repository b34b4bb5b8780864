"""Property-based tests (hypothesis): chunking + boilerplate vs pure
Python reference models.

chunk_by_words conservation laws: every word of every document appears
in some chunk; stride-window coverage and overlap are exactly the
arithmetic model's. boilerplate_score is compared gram-for-gram with a
dict-based DF counter.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkmerce_spark.operators.chunking import boilerplate_score, chunk_by_words

_word = st.sampled_from(["a", "b", "c", "dd", "ee", "ff"])
_doc = st.lists(_word, min_size=1, max_size=30).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=6)


def _model_chunks(text: str, window: int, stride: int):
    words = text.split(" ")
    out = []
    start = 0
    while start == 0 or start < len(words):
        out.append((start // stride, start, words[start : start + window]))
        start += stride
        if start >= len(words):
            break
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_docs, window=st.integers(1, 8), stride=st.integers(1, 8))
def test_chunks_match_model(spark, docs, window, stride):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.n_tokens, r.chunk_text)
        for r in chunk_by_words(df, "text", "doc_id", window, stride).collect()
    }
    want = {}
    for i, text in enumerate(docs):
        for cid, start, words in _model_chunks(text, window, stride):
            want[(i, cid)] = (start, len(words), " ".join(words))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_docs, stride=st.integers(1, 5))
def test_chunks_cover_every_word(spark, docs, stride):
    """window >= stride => concatenating chunk words at stride offsets
    reconstructs each document exactly (coverage, no loss)."""
    window = stride  # non-overlapping tiling
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = chunk_by_words(df, "text", "doc_id", window, stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_start, r.chunk_text))
    for i, text in enumerate(docs):
        tiles = [t for _, t in sorted(by_doc[i])]
        assert " ".join(t for t in tiles if t) == text


def _model_boilerplate(docs, n, min_df):
    grams_per_doc = {}
    for i, text in enumerate(docs):
        words = text.split(" ")
        grams_per_doc[i] = [
            " ".join(words[p : p + n]) for p in range(len(words) - n + 1)
        ]
    df_count = {}
    for i, grams in grams_per_doc.items():
        for g in set(grams):
            df_count[g] = df_count.get(g, 0) + 1
    out = {}
    for i, grams in grams_per_doc.items():
        dup = sum(1 for g in grams if df_count[g] >= min_df)
        total = len(grams)
        out[i] = (total, dup, (10000 * dup) // total if total else 0)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_docs, n=st.integers(1, 4), min_df=st.integers(1, 3))
def test_boilerplate_matches_model(spark, docs, n, min_df):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.dup_grams, r.boilerplate_bp)
        for r in boilerplate_score(df, "text", "doc_id", n, min_df).collect()
    }
    assert got == _model_boilerplate(docs, n, min_df)
