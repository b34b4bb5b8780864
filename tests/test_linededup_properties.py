"""Property tests: line_dedup_rewrite vs a pure-Python reference.

The corpus line-dedup REWRITE (operators/linededup.py) is the most
intricate text transformation in the engine — segmenting, canonical-
occurrence ranking, and in-order re-assembly all have off-by-one
edges. Its DuckDB twin is builder-written too (the standing
oracle-authorship caveat), so this pins the semantics against an
INDEPENDENT reimplementation: a dozen lines of obvious Python over
random corpora drawn from a tiny vocabulary (maximizing segment
collisions).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkmerce_spark.operators.linededup import line_dedup_rewrite

_WORDS = ["a", "b", "c", "d"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _reference(docs: list[str], seg_words: int, min_count: int):
    """Obvious-by-inspection reimplementation: segment every doc,
    count segment texts corpus-wide, keep a segment iff it is rare
    (< min_count) or is the FIRST occurrence in (doc_id, seg) order,
    then re-join kept segments in order."""
    segs = []  # (doc_id, seg_idx, seg_text)
    for i, text in enumerate(docs):
        words = text.split(" ")
        n_seg = (len(words) + seg_words - 1) // seg_words
        for s in range(n_seg):
            segs.append((i, s, " ".join(words[s * seg_words : (s + 1) * seg_words])))
    counts: dict[str, int] = {}
    for _, _, t in segs:
        counts[t] = counts.get(t, 0) + 1
    first: dict[str, tuple[int, int]] = {}
    for i, s, t in sorted(segs):
        first.setdefault(t, (i, s))
    out = {}
    for i, text in enumerate(docs):
        kept, n_segments, n_dropped = [], 0, 0
        for di, s, t in segs:
            if di != i:
                continue
            n_segments += 1
            if counts[t] < min_count or first[t] == (i, s):
                kept.append(t)
            else:
                n_dropped += 1
        out[i] = (n_segments, n_dropped, " ".join(kept))
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_corpus, seg_words=st.integers(min_value=1, max_value=4))
def test_line_dedup_rewrite_matches_pure_python(spark, docs, seg_words):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_dropped"], r["text_clean"])
        for r in line_dedup_rewrite(df, "text", "doc_id", seg_words, 2).collect()
    }
    want = _reference(docs, seg_words, 2)
    # the operator passes empty docs through with zero segments; ""
    # splits to [''] giving the reference one ''-segment — normalize
    # both to the operator's contract (text_clean == "" either way)
    for i, t in enumerate(docs):
        g, w = got[i], want[i]
        assert g[2] == w[2], (i, docs, g, w)  # the rewrite itself
        if t != "":
            assert g[:2] == w[:2], (i, docs, g, w)
