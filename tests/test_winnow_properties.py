"""Property tests: winnow_fingerprints vs a pure-Python reference.

Winnowing (Schleimer/Wilkerson/Aiken, MOSS) has two load-bearing
guarantees the engine relies on for near-dup detection:

1. the selected set equals "min hash of every complete w-window of
   char-k-gram hashes" (the reference below is a direct transcription
   of the paper's windowing);
2. any shared substring of length >= k+w-1 between two documents
   yields at least one shared fingerprint.

Both sides of the catalog twin are builder-written (the standing
oracle-authorship caveat), so this pins the operator against an
independent dozen-line reimplementation, plus the paper's guarantee
as a cross-document property.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkmerce_spark.operators.fingerprint import winnow_fingerprints

K, W = 5, 4


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _reference(text: str) -> set[int]:
    n = _norm(text)
    grams = [n[i : i + K] for i in range(len(n) - K + 1)]
    hs = [_h32(g) for g in grams]
    return {min(hs[i : i + W]) for i in range(len(hs) - W + 1)}


_text = st.text(alphabet="ab c", min_size=0, max_size=40)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_text, min_size=1, max_size=6))
def test_winnow_matches_pure_python(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, "text", "doc_id", k=K, w=W).collect()
    got: dict[int, set[int]] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(docs):
        assert got.get(i, set()) == _reference(t), (i, t)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    shared=st.text(alphabet="abcd", min_size=K + W - 1, max_size=K + W + 6),
    pre=st.text(alphabet="xyz", min_size=0, max_size=10),
    post=st.text(alphabet="uvw", min_size=0, max_size=10),
)
def test_winnow_shared_substring_guarantee(spark, shared, pre, post):
    # two docs sharing a substring of length >= k+w-1 MUST share a fp
    a, b = pre + shared, shared + post
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=K, w=W).collect()
    fps: dict[int, set[int]] = {0: set(), 1: set()}
    for r in out:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1], (a, b, fps)
