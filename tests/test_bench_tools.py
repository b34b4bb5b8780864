"""Bench-harness contracts that need no engine run.

The MED3 digest is the committed A/B evidence; its honesty rules are
pinned here as pure-function tests over synthetic run records:

- the ratio is computed over the COMMON query set only;
- any entry present on one side only MUST be named in the digest
  header, and when BENCH_DUCK_SKIP drove the skip, the digest names
  the env value (and the BENCH_DUCK_SKIP_REASON when one is given) —
  a silent skip would quietly shrink the yardstick.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_median import summarize  # noqa: E402


def _run(queries: dict[str, float], metric: str) -> dict:
    return {
        "metric": metric,
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
    }


def _pairs(spark_q: dict[str, float], duck_q: dict[str, float]):
    return [
        (_run(dict(spark_q), "total_query_wall_seconds"),
         _run(dict(duck_q), "duckdb_twin_wall_seconds"))
        for _ in range(3)
    ]


def test_med3_ratio_uses_common_set_and_names_skips(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_DUCK_SKIP", "q_heavy")
    monkeypatch.setenv("BENCH_DUCK_SKIP_REASON", "allocator OOM at sf10")
    pairs = _pairs(
        {"q_a": 1.0, "q_b": 2.0, "q_heavy": 50.0},
        {"q_a": 0.5, "q_b": 1.5},
    )
    lines = summarize(pairs, "testtag", "/tmp/sfX", str(tmp_path))
    text = "\n".join(lines)
    # ratio over the common set only: (1+2)/(0.5+1.5) = 1.5 — q_heavy's
    # 50 s must NOT leak into the committed number
    assert "1.500" in text
    # the skipped entry is named in the header, with env + reason
    assert "`q_heavy`" in text
    assert "BENCH_DUCK_SKIP=q_heavy" in text
    assert "allocator OOM at sf10" in text
    # both med3 JSON docs were written and carry the median per query
    spark_doc = json.load(open(tmp_path / "BENCH_SPARK_testtag_med3.json"))
    duck_doc = json.load(open(tmp_path / "BENCH_DUCK_testtag_med3.json"))
    assert spark_doc["queries"]["q_heavy"] == 50.0
    assert "q_heavy" not in duck_doc["queries"]


def test_med3_no_skips_has_no_exclusion_line(tmp_path, monkeypatch):
    monkeypatch.delenv("BENCH_DUCK_SKIP", raising=False)
    monkeypatch.delenv("BENCH_DUCK_SKIP_REASON", raising=False)
    pairs = _pairs({"q_a": 1.0}, {"q_a": 1.0})
    lines = summarize(pairs, "testtag2", "/tmp/sfX", str(tmp_path))
    text = "\n".join(lines)
    assert "Excluded from the ratio" not in text
    assert "1.000" in text


def test_med3_median_smooths_one_outlier_run(tmp_path):
    pairs = _pairs({"q_a": 1.0}, {"q_a": 1.0})
    pairs[1][0]["queries"]["q_a"] = 9.0  # one hot spark run
    pairs[1] = (
        dict(pairs[1][0], value=9.0),
        pairs[1][1],
    )
    lines = summarize(pairs, "testtag3", "/tmp/sfX", str(tmp_path))
    doc = json.load(open(tmp_path / "BENCH_SPARK_testtag3_med3.json"))
    assert doc["queries"]["q_a"] == 1.0  # median, not mean
    text = "\n".join(lines)
    assert "q_a" in text  # named as a spread outlier
