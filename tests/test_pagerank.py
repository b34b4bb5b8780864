"""Fixed-iteration PageRank: property tests vs pure-Python power
iteration with the same int64 contribution quantization."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

QUANT = 1_000_000_000_000_000.0


def _py_pagerank(edges, nodes, n_iter=5, damping=0.85):
    omd = 1.0 - damping
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    n = len(nodes)
    r = {v: 1.0 / float(n) for v in nodes}
    for _ in range(n_iter):
        s_int = {v: 0 for v in nodes}
        for a, b, w in edges:
            s_int[b] += math.floor((float(w) / float(out_w[a])) * r[a] * QUANT + 0.5)
        r = {v: omd / float(n) + damping * (float(s_int[v]) / QUANT) for v in nodes}
    return r, out_w


def _spark_pagerank(spark, edges, nodes, n_iter=5, damping=0.85):
    from linkmerce_spark.operators.pagerank import pagerank

    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    v = spark.createDataFrame([(x,) for x in nodes], "node string")
    got = pagerank(e, v, n_iter=n_iter, damping=damping).collect()
    return (
        {r["node"]: r["pagerank"] for r in got},
        {r["node"]: r["out_w"] for r in got},
    )


def _sym(pairs):
    seen = {}
    for a, b, w in pairs:
        if a == b:
            continue
        seen[(a, b)] = w
        seen.setdefault((b, a), w)
    return [(a, b, w) for (a, b), w in seen.items()]


def test_pagerank_matches_pure_python_exactly(spark):
    nodes = ["a", "b", "c", "d", "e"]
    edges = _sym([("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "d", 1)])
    exp_r, exp_o = _py_pagerank(edges, nodes)
    got_r, got_o = _spark_pagerank(spark, edges, nodes)
    assert got_r == exp_r  # bit-identical, not approx — the quantization contract
    assert got_o == {v: exp_o.get(v, 0) for v in nodes}
    # 'e' is isolated: teleport-only rank, exactly.
    assert got_r["e"] == (1.0 - 0.85) / 5.0 + 0.85 * 0.0


def test_pagerank_mass_is_conserved_without_dangling():
    # symmetric graph -> no dangling -> total rank stays ~1 under the
    # pure-Python model the Spark op is pinned against.
    nodes = ["a", "b", "c"]
    edges = _sym([("a", "b", 1), ("b", "c", 5), ("c", "a", 2)])
    r, _ = _py_pagerank(edges, nodes, n_iter=20)
    assert abs(sum(r.values()) - 1.0) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    raw=st.lists(
        st.tuples(
            st.sampled_from("abcdef"),
            st.sampled_from("abcdef"),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=10,
    ),
    n_iter=st.integers(min_value=1, max_value=4),
)
def test_pagerank_random_graphs_match(spark, raw, n_iter):
    edges = _sym(raw)
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e[:2]} | {"z"})  # + isolated
    exp_r, _ = _py_pagerank(edges, nodes, n_iter=n_iter)
    got_r, _ = _spark_pagerank(spark, edges, nodes, n_iter=n_iter)
    assert got_r == exp_r


def test_pagerank_rejects_bad_params(spark):
    from linkmerce_spark.operators.pagerank import pagerank, shared_gram_edges

    e = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight long")
    v = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        pagerank(e, v, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(e, v, damping=1.0)
    with pytest.raises(ValueError):
        shared_gram_edges(e, "src", "dst", min_groups=1)


def test_shared_gram_edges_symmetric_and_capped(spark):
    from linkmerce_spark.operators.pagerank import shared_gram_edges

    shared = "one two three four five six seven eight"
    rows = [
        (1, "s1", shared + " tail1"),
        (2, "s2", shared + " tail2"),
        (3, "s3", "totally different words with no overlap at all here"),
        # a gram shared by ALL sources would exceed max_groups=2 and be dropped
        (4, "s1", "common common common common common common common common"),
        (5, "s2", "common common common common common common common common"),
        (6, "s3", "common common common common common common common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in shared_gram_edges(
            df, "text", "source", n=8, min_groups=2, max_groups=2
        ).collect()
    }
    assert ("s1", "s2") in edges and ("s2", "s1") in edges
    assert edges[("s1", "s2")] == edges[("s2", "s1")] == 1
    assert not any("s3" in k for k in edges)  # the 3-source gram was capped out
