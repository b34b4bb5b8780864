"""Property-based tests (hypothesis): round-5 operator invariants.

connected_components is checked against a pure-Python union-find on
random graphs — the distributed min-label propagation must agree with
the sequential ground truth on every input, including long chains that
exercise multi-round convergence. pack_sequences invariants: offsets
stay inside the budget, running totals are conserved, and sharding
partitions the plan.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_edges)
def test_connected_components_matches_union_find(spark, edges):
    from linkmerce_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == _union_find_components(edges)


_counts = st.lists(st.integers(0, 900), min_size=1, max_size=12)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ns=_counts, budget=st.integers(1, 600))
def test_pack_sequences_invariants(spark, ns, budget):
    from linkmerce_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(list(enumerate(ns)), "doc_id long, n long")
    rows = sorted(
        (r["doc_id"], r["tokens_before"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, "n", budget=budget).collect()
    )
    running = 0
    for i, (doc, before, pack, off) in enumerate(rows):
        assert doc == i
        assert before == running          # conservation: exact prefix sums
        assert pack == before // budget   # positional binning
        assert 0 <= off < budget          # offset stays inside the budget
        assert off == before % budget
        running += ns[i]
    packs = [p for _, _, p, _ in rows]
    assert packs == sorted(packs)         # pack ids are monotone in order
