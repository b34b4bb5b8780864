"""Property-based tests (hypothesis): allocation conservation laws.

The remainder-preserving allocation (SURVEY W6) has a hard invariant
the reference depends on for money math: the allocated shares MUST sum
exactly to the group total, for any weights — the first row absorbs
the rounding residue. Same for the integer-even split. Random inputs
probe the float/rounding edges example-based tests miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from linkmerce_spark.operators.allocation import (
    allocate_integer_even,
    allocate_proportional,
)

_weights = st.lists(
    st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=8
).filter(lambda ws: sum(ws) > 0)
_totals = st.integers(min_value=0, max_value=10_000_000_000)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=_weights, total=_totals)
def test_proportional_allocation_conserves_total(spark, ws, total):
    rows = [("g", i, float(w)) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "grp string, seq int, w double")
    out = allocate_proportional(
        df,
        group=["grp"],
        weight=F.col("w"),
        total=F.lit(total).cast("bigint"),
        order_by=[F.col("seq").asc()],
        out="share",
    )
    shares = [r["share"] for r in out.collect()]
    assert sum(shares) == total  # exact conservation, any weights
    if len(ws) == 1:
        assert shares[0] == total


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(min_value=1, max_value=9), total=_totals)
def test_integer_even_split_conserves_total(spark, n, total):
    rows = [("g", i) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, seq int")
    out = allocate_integer_even(
        df,
        group=["grp"],
        total=F.lit(total).cast("bigint"),
        order_by=[F.col("seq").asc()],
        out="share",
    )
    shares = sorted(r["share"] for r in out.collect())
    assert sum(shares) == total
    assert shares[-1] - shares[0] <= 1  # even to within one unit
