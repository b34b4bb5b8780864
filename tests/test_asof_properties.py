"""Property-based test: asof_join vs pandas.merge_asof.

pandas.merge_asof is an independent, widely-trusted reference
implementation of as-of semantics (backward/forward, inclusive ties,
tolerance). Random keyed event sets drive the Spark operator and the
pandas reference side-by-side; any divergence in match selection,
tolerance masking, or left-row preservation fails the property.
Right-side (key, ts) duplicates are excluded here because merge_asof's
winner among exact duplicates is positional (input order), which a
distributed engine deliberately does not honor — asof_join resolves
those via its explicit ``tiebreak`` instead (covered by the unit
tests).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkmerce_spark.operators.asofjoin import asof_join

_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=60)
_left_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=12)
# unique (key, ts) on the right: deterministic winner on both sides
_right_rows = st.lists(
    st.tuples(_key, _ts), min_size=0, max_size=12, unique_by=lambda t: (t[0], t[1])
)


def _pandas_asof(left, right, direction, tolerance):
    lp = pd.DataFrame(left, columns=["k", "ts"]).reset_index(names="lid")
    rp = pd.DataFrame(right, columns=["k", "rts"])
    rp["v"] = rp["k"] * 1000 + rp["rts"]
    if lp.empty:
        return {}
    if rp.empty:
        out = lp.copy()
        out["v"] = pd.NA
    else:
        out = pd.merge_asof(
            lp.sort_values("ts", kind="stable"),
            rp.sort_values("rts", kind="stable"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=True,
        )
    return {
        (r.k, r.ts, r.lid): (None if pd.isna(r.v) else int(r.v))
        for r in out.itertuples()
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=_left_rows,
    right=_right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
)
def test_asof_join_matches_pandas(spark, left, right, direction, tolerance):
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k int, ts int, lid int"
    )
    r = spark.createDataFrame(
        [(k, ts, k * 1000 + ts) for k, ts in right], "k int, rts int, v int"
    )
    out = asof_join(
        l,
        r,
        keys=["k"],
        left_ts="ts",
        right_ts="rts",
        direction=direction,
        tolerance=None if tolerance is None else F.lit(tolerance),
    )
    got = {(row.k, row.ts, row.lid): row.v for row in out.collect()}
    want = _pandas_asof(left, right, direction, tolerance)
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=_left_rows,
    right=_right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
    width=st.sampled_from([1, 4, 17, 1000]),
)
def test_bucketed_asof_matches_pandas(spark, left, right, direction, tolerance, width):
    """The skew-hardened bucketed variant must be semantically identical
    to plain as-of for EVERY bucket width — widths only change the plan."""
    from pyspark.sql import functions as F

    from linkmerce_spark.operators.asofjoin import asof_join_bucketed

    l = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k int, ts int, lid int"
    )
    r = spark.createDataFrame(
        [(k, ts, k * 1000 + ts) for k, ts in right], "k int, rts int, v int"
    )
    out = asof_join_bucketed(
        l,
        r,
        keys=["k"],
        left_ts="ts",
        right_ts="rts",
        bucket_width=width,
        direction=direction,
        tolerance=None if tolerance is None else F.lit(tolerance),
    )
    got = {(row.k, row.ts, row.lid): row.v for row in out.collect()}
    want = _pandas_asof(left, right, direction, tolerance)
    assert got == want
