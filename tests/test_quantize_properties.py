"""Property-based tests (hypothesis): quantization-tier invariants.

The SQ8 storage path carries two hard contracts a 100 TB corpus
depends on: (1) reconstruction error is bounded by half a quantization
step in EVERY dimension for ANY input distribution, and (2) the sign-
bit BQ code equals the independent pure-Python packer for any vector —
including empty, negative-zero, sub-32-dim, and past-64-dim shapes
that example-based tests only spot-check. Random inputs probe the
float edges (denormals excluded: parquet float32 fixtures don't carry
them and the fixture generator never emits them)."""

from __future__ import annotations

import math
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_component = st.floats(
    min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False,
    width=32,
)
_vectors = st.lists(
    st.lists(_component, min_size=4, max_size=4), min_size=2, max_size=12
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=_vectors)
def test_sq8_error_bounded_by_half_step_everywhere(spark, vecs):
    from linkmerce_spark.operators.quantize import sq8_audit

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = {r["dim"]: r for r in sq8_audit(df).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for d, r in rows.items():
        assert 0 <= r["max_code"] <= 255, d
        assert r["n_values"] == len(vecs), d
        # half-step bound in nanounits (+2 for the two half-up floors)
        half_step_nano = (r["mx_micro"] - r["mn_micro"]) * 1000 / 255.0 / 2.0
        assert r["max_err_nano"] <= half_step_nano + 2, d


_any_vec = st.one_of(
    st.none(),
    st.lists(_component, min_size=0, max_size=70),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=st.lists(_any_vec, min_size=1, max_size=8))
def test_bq_signatures_match_pure_packer_any_shape(spark, vecs):
    from linkmerce_spark.operators.quantize import bq_signatures

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["sig_lo"], r["sig_hi"])
        for r in bq_signatures(df).collect()
    }

    def py_sig(v):
        if not v:  # None or empty -> total (0, 0)
            return 0, 0
        lo = hi = 0
        for d, x in enumerate(v[:64]):  # dims >= 65 are the documented cap
            xf = struct.unpack("f", struct.pack("f", x))[0]
            if xf > 0.0:
                if d < 32:
                    lo |= 1 << d
                else:
                    hi |= 1 << (d - 32)
        return lo, hi

    for i, v in enumerate(vecs):
        assert got[i] == py_sig(v), (i, v)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=st.lists(st.lists(_component, min_size=3, max_size=3),
                     min_size=1, max_size=10))
def test_sq8_reconstruct_within_half_step_per_element(spark, vecs):
    from linkmerce_spark.operators.quantize import sq8_reconstruct

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: list(r["rv"]) for r in sq8_reconstruct(df).collect()}
    dims = 3
    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    mn = [min(f32(v[d]) for v in vecs) for d in range(dims)]
    mx = [max(f32(v[d]) for v in vecs) for d in range(dims)]
    for i, v in enumerate(vecs):
        assert len(got[i]) == dims
        for d in range(dims):
            step = (mx[d] - mn[d]) / 255.0
            assert abs(got[i][d] - f32(v[d])) <= step / 2.0 + 1e-9, (i, d)
