"""Property-based tests: priority_sample and the KMV sketch vs pure-
Python references.

Both operators claim ENGINE-EXACT determinism: the selected sample /
sketch is a pure function of (keys, weights, salt) via 32-bit md5
prefixes and exactly-representable float64 arithmetic, so an
independent hashlib+floats reimplementation must reproduce the Spark
result bit-for-bit on arbitrary inputs. Any divergence — hash
construction, tie handling, the tau boundary, the k-th-value
estimator — fails the property.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkmerce_spark.operators.sampling import priority_sample
from linkmerce_spark.operators.sketches import kmv_estimates, kmv_sketch

SPACE = 4294967296.0


def _h32(salt: str, key) -> int:
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)


_keys = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=0, max_size=40, unique=True
)
_weights = st.integers(min_value=1, max_value=100_000)


class TestPrioritySampleProperty:
    @settings(
        max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(keys=_keys, wseed=st.integers(min_value=1, max_value=9999), n=st.integers(min_value=1, max_value=12))
    def test_matches_pure_python_reference(self, spark, keys, wseed, n):
        rows = [(k, (k * wseed) % 997 + 1) for k in keys]
        # pure-Python DLT reference
        pri = {k: (w * SPACE) / (_h32("t", k) + 1) for k, w in rows}
        order = sorted(rows, key=lambda r: (-pri[r[0]], str(r[0])))
        top = order[: n + 1]
        if len(top) > n:
            tau = min(pri[k] for k, _ in top)
            expect = {k: max(float(w), tau) for k, w in top if pri[k] > tau}
        else:
            expect = {k: float(w) for k, w in top}

        df = spark.createDataFrame(rows or [(None, None)], "id long, w long")
        if not rows:
            df = df.filter("id IS NOT NULL")
        got = {
            r["id"]: r["w_hat"]
            for r in priority_sample(df, "w", "id", n, salt="t").collect()
        }
        assert got == expect


class TestKmvSketchProperty:
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(keys=_keys, k=st.integers(min_value=2, max_value=16))
    def test_sketch_and_estimate_match_pure_python(self, spark, keys, k):
        # pure-Python reference: k smallest 32-bit hashes of distinct keys
        hashes = sorted(_h32("kmv", key) for key in keys)
        expect_sketch = hashes[:k]
        if len(keys) < k:
            expect_est = float(len(keys))
        else:
            expect_est = (k - 1) * SPACE / expect_sketch[-1]

        df = spark.createDataFrame(
            [("g", key) for key in keys] or [(None, None)], "g string, k long"
        )
        if not keys:
            df = df.filter("g IS NOT NULL")
        sk = kmv_sketch(df, "g", "k", k=k)
        got_sketch = sorted(r["h"] for r in sk.collect())
        assert got_sketch == expect_sketch
        est = kmv_estimates(sk, k=k).collect()
        if keys:
            (row,) = est
            assert row["distinct_est"] == expect_est
        else:
            assert est == []
