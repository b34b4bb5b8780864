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


# Round-7: the reference's rounding edge allows negative fees via ABS
# ordering (dbt_postgres/.../smartstore__sales_daily.sql:170-216), so
# the conservation law must also hold for all-zero, all-negative, and
# mixed-sign weight groups with negative totals — and the expression
# must be ENGINE-EXACT (DuckDB re-derivation agrees per row), not just
# sum-conserving.
_signed_weights = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=8
)
_signed_totals = st.integers(min_value=-10_000_000, max_value=10_000_000)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=_signed_weights, total=_signed_totals)
def test_proportional_allocation_signed_edges_engine_exact(spark, ws, total):
    import duckdb

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
    got = {r["seq"]: r["share"] for r in out.collect()}
    # conservation under every sign mix, including wsum == 0 exactly
    assert sum(got.values()) == total

    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, seq INT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    oracle = con.execute(f"""
        WITH b AS (
          SELECT grp, seq, CAST(COALESCE(w, 0) AS DECIMAL(18,6)) AS wx,
                 CAST({total} AS BIGINT) AS total
          FROM t
        ), s AS (
          SELECT *, SUM(wx) OVER (PARTITION BY grp) AS wsum FROM b
        ), r AS (
          SELECT *,
            CAST(CASE WHEN wsum = 0 THEN 0.0
                 ELSE FLOOR(CAST(total AS DOUBLE) * CAST(wx AS DOUBLE)
                            / CAST(wsum AS DOUBLE) + 0.5)
                 END AS DECIMAL(18,0)) AS sh,
            ROW_NUMBER() OVER (PARTITION BY grp ORDER BY seq) AS rn
          FROM s
        )
        SELECT seq,
          CASE WHEN rn = 1
               THEN sh + (CAST(total AS DECIMAL(18,0))
                          - SUM(sh) OVER (PARTITION BY grp))
               ELSE sh END AS share
        FROM r
    """).fetchall()
    want = {seq: share for seq, share in oracle}
    assert {k: float(v) for k, v in got.items()} == {
        k: float(v) for k, v in want.items()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(min_value=1, max_value=9),
       total=st.integers(min_value=-10_000_000, max_value=10_000_000))
def test_integer_even_split_negative_totals_conserve(spark, n, total):
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
    assert shares[-1] - shares[0] <= 1
