"""Bloom semi-join pre-filter: superset guarantee, FP-rate sanity,
fact-side plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkmerce_spark.operators.bloom import bloom_bitset, bloom_semi_filter


class TestBloomSemiFilter:
    def test_no_false_negatives(self, spark):
        big = spark.range(0, 5000).select((F.col("id") % 1000).alias("k"), "id")
        keys = spark.range(0, 1000, 7).select(F.col("id").alias("k"))
        out = bloom_semi_filter(big, keys, "k", num_bits=1 << 14)
        kept = {r.k for r in out.select("k").distinct().collect()}
        wanted = {r.k for r in keys.collect()}
        assert wanted <= kept  # every true member survives

    def test_false_positive_rate_bounded(self, spark):
        big = spark.range(0, 20000).select(F.col("id").alias("k"))
        keys = spark.range(0, 20000, 40).select(F.col("id").alias("k"))  # 500 keys
        out = bloom_semi_filter(big, keys, "k", num_bits=1 << 16, num_hashes=3)
        kept = out.count()
        # 500 true + FPs; with m=65536, n=500, k=3 the FP rate is ~1e-5
        assert 500 <= kept <= 600, kept

    def test_transparent_through_exact_join(self, spark):
        big = spark.range(0, 3000).select((F.col("id") % 400).alias("k"), "id")
        keys = spark.range(0, 400, 3).select(F.col("id").alias("k"))
        pre = bloom_semi_filter(big, keys, "k", num_bits=1 << 12)
        via_bloom = pre.join(keys, "k").count()
        plain = big.join(keys, "k").count()
        assert via_bloom == plain

    def test_bitset_is_one_broadcastable_row(self, spark):
        keys = spark.range(0, 100).select(F.col("id").alias("k"))
        bits = bloom_bitset(keys, "k", num_bits=1 << 12)
        rows = bits.collect()
        assert len(rows) == 1
        assert len(rows[0]["__bloom"]) <= (1 << 12) // 64

    def test_fact_side_not_shuffled(self, spark):
        big = spark.range(0, 1000).select(F.col("id").alias("k"))
        keys = spark.range(0, 100).select(F.col("id").alias("k"))
        out = bloom_semi_filter(big, keys, "k", num_bits=1 << 12)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the only exchanges belong to the bitset build (tiny, key-side)
        # + its broadcast; the big side must go scan -> filter.
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "__word" in line or "__pos" in line, line
