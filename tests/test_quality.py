"""dbt-style data-quality checks (operators/quality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkmerce_spark.operators.quality import (
    accepted_values,
    not_null,
    relationships,
    run_checks,
    unique,
)


def _report(checks):
    return {r.rule: r.n_violations for df in [run_checks(checks)] for r in df.collect()}


class TestQualityChecks:
    def test_all_rules_count_violations(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10), (1, "b", None), (2, "zz", 30), (None, "a", 40)],
            "k int, status string, ref int",
        )
        ref = spark.createDataFrame([(10,), (30,)], "id int")
        got = _report(
            [
                not_null(df, "k"),
                unique(df, "k"),
                accepted_values(df, "status", ["a", "b"]),
                relationships(df, "ref", ref, "id"),
            ]
        )
        assert got == {
            "not_null:k": 1,
            "unique:k": 1,  # two rows share k=1 -> 1 surplus row
            "accepted_values:status": 1,  # 'zz'
            "relationships:ref": 1,  # 40 has no referenced row
        }

    def test_clean_frame_reports_zeroes(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, status string")
        got = _report(
            [not_null(df, "k"), unique(df, "k"), accepted_values(df, "status", ["a", "b"])]
        )
        assert set(got.values()) == {0}

    def test_null_fk_not_an_orphan(self, spark):
        df = spark.createDataFrame([(None,), (5,)], "ref int")
        ref = spark.createDataFrame([(5,)], "id int")
        got = _report([relationships(df, "ref", ref, "id")])
        assert got["relationships:ref"] == 0
