"""Validation rules (operators/validate.py), event-transition matrix
(operators/funnel.py), and numeric histograms (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.funnel import event_transitions
from pylluminator_spark.operators.profile import numeric_histogram
from pylluminator_spark.operators.validate import (
    in_range,
    in_set,
    matches,
    non_negative,
    not_null,
    positive,
    unique,
    validate,
)

SF = "/root/testdata/sf0.001"


class TestValidate:
    @pytest.fixture(scope="class")
    def df(self, spark):
        rows = [
            (1, "a@x.com", 10.0, "red"),
            (2, "b@y.org", -5.0, "blue"),
            (2, None, 200.0, "red"),
            (4, "not-an-email", 30.0, "green"),
            (5, "c@z.net", None, "mauve"),
        ]
        return spark.createDataFrame(rows, ["id", "email", "score", "color"])

    def test_report_shape_and_counts(self, df):
        report = validate(
            df,
            [
                not_null("email"),
                unique("id"),
                in_range("score", 0, 100),
                matches("email", r"[^@]+@[^@]+\.[a-z]+"),
                in_set("color", ["red", "blue", "green"]),
                non_negative("score"),
                positive("id"),
            ],
        )
        got = {r["rule"]: r for r in report.collect()}
        assert got["not_null(email)"]["n_violations"] == 1
        assert got["unique(id)"]["n_violations"] == 1  # id=2 twice
        assert got["in_range(score,0,100)"]["n_violations"] == 2  # -5, 200
        assert got["matches(email)"]["n_violations"] == 1
        assert got["in_set(color)"]["n_violations"] == 1  # mauve
        assert got["non_negative(score)"]["n_violations"] == 1
        assert got["positive(id)"]["n_violations"] == 0
        assert all(r["n_rows"] == 5 for r in got.values())
        assert got["positive(id)"]["passed"] is True
        assert got["unique(id)"]["passed"] is False

    def test_single_aggregation_pass(self, df):
        report = validate(df, [not_null("email"), in_range("score", 0, 100)])
        plan = report._jdf.queryExecution().executedPlan().toString()
        # one scan: the plan contains exactly one relation read
        assert plan.count("LocalTableScan") + plan.count("Scan ") <= 2

    def test_empty_rules_rejected(self, df):
        with pytest.raises(ValueError):
            validate(df, [])

    def test_all_pass_on_clean_table(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        report = validate(
            docs,
            [not_null("doc_id"), unique("doc_id"), non_negative("n_chars")],
        )
        assert all(r["passed"] for r in report.collect())


class TestTransitions:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            (1, 100, 1, "a"),
            (2, 200, 1, "b"),
            (3, 300, 1, "a"),
            (4, 100, 2, "a"),
            (5, 150, 2, "a"),
            (6, 500, 3, "c"),
        ]
        return spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )

    def test_counts(self, events):
        got = {
            (r["prev_type"], r["next_type"]): r["n_transitions"]
            for r in event_transitions(events).collect()
        }
        assert got == {
            ("<start>", "a"): 2,
            ("<start>", "c"): 1,
            ("a", "b"): 1,
            ("b", "a"): 1,
            ("a", "a"): 1,
        }

    def test_total_equals_rows(self, events):
        total = event_transitions(events).agg(
            F.sum("n_transitions").alias("s")
        ).collect()[0]["s"]
        assert total == events.count()

    def test_deterministic_on_ts_ties(self, spark):
        rows = [(2, 100, 1, "b"), (1, 100, 1, "a")]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {
            (r["prev_type"], r["next_type"])
            for r in event_transitions(ev).collect()
        }
        # equal ts: event_id breaks the tie -> a precedes b
        assert got == {("<start>", "a"), ("a", "b")}


class TestHistogram:
    def test_counts_and_edges(self, spark):
        df = spark.createDataFrame(
            [(float(v),) for v in range(100)], ["x"]
        )
        h = {
            r["bin"]: (r["lo_edge"], r["hi_edge"], r["n_rows"])
            for r in numeric_histogram(df, "x", bins=10, lo=0, hi=100).collect()
        }
        assert len(h) == 10
        assert all(n == 10 for _, _, n in h.values())
        assert h[0][0] == 0.0 and h[0][1] == 10.0
        assert h[9][1] == 100.0

    def test_auto_range_and_clamping(self, spark):
        df = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0]], ["x"])
        h = numeric_histogram(df, "x", bins=2)
        total = h.agg(F.sum("n_rows")).collect()[0][0]
        assert total == 3
        # hi value (3.0) clamps into the last bin, not a phantom bin 2
        assert h.filter(F.col("bin") >= 2).count() == 0

    def test_nulls_excluded_degenerate_range(self, spark):
        df = spark.createDataFrame([(5.0,), (5.0,), (None,)], ["x"])
        rows = numeric_histogram(df, "x", bins=4).collect()
        assert sum(r["n_rows"] for r in rows) == 2

    def test_bad_bins(self, spark):
        df = spark.createDataFrame([(1.0,)], ["x"])
        with pytest.raises(ValueError):
            numeric_histogram(df, "x", bins=0)


def test_references_rule(spark):
    from pylluminator_spark.operators.validate import not_null, references, validate

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    dims = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    out = {
        r.rule: (r.n_rows, r.n_violations, r.passed)
        for r in validate(
            facts, [not_null("fk"), references("fk", dims, "k")]
        ).collect()
    }
    # NULL fks are not fk violations (they fail not_null instead)
    assert out["references(fk)"] == (4, 1, False)
    assert out["not_null(fk)"] == (4, 1, False)


def test_references_only_rule_set(spark):
    from pylluminator_spark.operators.validate import references, validate

    facts = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    dims = spark.createDataFrame([(10,), (20,)], "k long")
    rows = validate(facts, [references("fk", dims, "k")]).collect()
    assert len(rows) == 1 and rows[0].passed


class TestKAnonymity:
    def test_class_counts_and_flags(self, spark):
        from pylluminator_spark.operators.validate import k_anonymity

        df = spark.createDataFrame(
            [("US", 30)] * 5 + [("US", 40)] * 2 + [("FR", 30)] * 3,
            "country string, age long",
        )
        got = {
            (r.country, r.age): (r.class_size, r.is_violation)
            for r in k_anonymity(df, ["country", "age"], k=4).collect()
        }
        assert got == {
            ("US", 30): (5, False),
            ("US", 40): (2, True),
            ("FR", 30): (3, True),
        }

    def test_summary_rollup(self, spark):
        from pylluminator_spark.operators.validate import (
            k_anonymity_summary,
        )

        df = spark.createDataFrame(
            [("US", 30)] * 5 + [("US", 40)] * 2 + [("FR", 30)] * 3,
            "country string, age long",
        )
        s = k_anonymity_summary(df, ["country", "age"], k=4).collect()[0]
        assert (
            s.n_classes,
            s.n_violating_classes,
            s.rows_at_risk,
            s.min_class_size,
        ) == (3, 2, 5, 2)

    def test_no_violations_at_k_one(self, spark):
        from pylluminator_spark.operators.validate import (
            k_anonymity,
            k_anonymity_summary,
        )

        df = spark.createDataFrame(
            [("A", 1), ("B", 2)], "g string, v long"
        )
        assert (
            k_anonymity(df, ["g"], k=1)
            .filter("is_violation").count() == 0
        )
        s = k_anonymity_summary(df, ["g"], k=1).collect()[0]
        assert s.n_violating_classes == 0 and s.rows_at_risk == 0
