"""Imputation strategies vs hand-computed fills."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.impute import impute


@pytest.fixture(scope="module")
def idf(spark):
    rows = [
        ("a", 1.0, "x"), ("a", 3.0, "x"), ("a", None, "y"),
        ("a", None, None),
        ("b", 10.0, "z"), ("b", None, "z"), ("b", 20.0, None),
        ("c", None, None),  # group with nothing observed
    ]
    return spark.createDataFrame(rows, "g string, v double, s string")


def test_grouped_mean(spark, idf):
    out = impute(idf, {"v": "mean"}, group_cols=["g"]).collect()
    by = {}
    for r in out:
        by.setdefault(r.g, []).append((r.v, r.v_imputed))
    assert sorted(by["a"]) == [(1.0, False), (2.0, True), (2.0, True), (3.0, False)]
    assert sorted(by["b"]) == [(10.0, False), (15.0, True), (20.0, False)]
    assert by["c"] == [(None, False)]  # nothing to fill from


def test_global_median_and_mode(spark, idf):
    out = impute(idf, {"v": "median", "s": "mode"}).collect()
    vals = sorted(r.v for r in out)
    # global median of [1,3,10,20] = 6.5
    assert vals.count(6.5) == 4  # all four NULL v rows filled
    # mode of s: x and z tie at 2 -> smallest wins ('x')
    filled_s = [r.s for r in out if r.s_imputed]
    assert filled_s == ["x"] * 3


def test_constant(spark, idf):
    out = impute(idf, {"s": ("constant", "???")}).collect()
    assert sum(1 for r in out if r.s == "???") == 3


def test_unknown_strategy(spark, idf):
    with pytest.raises(ValueError):
        impute(idf, {"v": "banana"})


class TestWinsorize:
    def _df(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        rows = []
        for g in ("a", "b"):
            vals = rng.normal(0 if g == "a" else 100, 10, 200)
            rows += [(g, i, float(v)) for i, v in enumerate(vals)]
        rows.append(("a", 999, None))  # NULL passes through
        return rows, spark.createDataFrame(rows, ["g", "id", "v"])

    def test_matches_numpy_clip(self, spark):
        import numpy as np

        from pylluminator_spark.operators.impute import winsorize

        rows, df = self._df(spark)
        out = {
            (r["g"], r["id"]): r
            for r in winsorize(
                df, ["v"], group_cols=["g"], lower=0.05, upper=0.95
            ).collect()
        }
        for g in ("a", "b"):
            vals = np.array([r[2] for r in rows if r[0] == g and r[2] is not None])
            # numpy linear interpolation == Spark exact percentile
            lo, hi = np.percentile(vals, [5, 95])
            for r in rows:
                if r[0] != g or r[2] is None:
                    continue
                got = out[(g, r[1])]
                assert got["v"] == pytest.approx(min(max(r[2], lo), hi))
                assert got["v_winsorized"] == (r[2] < lo or r[2] > hi)

    def test_null_passthrough_and_flag(self, spark):
        from pylluminator_spark.operators.impute import winsorize

        _, df = self._df(spark)
        row = [
            r
            for r in winsorize(df, ["v"], group_cols=["g"]).collect()
            if r["id"] == 999
        ][0]
        assert row["v"] is None and row["v_winsorized"] is False

    def test_global_no_groups(self, spark):
        from pylluminator_spark.operators.impute import winsorize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(101)], ["id", "v"]
        )
        out = winsorize(df, ["v"], lower=0.1, upper=0.9, flag=False)
        vals = sorted(r["v"] for r in out.collect())
        assert vals[0] == 10.0 and vals[-1] == 90.0
        assert "v_winsorized" not in out.columns

    def test_null_group_key_rows_pass_through(self, spark):
        from pylluminator_spark.operators.impute import winsorize

        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
             (None, 3, 99.0), (None, 4, -5.0)],
            ["g", "id", "v"],
        )
        out = {r["id"]: r for r in
               winsorize(df, ["v"], group_cols=["g"]).collect()}
        assert len(out) == 5  # inner join would drop the NULL-key rows
        assert out[3]["v"] == 99.0 and out[3]["v_winsorized"] is False
        assert out[4]["v"] == -5.0 and out[4]["v_winsorized"] is False


class TestRobustZscore:
    def test_matches_numpy(self, spark):
        import numpy as np

        from pylluminator_spark.operators.impute import robust_zscore

        rng = np.random.default_rng(5)
        rows = []
        for g in ("a", "b"):
            vals = rng.normal(0 if g == "a" else 50, 5, 151)
            vals[0] = 1e6  # an outlier MAD must shrug off
            rows += [(g, i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, ["g", "id", "v"])
        out = {
            (r["g"], r["id"]): r["v_rz"]
            for r in robust_zscore(df, ["v"], group_cols=["g"]).collect()
        }
        for g in ("a", "b"):
            vals = np.array([r[2] for r in rows if r[0] == g])
            med = np.median(vals)
            mad = np.median(np.abs(vals - med))
            for r in rows:
                if r[0] != g:
                    continue
                exp = (r[2] - med) / (1.4826 * mad)
                assert out[(g, r[1])] == pytest.approx(exp, rel=1e-9)
        # the planted outlier scores huge, the bulk stays moderate
        assert abs(out[("a", 0)]) > 1000
        bulk = [v for (g, i), v in out.items() if g == "a" and i != 0]
        assert max(abs(v) for v in bulk) < 10

    def test_zero_mad_yields_null(self, spark):
        from pylluminator_spark.operators.impute import robust_zscore

        df = spark.createDataFrame(
            [("a", i, 7.0) for i in range(5)] + [("a", 99, 8.0)],
            ["g", "id", "v"],
        )
        out = robust_zscore(df, ["v"], group_cols=["g"]).collect()
        assert all(r["v_rz"] is None for r in out)  # MAD == 0

    def test_null_value_and_null_group(self, spark):
        from pylluminator_spark.operators.impute import robust_zscore

        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
             ("a", 3, None), (None, 4, 5.0)],
            ["g", "id", "v"],
        )
        out = {r["id"]: r for r in
               robust_zscore(df, ["v"], group_cols=["g"]).collect()}
        assert len(out) == 5
        assert out[3]["v_rz"] is None  # NULL value
        assert out[4]["v_rz"] is None  # NULL group key
        assert out[1]["v_rz"] == 0.0   # the median row
