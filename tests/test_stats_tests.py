"""Association statistics vs pure-python/numpy references."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from pylluminator_spark.operators.stats_tests import (
    chi_square,
    crosstab_counts,
    entropy,
    mutual_information,
)


@pytest.fixture(scope="module")
def cat_df(spark):
    rng = random.Random(13)
    # dependent pair: y correlates with x
    rows = []
    for _ in range(5000):
        x = rng.choice("abcd")
        y = rng.choice("uv") if x in "ab" else rng.choice("uvw")
        rows.append((x, y))
    return spark.createDataFrame(rows, "x string, y string"), rows


def _cells(rows):
    c = {}
    for x, y in rows:
        c[(x, y)] = c.get((x, y), 0) + 1
    return c


def test_crosstab_counts(spark, cat_df):
    df, rows = cat_df
    got = {(r.x, r.y): r.n for r in crosstab_counts(df, "x", "y").collect()}
    assert got == _cells(rows)


def test_chi_square_matches_numpy(spark, cat_df):
    df, rows = cat_df
    c = _cells(rows)
    xs = sorted({x for x, _ in c})
    ys = sorted({y for _, y in c})
    obs = np.array([[c.get((x, y), 0) for y in ys] for x in xs], float)
    n = obs.sum()
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    want_chi2 = float(((obs - e) ** 2 / e)[obs + e > 0].sum())
    out = chi_square(df, "x", "y").collect()[0]
    assert out.n == int(n) and out.n_x == 4 and out.n_y == 3
    assert out.dof == 6
    assert out.chi2 == pytest.approx(want_chi2, abs=5e-6)
    want_v = math.sqrt(want_chi2 / (n * (min(4, 3) - 1)))
    assert out.cramers_v == pytest.approx(want_v, rel=1e-6)
    # the dependence is real and detected
    assert out.chi2 > 100


def test_chi_square_independent_near_zero(spark):
    rows = [(str(i % 4), str((i // 4) % 3)) for i in range(1200)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi_square(df, "x", "y").collect()[0]
    assert out.chi2 == pytest.approx(0.0, abs=1e-9)  # perfectly balanced


def test_entropy_matches_python(spark, cat_df):
    df, rows = cat_df
    counts = {}
    for x, _ in rows:
        counts[x] = counts.get(x, 0) + 1
    n = len(rows)
    want = -sum(c / n * math.log2(c / n) for c in counts.values())
    out = entropy(df, "x").collect()[0]
    assert out.n == n and out.n_classes == 4
    assert out.entropy == pytest.approx(want, abs=5e-7)


def test_entropy_degenerate_single_class(spark):
    df = spark.createDataFrame([("a",)] * 10, "x string")
    out = entropy(df, "x").collect()[0]
    assert out.entropy == 0.0 and out.n_classes == 1


def test_mutual_information_matches_python(spark, cat_df):
    df, rows = cat_df
    c = _cells(rows)
    n = len(rows)
    px, py = {}, {}
    for (x, y), k in c.items():
        px[x] = px.get(x, 0) + k
        py[y] = py.get(y, 0) + k
    want = sum(
        k / n * math.log2((k * n) / (px[x] * py[y]))
        for (x, y), k in c.items()
    )
    out = mutual_information(df, "x", "y").collect()[0]
    assert out.mi == pytest.approx(want, abs=5e-7)
    assert out.mi > 0.01  # dependence detected


def test_mutual_information_independent_zero(spark):
    rows = [(str(i % 4), str((i // 4) % 3)) for i in range(1200)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = mutual_information(df, "x", "y").collect()[0]
    assert out.mi == pytest.approx(0.0, abs=1e-9)


def test_psi_categorical_matches_python(spark):
    import math as m

    e_rows = [("a",)] * 500 + [("b",)] * 300 + [("c",)] * 200
    a_rows = [("a",)] * 300 + [("b",)] * 300 + [("d",)] * 400
    from pylluminator_spark.operators.stats_tests import psi_categorical

    e_df = spark.createDataFrame(e_rows, "x string")
    a_df = spark.createDataFrame(a_rows, "x string")
    out = psi_categorical(e_df, a_df, "x").collect()[0]
    cats = ["a", "b", "c", "d"]
    k, te, ta = len(cats), len(e_rows), len(a_rows)
    ec = {"a": 500, "b": 300, "c": 200}
    ac = {"a": 300, "b": 300, "d": 400}
    want = sum(
        (p - q) * m.log(p / q)
        for c in cats
        for p, q in [(
            (ec.get(c, 0) + 0.5) / (te + 0.5 * k),
            (ac.get(c, 0) + 0.5) / (ta + 0.5 * k),
        )]
    )
    assert out.n_expected == te and out.n_actual == ta
    assert out.n_categories == 4
    assert out.psi == pytest.approx(want, abs=5e-7)
    assert out.psi > 0.25  # this shift is large by the standard rubric


def test_psi_identical_distributions_near_zero(spark):
    rows = [(str(i % 5),) for i in range(1000)]
    df = spark.createDataFrame(rows, "x string")
    from pylluminator_spark.operators.stats_tests import psi_categorical

    out = psi_categorical(df, df, "x").collect()[0]
    assert out.psi == pytest.approx(0.0, abs=1e-9)


def test_ab_test_matches_python(spark):
    import math as m
    import random

    rng = random.Random(31)
    rows = [("a", round(rng.gauss(10, 2), 2)) for _ in range(800)] + [
        ("b", round(rng.gauss(10.4, 2), 2)) for _ in range(700)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    from pylluminator_spark.operators.stats_tests import ab_test

    out = ab_test(df, "g", "v", "a", "b").collect()[0]
    ca = [round(v * 100) for g, v in rows if g == "a"]
    cb = [round(v * 100) for g, v in rows if g == "b"]

    def stats(c):
        n = len(c)
        s, q = sum(c), sum(x * x for x in c)
        return n, s / n / 100, (q - s * s / n) / (n - 1) / 10000

    na, ma, va = stats(ca)
    nb, mb, vb = stats(cb)
    se = m.sqrt(va / na + vb / nb)
    z = (ma - mb) / se
    p = m.erfc(abs(z) / m.sqrt(2))
    assert (out.n_a, out.n_b) == (na, nb)
    assert out.mean_a == pytest.approx(ma, abs=1.1e-6)
    assert out.se == pytest.approx(se, abs=1.1e-6)
    assert out.z == pytest.approx(z, abs=5e-6)
    # erfc polynomial |rel err| < 1.2e-7 vs libm erfc
    assert out.p_value == pytest.approx(p, rel=1e-5, abs=1e-6)
    # the 0.4-sigma shift on n~700 is detectable
    assert out.p_value < 0.05


def test_ab_test_tiny_group_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    from pylluminator_spark.operators.stats_tests import ab_test

    out = ab_test(df, "g", "v", "a", "b").collect()[0]
    assert out.n_a == 1 and out.p_value is None  # n<2 -> NULL, not error
