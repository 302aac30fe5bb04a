"""Funnel operator: strict-order earliest-entry semantics vs a pure-python
reference, including same-timestamp non-advancement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.datasets import load_table
from pylluminator_spark.operators.funnel import funnel_counts, funnel_user_steps

SF_DIR = "/root/testdata/sf0.001"
STEPS = ["signup", "view", "purchase"]


def _py_funnel(rows, steps):
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        times = [None] * len(steps)
        for ts, tp in evs:
            for i, s in enumerate(steps):
                if times[i] is None and tp == s and (
                    i == 0 or (times[i - 1] is not None and ts > times[i - 1])
                ):
                    times[i] = ts
                    break
        out[u] = times
    return out


@pytest.fixture(scope="module")
def ev(spark):
    return load_table(spark, SF_DIR, "events").cache()


def test_funnel_user_steps_match_python(spark, ev):
    rows = ev.select("user_id", "ts", "event_type").collect()
    want = _py_funnel(rows, STEPS)
    got = {r.user_id: r for r in funnel_user_steps(ev, STEPS).collect()}
    assert set(got) == set(want)
    for u, times in want.items():
        for i, s in enumerate(STEPS):
            assert getattr(got[u], f"t_{i + 1}_{s}") == times[i], (u, s)


def test_funnel_counts_monotone(spark, ev):
    counts = {r.step: r.n_users for r in funnel_counts(ev, STEPS).collect()}
    assert counts["signup"] >= counts["view"] >= counts["purchase"] > 0


def test_same_timestamp_does_not_advance(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "signup"),
        (1, t0, "view"),  # same instant: must NOT count as after signup
        (1, t0 + dt.timedelta(minutes=1), "view"),
        (2, t0, "view"),  # view before signup: never enters the funnel
        (2, t0 + dt.timedelta(minutes=1), "signup"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r.user_id: r for r in funnel_user_steps(df, ["signup", "view"]).collect()}
    assert got[1].t_1_signup == t0
    assert got[1].t_2_view == t0 + dt.timedelta(minutes=1)
    assert got[2].t_1_signup == t0 + dt.timedelta(minutes=1)
    assert got[2].t_2_view is None


def test_cohort_retention_matches_python(spark, ev):
    import datetime as dt

    from pylluminator_spark.operators.funnel import cohort_retention

    rows = ev.select("user_id", "ts").collect()

    def week(ts):
        d = ts.date() - dt.timedelta(days=ts.weekday())
        return dt.datetime(d.year, d.month, d.day)

    per = {(r.user_id, week(r.ts)) for r in rows}
    first = {}
    for u, w in per:
        if u not in first or w < first[u]:
            first[u] = w
    want = {}
    for u, w in per:
        off = (w - first[u]).days // 7
        if off <= 8:
            want.setdefault((first[u], off), set()).add(u)
    got = {
        (r.cohort, r.offset): r.n_users
        for r in cohort_retention(ev, period="week", max_offset=8).collect()
    }
    assert got == {k: len(v) for k, v in want.items()}
    # offset-0 count is the full cohort; retention never exceeds it
    for (c, off), n in got.items():
        assert n <= got[(c, 0)]
