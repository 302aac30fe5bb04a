"""Attribution models vs hand-computed references."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pylluminator_spark.operators.attribution import (
    last_touch,
    linear_attribution,
)

H = 3_600_000_000  # 1h in us


def _ts(i):
    return datetime(2024, 1, 1) + timedelta(hours=i)


ROWS = [
    # user 1: click -> view -> purchase; then stale click .. purchase
    (1, _ts(0), 1, "click"),
    (1, _ts(1), 2, "view"),
    (1, _ts(2), 3, "purchase"),
    (1, _ts(3), 4, "click"),
    (1, _ts(30), 5, "purchase"),   # 27h after click: stale at 24h lookback
    # user 2: organic purchase (no touches)
    (2, _ts(1), 6, "purchase"),
    # user 3: same-instant touch and purchase (touch sorts first)
    (3, _ts(5), 7, "view"),
    (3, _ts(5), 8, "purchase"),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_last_touch(spark, ev):
    out = {
        r.conversion_id: (r.touch_id, r.touch_type)
        for r in last_touch(
            ev,
            touch_types=["click", "view"],
            conversion_type="purchase",
            lookback_us=24 * H,
        ).collect()
    }
    assert out[3] == (2, "view")      # most recent touch wins
    assert out[5] == (None, None)     # outside lookback -> organic
    assert out[6] == (None, None)     # no touches at all
    assert out[8] == (7, "view")      # same instant counts


def test_linear_attribution(spark, ev):
    got = {
        r.touch_type: (r.n_conversions, r.credit_ppm)
        for r in linear_attribution(
            ev,
            touch_types=["click", "view"],
            conversion_type="purchase",
            lookback_us=24 * H,
        ).collect()
    }
    # conv 3 (user 1): touches {click@0, view@1} -> 500000 each
    # conv 5 (user 1): only click@3h within 24h? 30-3=27h -> outside; none
    # conv 8 (user 3): view@5 -> 1000000
    assert got["click"] == (1, 500_000)
    assert got["view"] == (2, 1_500_000)


def test_linear_remainder_dropped(spark):
    rows = [
        (1, _ts(0), 1, "click"), (1, _ts(1), 2, "click"),
        (1, _ts(2), 3, "click"), (1, _ts(3), 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = linear_attribution(
        df, touch_types=["click"], conversion_type="purchase",
        lookback_us=24 * H,
    ).collect()[0]
    assert out.credit_ppm == 3 * (1_000_000 // 3)  # 999999: floor division
