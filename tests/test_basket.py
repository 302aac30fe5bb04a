"""Market-basket rules vs a pure-python reference."""

from __future__ import annotations

import itertools
import random

import pytest

from pylluminator_spark.operators.basket import association_rules, item_pairs

BASKETS = {
    1: {"milk", "bread", "butter"},
    2: {"milk", "bread"},
    3: {"milk", "beer"},
    4: {"bread", "butter"},
    5: {"milk", "bread", "beer"},
}


def _rows():
    out = []
    for b, items in BASKETS.items():
        for i in items:
            out.append((b, i))
            out.append((b, i))  # duplicates must not inflate counts
    return out


@pytest.fixture(scope="module")
def bdf(spark):
    return spark.createDataFrame(_rows(), "basket long, item string")


def test_item_pairs_exact(spark, bdf):
    got = {
        (r.item_a, r.item_b): r.pair_count
        for r in item_pairs(bdf, "basket", "item").collect()
    }
    want = {}
    for items in BASKETS.values():
        for a, b in itertools.combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_association_rules_match_python(spark, bdf):
    out = association_rules(
        bdf, "basket", "item", min_pair_count=2
    ).collect()
    n = len(BASKETS)
    counts = {}
    for items in BASKETS.values():
        for i in items:
            counts[i] = counts.get(i, 0) + 1
    rules = {(r.antecedent, r.consequent): r for r in out}
    # milk&bread appear together in baskets 1,2,5
    r = rules[("milk", "bread")]
    assert r.pair_count == 3
    assert r.support == pytest.approx(3 / n, abs=1e-6)
    assert r.confidence == pytest.approx(3 / counts["milk"], abs=1e-6)
    assert r.lift == pytest.approx(
        3 * n / (counts["milk"] * counts["bread"]), abs=1e-6
    )
    # both directions present with the same pair_count
    assert rules[("bread", "milk")].pair_count == 3
    # min_pair_count prunes singletons (milk&beer appears twice: kept)
    assert ("milk", "beer") in rules
    assert ("butter", "beer") not in rules


def test_max_basket_size_guard(spark):
    rows = [(1, f"i{k}") for k in range(50)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = item_pairs(df, "basket", "item", max_basket_size=10).collect()
    assert {(r.item_a, r.item_b) for r in got} == {("a", "b")}
