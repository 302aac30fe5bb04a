"""Fuzzy string matching: edit-distance joins with lossless
deletion-neighborhood blocking (FastSS; Bocek et al. 2007, public).

Beyond-reference operator (driver north star): entity resolution and
near-duplicate key matching ("acme-corp" vs "acme_corp" after
normalization, OCR'd identifiers, typo'd SKUs) need a JOIN ON
levenshtein(a, b) <= d — which, written literally, is a cartesian product.
The scale-safe plan is candidate generation by blocking + cheap exact
verification:

    every string s emits its deletion neighborhood D_d(s) — s itself plus
    every variant with up to d characters deleted. Two strings within edit
    distance d ALWAYS share a neighborhood element (deleting the edited
    positions from both sides meets in the middle), so an equi-join on the
    variant key finds every true pair (no false negatives); false positives
    are removed by one JVM-codegen ``levenshtein`` call per candidate.

Cost: |s| + 1 keys per string at d = 1, O(|s|^2) at d = 2 — linear blowup,
one shuffle on the variant key, and the verify touches only candidate
pairs. No cartesian product at any scale; skew is bounded because variant
keys are near-unique for realistic vocabularies (a pathologically hot
variant would need many strings one deletion apart).

All stages are built-in expressions (transform/sequence/explode/
levenshtein) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column, max_dist: int = 1) -> Column:
    """Array of distinct strings reachable from ``col`` by deleting up to
    ``max_dist`` characters (including ``col`` itself). Supports d = 1, 2.

    Empty strings yield just themselves (``sequence(1, 0)`` is DESCENDING
    in Spark, not empty — the ``when`` guard dodges that trap).
    """
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")

    def one_deletions(c: Column) -> Column:
        L = F.length(c)
        dels = F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.concat(
                c.substr(F.lit(1), i - F.lit(1)), c.substr(i + F.lit(1), L)
            ),
        )
        return F.when(L >= 1, dels).otherwise(
            F.array().cast("array<string>")
        )

    d1 = F.array_union(F.array(col), one_deletions(col))
    if max_dist == 1:
        return d1
    d2 = F.flatten(
        F.transform(d1, lambda v: F.array_union(F.array(v), one_deletions(v)))
    )
    return F.array_distinct(d2)


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    *,
    max_dist: int = 1,
    out_left: str = "left_val",
    out_right: str = "right_val",
) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``col`` within edit
    distance ``max_dist`` (excluding identical pairs), canonicalized as
    ``out_left < out_right``, with the exact ``dist``.

    Plan: distinct -> explode deletion variants -> variant equi-join ->
    distinct candidate pairs -> levenshtein verify. One shuffle per stage,
    no cartesian.
    """
    vals = df.select(F.col(col).alias("_v")).where(
        F.col("_v").isNotNull()
    ).distinct()
    keyed = vals.select(
        "_v",
        F.explode(deletion_variants(F.col("_v"), max_dist)).alias("_k"),
    )
    a = keyed.select(F.col("_v").alias(out_left), F.col("_k").alias("_k"))
    b = keyed.select(F.col("_v").alias(out_right), F.col("_k").alias("_k"))
    cands = (
        a.join(b, "_k")
        .where(F.col(out_left) < F.col(out_right))
        .select(out_left, out_right)
        .distinct()
    )
    dist = F.levenshtein(F.col(out_left), F.col(out_right))
    return cands.withColumn("dist", dist).where(
        F.col("dist") <= max_dist
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_dist: int = 1,
) -> DataFrame:
    """Join ``left`` and ``right`` on ``levenshtein(left_col, right_col)
    <= max_dist`` without a cartesian product, via the shared deletion-
    neighborhood equi-join. Returns all left/right column pairs plus
    ``dist``; rows may repeat per matching partner (join semantics).

    Duplicate candidate pairs from multiple shared variants are collapsed
    on the string pair BEFORE re-attaching payload columns, keeping the
    verify stage and the payload join linear in true matches.
    """
    lv = left.select(F.col(left_col).alias("_lv")).where(
        F.col("_lv").isNotNull()
    ).distinct()
    rv = right.select(F.col(right_col).alias("_rv")).where(
        F.col("_rv").isNotNull()
    ).distinct()
    lk = lv.select(
        "_lv", F.explode(deletion_variants(F.col("_lv"), max_dist)).alias("_k")
    )
    rk = rv.select(
        "_rv", F.explode(deletion_variants(F.col("_rv"), max_dist)).alias("_k")
    )
    pairs = (
        lk.join(rk, "_k")
        .select("_lv", "_rv")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("_lv"), F.col("_rv")))
        .where(F.col("dist") <= max_dist)
    )
    out = (
        left.join(pairs, left[left_col] == pairs["_lv"])
        .join(right, pairs["_rv"] == right[right_col])
        .drop("_lv", "_rv")
    )
    return out
