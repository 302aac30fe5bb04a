"""Declarative data-quality validation (deequ/Great-Expectations-shaped).

Beyond-reference operator (driver north star): every production pipeline
brackets its stages with contract checks — null rates, uniqueness, value
ranges, format regexes, referential membership. The scale constraint is
that ALL checks over a table must come from ONE aggregation pass (a 100 TB
scan per rule is a non-starter), which is exactly how this module compiles
them: each rule becomes one conditional-count expression; the whole rule
set is a single ``agg`` with map-side partial combine. ``unique`` rules
need a distinct count and are folded into the same pass as
``count - countDistinct`` (exact; swap to approx at extreme cardinality).

Rules (all count VIOLATIONS, so 0 == pass):

- ``not_null(col)`` — NULL values
- ``unique(col)`` — rows beyond the first per value (NULLs ignored)
- ``in_range(col, lo, hi)`` — non-NULL values outside [lo, hi]
- ``matches(col, regex)`` — non-NULL values not fully matching
- ``in_set(col, values)`` — non-NULL values outside the allowed set
- ``non_negative(col)`` / ``positive(col)`` — sugar over in_range
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    kind: str
    violation_expr: Column | None  # None => handled specially (unique)
    ref_df: "DataFrame | None" = None  # fk rules: the referenced table
    ref_col: str | None = None

    def __repr__(self) -> str:  # stable in test output
        return f"Rule({self.name})"


def not_null(col: str) -> Rule:
    return Rule(
        f"not_null({col})", col, "not_null",
        F.col(col).isNull().cast("long"),
    )


def unique(col: str) -> Rule:
    return Rule(f"unique({col})", col, "unique", None)


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})", col, "in_range",
        (c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long"),
    )


def non_negative(col: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"non_negative({col})", col, "in_range",
        (c.isNotNull() & (c < 0)).cast("long"),
    )


def positive(col: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"positive({col})", col, "in_range",
        (c.isNotNull() & (c <= 0)).cast("long"),
    )


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"matches({col})", col, "matches",
        (c.isNotNull() & ~c.rlike(f"^(?:{pattern})$")).cast("long"),
    )


def in_set(col: str, values: Sequence) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_set({col})", col, "in_set",
        (c.isNotNull() & ~c.isin(list(values))).cast("long"),
    )


def references(col: str, ref_df: DataFrame, ref_col: str, *, name: str = "") -> Rule:
    """Referential-integrity rule: every non-NULL value of ``col`` must
    exist in ``ref_df[ref_col]``. Unlike the scan rules, each fk rule
    costs one broadcast/shuffle left join against the (distinct) key side
    — still one pass over the fact table per rule, never a collect."""
    return Rule(
        name or f"references({col})", col, "fk", None,
        ref_df=ref_df, ref_col=ref_col,
    )


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Run every scan rule in ONE aggregation pass (fk rules add one keyed
    join each). Returns the long report
    ``(rule, column, n_rows, n_violations, passed)``."""
    if not rules:
        raise ValueError("validate: empty rule set")
    fk_rules = [r for r in rules if r.kind == "fk"]
    rules = [r for r in rules if r.kind != "fk"]
    reports = []
    for r in fk_rules:
        keys = r.ref_df.select(
            F.col(r.ref_col).alias("_refkey")
        ).distinct()
        joined = df.join(
            keys, df[r.column] == keys["_refkey"], "left"
        )
        reports.append(
            joined.agg(
                F.lit(r.name).alias("rule"),
                F.lit(r.column).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (
                        F.col(r.column).isNotNull()
                        & F.col("_refkey").isNull()
                    ).cast("long")
                ).alias("n_violations"),
            ).withColumn("passed", F.col("n_violations") == 0)
        )
    if not rules:
        out = reports[0]
        for x in reports[1:]:
            out = out.unionByName(x)
        return out
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            aggs.append(
                (
                    F.count(F.col(r.column))
                    - F.countDistinct(F.col(r.column))
                ).alias(f"_v{i}")
            )
        else:
            aggs.append(F.sum(r.violation_expr).alias(f"_v{i}"))
    row = df.agg(*aggs)
    parts = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.lit(r.column).alias("column"),
            F.col("_n").alias("n_rows"),
            F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("long").alias(
                "n_violations"
            ),
        )
        for i, r in enumerate(rules)
    ]
    out = (
        row.select(F.explode(F.array(*parts)).alias("_r"))
        .select("_r.*")
        .withColumn("passed", F.col("n_violations") == 0)
    )
    for rep in reports:
        out = out.unionByName(rep)
    return out


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Per-equivalence-class k-anonymity report (Sweeney 2002): group by
    the quasi-identifier columns and flag every class smaller than ``k`` —
    the governance check a training-data release runs before shipping
    user-derived rows. Returns (quasi_cols..., class_size, is_violation),
    one row per equivalence class.

    One hash aggregate on the quasi-identifier key — map-side partials,
    no window, no join; the violation flag is a codegen comparison."""
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size")
    ).withColumn("is_violation", F.col("class_size") < k)


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """One-row rollup of ``k_anonymity``: total classes, violating classes,
    rows at risk (rows inside sub-k classes), and the minimum class size —
    the quantity k-anonymity is stated in terms of."""
    classes = k_anonymity(df, quasi_cols, k)
    viol = F.col("class_size") < k
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(viol.cast("int")).cast("long").alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("class_size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("class_size").alias("min_class_size"),
    )
