"""Genomic coordinate helpers as column expressions.

Reference citations (/root/reference):
- ``merge_alt_chromosomes``: utils.py:261-305 — collapse alt contigs
  (``22_KI270928V1_ALT`` -> ``22``), unknowns -> ``*``.
- ``get_chromosome_number``: utils.py:308-354 — natural sort order with
  X -> 98, Y -> 99, other strings -> 100.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def merge_alt_chromosomes_expr(chrom: Column) -> Column:
    """Normalize a chromosome name: strip 'chr', collapse alt contigs to the
    base chromosome, map unknown/zero to '*' (reference utils.py:261-305)."""
    trimmed = F.regexp_replace(F.lower(chrom.cast("string")), "chr", "")
    first_part = F.split(trimmed, "_").getItem(0)
    is_digit = first_part.rlike("^[0-9]+$")
    return (
        F.when(chrom.isNull(), F.lit("*"))
        .when(is_digit & (first_part.cast("int") == 0), F.lit("*"))
        .when(is_digit, first_part.cast("int").cast("string"))
        .when(first_part.isin("x", "y", "*"), first_part)
        .otherwise(F.lit("*"))
    )


def chromosome_order_expr(chrom: Column) -> Column:
    """Integer sort key for natural chromosome ordering
    (reference utils.py:308-354 with convert_string=True):
    '1'..'22' -> 1..22, X -> 98, Y -> 99, anything else -> 100."""
    trimmed = F.regexp_replace(F.lower(chrom.cast("string")), "chr", "")
    return (
        F.when(chrom.isNull(), F.lit(100))
        .when(trimmed.rlike("^[0-9]+$"), trimmed.cast("int"))
        .when(trimmed == "x", F.lit(98))
        .when(trimmed == "y", F.lit(99))
        .otherwise(F.lit(100))
    )
