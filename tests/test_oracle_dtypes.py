"""Full-registry oracle dtype parity (VERDICT r3 #1).

The driver compares Spark and DuckDB results through pandas with a
``to_csv(float_format="%.10g")`` value hash, so a DuckDB HUGEINT column
(bare ``SUM`` over integers) arriving as float64 while Spark yields int64
hash-mismatches once values exceed 10 significant digits — even when the
numbers are identical.  This bug class recurred twice (r1 and r3); this
test makes the sweep mechanical over EVERY ``oracle_sql()`` entry, not
just the 50 the driver gates per round.

For each entry we execute the oracle in DuckDB at sf0.001 (cheap) and
read the Spark query's schema lazily (no job).  Rules per column:

* Spark integral  -> DuckDB dtype must be integral, or float64 only when
  the column actually contains NULLs (NULLs promote BOTH sides, so the
  driver sees float64 vs float64 — benign).
* Spark floating  -> DuckDB dtype must be floating (an int oracle column
  against a double Spark column survives %.10g only by accident).
* Column name sets must match exactly (driver sorts by name).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
FLOATING = (T.FloatType, T.DoubleType)

NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_dtypes_match_spark_schema(spark, duck_con, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)  # lazy — schema only
    schema = {f.name.lower(): f.dataType for f in sdf.schema.fields}

    odf = duck_con.execute(entry_mod.oracle_sql()[name]).fetch_df()
    duck_cols = {c.lower() for c in odf.columns}
    assert duck_cols == set(schema), (
        f"{name}: column sets differ — spark {sorted(schema)}"
        f" vs oracle {sorted(duck_cols)}"
    )

    problems = []
    for col in odf.columns:
        stype = schema[col.lower()]
        d = odf[col].dtype
        if isinstance(stype, INTEGRAL):
            if np.issubdtype(d, np.integer):
                continue
            if d == np.float64 and odf[col].isna().any():
                continue  # NULLs promote both sides to float64
            problems.append(
                f"{col}: spark {stype.simpleString()} vs duckdb {d}"
                " (bare SUM over ints returns HUGEINT->float64;"
                " CAST(... AS BIGINT) in the oracle)"
            )
        elif isinstance(stype, FLOATING):
            if not np.issubdtype(d, np.floating):
                problems.append(
                    f"{col}: spark {stype.simpleString()} vs duckdb {d}"
                    " (CAST the oracle column AS DOUBLE)"
                )
    assert not problems, f"{name}: {problems}"
