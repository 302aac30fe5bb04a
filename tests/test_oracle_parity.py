"""Local emulation of the driver's DuckDB-oracle correctness gate.

For every entry in ``queries()`` with a matching ``oracle_sql()``, run the
Spark query and the DuckDB SQL on the same parquet tables and compare
row-counts, column names, and (order-insensitively) exact values. This is
deliberately *exact* — the driver hashes values, so approximate agreement is
not enough.
"""

from __future__ import annotations

import math

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0
        return v + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_to_multiset(rows):
    return sorted(
        (tuple(_canon(v) for v in row) for row in rows),
        key=lambda r: tuple(str(x) for x in r),
    )


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.fixture(scope="module")
def duck_con():
    con = _duck(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck_con, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    res = duck_con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    # align duck column order to spark's
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(row[i] for i in idx) for row in duck_rows]

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_set, d_set = _rows_to_multiset(spark_rows), _rows_to_multiset(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_entry_driver_smoke(spark):
    """The driver's t1 smoke contract: entry(spark) runs, yields >=0 rows
    with a stable schema, and returns an uncollected DataFrame."""
    df = entry_mod.entry(spark)
    assert df.schema.simpleString() == (
        "struct<sample:string,n_probes:bigint,mean_beta:double,"
        "n_hypo:bigint,n_hyper:bigint>"
    )
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["n_probes"] > 0 for r in rows)


def test_vanilla_session_events_queries():
    """VERDICT r1 #1 regression: the driver passes its OWN SparkSession with
    none of get_spark's confs, and events.parquet (TIMESTAMP NANOS) must
    still load and hash-match. Runs the driver-emulating harness in a
    subprocess so the session really is vanilla (same-JVM getOrCreate would
    inherit this suite's confs)."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable,
            str(repo / "tests" / "driver_emu.py"),
            "/root/testdata/sf0.001",
            "sessionize",
            "event_windows",
            "moving_avg_time",
            "asof_join",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env={**__import__("os").environ, "PYTHONPATH": str(repo)},
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
