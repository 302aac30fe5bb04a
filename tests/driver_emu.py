"""Emulate the driver's correctness gate more faithfully than
test_oracle_parity: vanilla SparkSession (no get_spark confs), pandas
transfer on both sides, column-name-sorted value hash — so DuckDB HUGEINT
-> float64 dtype drift shows up exactly as the driver sees it.

Usage: python tests/driver_emu.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

# running as `python tests/driver_emu.py` puts tests/ (not the repo root)
# on sys.path; __spark_entry__ lives at the root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("driver-emu")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as em

    qs, oracles = em.queries(), em.oracle_sql()
    names = sys.argv[2:] or list(qs)
    bad = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN queries()")
            bad += 1
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = norm(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERR {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if name not in oracles:
            print(f"{name}: rows={len(spdf)} (no oracle, rows-only)")
            continue
        odf = norm(con.execute(oracles[name]).fetch_df())
        rows_ok = len(spdf) == len(odf)
        cols_ok = list(spdf.columns) == list(odf.columns)
        h_ok = rows_ok and cols_ok and value_hash(spdf) == value_hash(odf)
        if rows_ok and cols_ok and h_ok:
            print(f"{name}: OK rows={len(spdf)}")
        else:
            bad += 1
            print(
                f"{name}: MISMATCH rows {len(spdf)}/{len(odf)}"
                f" cols_ok={cols_ok} hash_ok={h_ok}"
            )
            if cols_ok and rows_ok:
                for c in spdf.columns:
                    if str(spdf[c].dtype) != str(odf[c].dtype):
                        print(f"  dtype {c}: spark={spdf[c].dtype} oracle={odf[c].dtype}")
                    elif not spdf[c].astype(str).equals(odf[c].astype(str)):
                        ne = (spdf[c].astype(str) != odf[c].astype(str))
                        print(f"  values {c}: {int(ne.sum())} differing rows")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
