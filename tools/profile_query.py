#!/usr/bin/env python
"""Ad-hoc per-query profiler for the optimization rounds.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--plan-dir DIR] q1 q2 ...

Times each named query with the noop sink (same methodology as bench.py:
warm tables first, min over N runs) and optionally writes the
``explain("formatted")`` output to <plan-dir>/<query>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pylluminator_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--no-time", action="store_true", help="only dump plans")
    ap.add_argument(
        "--final-plan", action="store_true",
        help="execute via collect() and dump the FINAL adaptive plan",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile_query")
    qs = entry_mod.queries()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        entry_mod._t(spark, args.sf, t).count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").count()
    spark.range(1).write.format("noop").mode("overwrite").save()

    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        fn = qs[name]
        if args.plan_dir:
            df = fn(spark, args.sf)
            if args.final_plan:
                df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        if args.no_time:
            print(f"{name}: plan dumped")
            continue
        best = None
        njobs = 0
        for i in range(args.runs):
            group = f"{name}-r{i}"
            spark.sparkContext.setJobGroup(group, f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            njobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
            best = el if best is None else min(best, el)
            print(f"  {name} run{i}: {el:.3f}s ({njobs} jobs)")
        print(f"{name}: min {best:.3f}s over {args.runs} runs, {njobs} jobs/run")
    spark.stop()


if __name__ == "__main__":
    main()
