#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from pylluminator_spark.plans.manifest import _fn_fingerprint  # noqa: E402
from pylluminator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pylluminator_spark_bench")

    qs = entry_mod.queries()
    # Warm the JVM, parquet footers (all tables), and the Python UDF worker
    # pool + Arrow path once, so per-query numbers measure the query, not
    # session startup.
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        entry_mod._t(spark, sf_dir, t).count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).count()
    # warm the noop sink's class loading so it isn't billed to query 1
    spark.range(1).write.format("noop").mode("overwrite").save()

    # Per-query time = MIN over repeated runs. Sub-second queries on a
    # shared 32-core box are dominated by scheduler/GC noise (observed
    # same-query spreads of 0.2 s vs 6 s across back-to-back runs);
    # min-of-k measures the query, not the neighbor's compile. The
    # SLOWEST queries are the ones anyone reads, so they get the MOST
    # repetitions (VERDICT r5 #5 — the old policy ran them exactly once,
    # which made round-over-round "regressions" indistinguishable from
    # drift): every query runs min-of-BENCH_RUNS (default 2), and any
    # query whose first run exceeds SLOW_ABOVE seconds (default 1.0) is
    # promoted to min-of-SLOW_RUNS (default 3).
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    slow_runs = max(
        runs, int(os.environ.get("SPARK_GRAFT_BENCH_SLOW_RUNS", "3"))
    )
    slow_above = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_ABOVE", "1.0"))
    def time_query(name, fn, timings, runs_used, errors):
        best: float | None = None
        budget = runs
        attempt = 0
        while attempt < budget:
            attempt += 1
            start = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # noop sink, NOT count(): Catalyst prunes projection-only
                # work out of a count plan (the optimized count plan for
                # pii_redact contains no regexp_replace at all — measured
                # 0.14 s benched vs 0.56 s real at sf0.1). The noop sink
                # evaluates every output column of the exact result plan
                # and discards the rows — what a real downstream consumer
                # pays, minus the write.
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — one bad query must
                # not zero out the whole benchmark record; and a flaky
                # REPEAT must not discard a valid first measurement
                if best is None:
                    errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
                break
            elapsed = time.perf_counter() - start
            if best is None and elapsed > slow_above:
                budget = slow_runs
            best = elapsed if best is None else min(best, elapsed)
        if best is not None:
            timings[name] = round(best, 4)
            # record the ACTUAL repetition count per query — slow queries
            # are promoted to min-of-slow_runs, and a consumer comparing
            # rounds must be able to tell min-of-1/2/3 numbers apart
            runs_used[name] = attempt

    timings: dict[str, float] = {}
    runs_used: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        time_query(name, fn, timings, runs_used, errors)
    total = round(sum(timings.values()), 4)

    # Engine-path twins, timed OUTSIDE the gated query set (separate JSON
    # key, not part of the baseline comparison): gate entries that
    # deliberately run a slower SQL-portable arithmetic so the DuckDB
    # oracle can replicate them bit-for-bit also get their PRODUCTION
    # variant timed, so the bench shows the number a real pipeline sees.
    # (VERDICT r6 #4: dsir_weights' headline seconds measure the
    # oracle-twin per-character polynomial hash; the engine path hashes
    # n-grams with xxhash64.)
    def _dsir_engine(spark, sf_dir):
        import pyspark.sql.functions as F

        from pylluminator_spark.operators.dsir import dsir_log_weights

        docs = entry_mod._t(spark, sf_dir, "documents")
        return dsir_log_weights(
            docs,
            docs.filter(F.col("lang") == "en"),
            buckets=256,
            alpha=1.0,
            arith=False,
            target_within=True,
        )

    def _langid_engine(spark, sf_dir):
        # production path: xxhash64 buckets + plain-SUM reduce (map-side
        # combine) — vs the gate's poly-hash + sorted-fold twin; fused
        # fit+classify (one gram pass, r9)
        from pylluminator_spark.operators.langid import (
            fit_classify_langid,
            langid_predict,
        )

        docs = entry_mod._t(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        return langid_predict(
            fit_classify_langid(docs, n=3, buckets=256, alpha=0.5)
        )

    def _doremi_engine(spark, sf_dir):
        # production path: plain-SUM per-domain reduction (bounded
        # state, map-side combine) — vs the gate's sorted-doc-fold twin
        import pyspark.sql.functions as F

        from pylluminator_spark.operators.doremi import (
            doremi_domain_weights,
        )

        docs = entry_mod._t(spark, sf_dir, "documents")
        ref = docs.filter(F.col("lang") == "en").select("doc_id", "text")
        return doremi_domain_weights(
            docs.select("doc_id", "source", "text"),
            ref,
            min_bigram_count=2,
            reference_within=True,
        )

    twin_timings: dict[str, float] = {}
    twin_runs: dict[str, int] = {}
    twins = {
        "dsir_weights_engine": _dsir_engine,
        "langid_predict_engine": _langid_engine,
        "doremi_weights_engine": _doremi_engine,
    }
    for name, fn in twins.items():
        time_query(name, fn, twin_timings, twin_runs, errors)
    # Per-query code fingerprint (manifest.py's code-object hash): the
    # min-merge below only reuses a prior run's minimum when the query
    # function is BYTE-IDENTICAL, so an implementation change
    # auto-resets that query's min instead of silently attributing the
    # old code's timing to the new code (r9 ADVICE / VERDICT #4). Scope
    # matches _fn_fingerprint's contract: the query function's own code
    # objects + defaults — a change inside a called package helper does
    # NOT alter the fingerprint, so SPARK_GRAFT_BENCH_FRESH=1 remains
    # the override for helper-level rewrites.
    fps = {name: _fn_fingerprint(fn) for name, fn in qs.items()}
    fps.update({name: _fn_fingerprint(fn) for name, fn in twins.items()})
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_fp": fps,
        "runs_per_query": runs,
        "slow_runs": slow_runs,
        "slow_above_sec": slow_above,
        "query_runs": runs_used,
        "engine_twins": twin_timings,
        **({"errors": errors} if errors else {}),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Print the SLIM contract line only (metric/value/unit/queries/sf,
    # plus errors when present). The driver captures a bounded stdout
    # tail; the r12 line carried 190 query names + 193 fingerprints +
    # per-query run counts and BENCH_r11's capture truncated the FRONT
    # of it, voiding the whole r12 round-over-round comparison
    # (PERF_r12 n_common=0 — VERDICT r12 #2). Fingerprints, run counts
    # and engine twins move to the side files below, which the repo
    # tracks whole.
    slim = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        **({"errors": errors} if errors else {}),
        "sf": payload["sf"],
    }
    print(json.dumps(slim))
    # The driver artifact truncates long stdout tails, which made r3/r4
    # cross-round comparisons lossy — persist the COMPLETE per-query dict
    # (fingerprints, run counts, twins) to a file too.
    line = json.dumps(payload)
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(here, "BENCH_LAST.json")
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # benchmarking must never fail on an unwritable side-file
    # The per-SF file is MIN-MERGED across the round's runs (VERDICT r8
    # #2: the tracked r8 record was the slowest of three same-code runs —
    # 106.2 s vs a 90.0 s rerun — so per-query diffs between rounds were
    # box-load noise). Each run updates BENCH_FULL_sf{sf}.json with the
    # per-query min over every run since the file was last reset; round
    # close copies the sf0.1 file to a tracked BENCH_FULL_r0N.json. The
    # merge keys on the CURRENT run's query set (renamed/removed queries
    # drop out) and each entry is fingerprint-guarded: a prior minimum
    # is only kept when the query function's code-object hash matches
    # the current one, so changing an implementation auto-resets that
    # query's min (legacy records without fingerprints never donate
    # mins). SPARK_GRAFT_BENCH_FRESH=1 still resets everything — use it
    # after rewriting a package-level helper the fingerprint can't see.
    # A quick sf0.001 iteration run never clobbers the round's sf0.1
    # record (that clobbering is how the r7 per-query map was lost).
    merged_path = os.path.join(here, f"BENCH_FULL_sf{sf}.json")
    merged = dict(payload)
    merged["merged_runs"] = 1
    if os.environ.get("SPARK_GRAFT_BENCH_FRESH", "") != "1":
        try:
            with open(merged_path) as fh:
                prev = json.loads(fh.readline())
            prev_fps = prev.get("query_fp") or {}
            for key in ("queries", "engine_twins"):
                prior = prev.get(key) or {}
                cur = merged.get(key) or {}
                for name, sec in cur.items():
                    if (
                        name in prior
                        and prior[name] < sec
                        and prev_fps.get(name) == fps.get(name)
                    ):
                        cur[name] = prior[name]
                        if key == "queries" and name in prev.get(
                            "query_runs", {}
                        ):
                            merged["query_runs"][name] = (
                                merged["query_runs"].get(name, 0)
                                + prev["query_runs"][name]
                            )
            merged["value"] = round(sum(merged["queries"].values()), 4)
            merged["merged_runs"] = int(prev.get("merged_runs", 1)) + 1
        except (OSError, ValueError, KeyError, TypeError):
            pass  # unreadable/legacy record -> start a fresh merge
    try:
        with open(merged_path, "w") as fh:
            fh.write(json.dumps(merged) + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
