#!/usr/bin/env python
"""Time each PipelineManifest stage + publish while running one query.

Usage: python tools/profile_curate.py <query> [sf_dir]
Prints per-stage wall seconds (fn build + publish write) and Spark job
counts, so curate-family optimization targets the stages that actually
cost time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pylluminator_spark.plans import manifest as man  # noqa: E402
from pylluminator_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile_curate")
    for t in ("documents", "lineitem", "orders"):
        entry_mod._t(spark, sf_dir, t).count()
    spark.range(1).write.format("noop").mode("overwrite").save()

    rows = []
    orig_stage = man.PipelineManifest.stage
    orig_pub = man.PipelineManifest._publish
    orig_frame = man.PipelineManifest.frame_source
    orig_cfp = man.content_fingerprint

    def stage(self, name, fn, inputs, params=None, code_version=None):
        t0 = time.perf_counter()
        ref = orig_stage(self, name, fn, inputs, params, code_version)
        rows.append((f"stage:{name}", time.perf_counter() - t0, ref.from_cache))
        return ref

    def _publish(self, df, out_dir):
        t0 = time.perf_counter()
        r = orig_pub(self, df, out_dir)
        rows.append(("  publish", time.perf_counter() - t0, None))
        return r

    def frame_source(self, name, df, fingerprint=None, meta=None, meta_fn=None):
        t0 = time.perf_counter()
        ref = orig_frame(self, name, df, fingerprint, meta, meta_fn)
        rows.append((f"frame_source:{name}", time.perf_counter() - t0, ref.from_cache))
        return ref

    def content_fingerprint(df, **kw):
        t0 = time.perf_counter()
        r = orig_cfp(df, **kw)
        rows.append(("content_fingerprint", time.perf_counter() - t0, None))
        return r

    man.PipelineManifest.stage = stage
    man.PipelineManifest._publish = _publish
    man.PipelineManifest.frame_source = frame_source
    man.content_fingerprint = content_fingerprint
    # curate.py imported content_fingerprint by name in some scopes
    import pylluminator_spark.operators.curate as cur_mod  # noqa: F401

    qs = entry_mod.queries()
    for rep in range(2):
        rows.clear()
        t0 = time.perf_counter()
        df = qs[qname](spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        print(
            f"\n=== {qname} rep{rep}: build {t_build:.3f}s"
            f" + exec {t_exec:.3f}s ==="
        )
        total_staged = 0.0
        for name, sec, cached in rows:
            tag = "" if cached is None else (" CACHE" if cached else "")
            print(f"  {sec:7.3f}s  {name}{tag}")
            if not name.startswith("  "):
                total_staged += sec
        print(f"  staged total: {total_staged:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
