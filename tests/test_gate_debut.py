"""Pre-gate checklist (VERDICT r5 #3): every oracle-bearing entry that
has NEVER had a green driver row must pass the driver-faithful emulation
at sf0.01 AND sf0.1 BEFORE its gate debut. combat_stats proved why:
sf0.001-only pytest parity misses rounding-boundary float
nondeterminism that only appears once row counts grow (it was green at
sf0.001 and red at sf0.01/sf0.1).

Opt-in (SPARK_GRAFT_SCALE=1) because each entry spins a vanilla
SparkSession subprocess; run it whenever the registry gains entries or
the gate rotation changes. The debut set is computed from the
CORRECTNESS_r*.json artifacts, so the test automatically tracks rounds.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="opt-in: set SPARK_GRAFT_SCALE=1 (spawns per-entry emu runs)",
)

REPO = Path(__file__).resolve().parent.parent


def _debut_entries() -> list[str]:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as em

    green: set[str] = set()
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and (
                row.get("hash_match") or row.get("hash_match") is None
            ):
                green.add(name)
    return sorted(
        (set(em.queries()) & set(em.oracle_sql())) - green
    )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_never_gated_entries_pass_emu(sf_dir):
    debut = _debut_entries()
    if not debut:
        pytest.skip("no never-gated oracle-bearing entries")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tests" / "driver_emu.py"),
            sf_dir,
            *debut,
        ],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"emu failed for debut set {debut}:\n{out[-3000:]}"
    for name in debut:
        assert f"{name}: OK" in out, f"{name} not OK at {sf_dir}:\n{out[-3000:]}"
