"""Rotation-staleness bridge (VERDICT r6 #5): with 163 oracle-bearing
entries and 50 driver gate slots per round, some entries inevitably miss
the rotation. This sweep re-verifies the DEFERRED TAIL — the
oracle-bearing entries outside the current 50 gated slots whose latest
green driver row is oldest — through the driver-faithful emulation, so
no entry ever goes a round without an independent re-verification:
entries either get a real driver row (slots 1-50) or an emu row (this
test) every round.

Opt-in (SPARK_GRAFT_SCALE=1) like test_gate_debut: spawns per-SF
vanilla-session emu subprocesses. The staleness tiers are computed from
the CORRECTNESS_r*.json artifacts, so the test tracks rounds
automatically — after the r7 gate lands, the oldest tier becomes the 13
r4-aged entries deferred from the r7 rotation (registry section 3).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="opt-in: set SPARK_GRAFT_SCALE=1 (spawns per-SF emu runs)",
)

REPO = Path(__file__).resolve().parent.parent


def _deferred_oldest_tier() -> list[str]:
    """Oracle-bearing entries beyond slot 50 whose latest green driver
    row is the oldest round present among deferred entries."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as em

    latest: dict[str, int] = {}
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)", Path(path).stem).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and (
                row.get("hash_match") or row.get("hash_match") is None
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    names = list(em.queries())
    deferred = [
        n for n in names[50:] if n in em.oracle_sql() and n in latest
    ]
    if not deferred:
        return []
    oldest = min(latest[n] for n in deferred)
    return sorted(n for n in deferred if latest[n] == oldest)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_deferred_tail_reverified_by_emu(sf_dir):
    tier = _deferred_oldest_tier()
    if not tier:
        pytest.skip("no deferred oracle-bearing entries")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tests" / "driver_emu.py"),
            sf_dir,
            *tier,
        ],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"emu failed for deferred tier {tier}:\n{out[-3000:]}"
    for name in tier:
        assert f"{name}: OK" in out, f"{name} not OK at {sf_dir}:\n{out[-3000:]}"
