"""Driver-contract guard for bench.py: one JSON line with the required
keys, runnable as a subprocess exactly the way the driver invokes it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_driver_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--only",
         "pricing_summary,sessionize_events"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, "exactly ONE JSON line required"
    d = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert set(d["queries"]) == {"pricing_summary", "sessionize_events"}
    assert all(t >= 0 for t in d["queries"].values())
    assert abs(d["value"] - sum(d["queries"].values())) < 0.01
