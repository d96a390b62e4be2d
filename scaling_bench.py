#!/usr/bin/env python
"""Scaling-efficiency protocol (north rule, sandbox form).

Runs the flagship benchmark in two fresh JVMs — local[8] (N) and local[32]
(4N) — on the identical input, reports throughput at both and
efficiency = (pages_per_sec@4N / pages_per_sec@N) / 4. Target >= 0.8.

Usage: python scaling_bench.py [--replicate R] [--sf-dir DIR]
Writes/updates the measurement table in BENCH/SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_once(cpus: int, sf_dir: str, replicate: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_BENCH_FLAGSHIP_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=1000)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()

    r8 = run_once(8, args.sf_dir, args.replicate)
    r32 = run_once(32, args.sf_dir, args.replicate)
    eff = (r32["pages_per_sec"] / r8["pages_per_sec"]) / 4.0
    result = {
        "metric": "scaling efficiency N->4N (local[8] -> local[32])",
        "value": round(eff, 3),
        "unit": "ratio",
        "pages_in": r8["pages_in"],
        "pages_per_sec_n8": r8["pages_per_sec"],
        "pages_per_sec_n32": r32["pages_per_sec"],
        "wall_n8": r8["value"],
        "wall_n32": r32["value"],
        "sf": r8["sf"],
        "replicate": args.replicate,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.md"), "w") as f:
        f.write(
            "# Scaling efficiency (north-rule sandbox protocol)\n\n"
            "Same job, same input, two parallelism levels in fresh JVMs.\n\n"
            "| run | parallelism | pages in | wall (s) | pages/sec |\n"
            "|---|---|---|---|---|\n"
            f"| bench-N | local[8] | {r8['pages_in']} | {r8['value']} | {r8['pages_per_sec']} |\n"
            f"| bench-4N | local[32] | {r32['pages_in']} | {r32['value']} | {r32['pages_per_sec']} |\n\n"
            f"**Efficiency = ({r32['pages_per_sec']} / {r8['pages_per_sec']}) / 4 = "
            f"{eff:.3f}** (target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
