#!/usr/bin/env python
"""Battery-wide partitioning-invariance sweep.

Runs EVERY __spark_entry__.queries() entry twice — local[8] with
spark.sql.shuffle.partitions=7 and =32 — on the same input and compares
a sha of the sorted stringified rows. The determinism contract the
battery documents row-by-row (integer algebra, order-independent
merges, deterministic tie-breaks) predicts ZERO mismatches; this script
checks the whole battery at once rather than trusting 136 individual
arguments.

    PYTHONPATH=. python invariance_sweep.py [sf_dir]

Result from round 5 (2026-08-18, battery 135): 135/135 identical.
The one mismatch the first run surfaced was not a determinism bug but a
session-lifecycle one — q_jaccard_pairs' cached shingle frame from a
stopped SparkContext blew up its unpersist in the second session —
fixed with a guarded release (see the commit referencing this script).
"""

from __future__ import annotations

import hashlib
import sys


def run_all(parts: int, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    import __spark_entry__ as e

    out = {}
    for name, fn in e.queries().items():
        try:
            df = fn(spark, sf_dir)
            rows = sorted(tuple(str(x) for x in r) for r in df.collect())
            out[name] = hashlib.sha256(repr(rows).encode()).hexdigest()
        except Exception as ex:  # noqa: BLE001 - report, don't abort
            out[name] = f"ERR:{ex}"[:120]
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    a = run_all(7, sf_dir)
    b = run_all(32, sf_dir)
    mism = sorted(k for k in a if a[k] != b[k])
    errs = sorted(k for k in a if str(a[k]).startswith("ERR"))
    print({"queries": len(a), "mismatches": mism, "errors": errs})
    return 1 if (mism or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
