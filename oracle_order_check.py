#!/usr/bin/env python
"""Emitted-order oracle parity check — stricter than tests/test_oracle_parity
(which sorts rows): compares Spark's collected row ORDER and values against
the DuckDB oracle's emitted order, the way an order-sensitive hash would.

Usage: python oracle_order_check.py [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf
    import duckdb

    from imagery_utils_spark.session import get_spark

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="oracle-order-check")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs, orc = E.queries(), E.oracle_sql()
    failed = []
    for name in args.names:
        sdf = qs[name](spark, args.sf)
        srows = [tuple(canon(v) for v in r) for r in sdf.collect()]
        if name not in orc:
            print(f"{name}: no oracle ({len(srows)} rows)")
            continue
        res = con.execute(orc[name])
        orows = [tuple(canon(v) for v in r) for r in res.fetchall()]
        ocols = [d[0] for d in res.description]
        ok_cols = [c.lower() for c in sdf.columns] == [c.lower() for c in ocols]
        n_bad = sum(1 for a, b in zip(srows, orows) if a != b)
        ok = ok_cols and len(srows) == len(orows) and n_bad == 0
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"(rows {len(srows)}/{len(orows)}, order+value diffs {n_bad}, "
              f"cols_match {ok_cols})")
        if not ok:
            failed.append(name)
            shown = 0
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b and shown < 4:
                    print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
                    shown += 1
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
