#!/usr/bin/env python
"""Build a synthetic large-SF replica for LOCAL optimization measurement
only (the driver generates its own sf1.0; this is a 10x key-offset
replication of sf0.1 that preserves join consistency and the duplication
structure that drives near-dup pair volume).  Never read by bench.py or
any query unless SPARK_GRAFT_SF_DIR points here explicitly."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/bigsf/sf1s"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key column -> id-space size at sf0.1 (offsets keep joins consistent)
OFFSETS = {
    "doc_id": 5000, "vec_id": 2000, "event_id": 100000, "user_id": 1000,
    "c_custkey": 15000, "o_custkey": 15000,
    "s_suppkey": 1000, "l_suppkey": 1000,
    "p_partkey": 20000, "l_partkey": 20000,
    "o_orderkey": 150000, "l_orderkey": 150000,
}
SMALL = {"region", "nation"}  # dimension tables: copy verbatim

os.makedirs(DST, exist_ok=True)
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    src = os.path.join(SRC, f"{t}.parquet")
    if not os.path.exists(src):
        continue
    tab = pq.read_table(src)
    if t in SMALL:
        pq.write_table(tab, os.path.join(DST, f"{t}.parquet"))
        print(t, tab.num_rows)
        continue
    chunks = []
    for c in range(COPIES):
        cols = []
        for name in tab.schema.names:
            col = tab.column(name)
            if name in OFFSETS and c > 0:
                col = pc.add(col, pa.scalar(c * OFFSETS[name],
                                            type=col.type))
            cols.append(col)
        chunks.append(pa.table(dict(zip(tab.schema.names, cols))))
    out = pa.concat_tables(chunks)
    pq.write_table(out, os.path.join(DST, f"{t}.parquet"))
    print(t, out.num_rows)
