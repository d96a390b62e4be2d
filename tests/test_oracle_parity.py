"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and values (exact for ints/strings/timestamps,
bitwise for floats — the determinism policy in __spark_entry__)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
# the VALUES-literal oracles (independent_oracles.py) recompute from parquet
# at oracle-build time — point them at the same sf this test compares against
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def normalize(rows, columns):
    """Sort columns by name, then rows; floats kept exact."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [columns[i] for i in order]


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, like the driver
        return
    res = con.execute(ORACLES[name])
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    s_norm, cols = normalize(srows, scols)
    o_norm, _ = normalize(orows, ocols)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                print(f"{name} row {i} differs:\n  spark : {a}\n  oracle: {b}\n  cols: {cols}")
    assert n_bad == 0, f"{name}: {n_bad}/{len(s_norm)} rows differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3
