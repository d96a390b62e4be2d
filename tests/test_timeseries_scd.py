"""Unit tests: SCD2 interval build, gap-fill forward fill, k-core."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from imagery_utils_spark.operators.graph import kcore
from imagery_utils_spark.operators.scd import scd2_intervals
from imagery_utils_spark.operators.timeseries import gap_fill_daily


def test_scd2_collapses_consecutive_duplicates(spark):
    log = spark.createDataFrame(
        [Row(key=1, attr="a", ts=10, eid=1),
         Row(key=1, attr="a", ts=20, eid=2),   # unchanged -> collapsed
         Row(key=1, attr="b", ts=30, eid=3),
         Row(key=1, attr="b", ts=40, eid=4),   # unchanged -> collapsed
         Row(key=1, attr="a", ts=50, eid=5),   # back to a -> NEW interval
         Row(key=2, attr="x", ts=10, eid=6)])
    out = {(r.key, r.valid_from): (r.attr, r.valid_to, r.is_current)
           for r in scd2_intervals(log, "key", "attr", "ts", "eid").collect()}
    assert out == {
        (1, 10): ("a", 30, False),
        (1, 30): ("b", 50, False),
        (1, 50): ("a", None, True),
        (2, 10): ("x", None, True),
    }


def test_scd2_null_attr_and_ts_ties(spark):
    log = spark.createDataFrame(
        [Row(key=1, attr=None, ts=10, eid=1),
         Row(key=1, attr=None, ts=10, eid=2),  # NULL==NULL -> collapsed
         Row(key=1, attr="a", ts=10, eid=3)],  # tie broken by eid
        schema="key int, attr string, ts int, eid int")
    rows = sorted(scd2_intervals(log, "key", "attr", "ts", "eid").collect(),
                  key=lambda r: (r.valid_from, r.attr or ""))
    assert [(r.attr, r.valid_from, r.valid_to) for r in rows] == [
        (None, 10, 10), ("a", 10, None)]


def test_gap_fill_daily_forward_fill_and_leading_nulls(spark):
    obs = spark.createDataFrame(
        [Row(key=1, day=5, v=100), Row(key=1, day=8, v=200),
         Row(key=2, day=7, v=300)])
    out = {(r.key, r.day): (r.filled, r.is_gap)
           for r in gap_fill_daily(obs, "key", "day", "v").collect()}
    # global span is [5, 8] for every key
    assert out[(1, 5)] == (100, False)
    assert out[(1, 6)] == (100, True)
    assert out[(1, 7)] == (100, True)
    assert out[(1, 8)] == (200, False)
    # key 2 has no observation before day 7: filled stays NULL
    assert out[(2, 5)] == (None, True)
    assert out[(2, 6)] == (None, True)
    assert out[(2, 7)] == (300, False)
    assert out[(2, 8)] == (300, True)
    assert len(out) == 8


def test_kcore_peels_pendant_chain(spark):
    # triangle 1-2-3 (the 2-core) with a pendant chain 3-4-5 hanging off
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3),
         Row(src=3, dst=4), Row(src=4, dst=5)])
    out = {r.node: r.degree for r in kcore(edges, k=2, iters=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_whole_graph_survives_when_k_met(spark):
    # 4-clique: everyone has degree 3 >= k=3, nothing peels
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a in range(4) for b in range(a + 1, 4)])
    out = {r.node: r.degree for r in kcore(edges, k=3, iters=4).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_empty_result_when_too_sparse(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3)])
    assert kcore(edges, k=2, iters=2).count() == 0
