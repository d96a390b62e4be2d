"""Stream-stream interval join: cross-micro-batch matches must come out
of the state store; drained result equals the batch join."""

import datetime as dt
import os

from pyspark.sql import functions as F

from imagery_utils_spark.streaming.events import (
    run_interval_join_to_memory,
    stream_interval_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows():
    # (event_id, ts, user_id, event_type, value, props)
    mk = lambda i, mins, u: (i, T0 + dt.timedelta(minutes=mins), u, "e", 0.0, "")
    views = [mk(0, 0, 1), mk(2, 0, 2), mk(4, 300, 1)]
    clicks = [mk(1, 30, 1),   # matches view 0 (same user, +30 min)
              mk(3, 30, 2),   # matches view 2
              mk(5, 310, 1),  # matches view 4 only (outside 2h of view 0)
              mk(7, 30, 3)]   # no view for user 3
    return views, clicks


def test_stream_join_crosses_batches(spark, tmp_path):
    views, clicks = _rows()
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    # view 0 lands in v-batch 1; its matching click 1 in c-batch 2 —
    # the match can only emit from buffered state
    spark.createDataFrame(views[:1], schema).coalesce(1) \
        .write.mode("append").parquet(vdir)
    spark.createDataFrame(views[1:], schema).coalesce(1) \
        .write.mode("append").parquet(vdir)
    spark.createDataFrame(clicks[2:], schema).coalesce(1) \
        .write.mode("append").parquet(cdir)
    spark.createDataFrame(clicks[:2], schema).coalesce(1) \
        .write.mode("append").parquet(cdir)
    got = sorted(tuple(r) for r in run_interval_join_to_memory(
        spark, vdir, cdir, "tsj_x", interval="2 hours").collect())
    assert got == [(0, 1), (2, 3), (4, 5)]
    # batch parity: identical expression on batch frames
    bv = spark.read.parquet(vdir)
    bc = spark.read.parquet(cdir)
    batch = sorted(tuple(r) for r in
                   stream_interval_join(bv, bc, interval="2 hours").collect())
    assert batch == got
    assert len(os.listdir(vdir)) >= 2  # really two source files
