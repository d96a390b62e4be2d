"""foreachBatch upsert: idempotence, latest-wins, staging atomicity."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from imagery_utils_spark.streaming.events import apply_upsert_batch


def _state(spark, state_dir):
    return {(r.key): (r.version, r.sig)
            for r in spark.read.parquet(state_dir).collect()}


def test_upsert_latest_wins_and_idempotent(spark, tmp_path):
    state = os.path.join(str(tmp_path), "state")
    b1 = spark.createDataFrame([Row(key=1, version=1, sig="a"),
                                Row(key=2, version=1, sig="b")])
    b2 = spark.createDataFrame([Row(key=2, version=2, sig="b2"),
                                Row(key=3, version=1, sig="c")])
    apply_upsert_batch(spark, b1, state)
    apply_upsert_batch(spark, b2, state)
    expect = {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}
    assert _state(spark, state) == expect
    # replay both batches in any order: state must not move
    apply_upsert_batch(spark, b2, state)
    apply_upsert_batch(spark, b1, state)
    assert _state(spark, state) == expect
    # no staging/old leftovers after the swap
    assert not os.path.exists(state + ".staging")
    assert not os.path.exists(state + ".old")


def test_upsert_out_of_order_versions(spark, tmp_path):
    state = os.path.join(str(tmp_path), "s2")
    newer = spark.createDataFrame([Row(key=7, version=5, sig="new")])
    older = spark.createDataFrame([Row(key=7, version=2, sig="old")])
    apply_upsert_batch(spark, newer, state)
    apply_upsert_batch(spark, older, state)  # late arrival loses
    assert _state(spark, state) == {7: (5, "new")}
