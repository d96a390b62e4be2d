"""Pins for the independent-implementation oracles (independent_oracles.py).

The module itself imports nothing from the engine; these tests are the one
place both implementations meet outside the driver's correctness gate."""

import numpy as np

import independent_oracles as IO


def test_simhash_matches_engine_udf(spark):
    """The independently-written simhash must equal the engine UDF bit-for-
    bit (same contract: FNV-1a over distinct lowercase tokens, bit votes)."""
    from imagery_utils_spark.operators.dedup import simhash_udf

    texts = ["the quick brown fox", "THE QUICK brown fox", "", "one",
             "a b c d e f g h", "pad pad pad unique token stream xyz"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r.i: r.fp for r in
           df.select("i", simhash_udf()(df.text).alias("fp")).collect()}
    for i, t in enumerate(texts):
        assert IO._simhash64(t) == got[i], t
    # case-insensitivity baked into both
    assert IO._simhash64(texts[0]) == IO._simhash64(texts[1])


def test_greedy_cutline_masks_two_pass():
    """Hand-computed two-pass case: high-score full cover first, a sliver
    rejected in pass 1 (area < threshold) returns in pass 2 only if it still
    adds uncovered geometry."""
    tile = (0.0, 0.0, 10.0, 10.0)
    scenes = [
        ("full", 9.0, (0.0, 0.0, 10.0, 10.0)),     # covers everything
        ("sliver", 5.0, (9.5, 9.5, 10.0, 10.0)),   # 0.25 deg^2 inside full
        ("edge", 7.0, (-5.0, 0.0, 2.0, 10.0)),     # 20 deg^2 new in tile? no:
        # processed AFTER full (score 7 < 9) -> diff outside full is lon<0,
        # which does not intersect the tile -> skipped entirely
    ]
    got = IO._greedy_cutline_masks(tile, scenes, threshold=1.0)
    # pass 1: full accepted; edge skipped (diff outside tile); sliver covered
    # by full already in pass 1 (diff empty) -> not even a sliver retry
    assert got == [("full", 9.0)]

    scenes2 = [
        ("big", 9.0, (0.0, 0.0, 6.0, 10.0)),      # left 60%
        ("small", 8.0, (6.0, 0.0, 6.5, 10.0)),    # 5 deg^2 strip
        ("tiny", 7.0, (6.5, 0.0, 6.6, 10.0)),     # 1 deg^2 exactly threshold
        ("dust", 6.0, (6.6, 0.0, 6.65, 10.0)),    # 0.5 deg^2 -> pass-2 fill
    ]
    got2 = IO._greedy_cutline_masks(tile, scenes2, threshold=2.0)
    # big (60) and small (5) pass; tiny (1 < 2) deferred, dust (0.5) deferred;
    # pass 2 in pass-1 order: tiny then dust, both still uncovered -> accepted
    # appended after, then the whole list reversed (highest score LAST)
    assert [s for s, _ in got2] == ["dust", "tiny", "small", "big"]


def test_cutline_values_sql_roundtrip():
    import duckdb

    sql = IO._values_sql([("t1", "a", 1), ("t1", "b", 2)],
                         "CAST(c0 AS VARCHAR) AS tile_name, "
                         "CAST(c1 AS VARCHAR) AS scene_id, "
                         "CAST(c2 AS INTEGER) AS paint_order",
                         "tile_name, paint_order")
    assert duckdb.sql(sql).fetchall() == [("t1", "a", 1), ("t1", "b", 2)]
    empty = IO._values_sql([], "CAST(c0 AS VARCHAR) AS a, CAST(c1 AS VARCHAR) "
                           "AS b, CAST(c2 AS INTEGER) AS c", "a")
    assert duckdb.sql(empty).fetchall() == []
    # string escaping: embedded single quote must round-trip (SQL '' doubling,
    # not Python repr backslash-escaping)
    quoted = IO._values_sql([("o'brien_tile", "it's", 7)],
                            "CAST(c0 AS VARCHAR) AS tile_name, "
                            "CAST(c1 AS VARCHAR) AS scene_id, "
                            "CAST(c2 AS INTEGER) AS paint_order",
                            "tile_name")
    assert duckdb.sql(quoted).fetchall() == [("o'brien_tile", "it's", 7)]


def test_popcount_matrix():
    x = np.array([0, 1, 3, (1 << 64) - 1], dtype=np.uint64)
    assert list(IO._popcount64_matrix(x)) == [0, 1, 2, 64]
