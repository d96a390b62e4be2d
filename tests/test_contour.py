"""Marching squares: golden shapes, saddle resolution, closed loops."""

from collections import Counter

from pyspark.sql import Row

from imagery_utils_spark.operators.contour import contour_segments


def _segs(spark, cells, level=1):
    df = spark.createDataFrame(cells, "x long, y long, v long")
    return [(r.x1, r.y1, r.x2, r.y2)
            for r in contour_segments(df, level=level).collect()]


def _dense(vals):
    """vals[y][x] -> cell rows."""
    return [Row(x=x, y=y, v=v)
            for y, row in enumerate(vals) for x, v in enumerate(row)]


def test_single_hot_corner_golden(spark):
    # one above corner at (1,1) inside a 3x3 grid: 4 windows see it,
    # each singleton/triple case emits one segment -> a closed diamond
    vals = [[0, 0, 0], [0, 5, 0], [0, 0, 0]]
    segs = _segs(spark, _dense(vals))
    assert len(segs) == 4
    deg = Counter()
    for x1, y1, x2, y2 in segs:
        deg[(x1, y1)] += 1
        deg[(x2, y2)] += 1
    assert all(d == 2 for d in deg.values())  # one closed loop


def test_saddle_separates_aboves(spark):
    # diagonal aboves TL+BR in one window -> TWO segments, each hugging
    # its own above corner (the documented resolution)
    vals = [[5, 0], [0, 5]]
    segs = sorted(_segs(spark, _dense(vals)))
    assert len(segs) == 2
    assert segs == sorted([(0, 1, 1, 0), (1, 2, 2, 1)])


def test_interior_blob_is_closed_loop(spark):
    vals = [[0] * 5 for _ in range(5)]
    for x, y in [(1, 1), (2, 1), (1, 2), (2, 2), (3, 2)]:
        vals[y][x] = 9
    segs = _segs(spark, _dense(vals))
    deg = Counter()
    for x1, y1, x2, y2 in segs:
        deg[(x1, y1)] += 1
        deg[(x2, y2)] += 1
    # every vertex of an interior region boundary has degree exactly 2
    assert segs and all(d == 2 for d in deg.values())
