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


def test_footprint_expected_hand_case():
    """Hand-computed staircase: group g occupies cells (gx,gy) in
    {(0,0),(1,0),(1,1)} at res=6 (cw=5.625, ch=2.8125). North->south scan:
    row gy=1 -> right edge (2, y1c), left edge (1, y1c); row gy=0 ->
    right edge (2, y0c), left edge (0, y0c); ring = top + reversed(bottom).
    pages_sql is a VALUES literal so the test needs no parquet."""
    cw, ch = 360.0 / 64, 180.0 / 64
    # points at cell centers of (0,0), (1,0), (1,1)
    pts = [
        ("g", -180.0 + 0.5 * cw, -90.0 + 0.5 * ch),
        ("g", -180.0 + 1.5 * cw, -90.0 + 0.5 * ch),
        ("g", -180.0 + 1.5 * cw, -90.0 + 1.5 * ch),
    ]
    vals = ", ".join(f"('{g}', {x!r}, {y!r})" for g, x, y in pts)
    sql = f"SELECT * FROM (VALUES {vals}) t(group_id, lon, lat)"
    rows = IO.footprint_expected("/root/testdata/sf0.001", sql, res=6)
    assert len(rows) == 1
    gid, wkt, n = rows[0]
    assert gid == "g" and n == 4
    y1c = -90.0 + 1 * ch + 0.5 * ch
    y0c = -90.0 + 0.5 * ch
    exp_ring = [
        (-180.0 + 2 * cw, y1c),  # top: right edge of row gy=1
        (-180.0 + 2 * cw, y0c),  # top: right edge of row gy=0
        (-180.0 + 0 * cw, y0c),  # bottom reversed: left edge gy=0
        (-180.0 + 1 * cw, y1c),  # bottom reversed: left edge gy=1
    ]
    body = ", ".join(f"{x:.16f} {y:.16f}" for x, y in exp_ring)
    first = f"{exp_ring[0][0]:.16f} {exp_ring[0][1]:.16f}"
    assert wkt == f"POLYGON (( {body}, {first} ))"


def test_manifest_expected_joins_cutline_rows(monkeypatch):
    monkeypatch.setattr(
        IO, "cutline_expected",
        lambda *a, **k: [("t1", "s9", 1), ("t1", "s2", 2), ("t2", "s5", 1)],
    )
    assert IO.manifest_expected("ignored", "ignored") == [
        ("t1", "s9\ns2"), ("t2", "s5"),
    ]


def test_dp_recursive_matches_engine_stack_dp():
    """The independent recursive DP and the engine's iterative-stack numpy DP
    must keep the identical vertex set on the dyadic battery fixture (and on
    a degenerate repeated-point polyline)."""
    import numpy as np

    from imagery_utils_spark.operators.footprint import _dp_simplify

    for gid in range(IO.SIMPLIFY_GROUPS):
        pts = [IO.simplify_fixture_point(gid, i) for i in range(IO.SIMPLIFY_PTS)]
        kept_engine = _dp_simplify(np.asarray(pts), IO.SIMPLIFY_TOL)
        kept_oracle = [pts[i] for i in IO._dp_recursive(pts, IO.SIMPLIFY_TOL)]
        assert [tuple(p) for p in kept_engine] == kept_oracle

    # zero-length base segment branch (first == last)
    loop = [(0.0, 0.0), (1.0, 2.0), (2.0, 0.25), (0.0, 0.0)]
    kept_engine = _dp_simplify(np.asarray(loop), 0.3)
    kept_oracle = [loop[i] for i in IO._dp_recursive(loop, 0.3)]
    assert [tuple(p) for p in kept_engine] == kept_oracle


def test_simplify_expected_keeps_endpoints_and_order():
    rows = IO.simplify_expected()
    by_gid = {}
    for gid, seq, x, y in rows:
        by_gid.setdefault(gid, []).append((seq, x, y))
    assert set(by_gid) == set(range(IO.SIMPLIFY_GROUPS))
    for gid, pts in by_gid.items():
        assert [s for s, _x, _y in pts] == list(range(len(pts)))
        assert pts[0][1] == 0.0 and pts[-1][1] == float(IO.SIMPLIFY_PTS - 1)
        assert 2 <= len(pts) < IO.SIMPLIFY_PTS  # non-trivial simplification


def test_wrap_exact_matches_engine_float_wrap():
    """Fraction-exact oracle wrap vs the engine's float wrap: identical
    parts, order, and bit-identical interpolated crossings on the
    power-of-two fixture."""
    import numpy as np

    from imagery_utils_spark.core.geom import wrap_geometry_180

    for gid in range(IO.WRAP_GROUPS):
        ring = IO.wrap_fixture_ring(gid)
        engine = [p.tolist() for p in wrap_geometry_180(np.asarray(ring))]
        oracle = [[list(pt) for pt in p] for p in IO._wrap_exact(ring)]
        assert engine == oracle
