"""Two-pass greedy cutline semantics (/root/reference/lib/mosaic.py:743-789)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.core.region import Region
from imagery_utils_spark.operators.cutline import (
    cutline_contributors,
    determine_contributors,
    intersect_manifest,
)


def R(x0, y0, x1, y1):
    return Region.from_rect(x0, y0, x1, y1)


TILE = R(0, 0, 100, 100)


def ids(contribs):
    return [s for s, _, _ in contribs]


def test_single_scene():
    out = determine_contributors([("a", 50.0, R(0, 0, 100, 100))], TILE, 10.0)
    assert ids(out) == ["a"]
    assert out[0][2].area() == 100 * 100


def test_covered_scene_dropped():
    scenes = [  # ascending score
        ("worse", 10.0, R(20, 20, 80, 80)),   # fully inside 'better'
        ("better", 90.0, R(0, 0, 100, 100)),
    ]
    out = determine_contributors(scenes, TILE, 10.0)
    assert ids(out) == ["better"]


def test_partial_overlap_keeps_both_highest_last():
    scenes = [
        ("low", 10.0, R(0, 0, 60, 100)),
        ("high", 90.0, R(40, 0, 100, 100)),
    ]
    out = determine_contributors(scenes, TILE, 10.0)
    # highest score last (paint order)
    assert ids(out) == ["low", "high"]
    by_id = {s: g for s, _, g in out}
    assert by_id["high"].area() == 60 * 100
    assert by_id["low"].area() == 40 * 100  # only the uncovered part


def test_threshold_rejects_sliver():
    scenes = [
        ("sliver", 10.0, R(0, 0, 100, 2)),      # 200 < 1000 threshold, covered corner
        ("main", 90.0, R(0, 0, 100, 100)),
    ]
    # sliver fully covered by main -> diff empty in pass 2 -> dropped
    out = determine_contributors(scenes, TILE, 1000.0)
    assert ids(out) == ["main"]


def test_gap_fill_second_pass_no_threshold():
    # sliver adds a strip below threshold that nothing else covers:
    # rejected in pass 1, accepted in pass 2 (lib/mosaic.py:774-785)
    scenes = [
        ("sliver", 10.0, R(0, 98, 100, 100)),   # area 200 < 1000
        ("main", 90.0, R(0, 0, 100, 98)),
    ]
    out = determine_contributors(scenes, TILE, 1000.0)
    assert set(ids(out)) == {"main", "sliver"}
    # second-pass accepts are appended before the final reverse, so the
    # gap-filler ends up FIRST after reversal (painted under everything)
    assert ids(out)[0] == "sliver"
    by_id = {s: g for s, _, g in out}
    assert by_id["sliver"].area() == pytest.approx(200.0)


def test_full_geometry_union_fold():
    # 'mid' contributes outside the tile-clipped part of 'top'; because 'top'
    # folded its FULL geometry (not the clip) into the union, 'mid' gains
    # nothing in that area (lib/mosaic.py:767)
    tile = R(0, 0, 100, 100)
    scenes = [
        ("mid", 50.0, R(80, 0, 120, 100)),   # overlaps top's out-of-tile part
        ("top", 90.0, R(0, 0, 150, 100)),    # extends past the tile
    ]
    out = determine_contributors(scenes, tile, 10.0)
    assert ids(out) == ["top"]  # mid's diff vs full top geom is empty in-tile


def test_order_dependence_on_score():
    # identical geoms: only the best-scoring one contributes
    g = R(0, 0, 100, 100)
    scenes = [("a", 10.0, g), ("b", 20.0, g), ("c", 30.0, g)]
    out = determine_contributors(scenes, TILE, 10.0)
    assert ids(out) == ["c"]


def test_spark_cutline_and_manifest(spark):
    # 2x2 tile grid over [0,200]^2, rect scenes -> per-tile contributor
    # counts, mirroring the reference's structural assertions
    # (/root/reference/tests/test_mosaic.py:45-55)
    tiles = [
        ("m_1_1", 0.0, 100.0, 0.0, 100.0),
        ("m_1_2", 100.0, 200.0, 0.0, 100.0),
        ("m_2_1", 0.0, 100.0, 100.0, 200.0),
        ("m_2_2", 100.0, 200.0, 100.0, 200.0),
    ]
    scenes = [
        # (scene_id, score, s_xmin, s_ymin, s_xmax, s_ymax)
        ("A", 90.0, 0.0, 0.0, 120.0, 120.0),     # strong, covers 1_1 + edges
        ("B", 80.0, 80.0, 0.0, 200.0, 100.0),    # right half bottom
        ("C", 70.0, 0.0, 80.0, 200.0, 200.0),    # top half
        ("D", 10.0, 0.0, 0.0, 50.0, 50.0),       # fully under A
    ]
    cand_rows = []
    for tname, x0, x1, y0, y1 in tiles:
        t = Region.from_rect(x0, y0, x1, y1)
        for sid, sc, sx0, sy0, sx1, sy1 in scenes:
            if t.intersects(Region.from_rect(sx0, sy0, sx1, sy1)):
                cand_rows.append((tname, x0, x1, y0, y1, sid, sc, sx0, sy0, sx1, sy1))
    cand = spark.createDataFrame(
        cand_rows,
        "tile_name string, xmin double, xmax double, ymin double, ymax double, "
        "scene_id string, score double, s_xmin double, s_ymin double, "
        "s_xmax double, s_ymax double",
    )
    out = cutline_contributors(cand, contribution_threshold=100.0)
    res = {r.tile_name: r for r in intersect_manifest(out).collect()}
    # expected via the pure-python core
    expected = {}
    for tname, x0, x1, y0, y1 in tiles:
        t = Region.from_rect(x0, y0, x1, y1)
        rows = sorted(
            [(sid, sc, Region.from_rect(sx0, sy0, sx1, sy1))
             for sid, sc, sx0, sy0, sx1, sy1 in scenes
             if t.intersects(Region.from_rect(sx0, sy0, sx1, sy1))],
            key=lambda r: (r[1], r[0]),
        )
        expected[tname] = [s for s, _, _ in determine_contributors(rows, t, 100.0)]
    for tname in expected:
        assert list(res[tname].scene_ids) == expected[tname], tname
    # structural sanity: D never contributes anywhere
    all_ids = {s for r in res.values() for s in r.scene_ids}
    assert "D" not in all_ids
    assert res["m_1_1"].n_contribs >= 1
