"""Tier-2 structural parity with the reference test suite
(/root/reference/tests/test_mosaic.py:36-55): a 2x2 mosaic whose tiles get
exactly the golden per-tile contributor counts {1_1:2, 2_1:3, 1_2:2, 2_2:2},
with the reference's tile naming, produced end-to-end through the Spark
cutline operator."""

from pyspark.sql import functions as F

from imagery_utils_spark.core.region import Region
from imagery_utils_spark.operators import tile_grid
from imagery_utils_spark.operators.cutline import cutline_contributors, intersect_manifest

# (scene_id, score, (xmin, ymin, xmax, ymax)) — deterministic layout whose
# greedy two-pass selection yields the reference's golden count pattern
SCENES = [
    ("A", 90.0, (160.0, 60.0, 200.0, 100.0)),
    ("B", 80.0, (60.0, 80.0, 100.0, 180.0)),
    ("C", 70.0, (80.0, 100.0, 120.0, 200.0)),
    ("D", 60.0, (20.0, 60.0, 120.0, 200.0)),
    ("E", 50.0, (100.0, 120.0, 160.0, 200.0)),
]
GOLDEN_COUNTS = {"1_1": 2, "2_1": 3, "1_2": 2, "2_2": 2}
THRESHOLD = 400.0


def test_golden_tile_names():
    tiles = tile_grid.compute_tile_grid(0, 200, 0, 200, 100, 100, "testmosaic1", ".tif")
    assert sorted(t["name"] for t in tiles) == [
        "testmosaic1_1_1.tif", "testmosaic1_1_2.tif",
        "testmosaic1_2_1.tif", "testmosaic1_2_2.tif",
    ]


def test_golden_contributor_counts_spark(spark):
    tiles = tile_grid.compute_tile_grid(0, 200, 0, 200, 100, 100, "m")
    cand_rows = []
    for t in tiles:
        treg = Region.from_rect(t["xmin"], t["ymin"], t["xmax"], t["ymax"])
        for sid, score, (x0, y0, x1, y1) in SCENES:
            if treg.intersects(Region.from_rect(x0, y0, x1, y1)):
                cand_rows.append((
                    t["name"].replace("m_", ""), t["xmin"], t["xmax"],
                    t["ymin"], t["ymax"], sid, score, x0, y0, x1, y1,
                ))
    cand = spark.createDataFrame(
        cand_rows,
        "tile_name string, xmin double, xmax double, ymin double, ymax double, "
        "scene_id string, score double, s_xmin double, s_ymin double, "
        "s_xmax double, s_ymax double",
    )
    out = cutline_contributors(cand, contribution_threshold=THRESHOLD)
    got = {r.tile_name: r.n_contribs for r in intersect_manifest(out).collect()}
    assert got == GOLDEN_COUNTS
    # paint order: within each tile the highest score paints last
    per_tile = {}
    for r in out.collect():
        per_tile.setdefault(r.tile_name, []).append((r.paint_order, r.score))
    for tname, rows in per_tile.items():
        ordered = [s for _, s in sorted(rows)]
        assert ordered[-1] == max(ordered), tname


def test_golden_mosaic_output_files(spark, tmp_path):
    """Tier-2 file-existence parity (/root/reference/tests/test_mosaic.py:36-42):
    the golden 2x2 mosaic materializes one raster per tile with the
    reference's tile naming (testmosaic1_<row>_<col> + extension) plus a
    georeferencing sidecar, via cutline -> composite -> raster sink."""
    from imagery_utils_spark.operators.compose import composite
    from imagery_utils_spark.sources.sinks import write_raster_tiles

    tiles = tile_grid.compute_tile_grid(0, 200, 0, 200, 100, 100, "testmosaic1")
    cand_rows = []
    for t in tiles:
        treg = Region.from_rect(t["xmin"], t["ymin"], t["xmax"], t["ymax"])
        for sid, score, (x0, y0, x1, y1) in SCENES:
            if treg.intersects(Region.from_rect(x0, y0, x1, y1)):
                cand_rows.append((t["name"], t["xmin"], t["xmax"], t["ymin"],
                                  t["ymax"], sid, score, x0, y0, x1, y1))
    cand = spark.createDataFrame(
        cand_rows,
        "tile_name string, xmin double, xmax double, ymin double, ymax double, "
        "scene_id string, score double, s_xmin double, s_ymin double, "
        "s_xmax double, s_ymax double")
    contribs = cutline_contributors(cand, contribution_threshold=THRESHOLD)

    # 20x20 px tiles: pixel rows per (tile, contributing scene)
    W = H = 20
    scene_rects = {sid: r for sid, _s, r in SCENES}
    px = []
    for t in tiles:
        for sid, (x0, y0, x1, y1) in scene_rects.items():
            for pr in range(H):
                for pc in range(W):
                    lon = t["xmin"] + (pc + 0.5) * (t["xmax"] - t["xmin"]) / W
                    lat = t["ymax"] - (pr + 0.5) * (t["ymax"] - t["ymin"]) / H
                    if x0 <= lon <= x1 and y0 <= lat <= y1:
                        px.append((t["name"], sid, pr, pc, 100, 100, 100))
    pixels = spark.createDataFrame(
        px, "tile_name string, scene_id string, px_row int, px_col int, "
        "red int, green int, blue int")
    painted = pixels.join(
        contribs.select("tile_name", "scene_id", "paint_order"),
        ["tile_name", "scene_id"])
    win = composite(painted, ["tile_name", "px_row", "px_col"],
                    [F.desc("paint_order")])
    extents = spark.createDataFrame(
        [(t["name"], t["xmin"], t["ymin"], t["xmax"], t["ymax"]) for t in tiles],
        "tile_name string, xmin double, ymin double, xmax double, ymax double")
    manifest = write_raster_tiles(win.join(extents, "tile_name"),
                                  str(tmp_path), width=W, height=H).collect()
    import os

    expected = {f"testmosaic1_{r}_{c}" for r in (1, 2) for c in (1, 2)}
    assert {m.tile_name for m in manifest} == expected
    for name in expected:
        assert os.path.isfile(tmp_path / f"{name}.bmp"), name
        assert os.path.isfile(tmp_path / f"{name}.bmp.wld"), name
