import numpy as np

from imagery_utils_spark.core import cells


def test_lonlat_to_xy_edges():
    x, y = cells.lonlat_to_xy([-180.0, 0.0, 179.9999, 180.0], [-90.0, 0.0, 89.9999, 90.0], 4)
    assert list(x) == [0, 8, 15, 15]  # +180 clamps to last cell
    assert list(y) == [0, 8, 15, 15]


def test_linear_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 1, 7, 15):
        cell = cells.lonlat_to_linear(lon, lat, res)
        x, y = cells.linear_to_xy(cell, res)
        assert (cells.xy_to_linear(x, y, res) == cell).all()
        lon0, lat0, lon1, lat1 = cells.cell_bounds_linear(cell, res)
        assert (lon0 <= lon).all() and (lon < lon1).all()
        assert (lat0 <= lat).all() and (lat < lat1).all()


def test_morton_roundtrip_and_parent():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    m = cells.lonlat_to_morton(lon, lat, 12)
    x, y, res = cells.morton_decode(m)
    assert (res == 12).all()
    x2, y2 = cells.lonlat_to_xy(lon, lat, 12)
    assert (x == x2).all() and (y == y2).all()
    # parent consistency: morton parent == direct encode at res-2
    p = cells.morton_parent(m, 2)
    assert (p == cells.lonlat_to_morton(lon, lat, 10)).all()
    # linear parent matches too
    lin = cells.lonlat_to_linear(lon, lat, 12)
    assert (cells.linear_parent(lin, 12, 2) == cells.lonlat_to_linear(lon, lat, 10)).all()


def test_morton_prefix_locality():
    # children of one parent are contiguous in morton space
    m = cells.morton_encode(np.asarray([4]), np.asarray([6]), 3)[0]
    kids = []
    for dx in (0, 1):
        for dy in (0, 1):
            kids.append(cells.morton_encode(np.asarray([8 + dx]), np.asarray([12 + dy]), 4)[0])
    kids = sorted(kids)
    assert kids[-1] - kids[0] == 3  # 4 consecutive codes


def test_cover_bbox():
    ids = cells.cover_bbox_linear(-1.0, -1.0, 1.0, 1.0, 8)
    n = 1 << 8
    lon0, lat0, lon1, lat1 = cells.cell_bounds_linear(ids, 8)
    # every covered cell intersects the bbox
    assert (lon1 > -1.0).all() and (lon0 < 1.0).all()
    assert (lat1 > -1.0).all() and (lat0 < 1.0).all()
    # and the bbox corners are inside covered cells
    for qlon, qlat in [(-1.0, -1.0), (0.99, 0.99), (0.0, 0.0)]:
        assert cells.lonlat_to_linear([qlon], [qlat], 8)[0] in set(ids.tolist())


def test_cover_bbox_antimeridian():
    ids = cells.cover_bbox_linear(179.0, 10.0, -179.0, 11.0, 8)
    in_cells = set(ids.tolist())
    assert cells.lonlat_to_linear([179.5], [10.5], 8)[0] in in_cells
    assert cells.lonlat_to_linear([-179.5], [10.5], 8)[0] in in_cells
    assert cells.lonlat_to_linear([0.0], [10.5], 8)[0] not in in_cells


def test_disk_ring():
    c = int(cells.lonlat_to_linear([0.0], [0.0], 6)[0])
    d0 = cells.disk_linear(c, 6, 0)
    assert list(d0) == [c]
    d1 = cells.disk_linear(c, 6, 1)
    assert len(d1) == 9
    r1 = cells.ring_linear(c, 6, 1)
    assert len(r1) == 8 and c not in set(r1.tolist())


def test_disk_wraps_antimeridian():
    c = int(cells.lonlat_to_linear([-179.9], [0.0], 6)[0])
    d = cells.disk_linear(c, 6, 1)
    assert len(d) == 9  # wrapped around lon, not truncated
    east = int(cells.lonlat_to_linear([179.9], [0.0], 6)[0])
    assert east in set(d.tolist())
