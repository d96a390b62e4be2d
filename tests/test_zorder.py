"""Z-order clustering (operators/zorder.py): column/numpy/SQL morton
parity and layout locality."""
import numpy as np
from pyspark.sql import functions as F

from imagery_utils_spark.core import cells
from imagery_utils_spark.operators.zorder import (
    morton_col, zorder_locality_stats, zorder_repartition)


def test_morton_col_matches_numpy(spark):
    lons = [-180.0, -179.99, -0.5, 0.0, 0.25, 17.375, 179.99, 180.0, 181.0]
    lats = [-90.0, -89.99, -0.5, 0.0, 0.25, 42.125, 89.99, 90.0, 91.0]
    rows = [(i, lon, lat) for i, (lon, lat) in enumerate(
        [(a, b) for a in lons for b in lats])]
    df = spark.createDataFrame(rows, "i long, lon double, lat double")
    for res in (1, 6, 10, 16):
        got = {r.i: r.z for r in df.select(
            "i", morton_col(F.col("lon"), F.col("lat"), res).alias("z")
        ).collect()}
        want = cells.lonlat_to_morton(
            np.array([r[1] for r in rows]), np.array([r[2] for r in rows]),
            res)
        for i, w in enumerate(want):
            assert got[i] == int(w), (res, rows[i])


def test_zorder_repartition_locality(spark):
    n = 4096
    df = spark.range(n).select(
        "id",
        ((F.col("id") % 64) * 5.625 - 180.0 + 0.5).alias("lon"),
        ((F.floor(F.col("id") / 64) % 64) * 2.8125 - 90.0 + 0.5).alias("lat"),
    )
    z = zorder_repartition(df, res=10, num_partitions=16)
    stats = zorder_locality_stats(z, res=10, parent_res=3).collect()
    touched = [r.n_parent_cells for r in stats if r.n_rows > 0]
    # random layout: ~every partition sees most of the 8x8 parent grid;
    # z-ordered: contiguous key ranges -> a handful of parents each
    assert sum(touched) / len(touched) <= 8, touched

    rand_stats = zorder_locality_stats(
        df.withColumn("zkey", morton_col(F.col("lon"), F.col("lat"), 10))
        .repartition(16), res=10, parent_res=3).collect()
    rand_touched = [r.n_parent_cells for r in rand_stats if r.n_rows > 0]
    assert (sum(rand_touched) / len(rand_touched)
            > 3 * sum(touched) / len(touched))


def test_zorder_prefix_contiguity(spark):
    """Each parent cell's rows occupy one contiguous zkey range: ranges
    of distinct parents never interleave."""
    df = spark.range(1024).select(
        "id",
        ((F.col("id") % 32) * 11.25 - 180.0 + 0.5).alias("lon"),
        ((F.floor(F.col("id") / 32) % 32) * 5.625 - 90.0 + 0.5).alias("lat"),
    )
    z = zorder_repartition(df, res=8, num_partitions=4)
    rows = z.select("zkey").collect()
    shift = 2 * (8 - 2)
    spans = {}
    for r in rows:
        p = (r.zkey & ((1 << 56) - 1)) >> shift
        lo, hi = spans.get(p, (r.zkey, r.zkey))
        spans[p] = (min(lo, r.zkey), max(hi, r.zkey))
    ordered = sorted(spans.values())
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 < lo2
