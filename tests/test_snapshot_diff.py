"""snapshot_diff (operators/lineage.py): added/removed/changed over a
multi-column content signature."""

from imagery_utils_spark.operators.lineage import snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
        "id long, t1 string, t2 string")
    new = spark.createDataFrame(
        [(2, "b", "y"), (3, "c", "CHANGED"), (4, "d", "w")],
        "id long, t1 string, t2 string")
    got = {r.key: r.status
           for r in snapshot_diff(old, new, "id", ["t1", "t2"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged


def test_snapshot_diff_multicol_signature(spark):
    # change in the SECOND content column alone must be detected
    old = spark.createDataFrame([(1, "a", "x")],
                                "id long, t1 string, t2 string")
    new = spark.createDataFrame([(1, "a", "xx")],
                                "id long, t1 string, t2 string")
    rows = snapshot_diff(old, new, "id", ["t1", "t2"]).collect()
    assert [(r.key, r.status) for r in rows] == [(1, "changed")]
