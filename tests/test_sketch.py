"""KMV distinct sketch (operators/sketch.py): estimate accuracy,
partitioning independence, and exact-when-not-full semantics."""

from pyspark.sql import functions as F

from imagery_utils_spark.operators.sketch import kmv_estimate, kmv_sketch


def _sketch_rows(spark, n_distinct, parts, k=64, dup=2):
    vals = [(i % n_distinct,) for i in range(n_distinct * dup)]
    df = (spark.createDataFrame(vals, "v long")
          .withColumn("g", F.lit("g"))
          .repartition(parts))
    return kmv_estimate(kmv_sketch(df, ["g"], F.col("v"), k=k), k=k)


def test_kmv_estimate_accuracy(spark):
    row = _sketch_rows(spark, 5000, parts=4).collect()[0]
    # KMV rel. std. error ~ 1/sqrt(k-2) ~ 13% at k=64; allow 4 sigma
    assert abs(row.est_distinct - 5000) / 5000 < 0.5
    assert len(row.sketch) == 64


def test_kmv_partitioning_independent(spark):
    a = _sketch_rows(spark, 3000, parts=1).collect()[0]
    b = _sketch_rows(spark, 3000, parts=17).collect()[0]
    assert a.sketch == b.sketch
    assert a.est_distinct == b.est_distinct  # bit-identical


def test_kmv_not_full_is_exact(spark):
    row = _sketch_rows(spark, 40, parts=3).collect()[0]
    assert len(row.sketch) == 40
    assert row.est_distinct == 40.0          # sketch IS the set
