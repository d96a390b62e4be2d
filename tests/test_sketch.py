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


def test_cms_soundness_and_merge_determinism(spark):
    from imagery_utils_spark.operators.sketch import cms_build, cms_query
    import random
    rng = random.Random(11)
    vals = [(f"w{rng.randrange(300)}",) for _ in range(4000)]
    from collections import Counter
    truth = Counter(v for v, in vals)
    for parts in (1, 13):
        df = spark.createDataFrame(vals, "v string").repartition(parts)
        cms = cms_build(df, F.col("v"), depth=4, width=64)
        cells = sorted(tuple(r) for r in cms.collect())
        if parts == 1:
            base = cells
        else:
            assert cells == base          # partition-independent sketch
    qdf = spark.createDataFrame(
        [(w,) for w in list(truth)[:20]] + [("absent-x",)], "v string")
    est = {r.q: r.est for r in
           cms_query(cms, qdf, F.col("v"), depth=4, width=64).collect()}
    for w, e in est.items():
        assert e >= truth.get(w, 0)       # never under-counts
    # total mass bound: every estimate <= stream length
    assert max(est.values()) <= 4000


def test_cms_absent_probe_small(spark):
    from imagery_utils_spark.operators.sketch import cms_build, cms_query
    vals = [(f"t{i % 50}",) for i in range(1000)]
    df = spark.createDataFrame(vals, "v string")
    cms = cms_build(df, F.col("v"), depth=4, width=256)
    est = cms_query(cms, spark.createDataFrame([("nope",)], "v string"),
                    F.col("v"), depth=4, width=256).collect()[0].est
    assert est <= 40  # collisions only; expected ~ n*d/width per row min
