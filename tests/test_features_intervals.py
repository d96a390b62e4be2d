"""Unit tests: hashing-trick featurizer and banded interval overlap."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from imagery_utils_spark.operators.features import (
    feature_hash, feature_vector_digest)
from imagery_utils_spark.operators.rangejoin import interval_overlap_join


def test_feature_hash_sign_cancellation(spark):
    # same token twice = weight ±2; a doc with token t and anti-token?
    # cancellation needs two tokens hashing to the same bucket with
    # opposite signs — rare at dim=64; instead pin the multiplicity law
    docs = spark.createDataFrame([Row(doc_id=1, text="w w w"),
                                  Row(doc_id=2, text="w")])
    v = {(r.doc_id): r.w for r in feature_hash(docs, dim=64).collect()}
    assert v[1] == 3 * v[2]  # multiplicity scales the signed weight


def test_feature_hash_digest_stable_and_order_free(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma beta")])
    d1 = feature_vector_digest(feature_hash(docs)).collect()[0]
    docs2 = spark.createDataFrame(
        [Row(doc_id=1, text="beta gamma beta alpha")])  # reordered
    d2 = feature_vector_digest(feature_hash(docs2)).collect()[0]
    assert (d1.nnz, d1.l1, d1.vec_sha) == (d2.nnz, d2.l1, d2.vec_sha)


def test_interval_overlap_no_duplicate_across_bands(spark):
    # a long interval spanning many bands overlaps one short interval:
    # the pair must appear exactly once
    a = spark.createDataFrame([Row(a_id=1, a_start=0, a_end=1000)])
    b = spark.createDataFrame([Row(b_id=9, b_start=450, b_end=460)])
    out = interval_overlap_join(a, b, band=100).collect()
    assert len(out) == 1
    assert (out[0].a_id, out[0].b_id) == (1, 9)


def test_interval_overlap_touching_and_disjoint(spark):
    a = spark.createDataFrame([Row(a_id=1, a_start=0, a_end=100)])
    b = spark.createDataFrame(
        [Row(b_id=1, b_start=100, b_end=200),   # touching: closed -> yes
         Row(b_id=2, b_start=101, b_end=200),   # disjoint
         Row(b_id=3, b_start=-50, b_end=0)])    # touching at the left
    got = sorted(r.b_id for r in
                 interval_overlap_join(a, b, band=64).collect())
    assert got == [1, 3]


def test_interval_overlap_matches_theta_join(spark):
    # randomized-ish fixture vs the naive cross join, several bands
    a = spark.createDataFrame(
        [Row(a_id=i, a_start=(i * 37) % 500,
             a_end=(i * 37) % 500 + (i * 13) % 90) for i in range(40)])
    b = spark.createDataFrame(
        [Row(b_id=j, b_start=(j * 53) % 480,
             b_end=(j * 53) % 480 + (j * 11) % 120) for j in range(30)])
    fast = {(r.a_id, r.b_id)
            for r in interval_overlap_join(a, b, band=64).collect()}
    naive = {(r.a_id, r.b_id) for r in
             a.crossJoin(b).filter((F.col("a_start") <= F.col("b_end"))
                                   & (F.col("b_start") <= F.col("a_end"))
                                   ).collect()}
    assert fast == naive and naive
